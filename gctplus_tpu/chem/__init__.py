from gctplus_tpu.chem.tokenizer import SmilesTokenizer, untokenize
from gctplus_tpu.chem.vocab import Vocab, build_vocab_pair
