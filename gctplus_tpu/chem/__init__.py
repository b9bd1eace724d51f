from gctplus_tpu.chem.tokenizer import SmilesTokenizer, untokenize
from gctplus_tpu.chem.vocab import Vocab, build_vocab_pair
from gctplus_tpu.chem.sanitize import is_valid_smiles, mol_from_smiles
from gctplus_tpu.chem.canonical import canonical_smiles
from gctplus_tpu.chem.scaffold import murcko_scaffold, murcko_scaffold_similarity
from gctplus_tpu.chem.fingerprints import (
    smiles_to_morgan,
    tanimoto_similarity,
    bulk_tanimoto_matrix,
)
from gctplus_tpu.chem.descriptors import (
    PROPERTY_FN,
    compute_properties,
    get_property_fn,
)
from gctplus_tpu.chem.randomize import randomize_smiles
from gctplus_tpu.chem.mapper import pmap
