"""Native C++ tokenizer/encoder must agree with the Python tokenizer
exactly, and be substantially faster at batch scale."""

import time

import numpy as np
import pytest

from gctplus_tpu.chem.tokenizer import SmilesTokenizer
from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.native import NativeEncoder, count_tokens, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")

SMILES = [
    "CC(=O)Nc1ccc(O)cc1", "c1ccc2ccccc2c1", "BrCCl", "C%12CC%12",
    "C/C=C\\C", "[NH4+]", "O=S(=O)(N)c1ccccc1", "FC(F)(F)c1ccccc1",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
]


def _vocab(add_sep=False):
    tok = SmilesTokenizer()
    return Vocab.from_corpus_tokens([tok(s) for s in SMILES],
                                    with_sos_eos=True, add_sep=add_sep)


def test_native_matches_python():
    v = _vocab()
    tok = SmilesTokenizer()
    enc = NativeEncoder(v)
    out, lengths = enc.encode_batch(SMILES, max_len=48, add_sos=True,
                                    add_eos=True)
    for i, smi in enumerate(SMILES):
        want = [v.sos_id] + v.encode(tok(smi)) + [v.eos_id]
        got = out[i, : lengths[i]].tolist()
        assert got == want, smi


def test_native_sep_handling():
    v = _vocab(add_sep=True)
    enc = NativeEncoder(v)
    tok = SmilesTokenizer(add_sep=True)
    s = "c1ccccc1<sep>CCO"
    out, lengths = enc.encode_batch([s], max_len=32)
    want = v.encode(tok(s))
    assert out[0, : lengths[0]].tolist() == want


def test_count_tokens():
    tok = SmilesTokenizer()
    counts = count_tokens(SMILES)
    assert counts.tolist() == [len(tok(s)) for s in SMILES]


def test_native_speedup():
    """Best-of-3 each way: single-shot timing is flaky when the suite
    shares the box with a training run."""
    v = _vocab()
    tok = SmilesTokenizer()
    enc = NativeEncoder(v)
    batch = SMILES * 2000  # 18k molecules

    t_native = min(_timed(lambda: enc.encode_batch(
        batch, max_len=48, add_sos=True, add_eos=True)) for _ in range(3))

    def py():
        for s in batch:
            [v.sos_id] + v.encode(tok(s)) + [v.eos_id]

    t_python = min(_timed(py) for _ in range(3))
    assert t_native < t_python, (t_native, t_python)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
