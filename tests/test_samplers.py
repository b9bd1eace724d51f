"""Variant-sampler + metrics smoke tests on tiny random-weight models."""

import numpy as np
import pytest

import jax

from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.data.scaler import RobustScaler
from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
from gctplus_tpu.models.registry import init_params
from gctplus_tpu.sample.samplers import (
    CvaetfSampler,
    PscaVaetfSampler,
    ScaVaetfSampler,
    VaetfSampler,
)

TOKS = list("CNOSFcnos") + ["Cl", "Br", "(", ")", "=", "#", "1", "2", "3"]


def _vocabs():
    src = Vocab.from_corpus_tokens([TOKS], with_sos_eos=False, add_sep=True)
    trg = Vocab.from_corpus_tokens([TOKS], with_sos_eos=True, add_sep=True)
    return src, trg


def _toklen_data():
    return np.random.default_rng(0).integers(10, 50, 500)


def _cfg(src, trg, nconds):
    return ModelConfig(src_vocab=len(src), trg_vocab=len(trg), N=1,
                       d_model=32, d_ff=64, heads=4, latent_dim=8,
                       dropout=0.0, nconds=nconds,
                       use_cond2lat=nconds > 0)


def test_vaetf_sampler():
    src, trg = _vocabs()
    cfg = _cfg(src, trg, 0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    s = VaetfSampler(model, cfg, params, src, trg, toklen_data=_toklen_data(),
                     batch_size=8, max_strlen=20)
    smiles, toklen = s.sample_smiles(10)
    assert len(smiles) == 10 and len(toklen) == 10
    assert all(isinstance(x, str) for x in smiles)


def test_cvaetf_sampler_with_scaler():
    src, trg = _vocabs()
    cfg = _cfg(src, trg, 3)
    model = Cvaetf(cfg)
    params = init_params(model, cfg)
    scaler = RobustScaler().fit(
        np.random.default_rng(0).normal(size=(100, 3)) * [2, 30, 0.2] + [2, 60, 0.6])
    s = CvaetfSampler(model, cfg, params, src, trg,
                      toklen_data=_toklen_data(), scaler=scaler,
                      batch_size=8, max_strlen=16)
    props = np.tile([[2.0, 60.0, 0.7]], (6, 1))
    smiles, toklen = s.sample_smiles(props)
    assert len(smiles) == 6


def test_scaffold_samplers():
    src, trg = _vocabs()
    cfg = _cfg(src, trg, 0)
    model = Cvaetf(cfg)
    params = init_params(model, cfg)
    s = ScaVaetfSampler(model, cfg, params, src, trg,
                        toklen_data=_toklen_data(), batch_size=8,
                        max_strlen=16)
    smiles, _ = s.sample_smiles(5, "c1ccccc1")
    assert len(smiles) == 5
    # scaffold prefix must be stripped: outputs must not all start with
    # the scaffold token sequence (with random weights a model-emitted
    # <sep> token can still legitimately appear mid-string)
    assert not all(smi.startswith("c1ccccc1<sep>") for smi in smiles)

    cfg2 = _cfg(src, trg, 3)
    model2 = Cvaetf(cfg2)
    params2 = init_params(model2, cfg2)
    s2 = PscaVaetfSampler(model2, cfg2, params2, src, trg,
                          toklen_data=_toklen_data(), batch_size=8,
                          max_strlen=16)
    props = np.tile([[0.5, -0.2, 0.1]], (4, 1))
    smiles2, _ = s2.sample_smiles(props, "c1ccncc1", transform=False)
    assert len(smiles2) == 4


def test_encode_decode_roundtrip_api():
    src, trg = _vocabs()
    cfg = _cfg(src, trg, 0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    s = VaetfSampler(model, cfg, params, src, trg, toklen_data=_toklen_data(),
                     batch_size=4, max_strlen=16)
    z, mu, logvar = s.encode_smiles(["CCO", "CCN"])
    assert mu.shape[0] == 2 and mu.shape[2] == cfg.latent_dim
    out = s.decode_z(mu)
    assert len(out) == 2


def test_metrics_on_fixed_strings():
    from gctplus_tpu.eval.metrics import (
        fraction_unique, fraction_valid, get_all_metrics, internal_diversity,
        novelty)
    gen = ["CCO", "CCO", "OCC", "c1ccccc1", "C(C", "CCN"]
    assert fraction_valid(gen) == pytest.approx(5 / 6)
    # OCC == CCO canonically -> 3 unique among 5 valid
    assert fraction_unique(gen) == pytest.approx(3 / 5)
    nov = novelty(gen, ["CCO"], train_is_canonical=False)
    # moses semantics: |unique - train| / |unique| over the UNIQUE
    # canonical set {CCO, benzene, CCN} -> 2/3 novel
    # (also Inference/sca_sampling.py:228)
    assert nov == pytest.approx(2 / 3)
    d = internal_diversity(["CCO", "c1ccccc1", "CCN"])
    assert 0.0 < d < 1.0
    m = get_all_metrics(gen, train=["CCO"], test=["CCN", "c1ccccc1"])
    assert set(m) >= {"valid", "unique", "IntDiv", "novelty", "SNN/Test"}
