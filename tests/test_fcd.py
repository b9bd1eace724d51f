"""FCD code-path tests using a tiny random-weight ChemNet surrogate
(the real artifact is a data asset; the code path is identical —
reference usage: moses.get_all_metrics at Inference/uc_sampling.py:26-39)."""

import numpy as np
import pytest

from gctplus_tpu.eval.fcd import (ChemNet, activation_statistics,
                                  build_surrogate_chemnet, fcd,
                                  frechet_distance)

SET_A = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCOC", "CCCN",
         "c1ccncc1", "CC(C)O", "CCS", "CNC"]
SET_B = ["Clc1ccccc1Cl", "BrCCBr", "FC(F)(F)c1ccc(Br)cc1",
         "ICCI", "ClCCCl", "BrC(Br)Br", "Clc1ccncc1", "FCF",
         "ClCCBr", "IC(I)I"]


@pytest.fixture(scope="module")
def chemnet_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fcd") / "chemnet.npz"
    return build_surrogate_chemnet(str(p), hidden=8, seq_len=32)


def test_artifact_roundtrip(chemnet_path):
    net = ChemNet.load(chemnet_path)
    assert net.seq_len == 32
    ids = net.encode("Clc1ccccc1")   # greedy: Cl is one channel
    assert ids.shape == (32,)
    cl = net.charset.index("Cl")
    assert ids[0] == cl
    acts = net.activations(["CCO", "c1ccccc1"], batch_size=4)
    assert acts.shape == (2, 16)
    assert np.isfinite(acts).all()


def test_fcd_identity_and_separation(chemnet_path):
    d_self = fcd(SET_A, list(SET_A), model_path=chemnet_path)
    d_cross = fcd(SET_A, SET_B, model_path=chemnet_path)
    assert d_self == pytest.approx(0.0, abs=1e-4)
    assert d_cross > d_self + 1e-3


def test_fcd_invalid_smiles_dropped(chemnet_path):
    noisy = SET_A + ["not_a_smiles((", "C1CC"]
    d = fcd(noisy, SET_A, model_path=chemnet_path)
    assert d == pytest.approx(0.0, abs=1e-4)


def test_fcd_gate_without_artifact(monkeypatch):
    monkeypatch.delenv("GCTPLUS_CHEMNET", raising=False)
    with pytest.raises(NotImplementedError):
        fcd(SET_A, SET_B, model_path=None)


def test_frechet_distance_formula():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 4))
    y = x + 3.0
    mu1, c1 = activation_statistics(x)
    mu2, c2 = activation_statistics(y)
    d = frechet_distance(mu1, c1, mu2, c2)
    # same covariance, shifted mean: d^2 ~ |shift|^2 = 4 * 9
    assert d == pytest.approx(36.0, rel=0.05)


def test_get_all_metrics_includes_fcd_with_artifact(chemnet_path,
                                                    monkeypatch):
    from gctplus_tpu.eval.metrics import get_all_metrics
    monkeypatch.setenv("GCTPLUS_CHEMNET", chemnet_path)
    m = get_all_metrics(SET_A, train=SET_B, test=SET_B, k=(5,))
    assert "FCD/Test" in m and np.isfinite(m["FCD/Test"])
    assert 0.0 <= m["Scaf/Test"] <= 1.0 or np.isnan(m["Scaf/Test"])
