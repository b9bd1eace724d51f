"""Coverage for the smaller inventory components: length bucketing,
decode_check, transfer/freeze params, approximate_z, toklen sampler,
training plots, profiling counters."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp


def test_length_bucketing_loader():
    from gctplus_tpu.chem.vocab import Vocab
    from gctplus_tpu.data.dataset import BatchLoader, SmilesDataset

    smiles = ["C" * (i % 17 + 1) for i in range(200)]
    toks = [list(s) for s in smiles]
    src = Vocab.from_corpus_tokens(toks, with_sos_eos=False, add_sep=False)
    trg = Vocab.from_corpus_tokens(toks, with_sos_eos=True, add_sep=False)
    ds = SmilesDataset(smiles, src, trg)
    plain = BatchLoader(ds, 16, shuffle=True, length_bucketing=False)
    bucketed = BatchLoader(ds, 16, shuffle=True, length_bucketing=True)

    def pad_waste(loader):
        waste = 0
        for b in loader:
            lens = (b["src"] != src.pad_id).sum(1)
            waste += int((b["src"].shape[1] - lens).sum())
        return waste

    assert pad_waste(bucketed) <= pad_waste(plain)
    # all rows still covered exactly once
    idx = bucketed.bucketed_indices()
    assert sorted(idx.tolist()) == list(range(200))


def test_decode_check():
    from gctplus_tpu.chem.vocab import Vocab
    from gctplus_tpu.train.loop import decode_check

    toks = [["C", "C", "O"]]
    trg = Vocab.from_corpus_tokens(toks, with_sos_eos=True, add_sep=False)
    V = len(trg)
    # logits strongly peaked on "C C O <eos>"
    seq = [trg.stoi["C"], trg.stoi["C"], trg.stoi["O"], trg.eos_id]
    logits = np.full((2, len(seq), V), -10.0, np.float32)
    for i, t in enumerate(seq):
        logits[:, i, t] = 10.0
    ratio, smis = decode_check(logits, trg)
    assert ratio == 1.0
    assert smis[0] == "CCO"


def test_transfer_and_freeze_params():
    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import (
        freeze_mask, init_params, transfer_params)

    cfg = ModelConfig(src_vocab=12, trg_vocab=12, N=1, d_model=16, d_ff=32,
                      heads=2, latent_dim=4, dropout=0.0, nconds=0)
    m = Vaetf(cfg)
    p1 = init_params(m, cfg, jax.random.PRNGKey(0))
    p2 = init_params(m, cfg, jax.random.PRNGKey(1))
    merged = transfer_params(p1, p2)
    a = np.asarray(jax.tree_util.tree_leaves(merged)[0])
    b = np.asarray(jax.tree_util.tree_leaves(p1)[0])
    np.testing.assert_array_equal(a, b)

    mask = freeze_mask(p1, train_names=["decoder", "out"])
    assert all(jax.tree_util.tree_leaves(mask["decoder"]))
    assert not any(jax.tree_util.tree_leaves(mask["encoder"]))

    # freeze actually works through with_frozen (multi_transform)
    import optax
    from gctplus_tpu.train.schedule import with_frozen
    tx = with_frozen(optax.sgd(0.1), mask)
    state = tx.init(p1)
    grads = jax.tree_util.tree_map(jnp.ones_like, p1)
    updates, _ = tx.update(grads, state, p1)
    enc_upd = jax.tree_util.tree_leaves(updates["encoder"])
    dec_upd = jax.tree_util.tree_leaves(updates["decoder"])
    assert all(float(jnp.abs(u).max()) == 0 for u in enc_upd)
    assert all(float(jnp.abs(u).max()) > 0 for u in dec_upd)


def test_approximate_z():
    from gctplus_tpu.tasks.mol_interpolation import approximate_z

    z = np.random.default_rng(0).normal(2.0, 0.5, (30, 8))
    out = approximate_z(z, 50)
    assert out.shape == (50, 8)
    assert abs(out.mean() - 2.0) < 0.3


def test_toklen_distribution_sampler():
    from gctplus_tpu.data.toklen import sample_toklens

    data = np.concatenate([np.full(500, 20), np.full(500, 60)])
    out = sample_toklens(data, 2000, np.random.default_rng(0))
    frac_low = np.mean(np.abs(out - 20) < 10)
    frac_high = np.mean(np.abs(out - 60) < 10)
    assert 0.3 < frac_low < 0.7 and 0.3 < frac_high < 0.7


def test_training_plots(tmp_path):
    from gctplus_tpu.train.plots import collect_history, plot_training_curves

    for e in (1, 2):
        pd.DataFrame({"RCE": [3.0 / e, 2.0 / e], "KLD": [1.0, 1.0],
                      "LOSS": [4.0 / e, 3.0 / e], "BETA": [0.02] * 2,
                      "LR": [1e-4] * 2}).to_csv(tmp_path / f"train_{e}.csv")
    hist = collect_history(str(tmp_path), "train")
    assert set(hist["epoch"]) == {1, 2}
    out = plot_training_curves(str(tmp_path))
    assert out is None or out.endswith(".png")


def test_step_timer():
    from gctplus_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.update(n_tokens=100, n_samples=2)
    t.update(n_tokens=100, n_samples=2)
    r = t.report()
    assert r["tokens_per_s"] > 0 and r["samples_per_s"] > 0


def test_sharded_sampling_on_mesh():
    """Data-parallel sampling: batch sharded over the 'data' axis of
    the virtual mesh; the whole KV-cached decode runs SPMD."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.parallel import make_mesh
    from gctplus_tpu.sample.decode import DecodeEngine

    mesh = make_mesh(n_data=8, n_model=1)
    cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32, d_ff=64,
                      heads=4, latent_dim=8, dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    eng = DecodeEngine(model, cfg)
    bs = 16
    sh = NamedSharding(mesh, P("data"))
    prefix = jax.device_put(jnp.full((bs, 1), 2, jnp.int32), sh)
    stop = jax.device_put(jnp.full((bs,), 10, jnp.int32), sh)
    out = eng.sample_prior(params, prefix, 1, 12, stop, None,
                           jax.random.PRNGKey(0), max_new=8)
    assert out.shape == (bs, 9)


def test_sampler_with_mesh():
    """Variant sampler end-to-end with a sharded batch over the CPU mesh."""
    from gctplus_tpu.chem.vocab import Vocab
    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.parallel import make_mesh
    from gctplus_tpu.sample.samplers import VaetfSampler

    toks = [list("CNOScnos") + ["(", ")", "=", "1"]]
    src = Vocab.from_corpus_tokens(toks, with_sos_eos=False, add_sep=False)
    trg = Vocab.from_corpus_tokens(toks, with_sos_eos=True, add_sep=False)
    cfg = ModelConfig(src_vocab=len(src), trg_vocab=len(trg), N=1,
                      d_model=32, d_ff=64, heads=4, latent_dim=8,
                      dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    s = VaetfSampler(model, cfg, params, src, trg,
                     toklen_data=np.full(100, 12), batch_size=16,
                     max_strlen=16, mesh=mesh)
    smiles, toklen = s.sample_smiles(16)
    assert len(smiles) == 16


def test_native_and_python_collate_agree():
    from gctplus_tpu.chem.tokenizer import SmilesTokenizer
    from gctplus_tpu.chem.vocab import Vocab
    from gctplus_tpu.data.dataset import BatchLoader, SmilesDataset
    from gctplus_tpu.native import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    smiles = ["CC(=O)Nc1ccc(O)cc1", "BrCCl", "c1ccc2ccccc2c1", "C%12CC%12",
              "O=S(=O)(N)c1ccccc1"]
    scaffolds = ["c1ccccc1", "", "c1ccc2ccccc2c1", "C1CC1", "c1ccccc1"]
    tok = SmilesTokenizer()
    corpus = [tok(s) for s in smiles + scaffolds if s]
    src = Vocab.from_corpus_tokens(corpus, with_sos_eos=False, add_sep=True)
    trg = Vocab.from_corpus_tokens(corpus, with_sos_eos=True, add_sep=True)

    for use_scaffold in (False, True):
        for fixed in (None, 40):
            kw = dict(batch_size=5, use_scaffold=use_scaffold,
                      shuffle=False, fixed_len=fixed)
            ds = SmilesDataset(smiles, src, trg,
                               scaffolds=scaffolds if use_scaffold else None)
            b_py = next(iter(BatchLoader(ds, use_native=False, **kw)))
            b_nat = next(iter(BatchLoader(ds, use_native=True, **kw)))
            np.testing.assert_array_equal(b_py["src"], b_nat["src"])
            np.testing.assert_array_equal(b_py["trg"], b_nat["trg"])


def test_orbax_checkpointer(tmp_path):
    """Async sharded checkpoint backend (train/orbax_io.py): save with
    mesh-sharded params, restore bit-exact, hyper sidecar, latest_step.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.parallel import make_mesh, shard_params
    from gctplus_tpu.train.orbax_io import OrbaxCheckpointer
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import TrainState

    model, cfg = build_model("vaetf", 40, 44, N=1, d_model=32, d_ff=64,
                             heads=4, latent_dim=8, dropout=0.0)
    params = init_params(model, cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(params, mesh)
    tx, _ = make_optimizer(32, 10)
    state = TrainState.create(params, tx)

    ck = OrbaxCheckpointer(str(tmp_path))
    ck.save(1, state, {"N": 1})
    ck.save(2, state, {"N": 1}, wait=True)  # async back-to-back saves
    assert ck.latest_step() == 2
    assert ck.hyper(2) == {"N": 1}

    tpl = {"params": state.params, "opt_state": state.opt_state,
           "step": state.step}
    out = ck.restore(2, tpl)
    for a, b in zip(jax.tree_util.tree_leaves(out["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    ck.close()


def test_prop_tolerances_match_reference():
    """Pin the in-tolerance thresholds to the reference's
    Configuration/config_default.py:4 — a 0.04 QED transcription
    error survived rounds 1-3 and biased valid/unique_in_tolerance.
    Parse the reference file directly when present so a future drift
    on either side fails loudly."""
    from gctplus_tpu.config import PROP_TOLERANCES, TARGET_PROPS

    assert PROP_TOLERANCES == {
        "logP": 0.4, "tPSA": 8.0, "QED": 0.03, "SAS": 0.25}
    assert TARGET_PROPS["QED"] == [0.6, 0.725, 0.85]

    ref = Path("/root/reference/Configuration/config_default.py")
    if not ref.exists():
        pytest.skip("reference repo not available")
    ns = {}
    exec(ref.read_text(), ns)  # constants-only module
    assert {k: float(v) for k, v in ns["prop_tolerance"].items()} == \
        PROP_TOLERANCES
    assert ns["selected_target_prop"] == TARGET_PROPS
