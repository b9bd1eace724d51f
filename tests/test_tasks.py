"""Task-driver smoke tests on tiny models + synthetic data: the 4
sampling tasks, interpolation, model selection, attention dump."""

import os
import types

import numpy as np
import pandas as pd
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Synthetic data + a tiny random-weight checkpoint per variant."""
    from gctplus_tpu.data.preprocess import preprocess
    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.train.loop import save_checkpoint
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import TrainState

    root = tmp_path_factory.mktemp("tasks_ws")
    out = preprocess(str(root), n_jobs=1, n_synthetic=150, seed=5)

    runs = {}
    for model_type in ("vaetf", "pvaetf", "scavaetf", "pscavaetf"):
        suffix = "_sep" if "sca" in model_type else ""
        src = out["vocabs"][f"SRC{suffix}"]
        trg = out["vocabs"][f"TRG{suffix}"]
        model, cfg = build_model(model_type, len(src), len(trg), N=1,
                                 d_model=32, d_ff=64, heads=4, latent_dim=8,
                                 dropout=0.0)
        params = init_params(model, cfg)
        tx, _ = make_optimizer(32, 10)
        state = TrainState.create(params, tx)
        folder = root / f"run_{model_type}"
        os.makedirs(folder, exist_ok=True)
        save_checkpoint(str(folder / "model_1.msgpack"), state, {})
        runs[model_type] = str(folder)
    return root, out, runs


def _args(root, runs, model_type, **kw):
    base = dict(
        model_type=model_type, model_folder=runs[model_type],
        model_name="model_1.msgpack", util_folder=str(root / "utils"),
        data_folder=str(root), save_folder=str(root / "results"),
        property_list=(["logP", "tPSA", "QED"]
                       if model_type in ("pvaetf", "pscavaetf") else []),
        max_strlen=24, decode_algo="multinomial", top_k=None, n_jobs=1,
        seed=0, batch_size=8, N=1, H=4, d_ff=64, d_model=32, latent_dim=8,
        dropout=0.0, variational=True, use_cond2dec=False,
        use_cond2lat=False, get_attn=False, n_samples=6)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_uc_sampling_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.uc_sampling import uc_sampling
    train = out["frames"]["train"]["smiles"].tolist()[:50]
    m = uc_sampling(_args(root, runs, "vaetf"), train=train, test=train[:20])
    assert "valid" in m.columns
    # rerun hits the CSV cache
    m2 = uc_sampling(_args(root, runs, "vaetf"), train=train)
    assert m2["valid"].iloc[0] == m["valid"].iloc[0]


def test_sca_sampling_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.sca_sampling import sca_sampling
    scas = out["frames"]["train"]["scaffold"].tolist()
    m = sca_sampling(_args(root, runs, "scavaetf", n_scaffolds=2,
                           n_samples=4), scas)
    assert {"SSF", "sim80", "valid"} <= set(m.columns)
    assert len(m) == 2


def test_mol_interpolation_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.mol_interpolation import (
        mol_interpolation, slerp, lerp, smoothness_metrics)
    v0, v1 = np.ones(8), np.ones(8) * 2
    assert np.allclose(lerp(v0, v1, 0.5), 1.5)
    s = slerp(v0.reshape(2, 4), v1.reshape(2, 4), 0.0)
    assert np.allclose(s, v0.reshape(2, 4), atol=1e-6)
    # reference-formula parity, hand-computed
    # (Inference/mol_interpolation.py:142-150):
    # smooth_prev = fraction of adjacent sims >= 0.50
    from gctplus_tpu.tasks.mol_interpolation import (
        compute_smoothness_prev, compute_smoothness_start)
    assert compute_smoothness_prev([0.6, 0.4, 0.5, 0.49]) == 0.5
    # smooth_start: rev curve [.25,.5,.75] -> d_rev [.25,.25]
    # (binary-exact) std(ddof=1)=0 -> 1 - sqrt(std_fwd*0) = 1.0
    assert compute_smoothness_start([1, .8, .5], [.25, .5, .75]) == 1.0
    # d_fwd [-.5,-.1] std=.2828427, d_rev [.2,.6] std=.2828427
    # -> 1 - .2828427 = .7171573
    assert abs(compute_smoothness_start([1, .5, .4], [.2, .4, 1.0])
               - (1 - 0.4 / 2 ** 0.5)) < 1e-12
    m = smoothness_metrics(["CCO", "CCN", None, "CCO"])
    assert m["smooth_start"] <= 1  # can be negative, like the reference
    # identical path: fwd/rev curves constant -> both stds 0 ->
    # smooth_start 1; adjacent sims all 1 -> smooth_prev 1
    m = smoothness_metrics(["CCO", "CCO", "CCO"])
    assert m["smooth_start"] == 1.0 and m["smooth_prev"] == 1.0

    smis = out["frames"]["train"]["smiles"].tolist()[:60]
    df = mol_interpolation(
        _args(root, runs, "vaetf", n_pairs=1, n_interpolations=2), smis)
    assert len(df) <= 1  # pair selection can fail on tiny sets


def test_model_selection_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.model_selection import model_selection
    ref = out["frames"]["train"]["smiles"].tolist()[:40]
    df = model_selection(_args(root, runs, "vaetf", n_samples=8), ref)
    assert "score" in df.columns and len(df) == 1


def test_visualize_attention_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.visualize_attention import visualize_attention
    arrays = visualize_attention(_args(root, runs, "vaetf"), "CCO")
    assert arrays["encoder"].shape[0] == 1  # N=1 layers
    assert (root / "results" / "visualize_attention" /
            "attn_encoder.npy").exists()
    # self-contained bertviz-analog HTML view
    html = (root / "results" / "visualize_attention" /
            "attention.html").read_text()
    assert "decoder_cross" in html and "<canvas" in html


def test_latent_analysis_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.latent_analysis import latent_analysis
    smis = out["frames"]["train"]["smiles"].tolist()[:24]
    stats = latent_analysis(_args(root, runs, "vaetf", n_samples=24,
                                  seed=0), smis)
    assert "mu_std" in stats
    folder = root / "results" / "latent_analysis"
    assert (folder / "latent_pca.csv").exists()
    # t-SNE projection (test_encoder.py:509-789 parity tail)
    assert (folder / "latent_tsne.csv").exists()


def test_kldiv_score():
    from gctplus_tpu.eval.kldiv import kldiv_score
    a = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCCC"]
    s_same = kldiv_score(a, a)
    assert s_same["score"] > 0.95  # identical distributions
    b = ["c1ccc2ccccc2c1"] * 5
    s_diff = kldiv_score(b, a)
    assert s_diff["score"] < s_same["score"]


def test_p_sampling_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.p_sampling import p_sampling
    train_props = out["frames"]["train"]
    df = p_sampling(_args(root, runs, "pvaetf", n_samples=2),
                    train_props=train_props)
    assert len(df) == 27  # the full target grid (config_default.py:7-12)
    assert {"valid", "logP_MAE", "valid_in_tolerance",
            "n_train"} <= set(df.columns)
    assert (df["n_train"] >= 0).all()


def test_n_train_near_prop_counts():
    """Reference Inference/p_sampling.py:36-45 semantics: all
    properties within tolerance simultaneously."""
    from gctplus_tpu.tasks.p_sampling import get_n_train_near_prop
    train = pd.DataFrame({
        "logP": [1.0, 2.0, 3.0], "tPSA": [40.0, 60.0, 80.0],
        "QED": [0.6, 0.7, 0.8]})
    tol = {"logP": 0.5, "tPSA": 10.0, "QED": 0.1}
    combos = [(1.0, 40.0, 0.6),    # matches row 0 only
              (2.2, 55.0, 0.75),   # matches row 1 only
              (9.0, 40.0, 0.6)]    # logP excludes all
    assert get_n_train_near_prop(
        combos, ["logP", "tPSA", "QED"], tol, train) == [1, 1, 0]


def test_psca_sampling_task(tiny_setup):
    root, out, runs = tiny_setup
    from gctplus_tpu.tasks.psca_sampling import psca_sampling
    scas = out["frames"]["train"]["scaffold"].tolist()
    df = psca_sampling(_args(root, runs, "pscavaetf", n_scaffolds=1,
                             n_samples=2), scas)
    assert len(df) == 27
    assert {"SSF", "valid_molgpt"} <= set(df.columns)
    res = root / "results" / "psca_sampling"
    assert (res / "metric_by_scaffold.csv").exists()


def test_interpolate_pair_batched_retry_semantics():
    """The batched decode keeps the reference per-point retry rules
    (mol_interpolation.py:200-259): failed points redraw with std
    growing 0.005 every SECOND failed try, independent schedules per
    point, results in alpha order."""
    from gctplus_tpu.tasks.mol_interpolation import interpolate_pair

    class StubSampler:
        def __init__(self):
            self.rng = np.random.default_rng(0)
            self.calls = []

        def tokenizer(self, s):
            return list(s)

        def encode_smiles(self, smis, pad_to=None):
            L = pad_to or 8
            mu = np.zeros((len(smis), L, 4))
            return None, mu, np.zeros_like(mu)

        def decode_z(self, z, toklen=None):
            self.calls.append(z.shape)
            n_call = len(self.calls)
            out = []
            for k in range(z.shape[0]):
                # point 0 succeeds immediately; point 1 needs 3 tries;
                # point 2 never succeeds
                if k == 0 or (k == 1 and n_call >= 3):
                    out.append("CCO")
                else:
                    out.append("x(")  # invalid
            return out

    s = StubSampler()
    path = interpolate_pair(s, "CCO", "CCN", n_interp=3, max_retry=6)
    assert path[0] == "CCO" and path[-1] == "CCN"
    assert path[1] == "CCO"          # point 0: first-attempt success
    assert path[2] == "CCO"          # point 1: succeeded on retry
    assert path[3] is None           # point 2: exhausted retries
    # every decode call uses the FIXED batch shape (one XLA program)
    assert all(shape[0] == 3 for shape in s.calls)
    assert len(s.calls) == 6         # max-of-attempts, not sum


def test_psca_sampling_molgpt_mode(tiny_setup):
    """molgpt scaffold source (reference psca_sampling.py:134-139,
    222-224): 2x2x2 grid over logP/tPSA/SAS, sim>=0.8 filtered
    aggregation, fixture scaffold list."""
    root, out, runs = tiny_setup
    from gctplus_tpu.config import MOLGPT_SCAFFOLDS
    from gctplus_tpu.data.scaler import RobustScaler
    from gctplus_tpu.tasks.psca_sampling import psca_sampling

    props = ["logP", "tPSA", "SAS"]
    train_df = out["frames"]["train"]
    scaler = RobustScaler().fit(train_df[props].to_numpy(), columns=props)
    scaler.save(str(root / "utils" / "scaler_logP-tPSA-SAS.json"))

    args = _args(root, runs, "pscavaetf", n_scaffolds=2, n_samples=2,
                 property_list=props, scaffold_source="molgpt",
                 save_folder=str(root / "results_molgpt"))
    df = psca_sampling(args, MOLGPT_SCAFFOLDS)
    assert len(df) == 2 * 8  # 2 scaffolds x molgpt 2x2x2 grid
    assert set(props) <= set(df.columns)
    # molgpt aggregation: sim80 over the filtered set is 1.0 (or nan
    # when no generation clears the 0.8 bar — a tiny random model)
    s80 = df["sim80"].dropna()
    assert (s80 == 1.0).all()
    assert (root / "results_molgpt" / "psca_sampling"
            / "metric_by_property.csv").exists()


def test_cli_sca_sampling_dispatch(tiny_setup, tmp_path):
    """CLI end-to-end dispatch (cli.py): the sca-sampling subcommand
    loads the scaffold source DataFrame (regression: `df or fallback`
    raised on DataFrame truthiness) and runs the task."""
    from gctplus_tpu import cli

    root, out, runs = tiny_setup
    save = tmp_path / "cli_results"
    cli.main([
        "sca-sampling",
        "-model_type", "scavaetf",
        "-model_folder", runs["scavaetf"],
        "-model_name", "model_1.msgpack",
        "-util_folder", str(root / "utils"),
        "-data_folder", str(root),
        "-save_folder", str(save),
        "-max_strlen", "24", "-batch_size", "8", "-n_jobs", "1",
        "-n_samples", "4", "-n_scaffolds", "2",
        "-scaffold_source", "test_scaffolds",
        "-N", "1", "-H", "4", "-d_ff", "64", "-d_model", "32",
        "-latent_dim", "8", "-dropout", "0.0",
    ])
    assert (save / "sca_sampling" / "metric.csv").exists()
