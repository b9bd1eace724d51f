"""End-to-end slice: synthetic corpus -> preprocess -> train a tiny
vaetf 2 epochs -> checkpoint -> reload -> sample -> metrics. This is
the framework-level integration test the reference never had."""

import os
import types

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from gctplus_tpu.data.preprocess import preprocess

    root = tmp_path_factory.mktemp("ws")
    out = preprocess(str(root), n_jobs=1, n_synthetic=300, seed=3)
    return root, out


def test_preprocess_artifacts(workspace):
    root, out = workspace
    for rel in ("raw/train.csv", "prepared/train.csv", "prepared/train_sca.csv",
                "utils/SRC.json", "utils/TRG_sep.json",
                "utils/scaler_logP-tPSA-QED.json", "utils/toklen_list.csv"):
        assert (root / rel).exists(), rel
    trg = out["vocabs"]["TRG"]
    assert trg.itos[:4] == ["<unk>", "<pad>", "<sos>", "<eos>"]


def test_train_sample_eval_roundtrip(workspace, tmp_path):
    root, out = workspace
    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=2, batch_size=32,
        property_list=[], model_type="vaetf",
        model_folder=str(tmp_path / "run"), use_scaffold=False,
        randomize_prob=0.1, prepared_folder=str(root / "prepared"),
        util_folder=str(root / "utils"), debug=True,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=100, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=None, n_model_shards=1,
        compute_dtype="float32",
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False)

    from gctplus_tpu.tasks.train_task import train_task
    train_task(args)

    run = tmp_path / "run"
    assert (run / "model_2.msgpack").exists()
    assert (run / "train_1.csv").exists()
    assert (run / "valid_2.csv").exists()

    # loss must decrease epoch over epoch on this tiny corpus
    import pandas as pd
    h1 = pd.read_csv(run / "train_1.csv")
    h2 = pd.read_csv(run / "train_2.csv")
    assert h2["LOSS"].mean() < h1["LOSS"].mean()

    # reload checkpoint and sample
    sargs = types.SimpleNamespace(
        model_type="vaetf", model_folder=str(run),
        model_name="model_2.msgpack", util_folder=str(root / "utils"),
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.0,
        property_list=[], max_strlen=40, decode_algo="multinomial",
        top_k=None, seed=7, batch_size=16)
    from gctplus_tpu.tasks.common import build_sampler
    sampler = build_sampler(sargs)
    smiles, toklen = sampler.sample_smiles(16)
    assert len(smiles) == 16

    from gctplus_tpu.eval.metrics import fraction_valid
    v = fraction_valid(smiles)
    assert 0.0 <= v <= 1.0  # 2 epochs on 128 rows: no quality bar


def test_compact_checkpoint_cadence(workspace, tmp_path):
    """ckpt_full_every=3: intermediate epochs store params-only bf16
    blobs (~1/6 bytes), the final epoch a full resumable blob; both
    kinds serve the eval loader and the resume path."""
    root, out = workspace
    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=3, batch_size=32,
        property_list=[], model_type="vaetf",
        model_folder=str(tmp_path / "runc"), use_scaffold=False,
        randomize_prob=0.0, prepared_folder=str(root / "prepared"),
        util_folder=str(root / "utils"), debug=True,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=100, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=None, n_model_shards=1,
        compute_dtype="float32", ckpt_full_every=3,
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False, skip_valid=True)

    from gctplus_tpu.tasks.train_task import train_task
    train_task(args)

    run = tmp_path / "runc"
    from gctplus_tpu.train.loop import load_checkpoint
    b1 = load_checkpoint(str(run / "model_1.msgpack"))
    b3 = load_checkpoint(str(run / "model_3.msgpack"))
    assert "opt_state" not in b1          # compact epoch
    assert "opt_state" in b3              # full_every hit + final
    sz1 = os.path.getsize(run / "model_1.msgpack")
    sz3 = os.path.getsize(run / "model_3.msgpack")
    assert sz1 < sz3 / 3, (sz1, sz3)

    # resume path accepts a compact newest checkpoint (Adam restarts)
    (run / "model_3.msgpack").rename(run / "model_3_full.msgpack")
    args.start_epoch, args.num_epoch = 3, 3
    train_task(args)
    assert (run / "model_3.msgpack").exists()

    # eval loader upcasts compact bf16 leaves to the f32 template
    sargs = types.SimpleNamespace(
        model_type="vaetf", model_folder=str(run),
        model_name="model_1.msgpack", util_folder=str(root / "utils"),
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.0,
        property_list=[], max_strlen=40, decode_algo="multinomial",
        top_k=None, seed=7, batch_size=8)
    from gctplus_tpu.tasks.common import build_sampler
    smiles, _ = build_sampler(sargs).sample_smiles(8)
    assert len(smiles) == 8


def test_finetune_with_frozen_encoder(workspace, tmp_path):
    """Fine-tuning workflow (molGCT->GCT-Plus recipe,
    Model/build_model.py:17-39): -use_model_path transfers pretrained
    weights; -freeze_params zeroes updates for named modules. The
    frozen encoder must be bit-identical after training while the
    decoder moves."""
    import pandas as pd
    from flax import serialization

    root, out = workspace
    common = dict(
        seed=0, batch_size=32, property_list=[], model_type="vaetf",
        use_scaffold=False, randomize_prob=0.0,
        prepared_folder=str(root / "prepared"),
        util_folder=str(root / "utils"), debug=True,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=100, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=None, n_model_shards=1,
        compute_dtype="float32",
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.0,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False)

    from gctplus_tpu.tasks.train_task import train_task
    pre = tmp_path / "pretrain"
    train_task(types.SimpleNamespace(start_epoch=1, num_epoch=1,
                                     model_folder=str(pre), **common))
    pre_ckpt = str(pre / "model_1.msgpack")

    ft = tmp_path / "finetune"
    train_task(types.SimpleNamespace(
        start_epoch=1, num_epoch=1, model_folder=str(ft),
        use_model_path=pre_ckpt, freeze_params=["encoder"], **common))

    from gctplus_tpu.train.loop import load_checkpoint
    a = load_checkpoint(pre_ckpt)["params"]
    b = load_checkpoint(str(ft / "model_1.msgpack"))["params"]

    def _flat(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from _flat(v, f"{pre}{k}/")
            else:
                yield f"{pre}{k}", np.asarray(v)

    fa, fb = dict(_flat(a)), dict(_flat(b))
    enc = [k for k in fa if k.startswith("encoder/")]
    dec = [k for k in fa if k.startswith("decoder/")]
    assert enc and dec
    for k in enc:
        assert np.array_equal(fa[k], fb[k]), f"frozen leaf moved: {k}"
    assert any(not np.array_equal(fa[k], fb[k]) for k in dec)


def test_train_with_orbax_backend(workspace, tmp_path):
    """-ckpt_backend orbax: the epoch loop writes async orbax shards
    alongside the portable msgpack, and the shards restore bit-exact."""
    import numpy as np

    root, out = workspace
    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=1, batch_size=32,
        property_list=[], model_type="vaetf",
        model_folder=str(tmp_path / "run_orbax"), use_scaffold=False,
        randomize_prob=0.0, prepared_folder=str(root / "prepared"),
        util_folder=str(root / "utils"), debug=True,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=100, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=None, n_model_shards=1,
        compute_dtype="float32", ckpt_backend="orbax",
        N=1, H=4, d_ff=64, d_model=32, latent_dim=8, dropout=0.0,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False, skip_valid=True)

    from gctplus_tpu.tasks.train_task import train_task
    train_task(args)

    run = tmp_path / "run_orbax"
    assert (run / "model_1.msgpack").exists()
    assert (run / "orbax" / "1").is_dir()

    # orbax restore matches the msgpack params
    from flax import serialization
    from gctplus_tpu.train.loop import load_checkpoint
    from gctplus_tpu.train.orbax_io import OrbaxCheckpointer

    blob = load_checkpoint(str(run / "model_1.msgpack"))
    ck = OrbaxCheckpointer(str(run))
    assert ck.latest_step() == 1
    import jax as _jax
    restored = ck.restore(1)["params"]  # template-less host restore
    for a, b in zip(_jax.tree_util.tree_leaves(restored),
                    _jax.tree_util.tree_leaves(blob["params"])):
        assert np.allclose(np.asarray(a), np.asarray(b))
    ck.close()
