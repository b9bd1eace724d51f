"""fixed_decode_shapes protocol mode + compact checkpoint round-trip.

The scaffold protocols (sca/psca, reference Inference/sca_sampling.py:
137-260) decode 100 different-length scaffold prefixes; in protocol
mode the prefix buckets to 16 and lat_len is a function of the bucket
alone, so the whole run shares a handful of compiled programs.
Compact checkpoints (scripts/export_ckpt.py) drop the Adam moments
and store bf16 leaves; both load paths upcast to the f32 template.
"""

import os
from collections import Counter

import numpy as np
import pytest

import jax

from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.models import Cvaetf, ModelConfig
from gctplus_tpu.models.registry import init_params
from gctplus_tpu.sample.samplers import ScaVaetfSampler


def _tiny():
    v = Vocab.build(
        Counter({"C": 9, "c": 8, "O": 7, "N": 6, "1": 5, "2": 4,
                 "(": 3, ")": 2, "=": 1}),
        specials=("<unk>", "<pad>", "<sos>", "<eos>", "<sep>"))
    cfg = ModelConfig(src_vocab=len(v), trg_vocab=len(v), N=1, d_model=32,
                      d_ff=64, heads=2, latent_dim=8, dropout=0.0, nconds=0)
    model = Cvaetf(cfg)
    return v, cfg, model, init_params(model, cfg)


def test_fixed_shapes_share_program_across_scaffolds():
    v, cfg, model, params = _tiny()
    toklen_data = np.array([0] * 10 + [1, 2, 3, 2, 1], np.float64)
    s = ScaVaetfSampler(model, cfg, params, v, v, toklen_data=toklen_data,
                        max_strlen=16, batch_size=8, seed=0,
                        fixed_decode_shapes=True)
    # P=10 and P=15 both round to bucket 16 -> one compiled program
    for sca in ("C1CCCCC1", "c1ccccc1CCOCC"):
        out, _ = s.sample_smiles(8, sca)
        assert len(out) == 8
    keys = list(s.engine._jitted.keys())
    assert len(keys) == 1, keys
    # lat_len depends only on the bucket: max_strlen + P_bucket - 1,
    # rounded up to the 16-wide lat bucket
    assert keys[0][1] == 16 and keys[0][2] == 32


def test_default_shapes_unchanged():
    v, cfg, model, params = _tiny()
    toklen_data = np.array([0] * 10 + [1, 2, 3, 2, 1], np.float64)
    s = ScaVaetfSampler(model, cfg, params, v, v, toklen_data=toklen_data,
                        max_strlen=16, batch_size=8, seed=0)
    out, _ = s.sample_smiles(8, "C1CCCCC1")
    assert len(out) == 8
    (key,) = s.engine._jitted.keys()
    assert key[1] == 16  # P=10 rounds to 8-multiple 16 here too


def test_compact_checkpoint_roundtrip(tmp_path):
    import ml_dtypes
    from flax import serialization

    from gctplus_tpu.train.loop import load_checkpoint, save_checkpoint
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import TrainState

    v, cfg, model, params = _tiny()
    tx, _ = make_optimizer(32, 10)
    state = TrainState.create(params, tx)
    full = tmp_path / "model_1.msgpack"
    save_checkpoint(str(full), state, {"d_model": 32})

    # compact export: params-only, bf16 leaves
    blob = load_checkpoint(str(full))
    assert "opt_state" in blob
    compact = {
        "params": jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(ml_dtypes.bfloat16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x),
            blob["params"]),
        "step": blob["step"],
        "model_params": blob["model_params"],
    }
    cpath = tmp_path / "model_compact.msgpack"
    with open(cpath, "wb") as f:
        f.write(serialization.msgpack_serialize(compact))
    assert cpath.stat().st_size < full.stat().st_size / 2

    # eval load path upcasts to the f32 template
    from gctplus_tpu.tasks.common import load_params_any
    restored = load_params_any(model, cfg, str(cpath), "scavaetf")
    flat_r = jax.tree_util.tree_leaves(restored)
    flat_p = jax.tree_util.tree_leaves(params)
    assert all(np.asarray(r).dtype == np.asarray(p).dtype
               for r, p in zip(flat_r, flat_p))
    # bf16 round-trip: exact to bf16 resolution
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(p, np.float32),
                                   rtol=8e-3, atol=1e-6)
