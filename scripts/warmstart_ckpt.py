"""Warm-start one variant's training checkpoint from another's trunk.

The reference's own recipe does exactly this: `transfer_params`
(/root/reference/Model/build_model.py:17-25) copies every overlapping
tensor from a trained model into a freshly-built conditioned variant
before training (Bashscript/train/train_pscavaetf.sh passes the
trained scavaetf as the starting point).  Our analog: build the target
variant's f32 init tree, overlay all shape-matching leaves from the
source checkpoint (`models/registry.py::transfer_params`), and write a
params-only msgpack the training resume path picks up (Adam restarts
fresh; Noam LR continues from the epoch-derived step).

Conditioning heads that don't exist in the source (embed_cond2enc,
embed_cond2lat, prop_fc) keep their fresh init.

Usage: python scripts/warmstart_ckpt.py SRC.msgpack DST.msgpack \
           SRC_VARIANT DST_VARIANT UTIL_FOLDER [EPOCH_STEPS]

Writes DST.msgpack with step = source step (LR schedule continuity).
Runs entirely on CPU — never touches the TPU (a trainer may own it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    src_path, dst_path, src_variant, dst_variant, util_folder = sys.argv[1:6]

    import numpy as np
    from flax import serialization

    from gctplus_tpu.models.registry import (build_model, init_params,
                                             transfer_params)
    from gctplus_tpu.tasks.common import load_vocabs

    src_vocab, trg_vocab = load_vocabs(util_folder, dst_variant)
    nconds = 3 if dst_variant in ("pvaetf", "pscavaetf") else 0
    model, cfg = build_model(
        dst_variant, len(src_vocab), len(trg_vocab), N=6, d_model=512,
        d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
        use_cond2dec=False, use_cond2lat=(nconds > 0))
    template = init_params(model, cfg, jax.random.PRNGKey(0))

    with open(src_path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    src_sd = blob["params"]

    n_total = len(jax.tree_util.tree_leaves(template))

    copied = []

    def _count(path, t, s):
        if (s is not None
                and getattr(s, "shape", None) == getattr(t, "shape", None)):
            copied.append(path)

    def _walk(path, t, s):
        if isinstance(t, dict):
            for k, v in t.items():
                _walk(path + (k,), v, s.get(k) if isinstance(s, dict) else None)
        else:
            _count(path, t, s)

    template_sd = serialization.to_state_dict(template)
    _walk((), template_sd, src_sd)
    merged = transfer_params(src_sd, template_sd)
    merged = jax.tree_util.tree_map(
        lambda t, m: np.asarray(m, np.float32), template_sd, merged)

    out = {
        "params": merged,
        "step": int(blob.get("step", 0)),
        "model_params": dict(blob.get("model_params", {}),
                             warmstart_from=os.path.basename(src_path),
                             model_type=dst_variant),
    }
    tmp = dst_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    os.replace(tmp, dst_path)
    print(f"warmstart {src_variant}->{dst_variant}: {len(copied)}/{n_total} "
          f"leaves transferred, step={out['step']}, wrote {dst_path} "
          f"({os.path.getsize(dst_path)/1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
