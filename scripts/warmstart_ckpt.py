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

Beyond the reference recipe, cross-VOCAB transfer is supported
(e.g. scavaetf -> vaetf: the `<sep>` vocabs order tokens differently
and carry one extra special):

- the three vocab-sized leaf families (encoder/decoder embedding rows,
  `out` kernel columns + bias entries) are remapped BY TOKEN STRING —
  each destination id takes the source row of the same token; tokens
  absent from the source vocab keep their fresh init;
- the latent heads are aliased across the two layouts (Vaetf keeps
  them in a top-level `sampler` module, Cvaetf folds them into
  `encoder` — models/cvaetf.py:578-594 vs :597+), so fc_mu/fc_log_var
  always transfer.

Conditioning heads that don't exist in the source (embed_cond2enc,
embed_cond2lat, prop_fc) keep their fresh init.

Usage: python scripts/warmstart_ckpt.py SRC.msgpack DST.msgpack \
           SRC_VARIANT DST_VARIANT UTIL_FOLDER

Writes DST.msgpack with step = source step (LR schedule continuity).
Runs entirely on CPU — never touches the TPU (a trainer may own it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

# (path in the destination template) -> (axis that is vocab-sized,
# which vocab indexes it).  Everything else transfers by shape match.
_VOCAB_LEAVES = {
    ("encoder", "embed_sentence", "embedding"): (0, "src"),
    ("decoder", "embed", "embedding"): (0, "trg"),
    ("out", "kernel"): (1, "trg"),
    ("out", "bias"): (0, "trg"),
}

# Vaetf stores the latent heads under `sampler`, Cvaetf under `encoder`
_LATENT_ALIASES = [
    (("sampler",), ("encoder",)),
    (("encoder",), ("sampler",)),
]


def _flatten(d, pre=()):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, pre + (k,)))
        else:
            out[pre + (k,)] = v
    return out


def _remap_rows(np, tmpl_leaf, src_leaf, axis, dst_vocab, src_vocab):
    """Destination row i <- source row of the same token string;
    tokens missing from the source vocab keep the template init."""
    out = np.array(tmpl_leaf, np.float32, copy=True)
    src = np.asarray(src_leaf, np.float32)
    n_hit = 0
    for i, tok in enumerate(dst_vocab.itos):
        j = src_vocab.stoi.get(tok)
        if j is None:
            continue
        if axis == 0:
            out[i] = src[j]
        else:
            out[..., i] = src[..., j]
        n_hit += 1
    return out, n_hit


def main():
    src_path, dst_path, src_variant, dst_variant, util_folder = sys.argv[1:6]

    import numpy as np
    from flax import serialization

    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.tasks.common import load_vocabs

    dst_vocabs = dict(zip(("src", "trg"), load_vocabs(util_folder,
                                                      dst_variant)))
    src_vocabs = dict(zip(("src", "trg"), load_vocabs(util_folder,
                                                      src_variant)))
    same_vocab = all(src_vocabs[k].itos == dst_vocabs[k].itos
                     for k in ("src", "trg"))

    with open(src_path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())

    # architecture comes from the trunk's own embedded hyperparams
    # (T6 checkpoint layout), flagship defaults when absent
    mp = blob.get("model_params") or {}
    dim = lambda k, d: type(d)(mp[k]) if k in mp else d

    nconds = 3 if dst_variant in ("pvaetf", "pscavaetf") else 0
    model, cfg = build_model(
        dst_variant, len(dst_vocabs["src"]), len(dst_vocabs["trg"]),
        N=dim("N", 6), d_model=dim("d_model", 512), d_ff=dim("d_ff", 2048),
        heads=dim("H", 8), latent_dim=dim("latent_dim", 128),
        dropout=dim("dropout", 0.1),
        use_cond2dec=False, use_cond2lat=(nconds > 0))
    template = init_params(model, cfg, jax.random.PRNGKey(0))

    flat_src = _flatten(blob["params"])
    flat_tmpl = _flatten(serialization.to_state_dict(template))

    # alias the latent heads into the destination layout
    for dst_top, src_top in _LATENT_ALIASES:
        for path in list(flat_tmpl):
            if (path[:1] == dst_top and path[1] in ("fc_mu", "fc_log_var")
                    and path not in flat_src):
                alt = src_top + path[1:]
                if alt in flat_src:
                    flat_src[path] = flat_src[alt]

    copied, remapped, fresh = [], {}, []
    merged_flat = {}
    for path, tmpl_leaf in flat_tmpl.items():
        src_leaf = flat_src.get(path)
        if (not same_vocab and path in _VOCAB_LEAVES
                and src_leaf is not None):
            axis, which = _VOCAB_LEAVES[path]
            leaf, n_hit = _remap_rows(np, tmpl_leaf, src_leaf, axis,
                                      dst_vocabs[which], src_vocabs[which])
            merged_flat[path] = leaf
            remapped["/".join(path)] = (n_hit, len(dst_vocabs[which]))
        elif (src_leaf is not None and getattr(src_leaf, "shape", None)
                == getattr(tmpl_leaf, "shape", None)):
            merged_flat[path] = np.asarray(src_leaf, np.float32)
            copied.append(path)
        else:
            merged_flat[path] = np.asarray(tmpl_leaf, np.float32)
            fresh.append("/".join(path))

    def _unflatten(d, pre=()):
        if not isinstance(d, dict):
            return merged_flat[pre]
        return {k: _unflatten(v, pre + (k,)) for k, v in d.items()}

    merged = _unflatten(serialization.to_state_dict(template))

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
    print(f"warmstart {src_variant}->{dst_variant}: "
          f"{len(copied)}/{len(flat_tmpl)} leaves transferred, "
          f"vocab-remapped {remapped or 'none'}, "
          f"fresh {fresh or 'none'}, step={out['step']}, "
          f"wrote {dst_path} ({os.path.getsize(dst_path)/1e6:.0f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
