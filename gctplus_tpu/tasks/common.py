"""Shared task plumbing: artifact loading + sampler construction
(the analog of inference.py:108-147 + Model/build_model.py:90-116)."""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import pandas as pd

from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.data.scaler import RobustScaler
from gctplus_tpu.models.registry import build_model, init_params
from gctplus_tpu.sample.samplers import SAMPLER_REGISTRY, BaseSampler

_NEEDS_SEP = {"scavaetf", "pscavaetf"}
_NEEDS_SCALER = {"pvaetf", "pscavaetf"}


def load_vocabs(util_folder: str, model_type: str) -> Tuple[Vocab, Vocab]:
    suffix = "_sep" if model_type in _NEEDS_SEP else ""
    src = Vocab.load(os.path.join(util_folder, f"SRC{suffix}.json"))
    trg = Vocab.load(os.path.join(util_folder, f"TRG{suffix}.json"))
    return src, trg


def load_scaler(util_folder: str, props=("logP", "tPSA", "QED")
                ) -> RobustScaler:
    return RobustScaler.load(
        os.path.join(util_folder, f"scaler_{'-'.join(props)}.json"))


def load_toklen(util_folder: str) -> np.ndarray:
    df = pd.read_csv(os.path.join(util_folder, "toklen_list.csv"))
    col = "toklen" if "toklen" in df.columns else df.columns[-1]
    return df[col].to_numpy()


def load_sa_fragments(util_folder: str) -> None:
    """Activate the corpus-derived SA fragment and NP contribution
    tables when present."""
    # prefer the v2 multi-radius table (closer to the published
    # fpscores keying — see chem/sa_fragments.py::build_fragment_scores_v2)
    path = os.path.join(util_folder, "sa_fragments_v2.json")
    if not os.path.exists(path):
        path = os.path.join(util_folder, "sa_fragments.json")
    if os.path.exists(path):
        from gctplus_tpu.chem.descriptors import set_sa_fragment_scores
        from gctplus_tpu.chem.sa_fragments import load_fragment_scores
        set_sa_fragment_scores(load_fragment_scores(path))
    np_path = os.path.join(util_folder, "np_contributions.json")
    if os.path.exists(np_path):
        from gctplus_tpu.chem.descriptors import set_np_contributions
        from gctplus_tpu.chem.np_score import load_np_contributions
        set_np_contributions(load_np_contributions(np_path))


def load_params_any(model, cfg, model_path: str, model_type: str):
    """Load .msgpack (ours) or .pt (reference torch) checkpoints."""
    if model_path.endswith(".pt"):
        from gctplus_tpu.convert import load_torch_checkpoint
        params, _ = load_torch_checkpoint(model_path, model_type)
        return params
    from gctplus_tpu.train.loop import load_checkpoint
    from flax import serialization
    import jax
    import numpy as _np
    blob = load_checkpoint(model_path)
    template = init_params(model, cfg)
    restored = serialization.from_state_dict(template, blob["params"])
    # compact exports (scripts/export_ckpt.py) store bf16 leaves; the
    # runtime scheme is f32 params + dtype-cast compute, so upcast to
    # the template dtype on load
    return jax.tree_util.tree_map(
        lambda t, s: _np.asarray(s, t.dtype), template, restored)


def build_sampler(args, log=None) -> BaseSampler:
    """args needs: model_type, model_folder, model_name, util_folder,
    plus model_opts fields; mirrors get_sampler (build_model.py:90-116)."""
    src_vocab, trg_vocab = load_vocabs(args.util_folder, args.model_type)
    toklen = load_toklen(args.util_folder)
    load_sa_fragments(args.util_folder)
    scaler = None
    if args.model_type in _NEEDS_SCALER:
        scaler = load_scaler(args.util_folder,
                             tuple(getattr(args, "property_list", None)
                                   or ("logP", "tPSA", "QED")))

    import jax.numpy as jnp
    dtype = (jnp.bfloat16
             if getattr(args, "compute_dtype", "float32") == "bfloat16"
             else jnp.float32)
    model, cfg = build_model(
        args.model_type, len(src_vocab), len(trg_vocab),
        N=args.N, d_model=args.d_model, d_ff=args.d_ff, heads=args.H,
        latent_dim=args.latent_dim, dropout=args.dropout, dtype=dtype,
        # multi-token Pallas attention ties XLA on-chip at GCT shapes
        # (EVIDENCE.md round-2 A/B: 0.99x) — wired but non-default
        use_pallas_attention=bool(getattr(args, "use_pallas_attention",
                                          False)))
    model_path = os.path.join(args.model_folder, args.model_name)
    if os.path.exists(model_path):
        params = load_params_any(model, cfg, model_path, args.model_type)
        if log:
            log.info(f"loaded checkpoint {model_path}")
    else:
        params = init_params(model, cfg)
        if log:
            log.warning(f"checkpoint {model_path} not found: random init")

    cls = SAMPLER_REGISTRY[args.model_type]
    return cls(model, cfg, params, src_vocab, trg_vocab,
               toklen_data=toklen, scaler=scaler,
               max_strlen=getattr(args, "max_strlen", 80),
               decode_algo=getattr(args, "decode_algo", "multinomial"),
               top_k=getattr(args, "top_k", None),
               seed=getattr(args, "seed", 0),
               batch_size=getattr(args, "batch_size", 512),
               fixed_decode_shapes=getattr(args, "fixed_decode_shapes",
                                           False))
