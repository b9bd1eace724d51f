"""Model registry: variant name -> configured module.

Mirrors reference Model/build_model.py:8-14 where all four trained
variants share two classes:

  vaetf     -> Vaetf,  nconds=0
  pvaetf    -> Cvaetf, nconds=3, use_cond2lat=True
  scavaetf  -> Cvaetf, nconds=0 (scaffold conditioning is data-side)
  pscavaetf -> Cvaetf, nconds=3, use_cond2lat=True
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gctplus_tpu.models.cvaetf import Cvaetf, ModelConfig, Vaetf

MODEL_REGISTRY = {
    "vaetf": (Vaetf, dict(nconds=0, use_cond2lat=False)),
    "pvaetf": (Cvaetf, dict(nconds=3, use_cond2lat=True)),
    "scavaetf": (Cvaetf, dict(nconds=0, use_cond2lat=False)),
    "pscavaetf": (Cvaetf, dict(nconds=3, use_cond2lat=True)),
}


def build_model(model_type: str, src_vocab: int, trg_vocab: int,
                **overrides) -> Tuple[object, ModelConfig]:
    cls, variant = MODEL_REGISTRY[model_type]
    kw = dict(variant)
    kw.update(overrides)
    cfg = ModelConfig(src_vocab=src_vocab, trg_vocab=trg_vocab, **kw)
    return cls(cfg), cfg


def transfer_params(trained: dict, target: dict, log=None) -> dict:
    """Copy overlapping parameters from a trained tree into a target
    tree (reference transfer_params, Model/build_model.py:17-25);
    mismatched/missing leaves keep the target's values."""
    import numpy as np

    def _merge(t, s):
        if isinstance(t, dict):
            return {k: _merge(v, s.get(k)) if isinstance(s, dict) else v
                    for k, v in t.items()}
        if s is None or getattr(s, "shape", None) != getattr(t, "shape", None):
            if log:
                log.warning("transfer_params: keeping target leaf (shape "
                            f"{getattr(t, 'shape', '?')})")
            return t
        return jnp.asarray(np.asarray(s))

    return _merge(target, trained)


def freeze_mask(params: dict, train_names=None, freeze_names=None) -> dict:
    """Boolean mask tree for optax.masked: True = trainable (reference
    freeze_params, Model/build_model.py:28-39, keyed on the top-level
    module name: 'encoder', 'decoder', 'sampler', 'out', ...)."""
    def top_trainable(top: str) -> bool:
        if train_names is not None:
            return top in train_names
        if freeze_names is not None:
            return top not in freeze_names
        return True

    return {top: jax.tree_util.tree_map(lambda _: top_trainable(top), sub)
            for top, sub in params.items()}


def init_params(model, cfg: ModelConfig, rng: jax.Array = None,
                trg_len: int = 8, src_len: int = 8):
    """Initialize parameters with tiny dummy shapes (shapes don't matter:
    all parameters are shape-static in seq-len)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    src = jnp.zeros((1, src_len), jnp.int32)
    trg = jnp.zeros((1, trg_len), jnp.int32)
    src_mask = jnp.ones((1, 1, src_len + cfg.nconds), bool)
    trg_mask = jnp.ones((1, trg_len, trg_len), bool)
    conds = jnp.zeros((1, cfg.nconds), jnp.float32) if cfg.nconds > 0 else None

    # eager op-by-op dispatch is very slow in this environment; compile
    # the whole init into one XLA program
    @jax.jit
    def _init(rng):
        rngs = {"params": rng, "sample": rng, "dropout": rng}
        return model.init(
            rngs, src, trg, src_mask, trg_mask, econds=conds, dconds=conds,
            deterministic=True)["params"]

    return _init(rng)
