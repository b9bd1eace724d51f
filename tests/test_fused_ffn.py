"""Fused-FFN kernel (ops/fused_ffn.py) correctness in interpret mode.

Deterministic forward/backward must match the XLA FeedForward path
(reference Model/sublayers.py:77-89) at f32 roundoff; the dropout
path is validated against a hand-rolled reference that applies the
SAME per-tile mask (the in-kernel TPU PRNG has no CPU lowering, so
interpret-mode tests inject a deterministic jnp-only mask through the
_MASK_IMPL hook; the real-PRNG path is exercised on-chip by
scripts/probe_ffn_ab.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gctplus_tpu.ops.fused_ffn as ffn_mod
from gctplus_tpu.ops.fused_ffn import fused_ffn

D, F, T = 256, 512, 64


def _params(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 50, D)), jnp.float32)  # 100 % 64 != 0
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _xla_ffn(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2


def test_deterministic_forward_matches_xla():
    x, w1, b1, w2, b2 = _params()
    y = fused_ffn(x, w1, b1, w2, b2, jnp.zeros((1,), jnp.int32),
                  rate=0.1, deterministic=True, tile_rows=T, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_ffn(x, w1, b1, w2, b2)),
                               rtol=1e-5, atol=2e-5)


def test_deterministic_grads_match_xla():
    x, w1, b1, w2, b2 = _params(1)
    ct = jnp.asarray(np.random.default_rng(9).normal(size=x.shape), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    gf = jax.grad(lambda a: (fused_ffn(*a, seed, rate=0.0, deterministic=True,
                                       tile_rows=T, interpret=True) * ct).sum())(
        (x, w1, b1, w2, b2))
    gr = jax.grad(lambda a: (_xla_ffn(*a) * ct).sum())((x, w1, b1, w2, b2))
    for name, a, b in zip("x w1 b1 w2 b2".split(), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=f"grad {name} diverges from the XLA path")


def _fake_mask(seed_ref, tile_i, shape, keep):
    """Deterministic stand-in with the _MASK_IMPL contract."""
    pos = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
           * np.uint32(shape[1])
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    h = (pos * np.uint32(2654435761)
         + seed_ref[0].astype(jnp.uint32) * np.uint32(40503)
         + jnp.uint32(tile_i) * np.uint32(9176))
    return h < np.uint32(int(keep * 2 ** 32))


def test_dropout_forward_and_grads_match_masked_reference(monkeypatch):
    monkeypatch.setattr(ffn_mod, "_MASK_IMPL", _fake_mask)
    x, w1, b1, w2, b2 = _params(2)
    seed = jnp.asarray([7], jnp.int32)
    rate, keep = 0.5, 0.5

    def ref(x, w1, b1, w2, b2):
        x2 = x.reshape(-1, D)
        pad = (-x2.shape[0]) % T
        x2p = jnp.pad(x2, ((0, pad), (0, 0)))
        h = jax.nn.gelu(x2p @ w1 + b1, approximate=False)
        tiles = [jnp.where(_fake_mask(seed, i, (T, F), keep),
                           h[i * T:(i + 1) * T] / keep, 0.0)
                 for i in range(x2p.shape[0] // T)]
        y = jnp.concatenate(tiles) @ w2 + b2
        return y[:x2.shape[0]].reshape(x.shape)

    fused = functools.partial(fused_ffn, rate=rate, deterministic=False,
                              tile_rows=T, tile_rows_bwd=T, interpret=True)
    y = fused(x, w1, b1, w2, b2, seed)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, w1, b1, w2, b2)),
                               rtol=1e-5, atol=2e-5)
    # mask must drop ~rate of hidden units (sanity on the threshold math)
    ct = jnp.asarray(np.random.default_rng(3).normal(size=x.shape), jnp.float32)
    gf = jax.grad(lambda a: (fused(*a, seed) * ct).sum())((x, w1, b1, w2, b2))
    gr = jax.grad(lambda a: (ref(*a) * ct).sum())((x, w1, b1, w2, b2))
    for name, a, b in zip("x w1 b1 w2 b2".split(), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=f"dropout grad {name} diverges (mask regeneration broken?)")


def test_feedforward_module_fused_path_matches_xla(monkeypatch):
    """Model-level integration: FeedForward(use_fused=True) pulls the
    SAME Dense params and reproduces the XLA path deterministically."""
    from flax import linen as nn

    from gctplus_tpu.models.layers import FeedForward

    monkeypatch.setattr(ffn_mod, "fused_ffn_applicable",
                        lambda *a, **k: True)
    monkeypatch.setattr(ffn_mod, "fused_ffn",
                        functools.partial(fused_ffn, tile_rows=T,
                                          tile_rows_bwd=T, interpret=True))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 20, D)),
                    jnp.float32)
    ref_mod = FeedForward(D, F, dropout=0.1)
    fused_mod = FeedForward(D, F, dropout=0.1, use_fused=True)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    y_ref = ref_mod.apply(v, x, True)
    y_fused = fused_mod.apply(v, x, True)  # same param tree by design
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=2e-5)

    # train mode: runs the custom-vjp path end-to-end through the
    # module's make_rng seed derivation (mask injected via _MASK_IMPL)
    monkeypatch.setattr(ffn_mod, "_MASK_IMPL", _fake_mask)
    g = jax.grad(lambda p: (fused_mod.apply(
        {"params": p}, x, False,
        rngs={"dropout": jax.random.PRNGKey(1)}) ** 2).sum())(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in flat)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)
