"""Pallas fused attention vs the reference jnp implementation
(interpret mode on CPU; the real kernel is exercised by bench.py on
the TPU chip)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gctplus_tpu.ops.flash_attention import fused_attention


def _ref_attention(q, k, v, mask):
    d_k = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_k)
    s = jnp.where(mask[:, None, :, :], s, -1e9)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("mask_kind", ["padding", "causal"])
def test_fused_attention_matches_reference(mask_kind):
    rng = np.random.default_rng(0)
    bs, h, Lq, Lk, dk = 2, 4, 16, 16, 8
    q = jnp.asarray(rng.normal(size=(bs, h, Lq, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bs, h, Lk, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bs, h, Lk, dk)), jnp.float32)
    if mask_kind == "padding":
        lens = np.array([10, 16])
        mask = jnp.asarray(np.arange(Lk)[None, None, :] < lens[:, None, None])
    else:
        mask = jnp.asarray(np.tril(np.ones((Lq, Lk), bool))[None].repeat(bs, 0))

    ref = _ref_attention(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
