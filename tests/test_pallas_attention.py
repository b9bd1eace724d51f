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


# ---------------------------------------------------------------------------
# Streaming decode kernels (ops/decode_attention.py): multi-chunk
# online-softmax vs a per-head numpy oracle. Shapes are chosen so the
# scalar-prefetch clamp actually engages (several T chunks, positions/
# lengths mid-cache).
# ---------------------------------------------------------------------------

def _oracle_attend(q_vec, k_rows, v_rows, valid, dk):
    import math as _math

    s = k_rows @ q_vec / _math.sqrt(dk)
    s[~valid] = -1e9
    p = np.exp(s - s.max())
    p /= p.sum()
    return p @ v_rows


@pytest.mark.parametrize("pos", [0, 7, 11, 12, 23])
def test_self_stream_kernel_matches_oracle(pos):
    from gctplus_tpu.ops.decode_attention import self_attention_step

    heads, D, bs, T = 4, 128, 16, 24  # blk_t=12 -> 2 chunks
    dk = D // heads
    r = np.random.default_rng(3)
    q = r.normal(size=(bs, 1, D)).astype(np.float32)
    kc = r.normal(size=(T, bs, D)).astype(np.float32)
    vc = r.normal(size=(T, bs, D)).astype(np.float32)
    got = np.asarray(self_attention_step(
        jnp.int32(pos), jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        heads=heads, block_b=8, interpret=True))
    valid = np.arange(T) <= pos
    for b in range(bs):
        for h in range(heads):
            sl = slice(h * dk, (h + 1) * dk)
            ref = _oracle_attend(q[b, 0, sl], kc[:, b, sl], vc[:, b, sl],
                                 valid.copy(), dk)
            np.testing.assert_allclose(got[b, 0, sl], ref, atol=2e-5)


def test_cross_stream_kernel_matches_oracle():
    from gctplus_tpu.ops.decode_attention import cross_attention_step

    heads, D, bs, Tm = 4, 128, 16, 24  # blk_t=8 -> 3 chunks
    dk = D // heads
    r = np.random.default_rng(4)
    q = r.normal(size=(bs, 1, D)).astype(np.float32)
    km = r.normal(size=(bs, Tm, D)).astype(np.float32)
    vm = r.normal(size=(bs, Tm, D)).astype(np.float32)
    lens = r.integers(1, Tm + 1, (bs,)).astype(np.int32)
    got = np.asarray(cross_attention_step(
        jnp.asarray(q), jnp.asarray(km), jnp.asarray(vm),
        jnp.asarray(lens), heads=heads, block_b=8, interpret=True))
    for b in range(bs):
        valid = np.arange(Tm) < lens[b]
        for h in range(heads):
            sl = slice(h * dk, (h + 1) * dk)
            ref = _oracle_attend(q[b, 0, sl], km[b, :, sl], vm[b, :, sl],
                                 valid.copy(), dk)
            np.testing.assert_allclose(got[b, 0, sl], ref, atol=2e-5)
