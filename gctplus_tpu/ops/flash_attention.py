"""Pallas fused attention kernel for TPU.

The reference's attention materializes the (bs, h, L, L) score tensor
in HBM four times per layer stack pass (Model/sublayers.py:29-41,
cuDNN-backed matmuls). GCT sequences are short (<= 80 tokens + prefix,
config_default.py:1), so the whole (L, L) score tile of one (batch,
head) pair fits comfortably in VMEM: the kernel fuses
QK^T -> mask -> stable softmax -> AV into a single VMEM-resident pass
per (batch, head) grid cell — the single-KV-block degenerate case of
flash attention, which is optimal at these shapes (no online-softmax
bookkeeping needed).

Compute: MXU matmuls in f32 accumulation; masking via lane select
(mask passed as int8: 1=attend, 0=masked, filled with -1e9 like the
reference's masked_fill).

Used on the deterministic paths (sampling prefill, eval). The training
path keeps the XLA implementation when attention-weight dropout is
active (sublayers.py:38-39) — fusing PRNG dropout into the kernel is a
planned follow-up.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]            # (Lq, dk)
    k = k_ref[0, 0]            # (Lk, dk)
    v = v_ref[0, 0]            # (Lk, dk)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = m_ref[0]               # (Lq or 1, Lk) int8
    s = jnp.where(m != 0, s, MASK_FILL)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, mask, interpret: bool = False):
    """q: (bs, h, Lq, dk), k/v: (bs, h, Lk, dk),
    mask: (bs, Lq, Lk) or (bs, 1, Lk) boolean (True = attend).
    Returns (bs, h, Lq, dk) in q.dtype."""
    bs, h, Lq, dk = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(dk)
    m = mask.astype(jnp.int8)
    mask_q = m.shape[1]  # Lq or 1

    grid = (bs, h)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bs, h, Lq, dk), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lq, dk), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, dk), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, dk), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mask_q, Lk), lambda b, hh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lq, dk), lambda b, hh: (b, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, m)
    return out
