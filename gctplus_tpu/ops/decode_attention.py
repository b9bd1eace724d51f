"""Fused Pallas kernels for the per-token decode step.

Why these exist (measured, scripts/probe_decode_cost.py + an xprof
trace parsed in EVIDENCE.md): the XLA decode step at flagship shape
(bs=512, cache 80, d_model 512, 8 heads) runs ~300 small ops per token
— multiply-reduce attention fusions reading (bs, h, T, dk=64) caches
whose minor dim pads 64 -> 128 lanes (bf16 tile is (16,128)), so every
cache touch moves 2x the bytes, plus per-op copy/slice overhead.

Fix (measured 3.89 -> 2.26 ms/step at the flagship shape, EVIDENCE.md):

- KV caches are stored PACKED and T-MAJOR: (T, bs, D=h*dk). The lane
  dim is the full 512-wide D (tile-exact), and the per-step row
  update at a traced position is a contiguous (bs, D) slab
  dynamic-update-slice done in XLA before the kernel call (T is the
  untiled major axis, so the slab write is cheap and aliases inside
  the sampling while_loop).
- `self_attention_step` / `cross_attention_step` are read-only fused
  kernels (mask -> scores -> softmax -> context), auto-blocked over
  the batch so the Pallas runtime double-buffers the HBM->VMEM cache
  streams across grid cells.
- All heads are computed at once inside the kernel: the q*k product
  runs at full 512-lane width and the per-head reductions use
  (.., D) @ (D, h) one-hot segment matmuls on the MXU. (Per-head
  64-lane slicing wastes half the VPU; Mosaic supports neither the
  (.., h, dk) shape cast nor batched 3-D dot_generals — both were
  tried and measured slower or failed to lower.)

Math parity with models/layers.py::scaled_dot_attention: scores/sqrt(dk),
-1e9 mask fill, f32 softmax/accumulation, weights cast to the compute
dtype before the PV product. Everything else of the decoder step
(projections, FFN, norms) stays in XLA where the MXU already serves
it well.

Reference hot loop being replaced at the system level:
Inference/sampling_tool.py:140-184 (full-decoder re-run per token).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e9


def _segment_matrices(D: int, heads: int, dtype):
    """(D, h) one-hot segment matrix and its transpose, used to do the
    per-head reductions as tiny MXU matmuls: scores = (prod @ seg),
    weight broadcast = (p @ seg.T). Constant-folded at compile time."""
    dk = D // heads
    g = jax.lax.broadcasted_iota(jnp.int32, (D, heads), 0) // dk
    h = jax.lax.broadcasted_iota(jnp.int32, (D, heads), 1)
    seg = (g == h).astype(dtype)
    return seg, jnp.transpose(seg, (1, 0))


def _heads_attend(q, k, v, valid3, heads: int, scale: float):
    """B-major: q (B, D) f32, k/v (B, T, D); valid3 (B, T, 1) bool.
    Returns (B, D) context in v.dtype.

    All heads at once: the elementwise q*k product runs at full
    512-lane width (a per-head 64-lane slice wastes half the VPU), and
    the per-head reductions are (.., D) @ (D, h) one-hot matmuls on
    the MXU. f32 accumulation throughout; softmax weights are cast to
    the compute dtype before the PV product — same semantics as the
    XLA path (models/layers.py::scaled_dot_attention)."""
    B, T, D = k.shape
    seg, segT = _segment_matrices(D, heads, k.dtype)
    prod = k * jnp.expand_dims(q.astype(k.dtype), 1)     # (B, T, D)
    s = jnp.dot(prod.reshape(B * T, D), seg,
                preferred_element_type=jnp.float32)
    s = s.reshape(B, T, heads) * scale                   # (B, T, h)
    s = jnp.where(valid3, s, MASK_FILL)
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=1, keepdims=True)            # softmax over T
    pf = jnp.dot(p.reshape(B * T, heads).astype(v.dtype), segT,
                 preferred_element_type=jnp.float32)
    pf = pf.reshape(B, T, D).astype(v.dtype)             # (B, T, D)
    ctx = jnp.sum(pf * v, axis=1, dtype=jnp.float32)     # (B, D)
    return ctx.astype(v.dtype)


def _self_read_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                      *, heads: int):
    """Read-only fused self-attention over the already-updated T-major
    cache block (T, B, D). Auto-blocked inputs give double-buffered
    HBM->VMEM pipelining across grid cells; the row update itself is a
    contiguous (bs, D) slab DUS done in XLA before the call."""
    pos = pos_ref[0, 0]
    T, B, D = k_ref.shape
    q = q_ref[0].astype(jnp.float32)                   # (B, D)
    t3 = jax.lax.broadcasted_iota(jnp.int32, (T, B, 1), 0)
    valid3 = t3 <= pos
    scale = 1.0 / math.sqrt(D // heads)
    ctx = _heads_attend_major(q, k_ref[:], v_ref[:], valid3, heads,
                              scale)
    o_ref[0] = ctx.astype(o_ref.dtype)


def _heads_attend_major(q, k, v, valid3, heads: int, scale: float):
    """T-major variant: q (B, D) f32, k/v (T, B, D),
    valid3 (T, B, 1) bool. Returns (B, D) context in v.dtype."""
    T, B, D = k.shape
    seg, segT = _segment_matrices(D, heads, k.dtype)
    prod = k * jnp.expand_dims(q.astype(k.dtype), 0)     # (T, B, D)
    s = jnp.dot(prod.reshape(T * B, D), seg,
                preferred_element_type=jnp.float32)
    s = s.reshape(T, B, heads) * scale                   # (T, B, h)
    s = jnp.where(valid3, s, MASK_FILL)
    s = s - jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=0, keepdims=True)            # softmax over T
    pf = jnp.dot(p.reshape(T * B, heads).astype(v.dtype), segT,
                 preferred_element_type=jnp.float32)
    pf = pf.reshape(T, B, D).astype(v.dtype)             # (T, B, D)
    ctx = jnp.sum(pf * v, axis=0, dtype=jnp.float32)     # (B, D)
    return ctx.astype(v.dtype)


def _safe_block(bs: int, want: int) -> int:
    """Largest divisor of bs that is <= want — direct calls with any
    batch size get a working grid instead of an assert (block_b is a
    static arg, so this runs at trace time)."""
    b = max(1, min(want, bs))
    while bs % b:
        b -= 1
    return b


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_b", "interpret"))
def self_attention_step(pos, q, k_cache, v_cache, heads: int,
                        block_b: int = 32, interpret: bool = False):
    """Fused self-attention decode step over T-major packed caches.

    pos: () int32 current position. q: (bs, 1, D).
    k_cache/v_cache: (T, bs, D), row `pos` ALREADY holding the current
    token's K/V (the caller's dynamic_update_slice — a contiguous
    (bs, D) slab on this layout). Returns ctx (bs, 1, D)."""
    bs, _, D = q.shape
    T = k_cache.shape[0]
    block_b = _safe_block(bs, block_b)
    grid = (bs // block_b,)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    qT = jnp.transpose(q, (1, 0, 2))                   # (1, bs, D)

    row = pl.BlockSpec((1, block_b, D), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((T, block_b, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_self_read_kernel, heads=heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # pos
            row,                                        # q
            cache, cache,                               # k_cache, v_cache
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((1, bs, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, qT, k_cache, v_cache)
    return jnp.transpose(out, (1, 0, 2))


def _cross_step_kernel(q_ref, k_ref, v_ref, len_ref, o_ref,
                       *, heads: int):
    B, T, D = k_ref.shape
    q = q_ref[:, 0, :].astype(jnp.float32)
    t3 = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
    valid3 = t3 < jnp.expand_dims(len_ref[:], -1)       # (B, T, 1)
    scale = 1.0 / math.sqrt(D // heads)
    ctx = _heads_attend(q, k_ref[:], v_ref[:], valid3, heads, scale)
    o_ref[:, 0, :] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_b", "interpret"))
def cross_attention_step(q, k_mem, v_mem, lengths, heads: int,
                         block_b: int = 64, interpret: bool = False):
    """Fused cross-attention for one decode step.

    q: (bs, 1, D); k_mem/v_mem: (bs, Tm, D) packed; lengths: (bs,)
    int32 — row r attends to memory positions < lengths[r] (the
    reference's toklen-derived src_mask). Returns (bs, 1, D)."""
    bs, _, D = q.shape
    Tm = k_mem.shape[1]
    block_b = _safe_block(bs, block_b)
    grid = (bs // block_b,)
    len2d = lengths.astype(jnp.int32).reshape(bs, 1)

    return pl.pallas_call(
        functools.partial(_cross_step_kernel, heads=heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Tm, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Tm, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k_mem, v_mem, len2d)
