"""Fused Pallas kernels for the per-token decode step.

Why these exist (measured, scripts/probe_decode_cost.py + an xprof
trace parsed in EVIDENCE.md): the XLA decode step at flagship shape
(bs=512, cache 80, d_model 512, 8 heads) runs ~300 small ops per token
— multiply-reduce attention fusions reading (bs, h, T, dk=64) caches
whose minor dim pads 64 -> 128 lanes (bf16 tile is (16,128)), so every
cache touch moves 2x the bytes, plus per-op copy/slice overhead.

Design (round 2, measured 3.89 -> 2.26 ms/step at the flagship shape):

- KV caches are stored PACKED and T-MAJOR: (T, bs, D=h*dk). The lane
  dim is the full 512-wide D (tile-exact), and the per-step row
  update at a traced position is a contiguous (bs, D) slab
  dynamic-update-slice done in XLA before the kernel call.
- All heads are computed at once inside the kernel: the q*k product
  runs at full 512-lane width and the per-head reductions use
  (.., D) @ (D, h) one-hot segment matmuls on the MXU. (Per-head
  64-lane slicing wastes half the VPU; Mosaic supports neither the
  (.., h, dk) shape cast nor batched 3-D dot_generals — both were
  tried and measured slower or failed to lower.)

Round 3: the decode step is HBM-BOUND — at the flagship shape the
self caches + cross memory K/V total ~1 GB of reads per emitted token,
~1.3 ms at v5e bandwidth, which is most of the measured 2.26 ms. Both
kernels are therefore STREAMING (flash-style online softmax) over
T-chunks, with the chunk index CLAMPED via scalar prefetch:

- self-attention reads only cache rows <= pos (the average over a
  79-token decode is ~half the cache);
- cross-attention reads only memory rows < max(lengths) of each batch
  block (SMILES toklen averages ~35 of the 80-row memory).

Chunks past the clamp re-map to the last needed block index; the
Pallas pipeline emitter skips the DMA when consecutive grid steps
map to the same block, and @pl.when skips their compute — so the
clamped tail costs neither bandwidth nor FLOPs.

Math parity with models/layers.py::scaled_dot_attention: scores/sqrt(dk),
-1e9 mask fill, f32 online softmax/accumulation, weights cast to the
compute dtype before the PV product. Everything else of the decoder
step (projections, FFN, norms) stays in XLA where the MXU already
serves it well.

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


def _safe_block(bs: int, want: int) -> int:
    """Largest divisor of bs that is <= want — direct calls with any
    batch size get a working grid instead of an assert (block_b is a
    static arg, so this runs at trace time)."""
    b = max(1, min(want, bs))
    while bs % b:
        b -= 1
    return b


def _blk_t(T: int, want: int = 12, multiple_of: int = 1) -> int:
    """KV stream chunk: largest divisor of T that is <= want (clamp
    granularity ~want rows). multiple_of=8 for chunks that land on a
    TPU sublane dim (Mosaic requires the last two block dims divisible
    by (8, 128) or equal to the array dim). Falls back to a single
    full-T block when no admissible divisor exists — the streaming
    kernel then degenerates to one pass."""
    best = 0
    for d in range(multiple_of, min(want, T) + 1, multiple_of):
        if T % d == 0:
            best = d
    return best if best > 1 else T


def _flash_update(s, v_blk, m_ref, l_ref, acc_ref, reduce_axis: int,
                  heads: int):
    """One online-softmax accumulation step shared by both kernels.

    s: masked f32 scores with `heads` minor; v_blk: value chunk with D
    minor; reduce_axis: the T axis of s/v_blk. Scratch: m/l (B, h) f32
    running max/denominator, acc (B, D) f32 running numerator."""
    D = v_blk.shape[-1]
    _, segT_f = _segment_matrices(D, heads, jnp.float32)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=reduce_axis))
    alpha = jnp.exp(m_prev - m_new)                       # (B, h)
    p = jnp.exp(s - jnp.expand_dims(m_new, reduce_axis))  # (.., T.., h)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=reduce_axis)
    m_ref[:] = m_new
    # weights cast to the compute dtype before PV (XLA-path parity)
    _, segT_v = _segment_matrices(D, heads, v_blk.dtype)
    flat = p.reshape(-1, heads).astype(v_blk.dtype)
    pf = jnp.dot(flat, segT_v, preferred_element_type=jnp.float32)
    pf = pf.reshape(v_blk.shape).astype(v_blk.dtype)
    pv = jnp.sum(pf * v_blk, axis=reduce_axis, dtype=jnp.float32)
    alphaD = jnp.dot(alpha, segT_f, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alphaD + pv


def _flash_finalize(o_ref, l_ref, acc_ref, heads: int, t_major: bool):
    D = acc_ref.shape[-1]
    _, segT_f = _segment_matrices(D, heads, jnp.float32)
    invl = 1.0 / l_ref[:]
    invlD = jnp.dot(invl, segT_f, preferred_element_type=jnp.float32)
    out = (acc_ref[:] * invlD).astype(o_ref.dtype)
    if t_major:
        o_ref[0] = out
    else:
        o_ref[:, 0, :] = out


def _self_stream_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, heads: int, blk_t: int):
    """Streaming self-attention over position-limited T-major chunks.

    k_ref/v_ref: (blk_t, block_b, D) chunk t of the packed cache (the
    index map clamps t to the last chunk containing `pos`)."""
    t = pl.program_id(1)
    pos = pos_ref[0]
    Tb, B, D = k_ref.shape
    n_need = pos // blk_t + 1

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(t < n_need)
    def _():
        scale = 1.0 / math.sqrt(D // heads)
        seg, _ = _segment_matrices(D, heads, k_ref.dtype)
        q = q_ref[0].astype(k_ref.dtype)                  # (B, D)
        prod = k_ref[:] * q[None]                         # (Tb, B, D)
        s = jnp.dot(prod.reshape(Tb * B, D), seg,
                    preferred_element_type=jnp.float32)
        s = s.reshape(Tb, B, heads) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tb, B, 1), 0) \
            + t * blk_t
        s = jnp.where(rows <= pos, s, MASK_FILL)
        _flash_update(s, v_ref[:], m_ref, l_ref, acc_ref,
                      reduce_axis=0, heads=heads)

    @pl.when(t == n_need - 1)
    def _():
        _flash_finalize(o_ref, l_ref, acc_ref, heads, t_major=True)


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_b", "interpret"))
def self_attention_step(pos, q, k_cache, v_cache, heads: int,
                        block_b: int = 32, interpret: bool = False):
    """Fused self-attention decode step over T-major packed caches.

    pos: () int32 current position. q: (bs, 1, D).
    k_cache/v_cache: (T, bs, D), row `pos` ALREADY holding the current
    token's K/V (the caller's dynamic_update_slice — a contiguous
    (bs, D) slab on this layout). Returns ctx (bs, 1, D).

    Only cache chunks with rows <= pos are DMA'd (see module
    docstring): the chunk index is clamped via scalar prefetch."""
    bs, _, D = q.shape
    T = k_cache.shape[0]
    block_b = _safe_block(bs, block_b)
    blk_t = _blk_t(T)
    n_tb = T // blk_t
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    qT = jnp.transpose(q, (1, 0, 2))                   # (1, bs, D)

    row = pl.BlockSpec((1, block_b, D), lambda i, t, p_ref: (0, i, 0))
    cache = pl.BlockSpec(
        (blk_t, block_b, D),
        lambda i, t, p_ref: (jnp.minimum(t, p_ref[0] // blk_t), i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs // block_b, n_tb),
        in_specs=[row, cache, cache],
        out_specs=row,
        scratch_shapes=[
            pltpu.VMEM((block_b, heads), jnp.float32),  # m
            pltpu.VMEM((block_b, heads), jnp.float32),  # l
            pltpu.VMEM((block_b, D), jnp.float32),      # acc
        ])
    out = pl.pallas_call(
        functools.partial(_self_stream_kernel, heads=heads, blk_t=blk_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, bs, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, qT, k_cache, v_cache)
    return jnp.transpose(out, (1, 0, 2))


def _cross_stream_kernel(nblk_ref, q_ref, k_ref, v_ref, len_ref, o_ref,
                         m_ref, l_ref, acc_ref, *, heads: int, blk_t: int):
    """Streaming cross-attention over length-limited B-major chunks.

    k_ref/v_ref: (block_b, blk_t, D) chunk t of the packed memory (the
    index map clamps t to this batch block's max length)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    B, Tb, D = k_ref.shape
    n_need = nblk_ref[i]

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(t < n_need)
    def _():
        scale = 1.0 / math.sqrt(D // heads)
        seg, _ = _segment_matrices(D, heads, k_ref.dtype)
        q = q_ref[:, 0, :].astype(k_ref.dtype)            # (B, D)
        prod = k_ref[:] * q[:, None, :]                   # (B, Tb, D)
        s = jnp.dot(prod.reshape(B * Tb, D), seg,
                    preferred_element_type=jnp.float32)
        s = s.reshape(B, Tb, heads) * scale
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, Tb, 1), 1) \
            + t * blk_t
        s = jnp.where(cols < jnp.expand_dims(len_ref[:], -1),
                      s, MASK_FILL)
        _flash_update(s, v_ref[:], m_ref, l_ref, acc_ref,
                      reduce_axis=1, heads=heads)

    @pl.when(t == n_need - 1)
    def _():
        _flash_finalize(o_ref, l_ref, acc_ref, heads, t_major=False)


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_b", "interpret"))
def cross_attention_step(q, k_mem, v_mem, lengths, heads: int,
                         block_b: int = 64, interpret: bool = False):
    """Fused cross-attention for one decode step.

    q: (bs, 1, D); k_mem/v_mem: (bs, Tm, D) packed; lengths: (bs,)
    int32 — row r attends to memory positions < lengths[r] (the
    reference's toklen-derived src_mask). Returns (bs, 1, D).

    Only memory chunks below each batch block's max length are DMA'd
    (see module docstring)."""
    bs, _, D = q.shape
    Tm = k_mem.shape[1]
    block_b = _safe_block(bs, block_b)
    # the chunk is the SECOND-TO-LAST dim of the (B, Tb, D) block ->
    # must be a multiple of 8 (or the full Tm)
    blk_t = _blk_t(Tm, want=16, multiple_of=8)
    n_tb = Tm // blk_t
    lengths = lengths.astype(jnp.int32)
    len2d = lengths.reshape(bs, 1)
    # per-batch-block chunk budget: ceil(max(lengths in block)/blk_t)
    nblk = jnp.maximum(
        1, (jnp.max(lengths.reshape(bs // block_b, block_b), axis=1)
            + blk_t - 1) // blk_t)

    row = pl.BlockSpec((block_b, 1, D), lambda i, t, n_ref: (i, 0, 0))
    mem = pl.BlockSpec(
        (block_b, blk_t, D),
        lambda i, t, n_ref: (i, jnp.minimum(t, n_ref[i] - 1), 0))
    lspec = pl.BlockSpec((block_b, 1), lambda i, t, n_ref: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs // block_b, n_tb),
        in_specs=[row, mem, mem, lspec],
        out_specs=row,
        scratch_shapes=[
            pltpu.VMEM((block_b, heads), jnp.float32),  # m
            pltpu.VMEM((block_b, heads), jnp.float32),  # l
            pltpu.VMEM((block_b, D), jnp.float32),      # acc
        ])
    return pl.pallas_call(
        functools.partial(_cross_stream_kernel, heads=heads, blk_t=blk_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bs, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nblk, q, k_mem, v_mem, len2d)
