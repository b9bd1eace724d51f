"""Whole-decoder-layer Pallas megakernel for the per-token decode step.

Round-2 measured the fused-attention decode step at 2.26 ms
(EVIDENCE.md): ~1.3 ms is the HBM floor (KV cache + cross memory
reads, now streamed+clamped by ops/decode_attention.py) and most of
the remaining ~1 ms is XLA glue — per token the step still dispatches
~90 small ops (36 projection matmuls, 18 norms, residuals, FFNs,
cache updates).  Each one is individually MXU-friendly but
launch/copy overhead dominates at (512, 512)-sized work.

This module fuses EVERYTHING a decoder layer does for one token into
ONE pallas_call (6 calls per step instead of ~90 ops):

    norm_1 -> q/k/v proj -> streaming self-attention over the packed
    (T, bs, D) cache -> out proj -> residual -> norm_2 -> q proj ->
    streaming cross-attention over packed (bs, Tm, D) memory -> out
    proj -> residual -> norm_3 -> FFN (D->F gelu F->D) -> residual

Design notes:

- Grid is (batch_blocks, nTs + nTc): phase-structured over the second
  dim — t in [0, nTs) streams self-cache chunks, t in [nTs, nTs+nTc)
  streams cross-memory chunks; projections ride the first/boundary/
  last phases.  Chunk index maps CLAMP to the last needed chunk
  (self: rows < pos; cross: per-block max length), so clamped tails
  cost neither DMA nor compute — same trick as decode_attention.py.
- Weights (~7 MB bf16 incl. FFN) use constant index maps: the Pallas
  pipeline emitter fetches each exactly once per call, like the XLA
  matmuls did.
- The current token's K/V row is computed IN the kernel (from norm_1
  output) and emitted as (bs, D) outputs; the caller does the cache
  dynamic-update-slice in XLA.  The kernel adds the current token's
  attention contribution from VMEM and streams only cache rows
  STRICTLY below `pos` — no read-after-write on the cache.
- Residual adds run in the compute dtype (bf16 on TPU) to match the
  XLA path; norms in f32 (Bessel ddof=1, layers.py::Norm); attention
  online-softmax state in f32 (decode_attention.py::_flash_update).

The caller must pad the cache T to a multiple of 8 and the memory Tm
to a multiple of 16 (DecodeEngine does both for the mega path) so the
stream chunks stay tile-exact and VMEM-bounded.

Reference hot loop being replaced at the system level:
Inference/sampling_tool.py:140-184 (full-decoder re-run per token).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gctplus_tpu.ops.decode_attention import (MASK_FILL, _blk_t,
                                              _flash_update, _safe_block,
                                              _segment_matrices)


class LayerStepWeights(NamedTuple):
    """One decoder layer's parameters, kernel-ready.

    Projection/FFN kernels are (in, out) in the compute dtype; biases
    and norm affines are (1, dim) float32 (norms compute in f32)."""

    n1s: jnp.ndarray
    n1b: jnp.ndarray
    wq1: jnp.ndarray
    bq1: jnp.ndarray
    wk1: jnp.ndarray
    bk1: jnp.ndarray
    wv1: jnp.ndarray
    bv1: jnp.ndarray
    wo1: jnp.ndarray
    bo1: jnp.ndarray
    n2s: jnp.ndarray
    n2b: jnp.ndarray
    wq2: jnp.ndarray
    bq2: jnp.ndarray
    wo2: jnp.ndarray
    bo2: jnp.ndarray
    n3s: jnp.ndarray
    n3b: jnp.ndarray
    wf1: jnp.ndarray
    bf1: jnp.ndarray
    wf2: jnp.ndarray
    bf2: jnp.ndarray


def layer_weights_from_params(p, dtype) -> LayerStepWeights:
    """Build from a DecoderLayer param subtree (models/layers.py)."""
    as2d = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)
    cast = lambda a: jnp.asarray(a, dtype)
    a1, a2, ff = p["attn_1"], p["attn_2"], p["ff"]
    return LayerStepWeights(
        n1s=as2d(p["norm_1"]["alpha"]), n1b=as2d(p["norm_1"]["bias"]),
        wq1=cast(a1["q_linear"]["kernel"]), bq1=as2d(a1["q_linear"]["bias"]),
        wk1=cast(a1["k_linear"]["kernel"]), bk1=as2d(a1["k_linear"]["bias"]),
        wv1=cast(a1["v_linear"]["kernel"]), bv1=as2d(a1["v_linear"]["bias"]),
        wo1=cast(a1["out"]["kernel"]), bo1=as2d(a1["out"]["bias"]),
        n2s=as2d(p["norm_2"]["alpha"]), n2b=as2d(p["norm_2"]["bias"]),
        wq2=cast(a2["q_linear"]["kernel"]), bq2=as2d(a2["q_linear"]["bias"]),
        wo2=cast(a2["out"]["kernel"]), bo2=as2d(a2["out"]["bias"]),
        n3s=as2d(p["norm_3"]["alpha"]), n3b=as2d(p["norm_3"]["bias"]),
        wf1=cast(ff["linear_1"]["kernel"]), bf1=as2d(ff["linear_1"]["bias"]),
        wf2=cast(ff["linear_2"]["kernel"]), bf2=as2d(ff["linear_2"]["bias"]),
    )


def _norm(x, scale_ref, bias_ref, eps=1e-6):
    """layers.py::Norm — f32, Bessel-corrected std (ddof=1)."""
    xf = x.astype(jnp.float32)
    n = xf.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
    out = scale_ref[0] * (xf - mean) / (jnp.sqrt(var) + eps) + bias_ref[0]
    return out.astype(x.dtype)


def _gelu_exact(x):
    """Exact (erf) GELU without the erf primitive, which has no Pallas
    TPU (Mosaic) lowering — only erf_inv does.  erf is evaluated with
    the Abramowitz & Stegun 7.1.26 polynomial (|abs err| <= 1.5e-7),
    below half a bf16 ulp of the FFN activations, so the kernel stays
    token-parity-equal with the XLA path's jax.nn.gelu(approximate=
    False) (layers.py::FeedForward, ref Model/sublayers.py:77-89)."""
    a = x * 0.7071067811865476  # x / sqrt(2)
    s = jnp.where(a >= 0.0, 1.0, -1.0)
    z = jnp.abs(a)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
        + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-z * z))
    return 0.5 * x * (1.0 + erf)


def _proj(x, w_ref, b_ref):
    """x (B, Din) @ (Din, Dout) + bias, Flax-Dense-equivalent in the
    compute dtype (MXU f32 accumulation, bf16 result + bf16 bias)."""
    y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    return (y.astype(x.dtype) + b_ref[0].astype(x.dtype)).astype(x.dtype)


def _finalize(l_ref, acc_ref, heads, dtype):
    D = acc_ref.shape[-1]
    _, segT = _segment_matrices(D, heads, jnp.float32)
    invl = jnp.dot(1.0 / l_ref[:], segT,
                   preferred_element_type=jnp.float32)
    return (acc_ref[:] * invl).astype(dtype)


def _scores_1(q, k, heads):
    """Current-token self score: (B, D)x(B, D) -> (1, B, h) f32."""
    D = q.shape[-1]
    seg, _ = _segment_matrices(D, heads, k.dtype)
    scale = 1.0 / math.sqrt(D // heads)
    s = jnp.dot(q.astype(k.dtype) * k, seg,
                preferred_element_type=jnp.float32) * scale
    return s[None]


def _layer_step_kernel(pos_ref, nblk_ref, x_ref, k_ref, v_ref, mk_ref,
                       mv_ref, len_ref,
                       n1s, n1b, wq1, bq1, wk1, bk1, wv1, bv1, wo1, bo1,
                       n2s, n2b, wq2, bq2, wo2, bo2, n3s, n3b,
                       wf1, bf1, wf2, bf2,
                       xo_ref, ko_ref, vo_ref,
                       m_ref, l_ref, acc_ref, xr_ref, qs_ref,
                       *, heads: int, blk_ts: int, blk_tc: int,
                       n_ts: int, n_tc: int):
    i = pl.program_id(0)
    t = pl.program_id(1)
    pos = pos_ref[0]
    dtype = x_ref.dtype
    scale = 1.0 / math.sqrt(x_ref.shape[-1] // heads)

    # ---- phase 0: projections + current-token contribution ----------
    @pl.when(t == 0)
    def _():
        x = x_ref[:]
        xr_ref[:] = x
        h = _norm(x, n1s, n1b)
        q1 = _proj(h, wq1, bq1)
        k1 = _proj(h, wk1, bk1)
        v1 = _proj(h, wv1, bv1)
        ko_ref[:] = k1
        vo_ref[:] = v1
        qs_ref[:] = q1
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        s = _scores_1(q1, k1, heads)
        _flash_update(s, v1[None], m_ref, l_ref, acc_ref,
                      reduce_axis=0, heads=heads)

    # ---- self-attention stream over cache rows < pos -----------------
    n_need_s = (pos + blk_ts - 1) // blk_ts  # ceil(pos / blk_ts)

    @pl.when((t < n_need_s) & (t < n_ts))
    def _():
        Tb, B, D = k_ref.shape
        seg, _ = _segment_matrices(D, heads, k_ref.dtype)
        q = qs_ref[:].astype(k_ref.dtype)
        prod = k_ref[:] * q[None]
        s = jnp.dot(prod.reshape(Tb * B, D), seg,
                    preferred_element_type=jnp.float32)
        s = s.reshape(Tb, B, heads) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tb, B, 1), 0) \
            + t * blk_ts
        s = jnp.where(rows < pos, s, MASK_FILL)
        _flash_update(s, v_ref[:], m_ref, l_ref, acc_ref,
                      reduce_axis=0, heads=heads)

    # ---- self finalize -> out proj -> residual -> norm_2 -> cross q --
    @pl.when(t == n_ts - 1)
    def _():
        ctx = _finalize(l_ref, acc_ref, heads, dtype)
        xr_ref[:] = xr_ref[:] + _proj(ctx, wo1, bo1)
        h2 = _norm(xr_ref[:], n2s, n2b)
        qs_ref[:] = _proj(h2, wq2, bq2)
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # ---- cross-attention stream over memory cols < length ------------
    @pl.when((t >= n_ts) & (t - n_ts < nblk_ref[i]))
    def _():
        tc = t - n_ts
        B, Tb, D = mk_ref.shape
        seg, _ = _segment_matrices(D, heads, mk_ref.dtype)
        q = qs_ref[:].astype(mk_ref.dtype)
        prod = mk_ref[:] * q[:, None, :]
        s = jnp.dot(prod.reshape(B * Tb, D), seg,
                    preferred_element_type=jnp.float32)
        s = s.reshape(B, Tb, heads) * scale
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, Tb, 1), 1) \
            + tc * blk_tc
        s = jnp.where(cols < len_ref[:].reshape(B, 1, 1), s, MASK_FILL)
        _flash_update(s, mv_ref[:], m_ref, l_ref, acc_ref,
                      reduce_axis=1, heads=heads)

    # ---- cross finalize -> out proj -> residual -> FFN -> residual ---
    @pl.when(t == n_ts + n_tc - 1)
    def _():
        ctx2 = _finalize(l_ref, acc_ref, heads, dtype)
        xr_ref[:] = xr_ref[:] + _proj(ctx2, wo2, bo2)
        h3 = _norm(xr_ref[:], n3s, n3b)
        f = jnp.dot(h3, wf1[:], preferred_element_type=jnp.float32)
        f = f + bf1[0]
        f = _gelu_exact(f).astype(dtype)
        xo_ref[:] = xr_ref[:] + _proj(f, wf2, bf2)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_b", "interpret"))
def decoder_layer_step(x, pos, k_cache, v_cache, mem_k, mem_v, lengths,
                       w: LayerStepWeights, heads: int,
                       block_b: int = 64, interpret: bool = False):
    """One decoder layer's full per-token step as a single kernel.

    x: (bs, D) current-token activations (post embed+PE, pre norm_1).
    k_cache/v_cache: (T, bs, D) packed T-major caches holding rows
    STRICTLY below `pos` (row `pos` is written by the caller from the
    returned k_row/v_row). T must be a multiple of 8.
    mem_k/mem_v: (bs, Tm, D) packed cross memory, Tm a multiple of 16.
    lengths: (bs,) int32 — row r attends to memory cols < lengths[r].

    Returns (x_out (bs, D), k_row (bs, D), v_row (bs, D)).

    block_b=64 keeps the whole working set inside the 16 MB scoped
    VMEM budget at flagship shape (D=512, F=2048): ~7.1 MB weights
    (constant index maps, fetched once) + ~6 MB double-buffered
    cache/memory stream blocks + ~1 MB rows/scratch ≈ 14 MB.
    block_b=128 was measured 16.2 MB and failed XLA's scoped-vmem
    check on v5e (the CompilerParams vmem_limit_bytes does not raise
    that 16 MB stack limit through the remote-compile service).
    """
    bs, D = x.shape
    T = k_cache.shape[0]
    Tm = mem_k.shape[1]
    assert T % 8 == 0, f"cache len {T} must be a multiple of 8"
    assert Tm % 16 == 0, f"memory len {Tm} must be a multiple of 16"
    block_b = _safe_block(bs, block_b)
    blk_ts = _blk_t(T, want=8, multiple_of=8)
    blk_tc = _blk_t(Tm, want=16, multiple_of=16)
    n_ts, n_tc = T // blk_ts, Tm // blk_tc

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    lengths = lengths.astype(jnp.int32)
    nblk = jnp.maximum(
        1, (jnp.max(lengths.reshape(bs // block_b, block_b), axis=1)
            + blk_tc - 1) // blk_tc)
    len2d = lengths.reshape(bs, 1)

    row = pl.BlockSpec((block_b, D), lambda i, t, p, n: (i, 0))
    cache = pl.BlockSpec(
        (blk_ts, block_b, D),
        lambda i, t, p, n: (
            jnp.clip(t, 0,
                     jnp.maximum((p[0] + blk_ts - 1) // blk_ts - 1, 0)),
            i, 0))
    mem = pl.BlockSpec(
        (block_b, blk_tc, D),
        lambda i, t, p, n: (i, jnp.clip(t - n_ts, 0, n[i] - 1), 0))
    lspec = pl.BlockSpec((block_b, 1), lambda i, t, p, n: (i, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda i, t, p, n:
                                   (0,) * a.ndim)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs // block_b, n_ts + n_tc),
        in_specs=[row, cache, cache, mem, mem, lspec]
        + [const(a) for a in w],
        out_specs=(row, row, row),
        scratch_shapes=[
            pltpu.VMEM((block_b, heads), jnp.float32),   # m
            pltpu.VMEM((block_b, heads), jnp.float32),   # l
            pltpu.VMEM((block_b, D), jnp.float32),       # acc
            pltpu.VMEM((block_b, D), x.dtype),           # x residual
            pltpu.VMEM((block_b, D), x.dtype),           # current q
        ])
    out_sds = jax.ShapeDtypeStruct((bs, D), x.dtype)
    x_out, k_row, v_row = pl.pallas_call(
        functools.partial(_layer_step_kernel, heads=heads, blk_ts=blk_ts,
                          blk_tc=blk_tc, n_ts=n_ts, n_tc=n_tc),
        grid_spec=grid_spec,
        out_shape=(out_sds, out_sds, out_sds),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, nblk, x, k_cache, v_cache, mem_k, mem_v, len2d, *w)
    return x_out, k_row, v_row
