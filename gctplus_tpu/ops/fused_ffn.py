"""Fused FFN (Linear -> exact GELU -> dropout -> Linear) with a
flash-style backward that never materializes the (tokens, d_ff)
hidden activation in HBM.

Motivation (EVIDENCE.md round-3 roofline): the flagship train step is
HBM-bound — 170.6 GB touched per step at 87% of the v5e bandwidth
floor — and the largest reducible term is the FFN hidden state
(bs*len, 2048): the XLA path writes it at forward, then re-streams it
(and its dropout/gelu byproducts) through the backward matmuls.  Per
FFN layer that is ~5-7 * (N x d_ff) HBM round-trips; this kernel cuts
it to ZERO by saving only (x, rng_seed) and recomputing the hidden
tile-resident in VMEM on the backward pass (recompute adds MXU work,
which the step has spare: 42% MXU utilization at 569 GB/s streams).

Forward  (grid over row tiles, weights VMEM-resident once per call):
    a = x @ W1 + b1 ; h = gelu_exact(a) ; hd = dropout(h) ;
    y = hd @ W2 + b2
Backward (same tiling, same per-tile PRNG seed => identical mask):
    recompute a, h, mask
    dW2 += hd^T @ dy          db2 += sum(dy)
    dh   = (dy @ W2^T) * mask/keep
    da   = dh * gelu'(a)
    dW1 += x^T @ da           db1 += sum(da)
    dx   = da @ W1^T
dW*/db* accumulate in f32 VMEM scratch across the sequential TPU grid
(constant output index maps keep the blocks resident; written back
once at the end).

Dropout uses the in-kernel TPU PRNG (pltpu.prng_seed(seed, tile_i) +
prng_random_bits), NOT flax's threefry: the mask need only be a valid
iid Bernoulli(keep) draw that forward and backward agree on —
training semantics, not bit parity with the XLA path (golden-parity
tests run deterministic).  Seed handling mirrors train_task's rbg
choice: cheap per-step bits, reproducible given the step's key.

Replaces (numerically, deterministic mode): models/layers.py::
FeedForward — reference Model/sublayers.py:77-89 (PositionwiseFeed
Forward, F.gelu exact erf).  GELU uses the Abramowitz-Stegun 7.1.26
erf polynomial (|err| <= 1.5e-7, below half a bf16 ulp) because erf
has no Mosaic lowering; its gradient uses the same polynomial CDF
plus the exact Gaussian pdf term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf_poly(z):
    """Abramowitz & Stegun 7.1.26 erf on f32 (|abs err| <= 1.5e-7)."""
    s = jnp.where(z >= 0.0, 1.0, -1.0)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
        + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-az * az))


def _gelu_and_grad(a):
    """(gelu(a), d gelu/da) in f32: x*Phi(x); Phi(x) + x*phi(x)."""
    cdf = 0.5 * (1.0 + _erf_poly(a * _INV_SQRT2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * a * a)
    return a * cdf, cdf + a * pdf


def _prng_mask(seed_ref, tile_i, shape, keep_prob):
    """Bernoulli(keep) from the seeded in-kernel PRNG: keep iff
    bits < keep*2^32 (compare in uint32).  Seeding with (seed, tile)
    makes the backward pass regenerate the identical mask."""
    pltpu.prng_seed(seed_ref[0], tile_i)
    bits = pltpu.prng_random_bits(shape)
    thr = np.uint32(min(int(keep_prob * 2 ** 32), 2 ** 32 - 1))
    return bits.astype(jnp.uint32) < thr


# overridable for interpret-mode tests: pltpu.prng_* has no CPU
# lowering, so tests substitute a deterministic jnp-only mask with the
# same (seed_ref, tile_i, shape, keep) -> bool contract
_MASK_IMPL = _prng_mask


def _ffn_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    y_ref, *, rate, deterministic):
    i = pl.program_id(0)
    dtype = x_ref.dtype
    a = jnp.dot(x_ref[:], w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0]
    h, _ = _gelu_and_grad(a)
    if not deterministic and rate > 0.0:
        keep = 1.0 - rate
        h = jnp.where(_MASK_IMPL(seed_ref, i, h.shape, keep), h / keep, 0.0)
    y = jnp.dot(h.astype(dtype), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    y_ref[:] = y.astype(dtype)


def _ffn_bwd_kernel(seed_ref, x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    *, rate, deterministic):
    i = pl.program_id(0)
    dtype = x_ref.dtype
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # recompute the hidden tile (never read from HBM)
    a = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=f32) + b1_ref[0]
    h, dgelu = _gelu_and_grad(a)
    dy = dy_ref[:]
    if not deterministic and rate > 0.0:
        keep = 1.0 - rate
        # same (seed, tile) as forward -> identical mask
        mask = _MASK_IMPL(seed_ref, i, h.shape, keep)
        hd = jnp.where(mask, h / keep, 0.0)
    else:
        hd = h
    hd = hd.astype(dtype)

    dw2_ref[:] += jax.lax.dot_general(  # hd^T @ dy -> (F, D)
        hd, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db2_ref[:] += jnp.sum(dy.astype(f32), axis=0, keepdims=True)

    dh = jax.lax.dot_general(  # dy @ W2^T -> (rows, F)
        dy, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32)
    if not deterministic and rate > 0.0:
        dh = jnp.where(mask, dh / (1.0 - rate), 0.0)
    da = dh * dgelu
    da_c = da.astype(dtype)

    dw1_ref[:] += jax.lax.dot_general(  # x^T @ da -> (D, F)
        x_ref[:], da_c, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db1_ref[:] += jnp.sum(da, axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(  # da @ W1^T -> (rows, D)
        da_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dtype)


def _pad_rows(x2d, tile_rows):
    n = x2d.shape[0]
    pad = (-n) % tile_rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_ffn(rate, deterministic, tile_rows, tile_rows_bwd, interpret,
               x, w1, b1, w2, b2, seed):
    y, _ = _fused_ffn_fwd(rate, deterministic, tile_rows, tile_rows_bwd,
                          interpret, x, w1, b1, w2, b2, seed)
    return y


def _grid_call(kernel, n_tiles, tile_rows, in_specs, out_shapes,
               out_specs, interpret, args):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_tiles,),
            in_specs=in_specs, out_specs=out_specs),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)


def _const2d(ref_shape):
    return pl.BlockSpec(ref_shape, lambda i, *_: (0, 0))


def _fused_ffn_fwd(rate, deterministic, tile_rows, tile_rows_bwd,
                   interpret, x, w1, b1, w2, b2, seed):
    if not deterministic and rate > 0.0:
        # the dropout mask is seeded per (seed, tile index): forward
        # and backward MUST tile identically or the backward would
        # regenerate a different mask
        tile_rows = tile_rows_bwd
    orig_shape = x.shape
    dtype = x.dtype
    D, F = w1.shape
    x2d, n = _pad_rows(x.reshape(-1, D), tile_rows)
    n_tiles = x2d.shape[0] // tile_rows
    w1c, w2c = w1.astype(dtype), w2.astype(dtype)
    b1c = b1.astype(jnp.float32).reshape(1, F)
    b2c = b2.astype(jnp.float32).reshape(1, D)
    row = pl.BlockSpec((tile_rows, D), lambda i, *_: (i, 0))
    y2d = _grid_call(
        functools.partial(_ffn_fwd_kernel, rate=rate,
                          deterministic=deterministic),
        n_tiles, tile_rows,
        in_specs=[row, _const2d((D, F)), _const2d((1, F)),
                  _const2d((F, D)), _const2d((1, D))],
        out_shapes=jax.ShapeDtypeStruct((x2d.shape[0], D), dtype),
        out_specs=row,
        interpret=interpret,
        args=(seed, x2d, w1c, b1c, w2c, b2c))
    y = y2d[:n].reshape(orig_shape)
    return y, (x, w1, b1, w2, seed)


def _fused_ffn_bwd(rate, deterministic, tile_rows, tile_rows_bwd,
                   interpret, res, dy):
    # the backward tile is smaller: dW1/dW2 f32 accumulators (8 MB)
    # plus both weight copies stay VMEM-resident, and the recomputed
    # hidden temps scale with the tile (per-tile VMEM is independent
    # of bs/len — only tile_rows x d_ff matters: 256 rows blew the
    # 16 MB scoped vmem limit by 106 KB and 128 by 36 KB on-chip at
    # D=512/F=2048; 96 leaves ~1.6 MB of headroom)
    tile_rows = tile_rows_bwd
    x, w1, b1, w2, seed = res
    orig_shape = x.shape
    dtype = x.dtype
    D, F = w1.shape
    x2d, n = _pad_rows(x.reshape(-1, D), tile_rows)
    dy2d, _ = _pad_rows(dy.reshape(-1, D), tile_rows)  # zero rows: no grad
    n_tiles = x2d.shape[0] // tile_rows
    w1c, w2c = w1.astype(dtype), w2.astype(dtype)
    b1c = b1.astype(jnp.float32).reshape(1, F)
    row = pl.BlockSpec((tile_rows, D), lambda i, *_: (i, 0))
    f32 = jnp.float32
    dx2d, dw1, db1, dw2, db2 = _grid_call(
        functools.partial(_ffn_bwd_kernel, rate=rate,
                          deterministic=deterministic),
        n_tiles, tile_rows,
        in_specs=[row, row, _const2d((D, F)), _const2d((1, F)),
                  _const2d((F, D))],
        out_shapes=(jax.ShapeDtypeStruct((x2d.shape[0], D), dtype),
                    jax.ShapeDtypeStruct((D, F), f32),
                    jax.ShapeDtypeStruct((1, F), f32),
                    jax.ShapeDtypeStruct((F, D), f32),
                    jax.ShapeDtypeStruct((1, D), f32)),
        out_specs=(row, _const2d((D, F)), _const2d((1, F)),
                   _const2d((F, D)), _const2d((1, D))),
        interpret=interpret,
        args=(seed, x2d, dy2d, w1c, b1c, w2c))
    dx = dx2d[:n].reshape(orig_shape)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(w2.dtype), dseed)


_fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def fused_ffn(x, w1, b1, w2, b2, seed, *, rate: float = 0.0,
              deterministic: bool = True, tile_rows: int = 256,
              tile_rows_bwd: int = 96, interpret: bool = False):
    """Differentiable fused FFN.  x: (..., D); w1: (D, F); b1: (F,);
    w2: (F, D); b2: (D,); seed: (1,) int32 (ignored when deterministic
    or rate == 0).  Gradients are returned in the weights' own dtype
    (f32 params); the hidden state never touches HBM in either pass."""
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _fused_ffn(float(rate), bool(deterministic), int(tile_rows),
                      int(tile_rows_bwd), bool(interpret),
                      x, w1, b1, w2, b2, seed)


def fused_ffn_applicable(d_model: int, d_ff: int,
                         tile_rows: int = 256) -> bool:
    """Shape + backend gate (mirrors layers.py::
    _pallas_attention_applicable's TPU whitelist)."""
    if d_model % 128 or d_ff % 128:
        return False
    return jax.default_backend() in ("tpu", "axon")
