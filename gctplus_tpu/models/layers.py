"""Transformer primitives with reference-parity numerics.

Every quirk of the reference primitive library (GCT-Plus
Model/{modules,sublayers,layers}.py) that affects checkpoint parity is
reproduced here, in idiomatic Flax:

- `Norm` divides by the Bessel-corrected std (ddof=1), not the
  population std of nn.LayerNorm (Model/modules.py:93-94).
- `PositionalEncoding` uses the nonstandard frequency indexing
  sin(pos/10000^(2i/d)), cos(pos/10000^(2(i+1)/d)) and carries the
  x*sqrt(d_model) embedding scale (Model/modules.py:124-136); the
  embedding itself is unscaled (Model/modules.py:110).
- Attention uses masked_fill(-1e9) before softmax and applies dropout
  to the attention weights (Model/sublayers.py:29-41).
- Encoder/decoder blocks are pre-norm residual (Model/layers.py:8-82).

Compute dtype is configurable (bfloat16 for the TPU fast path);
parameters are always float32.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

MASK_FILL = -1e9


def matmul_precision(dtype):
    """HIGHEST for float32 (bit-parity with the torch reference, whose
    f32 matmuls are exact), DEFAULT for bfloat16: on TPU,
    Precision.HIGHEST on bf16 inputs forces a multi-pass f32-emulation
    matmul — measured ~2.5x the memory-floor cost per decode step
    (scripts/probe_decode_cost.py). bf16 inputs with f32 accumulation
    (preferred_element_type) are already the intended fast path."""
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)



def make_pe_table(d_model: int, max_seq_len: int = 200) -> np.ndarray:
    """Sinusoid table with the reference's index quirk (modules.py:124-130)."""
    pos = np.arange(max_seq_len, dtype=np.float64)[:, None]
    i = np.arange(0, d_model, 2, dtype=np.float64)[None, :]
    pe = np.zeros((max_seq_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos / np.power(10000.0, (2.0 * i) / d_model))
    pe[:, 1::2] = np.cos(pos / np.power(10000.0, (2.0 * (i + 1.0)) / d_model))
    return pe.astype(np.float32)


class Norm(nn.Module):
    """LayerNorm variant with Bessel-corrected std (modules.py:80-95)."""

    d_model: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.d_model,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # torch Tensor.std defaults to ddof=1 (Bessel), the parity trap.
        var = jnp.var(xf, axis=-1, keepdims=True, ddof=1)
        std = jnp.sqrt(var)
        out = alpha * (xf - mean) / (std + self.eps) + bias
        return out.astype(self.dtype)


class Embeddings(nn.Module):
    """Token embedding; the sqrt(d_model) scale lives in the PE
    (modules.py:101-110,136)."""

    vocab_size: int
    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids):
        table = self.param(
            "embedding",
            nn.initializers.glorot_uniform(),
            (self.vocab_size, self.d_model),
            jnp.float32,
        )
        return jnp.take(table, token_ids, axis=0).astype(self.dtype)


class PositionalEncoding(nn.Module):
    """x*sqrt(d) + pe[:len] then dropout (modules.py:116-144)."""

    d_model: int
    max_seq_len: int = 200
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe = jnp.asarray(make_pe_table(self.d_model, self.max_seq_len))
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, deterministic: bool = True, position_offset: int = 0):
        seq_len = x.shape[1]
        pe = jax.lax.dynamic_slice_in_dim(self.pe, position_offset, seq_len, axis=0)
        x = x * math.sqrt(self.d_model) + pe.astype(self.dtype)[None, :, :]
        return self.drop(x, deterministic=deterministic)

    def at_position(self, x, position):
        """Single-token variant for incremental decode: x (bs, 1, d),
        position a traced scalar."""
        pe = jax.lax.dynamic_slice_in_dim(self.pe, position, 1, axis=0)
        return x * math.sqrt(self.d_model) + pe.astype(self.dtype)[None, :, :]


def scaled_dot_attention(q, k, v, mask, dropout_mod, deterministic, dtype):
    """(bs, h, Lq, dk) x (bs, h, Lk, dk) -> (bs, h, Lq, dk).

    Parity: sublayers.py:29-41 — scores/sqrt(dk), masked_fill(-1e9),
    softmax, dropout-on-weights, then weighted sum. Softmax is done in
    float32 regardless of compute dtype.
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                        precision=matmul_precision(q.dtype))
    scores = scores / math.sqrt(d_k)
    if mask is not None:
        # mask: (bs, 1|Lq, Lk) -> broadcast over heads (sublayers.py:32)
        scores = jnp.where(mask[:, None, :, :], scores, MASK_FILL)
    weights = jax.nn.softmax(scores, axis=-1)
    attn = weights.astype(dtype)
    if dropout_mod is not None:
        attn = dropout_mod(attn, deterministic=deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32,
                     precision=matmul_precision(v.dtype))
    return out.astype(dtype), weights


def scaled_dot_attention_blhd(q, k, v, mask, dropout_mod, deterministic,
                              dtype):
    """Same math as scaled_dot_attention but on (bs, L, h, dk) operands:
    the head split/merge transposes are folded into the dot_generals
    (einsum batch/contract dims) instead of materialized — the train
    trace showed 27 ms/step of pure layout-change HLOs at the flagship
    shape (EVIDENCE.md round-3 roofline), most of it the three
    (bs,L,h,dk)->(bs,h,L,dk) copies per attention call. Weights keep
    the (bs, h, Lq, Lk) layout, so the dropout draw and the returned
    attention maps are bit-compatible with the BHLD path."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision(q.dtype))
    scores = scores / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, MASK_FILL)
    weights = jax.nn.softmax(scores, axis=-1)
    attn = weights.astype(dtype)
    if dropout_mod is not None:
        attn = dropout_mod(attn, deterministic=deterministic)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32,
                     precision=matmul_precision(v.dtype))
    return out.astype(dtype), weights


def _pallas_attention_applicable(mask, deterministic, dropout,
                                 return_attn, q_len) -> bool:
    """The fused Pallas kernel handles the deterministic no-weights
    case on real TPU; everything else falls back to the XLA path
    (attention-weight dropout and weight returns aren't fused, and a
    1-token query is a matvec the kernel's grid would waste)."""
    if return_attn or mask is None or q_len <= 1:
        return False
    if not deterministic and dropout > 0:
        return False
    import jax as _jax
    # whitelist TPU-like backends: an unknown backend (e.g. METAL)
    # must not attempt TPU-only Pallas lowering
    return _jax.default_backend() in ("tpu", "axon")


class MultiHeadAttention(nn.Module):
    """4-projection MHA (sublayers.py:44-74)."""

    heads: int
    d_model: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # transpose-free (bs, L, h, dk) attention layout on the batch
    # paths (scaled_dot_attention_blhd); decode/KV-cache paths keep
    # BHLD, which the streaming kernels expect
    use_blhd: bool = False

    def setup(self):
        dense = lambda name: nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, precision=matmul_precision(self.dtype),
            kernel_init=nn.initializers.glorot_uniform(), name=name,
        )
        self.q_linear = dense("q_linear")
        self.k_linear = dense("k_linear")
        self.v_linear = dense("v_linear")
        self.out = dense("out")
        self.attn_drop = nn.Dropout(rate=self.dropout)
        self.d_k = self.d_model // self.heads

    def _split(self, x):
        bs, L, _ = x.shape
        return x.reshape(bs, L, self.heads, self.d_k).transpose(0, 2, 1, 3)

    def _merge(self, x):
        bs, h, L, d_k = x.shape
        return x.transpose(0, 2, 1, 3).reshape(bs, L, h * d_k)

    def _heads4(self, x):
        bs, L, _ = x.shape
        return x.reshape(bs, L, self.heads, self.d_k)

    def __call__(self, q, k, v, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        if self.use_pallas and _pallas_attention_applicable(
                mask, deterministic, self.dropout, return_attn, q.shape[1]):
            qh = self._split(self.q_linear(q))
            kh = self._split(self.k_linear(k))
            vh = self._split(self.v_linear(v))
            from gctplus_tpu.ops.flash_attention import fused_attention
            ctx = fused_attention(qh, kh, vh, mask)
            return self.out(self._merge(ctx))
        if self.use_blhd:
            q4 = self._heads4(self.q_linear(q))
            k4 = self._heads4(self.k_linear(k))
            v4 = self._heads4(self.v_linear(v))
            ctx, weights = scaled_dot_attention_blhd(
                q4, k4, v4, mask, self.attn_drop, deterministic, self.dtype)
            bs, Lq = ctx.shape[0], ctx.shape[1]
            out = self.out(ctx.reshape(bs, Lq, self.d_model))
        else:
            qh = self._split(self.q_linear(q))
            kh = self._split(self.k_linear(k))
            vh = self._split(self.v_linear(v))
            ctx, weights = scaled_dot_attention(
                qh, kh, vh, mask, self.attn_drop, deterministic, self.dtype)
            out = self.out(self._merge(ctx))
        if return_attn:
            return out, weights
        return out

    # --- incremental-decode helpers ----------------------------------
    def project_kv(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V heads for a fixed memory (cross-attention precompute)."""
        return self._split(self.k_linear(x)), self._split(self.v_linear(x))

    def attend_with_kv(self, q, kh, vh, mask=None, deterministic: bool = True):
        """Query against precomputed K/V heads."""
        qh = self._split(self.q_linear(q))
        if self.use_pallas and _pallas_attention_applicable(
                mask, deterministic, self.dropout, False, qh.shape[2]):
            from gctplus_tpu.ops.flash_attention import fused_attention
            ctx = fused_attention(qh, kh, vh, mask)
            return self.out(self._merge(ctx))
        ctx, _ = scaled_dot_attention(
            qh, kh, vh, mask, self.attn_drop, deterministic, self.dtype)
        return self.out(self._merge(ctx))


class FeedForward(nn.Module):
    """Linear -> GELU -> dropout -> Linear (sublayers.py:77-89).

    With use_fused on a TPU backend, apply-time calls route through
    ops/fused_ffn.py (custom-vjp Pallas kernel whose backward
    recomputes the (tokens, d_ff) hidden tile-resident in VMEM
    instead of round-tripping it through HBM — see the train-step
    roofline in EVIDENCE.md).  Param tree, init, and deterministic
    numerics are identical to the XLA path; dropout draws its mask
    from the in-kernel TPU PRNG seeded per (layer-call, tile)."""

    d_model: int
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_fused: bool = False

    def setup(self):
        self.linear_1 = nn.Dense(
            self.d_ff, dtype=self.dtype, param_dtype=jnp.float32, precision=matmul_precision(self.dtype),
            kernel_init=nn.initializers.glorot_uniform(), name="linear_1")
        self.linear_2 = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, precision=matmul_precision(self.dtype),
            kernel_init=nn.initializers.glorot_uniform(), name="linear_2")
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, deterministic: bool = True):
        if self.use_fused and not self.is_initializing():
            from gctplus_tpu.ops.fused_ffn import (fused_ffn,
                                                   fused_ffn_applicable)
            if fused_ffn_applicable(self.d_model, self.d_ff):
                p = self.variables["params"]
                use_drop = not deterministic and self.dropout > 0.0
                seed = (jax.random.bits(self.make_rng("dropout"), (1,),
                                        "uint32").astype(jnp.int32)
                        if use_drop else jnp.zeros((1,), jnp.int32))
                return fused_ffn(
                    x.astype(self.dtype), p["linear_1"]["kernel"],
                    p["linear_1"]["bias"], p["linear_2"]["kernel"],
                    p["linear_2"]["bias"], seed, rate=self.dropout,
                    deterministic=deterministic)
        # torch F.gelu is the exact (erf) gelu.
        x = nn.gelu(self.linear_1(x), approximate=False)
        x = self.drop(x, deterministic=deterministic)
        return self.linear_2(x)


class EncoderLayer(nn.Module):
    """Pre-norm block: norm->selfattn->res; norm->ffn->res (layers.py:8-38)."""

    heads: int
    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_fused_ffn: bool = False
    use_blhd: bool = False

    def setup(self):
        self.norm_1 = Norm(self.d_model, dtype=self.dtype)
        self.attn = MultiHeadAttention(self.heads, self.d_model, self.dropout, self.dtype,
                                       use_pallas=self.use_pallas,
                                       use_blhd=self.use_blhd)
        self.norm_2 = Norm(self.d_model, dtype=self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype,
                              use_fused=self.use_fused_ffn)
        self.drop_1 = nn.Dropout(rate=self.dropout)
        self.drop_2 = nn.Dropout(rate=self.dropout)

    def __call__(self, x, mask, deterministic: bool = True, return_attn: bool = False):
        # Reference quirk (Model/layers.py:23-34): the encoder block
        # reassigns x to the *normed* value before each residual add,
        # so the residual base is norm(x), not x (unlike the decoder).
        x = self.norm_1(x)
        if return_attn:
            a, w = self.attn(x, x, x, mask, deterministic, return_attn=True)
        else:
            a = self.attn(x, x, x, mask, deterministic)
            w = None
        x = x + self.drop_1(a, deterministic=deterministic)
        x = self.norm_2(x)
        x = x + self.drop_2(self.ff(x, deterministic), deterministic=deterministic)
        if return_attn:
            return x, w
        return x


class DecoderLayer(nn.Module):
    """Pre-norm block: masked self-attn, cross-attn, ffn (layers.py:41-82)."""

    heads: int
    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_fused_ffn: bool = False
    use_blhd: bool = False

    def setup(self):
        self.norm_1 = Norm(self.d_model, dtype=self.dtype)
        self.attn_1 = MultiHeadAttention(self.heads, self.d_model, self.dropout, self.dtype,
                                         use_pallas=self.use_pallas,
                                         use_blhd=self.use_blhd)
        self.norm_2 = Norm(self.d_model, dtype=self.dtype)
        self.attn_2 = MultiHeadAttention(self.heads, self.d_model, self.dropout, self.dtype,
                                         use_pallas=self.use_pallas,
                                         use_blhd=self.use_blhd)
        self.norm_3 = Norm(self.d_model, dtype=self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype,
                              use_fused=self.use_fused_ffn)
        self.drop_1 = nn.Dropout(rate=self.dropout)
        self.drop_2 = nn.Dropout(rate=self.dropout)
        self.drop_3 = nn.Dropout(rate=self.dropout)

    def __call__(self, x, memory, src_mask, trg_mask, deterministic: bool = True,
                 return_attn: bool = False):
        h = self.norm_1(x)
        if return_attn:
            a1, w1 = self.attn_1(h, h, h, trg_mask, deterministic, return_attn=True)
        else:
            a1 = self.attn_1(h, h, h, trg_mask, deterministic)
            w1 = None
        x = x + self.drop_1(a1, deterministic=deterministic)
        h = self.norm_2(x)
        if return_attn:
            a2, w2 = self.attn_2(h, memory, memory, src_mask, deterministic, return_attn=True)
        else:
            a2 = self.attn_2(h, memory, memory, src_mask, deterministic)
            w2 = None
        x = x + self.drop_2(a2, deterministic=deterministic)
        h = self.norm_3(x)
        x = x + self.drop_3(self.ff(h, deterministic), deterministic=deterministic)
        if return_attn:
            return x, w1, w2
        return x

    # --- incremental-decode path --------------------------------------
    def step(self, x, pos, self_k, self_v, mem_k, mem_v, self_len_mask, src_mask,
             deterministic: bool = True):
        """One-token decode step.

        x: (bs, 1, d) current-token activations.
        self_k/self_v: (bs, h, T, dk) KV cache, position `pos` already
        holding this token's K/V (written by the caller).
        self_len_mask: (bs, 1, T) True for cache positions <= pos.
        src_mask: (bs, 1, Lmem) memory padding mask.
        """
        h = self.norm_1(x)
        a1 = self.attn_1.attend_with_kv(h, self_k, self_v, self_len_mask, deterministic)
        x = x + self.drop_1(a1, deterministic=deterministic)
        h = self.norm_2(x)
        a2 = self.attn_2.attend_with_kv(h, mem_k, mem_v, src_mask, deterministic)
        x = x + self.drop_2(a2, deterministic=deterministic)
        h = self.norm_3(x)
        x = x + self.drop_3(self.ff(h, deterministic), deterministic=deterministic)
        return x

    def self_kv(self, x):
        """K/V heads of the (normed) current token for cache insertion."""
        h = self.norm_1(x)
        return self.attn_1.project_kv(h)

    def cross_kv(self, memory):
        return self.attn_2.project_kv(memory)
