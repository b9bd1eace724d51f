"""Transformer-CVAE model family (TPU-native re-design of GCT-Plus).

Two model classes mirror the reference checkpoint layouts:

- `Vaetf` (reference Model/vaetf.py:117): unconditioned VAE whose
  latent heads live in a top-level `sampler` module. (The reference
  encoder also *contains* unused fc_mu/fc_log_var heads — those rows
  are ignored by the converter.)
- `Cvaetf` (reference Model/cvaetf.py:136): conditional VAE whose
  latent heads are folded into the encoder; scalar conditions are
  embedded as `nconds` prefix tokens on the encoder input
  (cvaetf.py:38-41) and, with `use_cond2lat`, on the decoder's latent
  memory with a widened source mask (cvaetf.py:107-117).

All variants (vaetf/pvaetf/scavaetf/pscavaetf) are these two classes
at different (nconds, use_cond2lat) settings; scaffold conditioning is
pure data plumbing (a `<sep>`-joined token prefix, Model/collate_fn.py:104-117).

Beyond the reference, the decoder exposes an incremental path
(`prepare_memory` / `prefill` / `step`) used by the KV-cached
`lax.while_loop` sampler — the reference re-runs the full decoder per
generated token (Inference/sampling_tool.py:140-184).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gctplus_tpu.models.layers import (
    DecoderLayer,
    Embeddings,
    EncoderLayer,
    Norm,
    PositionalEncoding,
    matmul_precision,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    src_vocab: int
    trg_vocab: int
    N: int = 6
    d_model: int = 512
    d_ff: int = 2048
    heads: int = 8
    latent_dim: int = 128
    dropout: float = 0.1
    nconds: int = 0
    use_cond2dec: bool = False
    use_cond2lat: bool = False
    variational: bool = True
    max_seq_len: int = 200
    dtype: Any = jnp.float32
    # fused Pallas attention on deterministic multi-token paths
    # (ops/flash_attention.py); XLA fallback elsewhere
    use_pallas_attention: bool = False
    # fused FFN with HBM-free backward (ops/fused_ffn.py) — the train
    # hot path's byte-reduction kernel; TPU-only, opt-in
    use_fused_ffn: bool = False
    # transpose-free (bs, L, h, dk) attention layout on batch paths
    # (models/layers.py::scaled_dot_attention_blhd); opt-in pending
    # the on-chip A/B
    attn_blhd: bool = False

    @property
    def d_k(self) -> int:
        return self.d_model // self.heads


class Encoder(nn.Module):
    """Embed (+cond prefix) -> PE -> N layers -> Norm [-> mu/logvar]."""

    cfg: ModelConfig
    with_latent_heads: bool

    def setup(self):
        c = self.cfg
        self.embed_sentence = Embeddings(c.src_vocab, c.d_model, c.dtype)
        if c.nconds > 0:
            self.embed_cond2enc = nn.Dense(
                c.d_model * c.nconds, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())
        self.pe = PositionalEncoding(c.d_model, c.max_seq_len, c.dropout, c.dtype)
        self.layers = [
            EncoderLayer(c.heads, c.d_model, c.d_ff, c.dropout, c.dtype,
                         use_pallas=c.use_pallas_attention,
                         use_fused_ffn=c.use_fused_ffn,
                         use_blhd=c.attn_blhd)
            for _ in range(c.N)
        ]
        self.norm = Norm(c.d_model, dtype=c.dtype)
        if self.with_latent_heads:
            self.fc_mu = nn.Dense(
                c.latent_dim, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())
            self.fc_log_var = nn.Dense(
                c.latent_dim, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())

    def __call__(self, src, src_mask, econds=None, deterministic: bool = True,
                 return_attn: bool = False):
        c = self.cfg
        x = self.embed_sentence(src)
        if c.nconds > 0:
            cond = self.embed_cond2enc(econds.astype(c.dtype))
            cond = cond.reshape(econds.shape[0], c.nconds, c.d_model)
            x = jnp.concatenate([cond, x], axis=1)
        x = self.pe(x, deterministic=deterministic)
        attns = []
        for layer in self.layers:
            if return_attn:
                x, w = layer(x, src_mask, deterministic, return_attn=True)
                attns.append(w)
            else:
                x = layer(x, src_mask, deterministic)
        x = self.norm(x)
        if self.with_latent_heads:
            out = (self.fc_mu(x), self.fc_log_var(x))
        else:
            out = x
        if return_attn:
            return out, attns
        return out


class Sampler(nn.Module):
    """Top-level latent heads for Vaetf (reference Model/sublayers.py:7-26)."""

    d_model: int
    latent_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fc_mu = nn.Dense(
            self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
            kernel_init=nn.initializers.glorot_uniform())
        self.fc_log_var = nn.Dense(
            self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
            kernel_init=nn.initializers.glorot_uniform())

    def __call__(self, x):
        return self.fc_mu(x), self.fc_log_var(x)


def reparameterize(mu, log_var, eps):
    """z = mu + eps * exp(0.5*logvar) (sublayers.py:14-18)."""
    return mu + eps * jnp.exp(0.5 * log_var)


class Decoder(nn.Module):
    """Embed trg -> fc_z(z) [+cond2lat prefix] -> PE -> N layers -> Norm.

    Parity: Model/cvaetf.py:72-133. Also implements the incremental
    KV-cache path for fast sampling.
    """

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.embed = Embeddings(c.trg_vocab, c.d_model, c.dtype)
        if c.use_cond2dec and c.nconds > 0:
            self.embed_cond2dec = nn.Dense(
                c.d_model * c.nconds, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())
        if c.use_cond2lat and c.nconds > 0:
            self.embed_cond2lat = nn.Dense(
                c.d_model * c.nconds, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())
        self.pe = PositionalEncoding(c.d_model, c.max_seq_len, c.dropout, c.dtype)
        self.fc_z = nn.Dense(
            c.d_model, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
            kernel_init=nn.initializers.glorot_uniform())
        self.layers = [
            DecoderLayer(c.heads, c.d_model, c.d_ff, c.dropout, c.dtype,
                         use_pallas=c.use_pallas_attention,
                         use_fused_ffn=c.use_fused_ffn,
                         use_blhd=c.attn_blhd)
            for _ in range(c.N)
        ]
        self.norm = Norm(c.d_model, dtype=c.dtype)

    def _memory_and_mask(self, z, src_mask, dconds):
        """fc_z projection plus the cond2lat prefix + mask widening."""
        c = self.cfg
        mem = self.fc_z(z.astype(c.dtype))
        if c.use_cond2lat and c.nconds > 0:
            cond = self.embed_cond2lat(dconds.astype(c.dtype))
            cond = cond.reshape(dconds.shape[0], c.nconds, c.d_model)
            mem = jnp.concatenate([cond, mem], axis=1)
            cond_mask = jnp.ones((src_mask.shape[0], 1, c.nconds), dtype=bool)
            src_mask = jnp.concatenate([cond_mask, src_mask], axis=2)
        return mem, src_mask

    def __call__(self, trg, z, src_mask, trg_mask, dconds=None,
                 deterministic: bool = True, return_attn: bool = False):
        c = self.cfg
        x = self.embed(trg)
        if c.use_cond2dec and c.nconds > 0:
            cond = self.embed_cond2dec(dconds.astype(c.dtype))
            cond = cond.reshape(dconds.shape[0], c.nconds, c.d_model)
            x = jnp.concatenate([cond, x], axis=1)
            mem = self.fc_z(z.astype(c.dtype))
        else:
            mem, src_mask = self._memory_and_mask(z, src_mask, dconds)
        x = self.pe(x, deterministic=deterministic)
        attns_self, attns_cross = [], []
        for layer in self.layers:
            if return_attn:
                x, w1, w2 = layer(x, mem, src_mask, trg_mask, deterministic,
                                  return_attn=True)
                attns_self.append(w1)
                attns_cross.append(w2)
            else:
                x = layer(x, mem, src_mask, trg_mask, deterministic)
        x = self.norm(x)
        if return_attn:
            return x, attns_self, attns_cross
        return x

    # ------------------------------------------------------------------
    # Incremental decode path (no reference counterpart; the TPU win).
    # Supported for use_cond2dec=False (all trained variants).
    # ------------------------------------------------------------------
    def prepare_memory(self, z, src_mask, dconds=None):
        """Precompute per-layer cross-attention K/V once per sample call.

        Returns (mem_kvs, widened_src_mask); mem_kvs is a tuple of
        (k, v) pairs, one per layer, each (bs, h, Lmem, dk).
        """
        mem, src_mask = self._memory_and_mask(z, src_mask, dconds)
        kvs = tuple(layer.cross_kv(mem) for layer in self.layers)
        return kvs, src_mask

    def prefill(self, prefix, prefix_len_mask, mem_kvs, src_mask,
                cache_len: int, deterministic: bool = True):
        """Run a (right-padded) prefix through the decoder, filling the
        self-attention KV cache.

        prefix: (bs, P) token ids; prefix_len_mask: (bs, P) True for
        real tokens.  Returns (x_all, self_kvs) where self_kvs is a
        per-layer tuple of (k, v), each (bs, h, cache_len, dk) with
        positions [0, P) filled.
        """
        c = self.cfg
        bs, P = prefix.shape
        x = self.embed(prefix)
        x = self.pe(x, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((P, P), dtype=bool))[None]
        self_mask = causal & prefix_len_mask[:, None, :]
        self_kvs = []
        for i, layer in enumerate(self.layers):
            k, v = layer.self_kv(x)  # (bs, h, P, dk)
            kc = jnp.zeros((bs, c.heads, cache_len, c.d_k), c.dtype)
            vc = jnp.zeros_like(kc)
            kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, 0, 0))
            self_kvs.append((kc, vc))
            x = self._prefill_layer(
                layer, x, self_mask, mem_kvs[i][0], mem_kvs[i][1], src_mask,
                deterministic)
        x = self.norm(x)
        return x, tuple(self_kvs)

    @staticmethod
    def _prefill_layer(layer, x, self_mask, mem_k, mem_v, src_mask, deterministic):
        h = layer.norm_1(x)
        a1 = layer.attn_1(h, h, h, self_mask, deterministic)
        x = x + layer.drop_1(a1, deterministic=deterministic)
        h = layer.norm_2(x)
        a2 = layer.attn_2.attend_with_kv(h, mem_k, mem_v, src_mask, deterministic)
        x = x + layer.drop_2(a2, deterministic=deterministic)
        h = layer.norm_3(x)
        x = x + layer.drop_3(layer.ff(h, deterministic), deterministic=deterministic)
        return x

    def step(self, token, pos, self_kvs, mem_kvs, src_mask,
             deterministic: bool = True):
        """One decode step at (traced) position `pos`.

        token: (bs,) ids of the token at `pos`. self_kvs/mem_kvs are
        per-layer tuples of (k, v). Returns (x_out (bs,1,d),
        new self_kvs).
        """
        c = self.cfg
        bs = token.shape[0]
        cache_len = self_kvs[0][0].shape[2]
        x = self.embed(token[:, None])
        x = self.pe.at_position(x, pos)
        positions = jnp.arange(cache_len)
        len_mask = (positions <= pos)[None, None, :]          # (1,1,T)
        len_mask = jnp.broadcast_to(len_mask, (bs, 1, cache_len))
        new_kvs = []
        for i, layer in enumerate(self.layers):
            k1, v1 = layer.self_kv(x)  # (bs, h, 1, dk)
            kc = jax.lax.dynamic_update_slice(
                self_kvs[i][0], k1, (0, 0, pos, 0))
            vc = jax.lax.dynamic_update_slice(
                self_kvs[i][1], v1, (0, 0, pos, 0))
            new_kvs.append((kc, vc))
            x = layer.step(x, pos, kc, vc, mem_kvs[i][0], mem_kvs[i][1],
                           len_mask, src_mask, deterministic)
        x = self.norm(x)
        return x, tuple(new_kvs)

    # ------------------------------------------------------------------
    # Fused packed-cache decode path (ops/decode_attention.py).
    #
    # KV caches live PACKED as (bs, T, d_model) — lane-exact bf16
    # tiles, vs the (bs, h, T, dk=64) layout whose minor dim pads to
    # 128 lanes and doubles HBM traffic (see the kernel module
    # docstring for the measured breakdown).
    # ------------------------------------------------------------------
    def prepare_memory_packed(self, z, src_mask, dconds=None):
        """(mem_kvs packed per layer, lengths (bs,) int32).

        The cross mask is always a contiguous prefix here: an optional
        all-valid cond2lat block then positions < toklen
        (sampling_tool.py:93-97,257), so a per-row length carries it.
        """
        mem, src_mask = self._memory_and_mask(z, src_mask, dconds)
        kvs = tuple((layer.attn_2.k_linear(mem), layer.attn_2.v_linear(mem))
                    for layer in self.layers)
        lengths = jnp.sum(src_mask[:, 0, :].astype(jnp.int32), axis=-1)
        return kvs, lengths

    def prefill_packed(self, prefix, prefix_len_mask, mem_kvs, mem_lengths,
                       cache_len: int, deterministic: bool = True):
        """Like prefill() but emits packed T-MAJOR (T, bs, d_model)
        caches (the fused kernel's layout: the per-step row write and
        block column reads stay tile-aligned) and consumes packed
        memory K/V + per-row lengths."""
        c = self.cfg
        bs, P = prefix.shape
        x = self.embed(prefix)
        x = self.pe(x, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((P, P), dtype=bool))[None]
        self_mask = causal & prefix_len_mask[:, None, :]
        Lm = mem_kvs[0][0].shape[1]
        src_mask = (jnp.arange(Lm)[None, None, :]
                    < mem_lengths[:, None, None])
        self_kvs = []
        for i, layer in enumerate(self.layers):
            h = layer.norm_1(x)
            k = layer.attn_1.k_linear(h)                 # (bs, P, D)
            v = layer.attn_1.v_linear(h)
            kc = jnp.zeros((cache_len, bs, c.d_model), c.dtype)
            vc = jnp.zeros_like(kc)
            kc = jax.lax.dynamic_update_slice(
                kc, jnp.transpose(k, (1, 0, 2)), (0, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, jnp.transpose(v, (1, 0, 2)), (0, 0, 0))
            self_kvs.append((kc, vc))
            x = self._prefill_layer_packed(
                layer, x, h, k, v, self_mask, mem_kvs[i][0], mem_kvs[i][1],
                src_mask, deterministic)
        x = self.norm(x)
        return x, tuple(self_kvs)

    @staticmethod
    def _prefill_layer_packed(layer, x, h, k, v, self_mask, mem_k, mem_v,
                              src_mask, deterministic):
        """Prefill attention over the (short) prefix using the packed
        projections; head split is a local reshape."""
        from gctplus_tpu.models.layers import scaled_dot_attention

        a = layer.attn_1
        qh = a._split(a.q_linear(h))
        ctx, _ = scaled_dot_attention(qh, a._split(k), a._split(v),
                                      self_mask, a.attn_drop, deterministic,
                                      a.dtype)
        x = x + layer.drop_1(a.out(a._merge(ctx)), deterministic=deterministic)
        h2 = layer.norm_2(x)
        a2 = layer.attn_2
        qh2 = a2._split(a2.q_linear(h2))
        ctx2, _ = scaled_dot_attention(qh2, a2._split(mem_k), a2._split(mem_v),
                                       src_mask, a2.attn_drop, deterministic,
                                       a2.dtype)
        x = x + layer.drop_2(a2.out(a2._merge(ctx2)),
                             deterministic=deterministic)
        h3 = layer.norm_3(x)
        x = x + layer.drop_3(layer.ff(h3, deterministic),
                             deterministic=deterministic)
        return x

    def step_packed(self, token, pos, self_kvs, mem_kvs, mem_lengths,
                    deterministic: bool = True, interpret: bool = False):
        """Fused-kernel decode step on packed caches.

        token: (bs,) ids at `pos`; self_kvs per-layer packed
        (bs, T, D) pairs (donated/aliased through the kernel);
        mem_lengths: (bs,) int32. Returns (x (bs,1,D), new self_kvs).
        """
        from gctplus_tpu.ops.decode_attention import (cross_attention_step,
                                                      self_attention_step)
        c = self.cfg
        bs = token.shape[0]
        block_b = 32 if bs % 32 == 0 else max(
            b for b in (16, 8, 4, 2, 1) if bs % b == 0)
        x = self.embed(token[:, None])
        x = self.pe.at_position(x, pos)
        new_kvs = []
        for i, layer in enumerate(self.layers):
            h = layer.norm_1(x)
            a1 = layer.attn_1
            q1 = a1.q_linear(h)
            k1 = a1.k_linear(h)
            v1 = a1.v_linear(h)
            # T-major row update: a contiguous (bs, D) slab, cheap and
            # alias-friendly inside the sampling while_loop
            kc = jax.lax.dynamic_update_slice(
                self_kvs[i][0], jnp.transpose(k1, (1, 0, 2)), (pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                self_kvs[i][1], jnp.transpose(v1, (1, 0, 2)), (pos, 0, 0))
            ctx = self_attention_step(
                pos, q1, kc, vc, heads=c.heads, block_b=block_b,
                interpret=interpret)
            new_kvs.append((kc, vc))
            x = x + layer.drop_1(a1.out(ctx), deterministic=deterministic)
            h2 = layer.norm_2(x)
            a2 = layer.attn_2
            ctx2 = cross_attention_step(
                a2.q_linear(h2), mem_kvs[i][0], mem_kvs[i][1], mem_lengths,
                heads=c.heads, block_b=block_b, interpret=interpret)
            x = x + layer.drop_2(a2.out(ctx2), deterministic=deterministic)
            h3 = layer.norm_3(x)
            x = x + layer.drop_3(layer.ff(h3, deterministic),
                                 deterministic=deterministic)
        x = self.norm(x)
        return x, tuple(new_kvs)

    def step_mega(self, token, pos, self_kvs, mem_kvs, mem_lengths,
                  deterministic: bool = True, interpret: bool = False):
        """Megakernel decode step: ONE pallas_call per layer
        (ops/decoder_step.py) instead of ~15 XLA ops + 2 attention
        kernels.  Same packed layouts as step_packed, but the cache T
        must be a multiple of 8 and the memory Tm a multiple of 16
        (DecodeEngine pads both for this path).  The kernel computes
        the current token's K/V internally and returns the rows; the
        cache row update stays here in XLA."""
        from gctplus_tpu.ops.decoder_step import (decoder_layer_step,
                                                  layer_weights_from_params)
        c = self.cfg
        x = self.embed(token[:, None])
        x = self.pe.at_position(x, pos)[:, 0, :]          # (bs, D)
        new_kvs = []
        for i, layer in enumerate(self.layers):
            w = layer_weights_from_params(
                {"attn_1": layer.attn_1.variables["params"],
                 "attn_2": layer.attn_2.variables["params"],
                 "ff": layer.ff.variables["params"],
                 "norm_1": layer.norm_1.variables["params"],
                 "norm_2": layer.norm_2.variables["params"],
                 "norm_3": layer.norm_3.variables["params"]},
                c.dtype)
            x, k_row, v_row = decoder_layer_step(
                x, pos, self_kvs[i][0], self_kvs[i][1],
                mem_kvs[i][0], mem_kvs[i][1], mem_lengths, w,
                heads=c.heads, interpret=interpret)
            kc = jax.lax.dynamic_update_slice(
                self_kvs[i][0], k_row[None], (pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                self_kvs[i][1], v_row[None], (pos, 0, 0))
            new_kvs.append((kc, vc))
        x = self.norm(x[:, None, :])
        return x, tuple(new_kvs)


class _BaseVAE(nn.Module):
    """Shared forward/encode/decode plumbing."""

    cfg: ModelConfig

    def _latent_heads(self, enc_out):  # pragma: no cover - overridden
        raise NotImplementedError

    def _sample_eps(self, shape, eps):
        if not self.cfg.variational:
            return None
        if eps is None:
            eps = jax.random.normal(self.make_rng("sample"), shape, jnp.float32)
        return eps

    def encode(self, src, src_mask, econds=None, eps=None,
               deterministic: bool = True):
        mu, log_var = self._latent_heads(
            self.encoder(src, src_mask, econds, deterministic))
        if self.cfg.variational:
            eps = self._sample_eps(mu.shape, eps)
            z = reparameterize(mu, log_var, eps)
        else:
            z = mu
        return z, mu, log_var

    def decode(self, trg, z, src_mask, trg_mask, dconds=None,
               deterministic: bool = True):
        x = self.decoder(trg, z, src_mask, trg_mask, dconds, deterministic)
        return self.out(x)

    def __call__(self, src, trg, src_mask, trg_mask, econds=None, dconds=None,
                 eps=None, deterministic: bool = True):
        c = self.cfg
        z, mu, log_var = self.encode(src, src_mask, econds, eps, deterministic)
        x = self.decoder(trg, z, src_mask, trg_mask, dconds, deterministic)
        output = self.out(x)
        if c.use_cond2dec and c.nconds > 0:
            output_prop = self.prop_fc(output[:, : c.nconds, :])
            output_mol = output[:, c.nconds:, :]
        else:
            output_prop = jnp.zeros((output.shape[0], c.nconds, 1), output.dtype)
            output_mol = output
        return output_prop, output_mol, mu, log_var, z

    def attention_maps(self, src, trg, src_mask, trg_mask, econds=None,
                       dconds=None):
        """Per-layer attention weights for visualization (reference
        get_attention_map, sampling_tool.py:191-223: decodes from mu).
        Returns (encoder_attns, decoder_self_attns, decoder_cross_attns),
        each a list of (bs, heads, Lq, Lk) arrays."""
        out, enc_attns = self.encoder(src, src_mask, econds,
                                      deterministic=True, return_attn=True)
        mu, _ = self._latent_heads(out)
        _, self_attns, cross_attns = self.decoder(
            trg, mu, src_mask, trg_mask, dconds, deterministic=True,
            return_attn=True)
        return enc_attns, self_attns, cross_attns

    # --- incremental decode wrappers (used via nn.apply(method=...)) ---
    def prepare_memory(self, z, src_mask, dconds=None):
        return self.decoder.prepare_memory(z, src_mask, dconds)

    def decode_prefill(self, prefix, prefix_len_mask, mem_kvs, src_mask,
                       cache_len: int, deterministic: bool = True):
        x, self_kvs = self.decoder.prefill(
            prefix, prefix_len_mask, mem_kvs, src_mask, cache_len,
            deterministic)
        return self.out(x), self_kvs

    def decode_step(self, token, pos, self_kvs, mem_kvs,
                    src_mask, deterministic: bool = True):
        x, self_kvs = self.decoder.step(
            token, pos, self_kvs, mem_kvs, src_mask, deterministic)
        return self.out(x)[:, 0, :], self_kvs

    # --- fused packed-cache variants (ops/decode_attention.py) ---------
    def prepare_memory_packed(self, z, src_mask, dconds=None):
        return self.decoder.prepare_memory_packed(z, src_mask, dconds)

    def decode_prefill_packed(self, prefix, prefix_len_mask, mem_kvs,
                              mem_lengths, cache_len: int,
                              deterministic: bool = True):
        x, self_kvs = self.decoder.prefill_packed(
            prefix, prefix_len_mask, mem_kvs, mem_lengths, cache_len,
            deterministic)
        return self.out(x), self_kvs

    def decode_step_packed(self, token, pos, self_kvs, mem_kvs,
                           mem_lengths, deterministic: bool = True,
                           interpret: bool = False):
        x, self_kvs = self.decoder.step_packed(
            token, pos, self_kvs, mem_kvs, mem_lengths, deterministic,
            interpret)
        return self.out(x)[:, 0, :], self_kvs

    def decode_step_mega(self, token, pos, self_kvs, mem_kvs,
                         mem_lengths, deterministic: bool = True,
                         interpret: bool = False):
        x, self_kvs = self.decoder.step_mega(
            token, pos, self_kvs, mem_kvs, mem_lengths, deterministic,
            interpret)
        return self.out(x)[:, 0, :], self_kvs


class Vaetf(_BaseVAE):
    """Unconditioned VAE; latent heads in a top-level sampler module."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        assert c.nconds == 0, "vaetf is the unconditioned variant"
        self.encoder = Encoder(c, with_latent_heads=False)
        self.decoder = Decoder(c)
        self.sampler = Sampler(c.d_model, c.latent_dim, c.dtype)
        self.out = nn.Dense(
            c.trg_vocab, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
            kernel_init=nn.initializers.glorot_uniform())

    def _latent_heads(self, enc_out):
        return self.sampler(enc_out)


class Cvaetf(_BaseVAE):
    """Conditional VAE; latent heads folded into the encoder."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c, with_latent_heads=True)
        self.decoder = Decoder(c)
        if c.use_cond2dec and c.nconds > 0:
            self.prop_fc = nn.Dense(
                1, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
                kernel_init=nn.initializers.glorot_uniform())
        self.out = nn.Dense(
            c.trg_vocab, dtype=c.dtype, param_dtype=jnp.float32, precision=matmul_precision(c.dtype),
            kernel_init=nn.initializers.glorot_uniform())

    def _latent_heads(self, enc_out):
        return enc_out  # encoder already returned (mu, log_var)
