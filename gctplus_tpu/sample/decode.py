"""KV-cached autoregressive decode engine.

This replaces the reference's hot loop (Inference/sampling_tool.py:140-184)
which re-runs the FULL decoder over the whole prefix for every emitted
token with a per-step host sync on the eos check — the #1 cost in every
sampling task. TPU-native design:

- one `prefill` pass fills the per-layer self-attention KV cache for
  the start prefix (`<sos>` [+ scaffold + `<sep>`]),
- cross-attention K/V over the latent memory are computed once
  (they depend only on z and the conditions),
- a `lax.while_loop` then emits one token per step — O(1) work per
  token instead of O(L) decoder re-runs — with the all-rows-finished
  break evaluated on device, no host round trips,
- everything is shape-static: the token buffer is
  `prefix_bucket + max_new` wide, generated tokens are placed
  compactly so positional encodings match the reference exactly.

Decoding algorithms match Inference/sampling_tool.py:
greedy argmax, multinomial, and the top-k probability filter
(`top_k_logits`, sampling_tool.py:12-16) that clamps non-top-k
probabilities to 1e-6 before renormalized sampling.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gctplus_tpu.models.cvaetf import ModelConfig


def top_k_filter_probs(probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Clamp probabilities below the k-th largest to 1e-6
    (parity: sampling_tool.py:12-16; multinomial renormalizes)."""
    kth = jax.lax.top_k(probs, k)[0][..., -1:]
    return jnp.where(probs < kth, 1e-6, probs)


def _sample_next(logits, rng, decode_algo: str, top_k: Optional[int]):
    """logits (bs, V) -> token ids (bs,)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if top_k is not None:
        probs = top_k_filter_probs(probs, top_k)
    if decode_algo == "greedy":
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)
    if decode_algo == "multinomial":
        return jax.random.categorical(rng, jnp.log(probs), axis=-1).astype(jnp.int32)
    raise ValueError(f"unknown decode_algo: {decode_algo}")


class DecodeEngine:
    """Caches jitted samplers keyed by static shapes.

    One engine per (model, params are passed per call). Usage:

        eng = DecodeEngine(model, cfg, eos_id=3, pad_id=1)
        tokens = eng.sample(params, prefix, prefix_len, z, src_mask,
                            dconds, rng, max_new=79,
                            decode_algo="multinomial", top_k=None)
    """

    def __init__(self, model, cfg: ModelConfig, fused=None):
        """fused: None = auto (decoder-layer MEGAKERNEL on real TPU,
        XLA path on cpu/gpu); True/False force the per-attention fused
        kernels / XLA; "interpret" runs the fused kernels in the
        Pallas interpreter (CPU tests); "mega" forces the
        whole-decoder-layer megakernel (ops/decoder_step.py, one
        pallas_call per layer per token); "mega_interpret" is its
        CPU-interpreter variant. Env GCTPLUS_DECODE_PATH
        ({mega,fused,xla}) overrides the auto choice — useful to pin a
        long eval run to a specific path.

        Measured at flagship shape bs=512 (probe_mega_ab.py, quiet
        chip): XLA 3.89 ms/step, fused attention kernels 2.25 ms,
        megakernel 1.89 ms — and the megakernel is markedly more
        robust to chip sharing (fewer, longer kernels). The fused path
        (ops/decode_attention.py) stores KV caches packed
        (bs, T, d_model) — ~2.5x fewer HBM bytes and ~50x fewer ops
        per emitted token than the XLA step (EVIDENCE.md decode
        breakdown); the megakernel folds each layer's ~15 remaining
        ops into one call."""
        self.model = model
        self.cfg = cfg
        if fused is None:
            env = os.environ.get("GCTPLUS_DECODE_PATH")
            if env:
                fused = {"mega": "mega", "fused": True, "xla": False}[env]
            else:
                # whitelist TPU-like backends (see layers.py
                # _pallas_attention_applicable)
                on_tpu = jax.default_backend() in ("tpu", "axon")
                fused = "mega" if on_tpu else False
        self.fused = fused
        self._jitted: Dict[Tuple, Any] = {}

    # -----------------------------------------------------------------
    def _build(self, prefix_bucket: int, lat_len: int, max_new: int,
               decode_algo: str, top_k: Optional[int], eos_id: int,
               pad_id: int, has_conds: bool, prior: bool = False):
        model, cfg = self.model, self.cfg
        cache_len = prefix_bucket + max_new
        fused = bool(self.fused)
        mega = self.fused in ("mega", "mega_interpret")
        interpret = self.fused in ("interpret", "mega_interpret")
        if mega:
            # megakernel stream-chunk alignment (ops/decoder_step.py):
            # cache T to a multiple of 8; rows >= pos are masked so the
            # pad is dead weight the clamp never reads
            cache_len = -(-cache_len // 8) * 8

        def sampler(params, prefix, prefix_len, z, src_mask, dconds, rng):
            bs = prefix.shape[0]
            variables = {"params": params}

            if fused:
                mem_kvs, mem_lengths = model.apply(
                    variables, z, src_mask, dconds,
                    method=type(model).prepare_memory_packed)
                if mega:
                    # memory Tm to a multiple of 16; padded cols sit
                    # beyond every row's length and are never read
                    Tm = mem_kvs[0][0].shape[1]
                    Tm_pad = -(-Tm // 16) * 16
                    if Tm_pad != Tm:
                        pad = ((0, 0), (0, Tm_pad - Tm), (0, 0))
                        mem_kvs = tuple(
                            (jnp.pad(k, pad), jnp.pad(v, pad))
                            for k, v in mem_kvs)
            else:
                mem_kvs, wide_src_mask = model.apply(
                    variables, z, src_mask, dconds,
                    method=type(model).prepare_memory)

            prefix_positions = jnp.arange(prefix_bucket)[None, :]
            prefix_len_mask = prefix_positions < prefix_len

            if fused:
                prefill_logits, self_kvs = model.apply(
                    variables, prefix, prefix_len_mask, mem_kvs,
                    mem_lengths, cache_len,
                    method=type(model).decode_prefill_packed)
            else:
                prefill_logits, self_kvs = model.apply(
                    variables, prefix, prefix_len_mask, mem_kvs,
                    wide_src_mask, cache_len,
                    method=type(model).decode_prefill)

            # token buffer, compact layout: [0, prefix_len) prefix,
            # generation continues at prefix_len
            tokens = jnp.full((bs, cache_len), pad_id, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, prefix, (0, 0))

            # first new token from the last real prefix position
            last_idx = prefix_len - 1
            first_logits = jnp.take_along_axis(
                prefill_logits, last_idx[None, None, None].astype(jnp.int32)
                * jnp.ones((bs, 1, 1), jnp.int32), axis=1)[:, 0, :]
            rng, sub = jax.random.split(rng)
            first_tok = _sample_next(first_logits, sub, decode_algo, top_k)
            bidx = jnp.arange(bs)
            tokens = tokens.at[bidx, prefix_len].set(first_tok)
            finished = first_tok == eos_id
            cur_len = prefix_len + 1

            def cond_fn(carry):
                tokens, cur_len, finished, kvs, rng = carry
                return (cur_len < prefix_len + max_new) & ~jnp.all(finished)

            def body_fn(carry):
                tokens, cur_len, finished, kvs, rng = carry
                last_tok = tokens[bidx, cur_len - 1]
                if mega:
                    logits, kvs = model.apply(
                        {"params": params}, last_tok, cur_len - 1, kvs,
                        mem_kvs, mem_lengths, True, interpret,
                        method=type(model).decode_step_mega)
                elif fused:
                    logits, kvs = model.apply(
                        {"params": params}, last_tok, cur_len - 1, kvs,
                        mem_kvs, mem_lengths, True, interpret,
                        method=type(model).decode_step_packed)
                else:
                    logits, kvs = model.apply(
                        {"params": params}, last_tok, cur_len - 1, kvs,
                        mem_kvs, wide_src_mask,
                        method=type(model).decode_step)
                rng, sub = jax.random.split(rng)
                nxt = _sample_next(logits, sub, decode_algo, top_k)
                nxt = jnp.where(finished, pad_id, nxt)
                tokens = tokens.at[bidx, cur_len].set(nxt)
                finished = finished | (nxt == eos_id)
                return (tokens, cur_len + 1, finished, kvs, rng)

            carry = (tokens, cur_len, finished, self_kvs, rng)
            tokens, cur_len, finished, _, _ = jax.lax.while_loop(
                cond_fn, body_fn, carry)
            return tokens

        if prior:
            # TPU-native prior sampling: z ~ N(0,1) and the toklen mask
            # are built ON DEVICE inside the compiled program — no
            # host-side latent generation or 20MB host->device
            # transfers per batch (the reference moves z from host
            # every call, sampling_tool.py:93-97,263).
            def prior_sampler(params, prefix, prefix_len, toklen_stop,
                              dconds, rng):
                bs = prefix.shape[0]
                rng, zkey = jax.random.split(rng)
                z = jax.random.normal(
                    zkey, (bs, lat_len, cfg.latent_dim), jnp.float32)
                src_mask = (jnp.arange(lat_len)[None, None, :]
                            < toklen_stop[:, None, None])
                return sampler(params, prefix, prefix_len, z, src_mask,
                               dconds, rng)

            if has_conds:
                return jax.jit(prior_sampler)
            return jax.jit(
                lambda params, prefix, prefix_len, toklen_stop, rng:
                prior_sampler(params, prefix, prefix_len, toklen_stop,
                              None, rng))

        if has_conds:
            return jax.jit(sampler)
        # dconds is None -> close over it so jit doesn't trace a None
        return jax.jit(
            lambda params, prefix, prefix_len, z, src_mask, rng: sampler(
                params, prefix, prefix_len, z, src_mask, None, rng))

    # -----------------------------------------------------------------
    def sample(self, params, prefix, prefix_len: int, z, src_mask,
               dconds, rng, max_new: int, decode_algo: str = "multinomial",
               top_k: Optional[int] = None, eos_id: int = 3, pad_id: int = 1):
        """Generate tokens. prefix: (bs, P_bucket) right-padded with
        pad_id; prefix_len: python/np scalar (same for the whole batch,
        like the reference's single-scaffold batches); z: (bs, lat_len,
        latent_dim); src_mask: (bs, 1, lat_len [+nconds for cvaetf]).

        Returns (bs, P_bucket + max_new) token ids; rows are
        eos-terminated (pad after eos)."""
        has_conds = dconds is not None
        key = (prefix.shape[1], z.shape[1], max_new, decode_algo, top_k,
               eos_id, pad_id, has_conds)
        if key not in self._jitted:
            self._jitted[key] = self._build(
                prefix.shape[1], z.shape[1], max_new, decode_algo, top_k,
                eos_id, pad_id, has_conds)
        fn = self._jitted[key]
        prefix_len = jnp.asarray(prefix_len, jnp.int32)
        if has_conds:
            return fn(params, prefix, prefix_len, z, src_mask, dconds, rng)
        return fn(params, prefix, prefix_len, z, src_mask, rng)

    # -----------------------------------------------------------------
    def beam_search(self, params, prefix, prefix_len: int, z, src_mask,
                    dconds, max_new: int, beam_width: int = 4,
                    length_penalty: float = 0.7, eos_id: int = 3,
                    pad_id: int = 1):
        """Beam-search decode (the reference ships a broken/dead beam
        search, Inference/generate_mols.py:75-208; this is a working
        TPU-native one). Beams ride the batch axis (bs*k rows share the
        KV-cache machinery); per-step: joint top-k over (k x V)
        continuations with GNMT-style length normalization
        score/((5+len)/6)^alpha. Returns (bs, prefix+max_new) best rows.
        """
        bs = prefix.shape[0]
        k = beam_width
        key = ("beam", prefix.shape[1], z.shape[1], max_new, k,
               length_penalty, eos_id, pad_id, dconds is not None)
        if key not in self._jitted:
            self._jitted[key] = self._build_beam(
                prefix.shape[1], z.shape[1], max_new, k, length_penalty,
                eos_id, pad_id, dconds is not None)
        fn = self._jitted[key]
        if dconds is not None:
            return fn(params, prefix, jnp.asarray(prefix_len, jnp.int32), z,
                      src_mask, dconds)
        return fn(params, prefix, jnp.asarray(prefix_len, jnp.int32), z,
                  src_mask)

    def _build_beam(self, prefix_bucket: int, lat_len: int, max_new: int,
                    k: int, alpha: float, eos_id: int, pad_id: int,
                    has_conds: bool):
        model, cfg = self.model, self.cfg
        cache_len = prefix_bucket + max_new

        def beam(params, prefix, prefix_len, z, src_mask, dconds=None):
            bs = prefix.shape[0]
            variables = {"params": params}

            def tile(x):
                return jnp.repeat(x, k, axis=0)  # (bs*k, ...)

            prefix_t = tile(prefix)
            z_t = tile(z)
            src_mask_t = tile(src_mask)
            dconds_t = tile(dconds) if dconds is not None else None

            mem_kvs, wide_src_mask = model.apply(
                variables, z_t, src_mask_t, dconds_t,
                method=type(model).prepare_memory)
            prefix_len_mask = jnp.broadcast_to(
                jnp.arange(prefix_bucket)[None, :] < prefix_len,
                (bs * k, prefix_bucket))
            prefill_logits, self_kvs = model.apply(
                variables, prefix_t, prefix_len_mask,
                mem_kvs, wide_src_mask, cache_len,
                method=type(model).decode_prefill)

            tokens = jnp.full((bs * k, cache_len), pad_id, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, prefix_t, (0, 0))

            bidx = jnp.arange(bs * k)
            last_idx = prefix_len - 1
            logp0 = jax.nn.log_softmax(jnp.take_along_axis(
                prefill_logits,
                (last_idx * jnp.ones((bs * k, 1, 1), jnp.int32)).astype(jnp.int32),
                axis=1)[:, 0, :].astype(jnp.float32), axis=-1)  # (bs*k, V)
            V = logp0.shape[-1]
            # initialize: row j of each group takes the j-th best token
            top0 = jax.lax.top_k(logp0.reshape(bs, k, V)[:, 0, :], k)
            scores = top0[0].reshape(bs * k)          # (bs*k,)
            first_tok = top0[1].reshape(bs * k).astype(jnp.int32)
            tokens = tokens.at[bidx, prefix_len].set(first_tok)
            finished = first_tok == eos_id
            cur_len = prefix_len + 1

            def norm_score(s, length):
                return s / (((5.0 + length) / 6.0) ** alpha)

            def body_fn(step, carry):
                tokens, scores, finished, kvs = carry
                cur = prefix_len + 1 + step
                last_tok = tokens[bidx, cur - 1]
                logits, kvs = model.apply(
                    {"params": params}, last_tok, cur - 1, kvs,
                    mem_kvs, wide_src_mask, method=type(model).decode_step)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                # finished beams only extend with pad at no cost
                pad_only = jnp.full((bs * k, V), -jnp.inf
                                    ).at[:, pad_id].set(0.0)
                logp = jnp.where(finished[:, None], pad_only, logp)
                cand = scores[:, None] + logp           # (bs*k, V)
                cand = cand.reshape(bs, k * V)
                best_s, best_i = jax.lax.top_k(cand, k)  # (bs, k)
                beam_src = best_i // V                   # index within group
                tok_next = (best_i % V).astype(jnp.int32)
                flat_src = (jnp.arange(bs)[:, None] * k + beam_src
                            ).reshape(bs * k)
                # reorder everything by chosen source beam
                tokens = tokens[flat_src]
                kvs = jax.tree_util.tree_map(lambda a: a[flat_src], kvs)
                finished = finished[flat_src]
                scores = best_s.reshape(bs * k)
                tok_flat = tok_next.reshape(bs * k)
                tokens = tokens.at[bidx, cur].set(
                    jnp.where(finished, pad_id, tok_flat))
                finished = finished | (tok_flat == eos_id)
                return (tokens, scores, finished, kvs)

            tokens, scores, finished, _ = jax.lax.fori_loop(
                0, max_new - 1, body_fn,
                (tokens, scores, finished, self_kvs))
            # pick best beam per group by length-normalized score
            lengths = jnp.sum(tokens != pad_id, axis=1).astype(jnp.float32)
            final = norm_score(scores, lengths).reshape(bs, k)
            best = jnp.argmax(final, axis=1)
            tokens = tokens.reshape(bs, k, cache_len)[jnp.arange(bs), best]
            return tokens

        if has_conds:
            return jax.jit(beam)
        return jax.jit(lambda p, pre, pl, z, sm: beam(p, pre, pl, z, sm))

    def sample_prior(self, params, prefix, prefix_len: int, lat_len: int,
                     toklen_stop, dconds, rng, max_new: int,
                     decode_algo: str = "multinomial",
                     top_k: Optional[int] = None, eos_id: int = 3,
                     pad_id: int = 1):
        """Like sample(), but z ~ N(0,1) of shape (bs, lat_len,
        latent_dim) and the source mask (positions < toklen_stop) are
        generated on device. toklen_stop: (bs,) ints."""
        has_conds = dconds is not None
        key = ("prior", prefix.shape[1], lat_len, max_new, decode_algo,
               top_k, eos_id, pad_id, has_conds)
        if key not in self._jitted:
            self._jitted[key] = self._build(
                prefix.shape[1], lat_len, max_new, decode_algo, top_k,
                eos_id, pad_id, has_conds, prior=True)
        fn = self._jitted[key]
        prefix_len = jnp.asarray(prefix_len, jnp.int32)
        toklen_stop = jnp.asarray(toklen_stop, jnp.int32)
        if has_conds:
            return fn(params, prefix, prefix_len, toklen_stop, dconds, rng)
        return fn(params, prefix, prefix_len, toklen_stop, rng)
