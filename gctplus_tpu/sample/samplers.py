"""Variant-level sampling API (reference Inference/sampling_tool.py).

One sampler class per conditioning mode, mirroring S1-S5 of the
reference inventory:

- VaetfSampler      (sampling_tool.py:187-273): z ~ N(0,1) with
  data-distribution token lengths.
- CvaetfSampler     (:276-340): + property conditioning (scaler-
  transformed logP/tPSA/QED).
- ScaVaetfSampler   (:501-595): decode from <sos>+scaffold+<sep>
  prefix; latent length = len(sca)+1+toklen.
- PscaVaetfSampler  (:343-498): properties + scaffold jointly.

All decode through the KV-cached DecodeEngine (O(1)/token) instead of
the reference's full re-decode loop; shapes are bucketed so the whole
sweep compiles a handful of XLA programs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gctplus_tpu.chem.tokenizer import SmilesTokenizer, untokenize
from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.data.toklen import sample_toklens
from gctplus_tpu.models.masks import get_src_mask
from gctplus_tpu.sample.decode import DecodeEngine


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BaseSampler:
    def __init__(self, model, cfg, params, src_vocab: Vocab, trg_vocab: Vocab,
                 toklen_data: Optional[np.ndarray] = None,
                 scaler=None, max_strlen: int = 80,
                 decode_algo: str = "multinomial",
                 top_k: Optional[int] = None, seed: int = 0,
                 batch_size: int = 512, lat_bucket: int = 16,
                 mesh=None, fixed_decode_shapes: bool = False):
        self.model = model
        self.cfg = cfg
        self.params = params
        self.src_vocab = src_vocab
        self.trg_vocab = trg_vocab
        self.toklen_data = toklen_data
        self.scaler = scaler
        self.max_strlen = max_strlen
        self.decode_algo = decode_algo
        self.top_k = top_k
        self.batch_size = batch_size
        self.lat_bucket = lat_bucket
        # protocol mode: prefix rounds to 16 and lat_len is a function
        # of the PREFIX BUCKET alone (not the toklen draws), so a
        # 100-scaffold protocol compiles ~3 programs instead of ~15.
        # The streaming cross-attention kernel clamps KV reads to each
        # block's max toklen, so the extra padded latent rows are
        # nearly free; masked positions make the math identical.
        self.fixed_decode_shapes = fixed_decode_shapes
        self.engine = DecodeEngine(model, cfg)
        self.tokenizer = SmilesTokenizer()
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.cond_dim = cfg.nconds
        # optional data-parallel sampling: shard the batch axis over the
        # 'data' mesh axis; the whole KV-cached decode then runs SPMD
        # across chips (no reference counterpart — DDP was train-only)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._batch_sharding = NamedSharding(mesh, P("data"))
        else:
            self._batch_sharding = None

    def _shard(self, x):
        if self._batch_sharding is None:
            return x
        return jax.device_put(x, self._batch_sharding)

    # --- helpers -------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _sample_toklen(self, n: int) -> np.ndarray:
        """Token lengths from the train histogram + cond offset
        (sampling_tool.py:75-81)."""
        if self.toklen_data is None:
            return np.full(n, 40) + self.cond_dim
        return sample_toklens(self.toklen_data, n, self.rng) + self.cond_dim

    def _sample_z(self, n: int, lat_len: int) -> jnp.ndarray:
        return jnp.asarray(
            self.rng.standard_normal((n, lat_len, self.cfg.latent_dim)),
            jnp.float32)

    def _transform(self, props) -> np.ndarray:
        props = np.asarray(props, np.float32)
        if self.scaler is not None:
            props = self.scaler.transform(props).astype(np.float32)
        return props

    def _ids_to_smiles(self, tokens: np.ndarray, strip: int = 0) -> List[str]:
        sos, eos = self.trg_vocab.sos_id, self.trg_vocab.eos_id
        out = []
        for row in tokens:
            out.append(untokenize(row[strip:], sos, eos, self.trg_vocab.itos))
        return out

    def _decode_batch(self, n: int, prefix_ids: List[int], toklen: np.ndarray,
                      extra_lat: int, dconds: Optional[np.ndarray]
                      ) -> np.ndarray:
        """Shared decode: bucketed prefix; z + source mask are drawn on
        device inside the compiled sampler (DecodeEngine.sample_prior).

        Partial batches are padded up to the full batch_size and
        trimmed after: ONE compiled program per run (each new batch
        shape costs a multi-minute remote compile here) and the fused
        kernels keep their 32-row block alignment."""
        if self.engine.fused and n != self.batch_size:
            n_pad = max(self.batch_size, _round_up(n, 32))
        else:
            n_pad = n
        P = len(prefix_ids)
        P_bucket = _round_up(P, 16 if self.fixed_decode_shapes else 8)
        prefix = np.full((n_pad, P_bucket), self.src_vocab.pad_id, np.int32)
        prefix[:, :P] = prefix_ids

        if self.fixed_decode_shapes:
            # static per-bucket latent length: covers the largest
            # possible draw (toklen <= max_strlen, extra_lat <=
            # P_bucket-1); stop masks the unused tail
            lat_len = self.max_strlen + P_bucket - 1
        else:
            lat_len = int(np.max(toklen)) + extra_lat
        lat_len = min(_round_up(lat_len, self.lat_bucket),
                      self.cfg.max_seq_len)
        toklen_pad = np.resize(np.asarray(toklen), n_pad)
        stop = np.minimum(toklen_pad + extra_lat, lat_len)

        if dconds is None:
            dc = None
        else:
            dconds_pad = np.resize(np.asarray(dconds, np.float32),
                                   (n_pad, np.asarray(dconds).shape[1]))
            dc = self._shard(jnp.asarray(dconds_pad, jnp.float32))
        toks = self.engine.sample_prior(
            self.params, self._shard(jnp.asarray(prefix)), P, lat_len,
            self._shard(jnp.asarray(stop, jnp.int32)), dc,
            self._next_key(), max_new=self.max_strlen - 1,
            decode_algo=self.decode_algo, top_k=self.top_k,
            eos_id=self.trg_vocab.eos_id, pad_id=self.trg_vocab.pad_id)
        return np.asarray(toks)[:n]

    # --- encoding (for interpolation / latent analysis) ----------------
    def encode_smiles(self, smiles_list: Sequence[str],
                      econds: Optional[np.ndarray] = None,
                      transform: bool = True,
                      sample_eps: bool = False,
                      pad_to: Optional[int] = None):
        """Returns (z, mu, logvar) like reference encode_smiles.

        pad_to: fixed padded length (one XLA program across calls —
        callers that slice mu/logvar to token lengths, e.g.
        mol_interpolation, should pass max_strlen)."""
        ids = [self.src_vocab.encode(self.tokenizer(s)) for s in smiles_list]
        L = pad_to or _round_up(max(len(t) for t in ids), 8)
        assert L >= max(len(t) for t in ids), "pad_to shorter than input"
        src = np.full((len(ids), L), self.src_vocab.pad_id, np.int32)
        for i, t in enumerate(ids):
            src[i, : len(t)] = t
        src = jnp.asarray(src)
        ec = None
        if econds is not None:
            ec = self._transform(econds) if transform else np.asarray(econds, np.float32)
            ec = jnp.asarray(ec)
        src_mask = get_src_mask(src, self.src_vocab.pad_id, ec)
        mu_shape_len = L + (self.cond_dim if ec is not None else 0)
        if sample_eps:
            eps = jnp.asarray(self.rng.standard_normal(
                (len(ids), mu_shape_len, self.cfg.latent_dim)), jnp.float32)
        else:
            eps = jnp.zeros((len(ids), mu_shape_len, self.cfg.latent_dim))
        z, mu, logvar = self.model.apply(
            {"params": self.params}, src, src_mask, ec, eps=eps,
            deterministic=True, method=type(self.model).encode)
        return np.asarray(z), np.asarray(mu), np.asarray(logvar)

    def decode_z(self, z: np.ndarray, toklen: Optional[np.ndarray] = None,
                 prefix_ids: Optional[List[int]] = None,
                 dconds: Optional[np.ndarray] = None,
                 transform: bool = True) -> List[str]:
        """Decode explicit latent codes (used by mol_interpolation)."""
        n = z.shape[0]
        if prefix_ids is None:
            prefix_ids = [self.trg_vocab.sos_id]
        if toklen is None:
            toklen = np.full(n, z.shape[1])
        P = len(prefix_ids)
        P_bucket = _round_up(P, 8)
        prefix = np.full((n, P_bucket), self.src_vocab.pad_id, np.int32)
        prefix[:, :P] = prefix_ids
        lat_len = z.shape[1]
        stop = np.minimum(toklen, lat_len)
        src_mask = jnp.asarray(
            np.arange(lat_len)[None, None, :] < stop[:, None, None])
        dc = None
        if dconds is not None:
            dc = self._transform(dconds) if transform else np.asarray(
                dconds, np.float32)
            dc = jnp.asarray(dc)
        toks = self.engine.sample(
            self.params, jnp.asarray(prefix), P, jnp.asarray(z, jnp.float32),
            src_mask, dc, self._next_key(), max_new=self.max_strlen - 1,
            decode_algo=self.decode_algo, top_k=self.top_k,
            eos_id=self.trg_vocab.eos_id, pad_id=self.trg_vocab.pad_id)
        strip = 0 if P == 1 else P  # scaffold prefix stripped (see subclass)
        return self._ids_to_smiles(np.asarray(toks), strip=strip)


    def _batched_decode(self, prefix_ids: List[int], toklen_all: np.ndarray,
                        extra_lat: int, dconds_all: Optional[np.ndarray],
                        strip: int = 0) -> List[str]:
        """Chunked decode over a whole request, sorted by sampled token
        length: rows in a chunk finish at similar steps, so the
        on-device all-finished break exits the while_loop early (a
        throughput optimization the reference's per-step host-sync loop
        cannot express as cheaply). Results return in request order."""
        n = len(toklen_all)
        order = np.argsort(toklen_all, kind="stable")
        out: List[Optional[str]] = [None] * n
        for s in range(0, n, self.batch_size):
            sel = order[s: s + self.batch_size]
            dc = None if dconds_all is None else dconds_all[sel]
            toks = self._decode_batch(len(sel), prefix_ids,
                                      toklen_all[sel], extra_lat, dc)
            smis = self._ids_to_smiles(toks, strip=strip)
            for k, idx in enumerate(sel):
                out[idx] = smis[k]
        return out  # type: ignore[return-value]


class VaetfSampler(BaseSampler):
    def sample_smiles(self, n: int) -> Tuple[List[str], np.ndarray]:
        toklen = self._sample_toklen(n)
        smiles = self._batched_decode([self.trg_vocab.sos_id], toklen,
                                      0, None)
        return smiles, toklen


class CvaetfSampler(BaseSampler):
    def sample_smiles(self, props: np.ndarray, transform: bool = True
                      ) -> Tuple[List[str], np.ndarray]:
        """props: (n, nconds) target property rows."""
        props = np.asarray(props, np.float32)
        n = len(props)
        dconds = self._transform(props) if transform else props
        toklen = self._sample_toklen(n)
        smiles = self._batched_decode([self.trg_vocab.sos_id], toklen,
                                      0, dconds)
        return smiles, toklen


class ScaVaetfSampler(BaseSampler):
    def _scaffold_prefix(self, scaffold: str) -> List[int]:
        sca_ids = self.trg_vocab.encode(self.tokenizer(scaffold))
        return [self.trg_vocab.sos_id] + sca_ids + [self.trg_vocab.sep_id]

    def sample_smiles(self, n: int, scaffold: str
                      ) -> Tuple[List[str], np.ndarray]:
        prefix_ids = self._scaffold_prefix(scaffold)
        sca_len = len(prefix_ids) - 2
        toklen = self._sample_toklen(n)
        # latent covers scaffold + <sep> + molecule (sampling_tool.py:569-578)
        smiles = self._batched_decode(prefix_ids, toklen, sca_len + 1, None,
                                      strip=len(prefix_ids))
        return smiles, toklen


class PscaVaetfSampler(BaseSampler):
    def _scaffold_prefix(self, scaffold: str) -> List[int]:
        sca_ids = self.trg_vocab.encode(self.tokenizer(scaffold))
        return [self.trg_vocab.sos_id] + sca_ids + [self.trg_vocab.sep_id]

    def sample_smiles(self, props: np.ndarray, scaffold: str,
                      transform: bool = True) -> Tuple[List[str], np.ndarray]:
        props = np.asarray(props, np.float32)
        dconds = self._transform(props) if transform else props
        prefix_ids = self._scaffold_prefix(scaffold)
        sca_len = len(prefix_ids) - 2
        toklen = self._sample_toklen(len(props))
        smiles = self._batched_decode(prefix_ids, toklen, sca_len + 1,
                                      dconds, strip=len(prefix_ids))
        return smiles, toklen


SAMPLER_REGISTRY = {
    "vaetf": VaetfSampler,
    "pvaetf": CvaetfSampler,
    "scavaetf": ScaVaetfSampler,
    "pscavaetf": PscaVaetfSampler,
}


def get_sampler(model_type: str, *args, **kwargs) -> BaseSampler:
    """reference Model/build_model.py:90-116 analog."""
    return SAMPLER_REGISTRY[model_type](*args, **kwargs)
