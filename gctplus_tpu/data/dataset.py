"""Dataset + batching for XLA's static-shape world.

Reference behavior being reproduced (Utils/dataset.py:251-329,
Model/collate_fn.py): tokenize SMILES on the fly, optional
randomization augmentation with probability randomize_prob, scaffold
variants concatenate `scaffold + <sep> + smiles` on both src and trg,
conditions ride along as float vectors; DistributedSampler shards rows
across ranks.

TPU-native differences:
- batches are padded to bucketed lengths (multiples of `bucket`) so
  XLA compiles a handful of shapes instead of one per length;
- sharding over hosts is a `rank::world_size` slice
  (jax.process_index()), and per-device sharding happens at
  device_put time with a NamedSharding over the 'data' mesh axis.
"""

from __future__ import annotations

import math
import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from gctplus_tpu.chem.randomize import randomize_smiles
from gctplus_tpu.chem.tokenizer import SmilesTokenizer
from gctplus_tpu.chem.vocab import Vocab


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_batch(token_lists: List[List[int]], pad_id: int, bucket: int = 8,
              max_len: Optional[int] = None) -> np.ndarray:
    L = max(len(t) for t in token_lists)
    L = _round_up(max(L, 1), bucket)
    if max_len is not None:
        L = min(L, max_len)
    out = np.full((len(token_lists), L), pad_id, np.int32)
    for i, t in enumerate(token_lists):
        t = t[:L]
        out[i, : len(t)] = t
    return out


class SmilesDataset:
    """Row storage + on-the-fly tokenize/augment (Utils/dataset.py:251-289)."""

    def __init__(self, smiles: Sequence[str], src_vocab: Vocab,
                 trg_vocab: Vocab,
                 properties: Optional[np.ndarray] = None,
                 scaffolds: Optional[Sequence[str]] = None,
                 randomize_prob: float = 0.0,
                 seed: int = 0):
        self.smiles = list(smiles)
        self.scaffolds = list(scaffolds) if scaffolds is not None else None
        self.properties = (np.asarray(properties, np.float32)
                           if properties is not None else None)
        self.src_vocab = src_vocab
        self.trg_vocab = trg_vocab
        self.randomize_prob = randomize_prob
        self.tokenizer = SmilesTokenizer()
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.smiles)

    def __getitem__(self, i: int) -> Dict:
        """Returns STRINGS (+ conditions); tokenization happens in the
        collate step (BatchLoader), where the native C++ encoder can
        take the whole batch in one call."""
        smi = self.smiles[i]
        if self.randomize_prob > 0 and self.rng.random() < self.randomize_prob:
            r = randomize_smiles(smi, self.rng)
            if r is not None:
                smi = r
        item: Dict = {"smiles": smi}
        if self.scaffolds is not None:
            item["scaffold"] = self.scaffolds[i] or ""
        if self.properties is not None:
            item["econds"] = self.properties[i]
            item["dconds"] = self.properties[i]
        return item


class BatchLoader:
    """Collate + shuffle + host-shard. Yields numpy dict batches.

    use_scaffold=True reproduces scavaetf_collate_fn
    (Model/collate_fn.py:104-124): src = scaffold+<sep>+smiles (no
    sos/eos), trg = <sos>+scaffold+<sep>+smiles+<eos>.
    """

    def __init__(self, dataset: SmilesDataset, batch_size: int,
                 use_scaffold: bool = False, shuffle: bool = True,
                 seed: int = 0, rank: int = 0, world_size: int = 1,
                 bucket: int = 8, drop_last: bool = False,
                 pad_to_multiple: int = 1, length_bucketing: bool = False,
                 fixed_len: Optional[int] = None,
                 use_native: Optional[bool] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.use_scaffold = use_scaffold
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.rank = rank
        self.world_size = world_size
        self.bucket = bucket
        self.drop_last = drop_last
        # pad partial batches by cycling rows so the batch axis stays
        # divisible by the data-mesh size (slight metric skew on the
        # final eval batch; training uses drop_last instead)
        self.pad_to_multiple = pad_to_multiple
        self.length_bucketing = length_bucketing
        # native C++ tokenize+encode for the collate hot path (exact
        # same token grammar; tested equivalent in test_native_tokenizer)
        self._native_src = self._native_trg = None
        if use_native is not False:
            try:
                from gctplus_tpu.native import NativeEncoder, native_available
                if native_available():
                    self._native_src = NativeEncoder(dataset.src_vocab)
                    self._native_trg = NativeEncoder(dataset.trg_vocab)
                elif use_native:
                    raise RuntimeError("native encoder requested but "
                                       "unavailable")
            except Exception:
                if use_native:
                    raise
        # fixed_len pads every batch to one static shape: ONE XLA
        # compilation for the whole run (recompiles are expensive,
        # especially through a remote-execution tunnel); costs padding
        # FLOPs, which length_bucketing=True instead minimizes.
        self.fixed_len = fixed_len
        self._lengths = None  # lazy, for length bucketing

    def set_epoch(self, epoch: int):
        """DistributedSampler.set_epoch analog (train1 epoch reshuffle)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.world_size > 1:
            # equal-length rank shards: ranks run in SPMD lockstep, so
            # a rank with one extra batch would hang in the gradient
            # all-reduce (DistributedSampler pads for the same reason)
            n_even = (len(idx) // self.world_size) * self.world_size
            idx = idx[:n_even]
        return idx[self.rank:: self.world_size]

    def _token_lengths(self) -> np.ndarray:
        if self._lengths is None:
            try:
                from gctplus_tpu.native import count_tokens, native_available
                if native_available():
                    self._lengths = count_tokens(self.ds.smiles)
                else:
                    raise RuntimeError
            except Exception:
                tok = self.ds.tokenizer
                self._lengths = np.asarray(
                    [len(tok(s)) for s in self.ds.smiles], np.int32)
        return self._lengths

    def bucketed_indices(self) -> np.ndarray:
        """Similar-length batching (reference MyIterator pool-of-100
        shuffle, train.py:35-97 / README.md:101): shuffle, sort by
        token length within pools of 100 batches, then shuffle batch
        order. Cuts padding waste AND recompilation (fewer length
        buckets per batch)."""
        idx = self._indices()
        lens = self._token_lengths()
        rng = np.random.default_rng(self.seed * 31 + self.epoch)
        pool = 100 * self.batch_size
        out = []
        for s in range(0, len(idx), pool):
            chunk = idx[s: s + pool]
            chunk = chunk[np.argsort(lens[chunk], kind="stable")]
            batches = [chunk[b: b + self.batch_size]
                       for b in range(0, len(chunk), self.batch_size)]
            rng.shuffle(batches)
            out.extend(batches)
        return np.concatenate(out) if out else idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _check_truncation(self, strings) -> None:
        """Warn (once, with a running count) when a sequence exceeds
        fixed_len and will lose tokens — incl. its <eos>. The reference
        filters by max_strlen at preprocess time (preprocess.py:135);
        nothing enforces it at load time here, so surface it."""
        if self.fixed_len is None:
            return
        # token count <= char count, so only char-long rows can overflow
        sus = [s for s in strings if len(s) > self.fixed_len]
        if not sus:
            return
        tok = self.ds.tokenizer
        n = sum(1 for s in sus
                if len(tok._with_sep(s) if self.use_scaffold else tok(s))
                > self.fixed_len)
        if n:
            self._n_truncated += n
            if not self._truncation_warned:
                self._truncation_warned = True
                import logging
                logging.getLogger("gctplus").warning(
                    "BatchLoader(fixed_len=%d): %d sequence(s) exceed "
                    "the bucket and are truncated (losing <eos>); "
                    "filter the corpus by max_strlen at preprocess "
                    "time to avoid this.", self.fixed_len, n)
        return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not hasattr(self, "_truncation_warned"):
            self._truncation_warned = False
            self._n_truncated = 0
        idx = self.bucketed_indices() if self.length_bucketing \
            else self._indices()
        sv, tv = self.ds.src_vocab, self.ds.trg_vocab
        tokenizer = self.ds.tokenizer
        for start in range(0, len(idx), self.batch_size):
            rows = [self.ds[i] for i in idx[start: start + self.batch_size]]
            if self.drop_last and len(rows) < self.batch_size:
                break
            m = self.pad_to_multiple
            if m > 1 and len(rows) % m:
                need = m - len(rows) % m
                rows = rows + [rows[k % len(rows)] for k in range(need)]
            if self.use_scaffold:
                # scaffold + <sep> + smiles on both sides (collate_fn.py:104-124)
                strings = [r["scaffold"] + "<sep>" + r["smiles"] for r in rows]
            else:
                strings = [r["smiles"] for r in rows]
            self._check_truncation(strings)

            if self._native_src is not None:
                max_src = self.fixed_len or 256
                max_trg = (self.fixed_len + 2) if self.fixed_len else 258
                src_arr, src_lens = self._native_src.encode_batch(
                    strings, max_src, handle_sep=self.use_scaffold)
                trg_arr, trg_lens = self._native_trg.encode_batch(
                    strings, max_trg, add_sos=True, add_eos=True,
                    handle_sep=self.use_scaffold)
                if self.fixed_len is None:
                    src_arr = src_arr[:, : _round_up(int(src_lens.max()),
                                                     self.bucket)]
                    trg_arr = trg_arr[:, : _round_up(int(trg_lens.max()),
                                                     self.bucket)]
                batch: Dict[str, np.ndarray] = {"src": src_arr,
                                                "trg": trg_arr}
            else:
                toks = [tokenizer._with_sep(s) if self.use_scaffold
                        else tokenizer(s) for s in strings]
                src_ids = [sv.encode(t) for t in toks]
                trg_ids = [[tv.sos_id] + tv.encode(t) + [tv.eos_id]
                           for t in toks]
                if self.fixed_len is not None:
                    src_arr = np.full((len(src_ids), self.fixed_len),
                                      sv.pad_id, np.int32)
                    trg_arr = np.full((len(trg_ids), self.fixed_len + 2),
                                      tv.pad_id, np.int32)
                    for i, t in enumerate(src_ids):
                        src_arr[i, : min(len(t), self.fixed_len)] = \
                            t[: self.fixed_len]
                    for i, t in enumerate(trg_ids):
                        trg_arr[i, : min(len(t), self.fixed_len + 2)] = \
                            t[: self.fixed_len + 2]
                    batch = {"src": src_arr, "trg": trg_arr}
                else:
                    batch = {
                        "src": pad_batch(src_ids, sv.pad_id, self.bucket),
                        "trg": pad_batch(trg_ids, tv.pad_id, self.bucket),
                    }
            if "econds" in rows[0]:
                batch["econds"] = np.stack([r["econds"] for r in rows])
                batch["dconds"] = np.stack([r["dconds"] for r in rows])
            yield batch
