"""Token vocabulary with torchtext-0.6-compatible id assignment.

The reference stores torchtext `Field` pickles whose vocab order the
trained checkpoints' embedding rows depend on (Utils/field.py:98-125,
preprocess.py:106-131). torchtext builds itos as: specials first, in
order [unk, pad, init, eos] + extra specials, then corpus tokens sorted
by descending frequency with alphabetical tie-break. We replicate that
exactly so converted checkpoints line up row-for-row:

  SRC:      <unk>=0 <pad>=1  [tokens...]
  TRG:      <unk>=0 <pad>=1 <sos>=2 <eos>=3  [tokens...]
  SRC_sep:  <unk>=0 <pad>=1 <sep>=2  [tokens...]
  TRG_sep:  <unk>=0 <pad>=1 <sos>=2 <eos>=3 <sep>=4  [tokens...]
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

UNK, PAD, SOS, EOS, SEP = "<unk>", "<pad>", "<sos>", "<eos>", "<sep>"


class Vocab:
    def __init__(self, itos: Sequence[str], unk_token: str = UNK):
        self.itos: List[str] = list(itos)
        self.stoi: Dict[str, int] = {t: i for i, t in enumerate(self.itos)}
        self.unk_token = unk_token
        self._unk_id = self.stoi.get(unk_token, 0)

    # --- id helpers -------------------------------------------------
    def __len__(self) -> int:
        return len(self.itos)

    def __contains__(self, tok: str) -> bool:
        return tok in self.stoi

    def token_to_id(self, tok: str) -> int:
        return self.stoi.get(tok, self._unk_id)

    def encode(self, tokens: Iterable[str]) -> List[int]:
        g = self.stoi.get
        u = self._unk_id
        return [g(t, u) for t in tokens]

    @property
    def pad_id(self) -> int:
        return self.stoi[PAD]

    @property
    def sos_id(self) -> Optional[int]:
        return self.stoi.get(SOS)

    @property
    def eos_id(self) -> Optional[int]:
        return self.stoi.get(EOS)

    @property
    def sep_id(self) -> Optional[int]:
        return self.stoi.get(SEP)

    # --- construction -----------------------------------------------
    @classmethod
    def build(
        cls,
        counter: Counter,
        specials: Sequence[str],
        min_freq: int = 1,
    ) -> "Vocab":
        """torchtext-0.6 Vocab ordering: specials (dedup, given order),
        then tokens sorted by (-freq, token)."""
        seen = dict.fromkeys(s for s in specials if s is not None)
        itos = list(seen)
        words = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        for tok, freq in words:
            if freq < min_freq or tok in seen:
                continue
            itos.append(tok)
        return cls(itos)

    @classmethod
    def from_corpus_tokens(
        cls,
        token_lists: Iterable[Sequence[str]],
        with_sos_eos: bool,
        add_sep: bool,
        min_freq: int = 1,
    ) -> "Vocab":
        counter: Counter = Counter()
        for toks in token_lists:
            counter.update(toks)
        specials = [UNK, PAD]
        if with_sos_eos:
            specials += [SOS, EOS]
        if add_sep:
            specials += [SEP]
        return cls.build(counter, specials, min_freq)

    # --- persistence ------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"itos": self.itos, "unk_token": self.unk_token}, f)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path) as f:
            d = json.load(f)
        return cls(d["itos"], d.get("unk_token", UNK))


def build_vocab_pair(token_lists_src, token_lists_trg, add_sep: bool):
    """Build the (SRC, TRG) vocab pair like preprocess.py:106-131."""
    src = Vocab.from_corpus_tokens(token_lists_src, with_sos_eos=False, add_sep=add_sep)
    trg = Vocab.from_corpus_tokens(token_lists_trg, with_sos_eos=True, add_sep=add_sep)
    return src, trg
