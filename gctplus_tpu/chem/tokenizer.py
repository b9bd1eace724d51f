"""Atom-wise SMILES tokenizer.

Token grammar is identical to the reference tokenizer
(GCT-Plus Utils/field.py:8-43, itself derived from SmilesPE's
atomwise_tokenizer): bracket atoms as one token, two-char halogens
Br/Cl, aromatic organic-subset atoms, ring-closure digits and %NN
two-digit ring bonds, and all SMILES punctuation. A `<sep>`-aware
variant splits "scaffold<sep>smiles" strings into
tokens(scaffold) + ['<sep>'] + tokens(smiles).
"""

from __future__ import annotations

import re
from typing import List

# One token per: bracket atom, Br/Cl, organic-subset atom, punctuation,
# %NN ring bond, ring digit.  (parity: Utils/field.py:16)
SMILES_TOKEN_PATTERN = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\|\/"
    r"|:|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)

_SEP_PATTERN = re.compile(r"(<sep>)")


class SmilesTokenizer:
    """Regex SMILES tokenizer, optionally `<sep>`-aware.

    Note: like the reference, characters that do not match the token
    grammar are silently dropped — tokenize+untokenize is only an
    identity on well-formed SMILES.
    """

    def __init__(self, add_sep: bool = False):
        self.add_sep = add_sep
        self.regex = re.compile(SMILES_TOKEN_PATTERN)

    def _raw_tokens(self, s: str) -> List[str]:
        return self.regex.findall(s)

    def _plain(self, s: str) -> List[str]:
        return [t for t in self._raw_tokens(s) if t != " "]

    def _with_sep(self, s: str) -> List[str]:
        parts = _SEP_PATTERN.split(s)
        if len(parts) == 1:
            return self._plain(s)
        if len(parts) == 3:
            return self._raw_tokens(parts[0]) + ["<sep>"] + self._raw_tokens(parts[2])
        return []

    def __call__(self, s: str) -> List[str]:
        return self._with_sep(s) if self.add_sep else self._plain(s)

    tokenize = __call__


def untokenize(token_ids, sos_id: int, eos_id: int, itos) -> str:
    """ids -> SMILES string; stops at eos, skips sos. (Utils/field.py:36-43)"""
    out = []
    for t in token_ids:
        t = int(t)
        if t == eos_id:
            break
        if t != sos_id:
            out.append(itos[t])
    return "".join(out)
