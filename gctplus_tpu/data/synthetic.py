"""Synthetic drug-like SMILES generator (offline MOSES stand-in).

The reference preprocess downloads the MOSES set (preprocess.py:81-83);
this environment has no network egress, so for end-to-end runs and
tests we synthesize a MOSES-like corpus: random assemblies of common
drug-like ring systems and substituents, validated through the in-repo
sanitizer. Real datasets drop in by passing CSV paths to the
preprocess pipeline instead.
"""

from __future__ import annotations

import random
from typing import List

from gctplus_tpu.chem.canonical import canonical_smiles

RINGS = [
    "c1ccccc1", "c1ccncc1", "c1ccoc1", "c1ccsc1", "c1cc[nH]c1",
    "c1ccc2ccccc2c1", "C1CCCCC1", "C1CCNCC1", "C1CCOCC1", "C1CCCC1",
    "c1cnccn1", "c1ccc2[nH]ccc2c1", "C1CCNC1", "c1cscn1", "c1cocn1",
    # extended set (round 2): more azoles/azines + saturated systems so
    # the unique-molecule space supports MOSES-scale (>=600k) corpora
    "c1cncnc1", "c1ccnnc1", "c1c[nH]cn1", "c1cc[nH]n1",
    "C1COCCN1", "C1CNCCN1", "C1CC1", "C1CCC1", "C1CCOC1", "C1CCSC1",
    "C1CCCCCC1", "c1ccc2ncccc2c1", "c1ccc2cnccc2c1",
    "c1ccc2[nH]cnc2c1", "c1ccc2occc2c1", "c1ccc2sccc2c1",
]

# attachment-ready substituents (appended in branch parentheses)
SUBS = [
    "C", "CC", "CCC", "C(C)C", "O", "OC", "N", "NC", "F", "Cl", "Br",
    "C(=O)O", "C(=O)N", "C(=O)OC", "C#N", "C(F)(F)F", "OCC", "NCC",
    "S(=O)(=O)N", "C(=O)C", "N(C)C", "OC(C)C", "CO", "CN",
    # extended set (round 2)
    "C(C)(C)C", "CCCC", "S(=O)(=O)C", "NC(=O)C", "OC(=O)C", "C=C",
    "N(CC)CC", "NS(=O)(=O)C", "OCCO", "OCCN", "CF", "SC", "C(=O)NC",
]

LINKERS = ["", "C", "CC", "O", "N", "C(=O)", "CN", "CO", "C(=O)N",
           # extended set (round 2)
           "CCC", "CCO", "CCN", "S", "S(=O)(=O)", "C(=O)O", "NC(=O)",
           "C=C", "OC", "N(C)"]


def _ring_with_subs(rng: random.Random) -> str:
    ring = rng.choice(RINGS)
    # insert substituents after a random ring atom (lowercase/uppercase)
    out = []
    i = 0
    n_subs = rng.randint(0, 2)
    positions = set()
    atoms = [j for j, ch in enumerate(ring)
             if ch in "cnosCNOS" and (j + 1 >= len(ring) or ring[j + 1] != "1")]
    if atoms:
        positions = set(rng.sample(atoms, min(n_subs, len(atoms))))
    for j, ch in enumerate(ring):
        out.append(ch)
        if j in positions:
            out.append("(" + rng.choice(SUBS) + ")")
    return "".join(out)


def random_druglike_smiles(rng: random.Random) -> str:
    n_rings = rng.choices([1, 2, 3], weights=[4, 5, 2])[0]
    parts = [_ring_with_subs(rng)]
    for _ in range(n_rings - 1):
        parts.append(rng.choice(LINKERS))
        parts.append(_ring_with_subs(rng))
    return "".join(parts)


def _canon_or_none(smi: str, max_len: int = 72):
    """Picklable pool worker."""
    can = canonical_smiles(smi)
    if can is None or len(can) > max_len:
        return None
    return can


def generate_dataset(n: int, seed: int = 0, max_len: int = 72,
                     n_jobs: int = 1) -> List[str]:
    """n unique, valid, canonical SMILES (canonicalization pooled)."""
    from functools import partial

    from gctplus_tpu.chem.mapper import pmap

    rng = random.Random(seed)
    seen = set()
    out: List[str] = []
    rounds = 0
    while len(out) < n and rounds < 60:
        rounds += 1
        batch = [random_druglike_smiles(rng)
                 for _ in range(max(1024, (n - len(out)) * 2))]
        batch = [s for s in batch if len(s) <= max_len]
        for can in pmap(partial(_canon_or_none, max_len=max_len), batch,
                        n_jobs):
            if can is None or can in seen:
                continue
            seen.add(can)
            out.append(can)
            if len(out) == n:
                break
    if len(out) < n:
        raise RuntimeError(f"only generated {len(out)}/{n} molecules")
    return out
