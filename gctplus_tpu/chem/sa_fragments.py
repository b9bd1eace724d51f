"""Corpus-derived fragment scores for the SA (synthetic
accessibility) descriptor.

Ertl & Schuffenhauer's SA score combines a fragment-frequency term
(precomputed over PubChem in the original / moses' fpscores artifact,
unavailable offline) with complexity penalties. Here the fragment
table is BUILT FROM THE TRAINING CORPUS at preprocess time — same
method, different reference population (documented deviation):
score_i = log10(count_i) - log10(count_max), i.e. the most common
environment scores 0 and rare ones go negative.

Fragments are radius-2 Morgan atom environments (the same hashes as
chem/fingerprints.py).
"""

from __future__ import annotations

import json
import math
from collections import Counter
from typing import Dict, Iterable, List

from gctplus_tpu.chem.fingerprints import _h
from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.sanitize import mol_from_smiles

UNSEEN_SCORE = -4.0


def atom_environment_rounds(mol: Mol, radius: int = 2) -> List[List[int]]:
    """Morgan environment hashes per atom for every radius 0..radius
    (the published fpscores table is keyed by ALL radii of a sparse
    Morgan fingerprint, so small fragments hit the table too)."""
    cur = []
    for a in mol.atoms:
        cur.append(_h((a.symbol, a.charge, a.n_h, a.aromatic,
                       len(mol.neighbors(a.idx)), a.isotope)))
    rounds = [list(cur)]
    for _ in range(radius):
        nxt = []
        for a in mol.atoms:
            env = sorted(
                (1.5 if b.aromatic else b.order, cur[b.other(a.idx)])
                for b in mol.bonds_of(a.idx))
            nxt.append(_h((cur[a.idx], tuple(env))))
        cur = nxt
        rounds.append(list(cur))
    return rounds


def atom_environment_hashes(mol: Mol, radius: int = 2) -> List[int]:
    """Final-radius Morgan environment hash per atom (v1 tables)."""
    return atom_environment_rounds(mol, radius)[-1]


def _env_hashes_of_smiles(smi: str, radius: int = 2):
    """Picklable pool worker."""
    mol = mol_from_smiles(smi)
    if mol is None:
        return []
    return atom_environment_hashes(mol, radius)


def _env_rounds_of_smiles(smi: str, radius: int = 2):
    """Picklable pool worker (all radii)."""
    mol = mol_from_smiles(smi)
    if mol is None:
        return []
    return atom_environment_rounds(mol, radius)


def build_fragment_scores(smiles: Iterable[str], radius: int = 2,
                          n_jobs: int = 1) -> Dict[str, float]:
    from functools import partial

    from gctplus_tpu.chem.mapper import pmap

    counts: Counter = Counter()
    for hashes in pmap(partial(_env_hashes_of_smiles, radius=radius),
                       list(smiles), n_jobs):
        counts.update(hashes)
    if not counts:
        return {}
    # offset so the most common environment scores +2.3 (calibrated so
    # typical drug-like molecules land in the 1.5-3.5 SAS band like the
    # original PubChem-derived table)
    log_max = math.log10(max(counts.values()))
    return {str(h): round(math.log10(c) - log_max + 2.3, 4)
            for h, c in counts.items()}


V2_MARKER = "__v2_multi_radius__"


def build_fragment_scores_v2(smiles: Iterable[str], radius: int = 2,
                             n_jobs: int = 1) -> Dict[str, float]:
    """v2 table: count environments over ALL radii 0..radius (like the
    published fpscores' sparse-Morgan keying), so small/terminal
    fragments score by their own frequency instead of falling to
    UNSEEN_SCORE.  Marked with V2_MARKER so fragment_score picks the
    matching lookup."""
    from functools import partial

    from gctplus_tpu.chem.mapper import pmap

    counts: Counter = Counter()
    for rounds in pmap(partial(_env_rounds_of_smiles, radius=radius),
                       list(smiles), n_jobs):
        for hashes in rounds:
            counts.update(hashes)
    if not counts:
        return {}
    log_max = math.log10(max(counts.values()))
    out = {str(h): round(math.log10(c) - log_max + 2.3, 4)
           for h, c in counts.items()}
    out[V2_MARKER] = 1.0
    return out


def save_fragment_scores(scores: Dict[str, float], path: str) -> None:
    with open(path, "w") as f:
        json.dump(scores, f)


def load_fragment_scores(path: str) -> Dict[str, float]:
    with open(path) as f:
        return json.load(f)


def fragment_score(mol: Mol, scores: Dict[str, float],
                   radius: int = 2) -> float:
    """Mean fragment contribution (Ertl's score1). v2 tables average
    over all radii 0..radius; v1 tables over the final radius only."""
    if V2_MARKER in scores:
        hashes = [h for hs in atom_environment_rounds(mol, radius)
                  for h in hs]
    else:
        hashes = atom_environment_hashes(mol, radius)
    if not hashes:
        return UNSEEN_SCORE
    return sum(scores.get(str(h), UNSEEN_SCORE) for h in hashes) / len(hashes)
