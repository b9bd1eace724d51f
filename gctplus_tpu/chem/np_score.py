"""Natural-product (NP) likeness score with a corpus-derived
contribution table.

Ertl, Roggo & Schuffenhauer's NP-likeness (J. Chem. Inf. Model. 2008,
the `NP` descriptor the reference gets from moses' NP_Score artifact
via Utils/properties.py) scores each radius-2 atom environment by the
log-ratio of its frequency in natural products vs synthetic molecules,
then averages over atoms with a soft clamp at |4|.

The precomputed contribution artifact is unavailable offline, so the
table is built from corpora at preprocess time (same method, different
reference populations — documented deviation, like chem/sa_fragments):

- two-corpus mode: contribution_i = log10(f_i^natural / f_i^synthetic)
  with Laplace smoothing — the faithful contrast when both corpora are
  supplied;
- single-corpus mode: contribution_i = log10(f_i / mean f), a
  familiarity score against the training distribution (environments
  typical of the corpus score positive, alien ones negative).

Environment hashes are shared with chem/sa_fragments.py so one pass
can feed both tables.
"""

from __future__ import annotations

import json
import math
from collections import Counter
from typing import Dict, Iterable, Optional

from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.sa_fragments import atom_environment_hashes

UNSEEN = -1.0  # environments absent from the table (Ertl: ignored;
# a mild negative keeps alien chemotypes from scoring as natural)
CLIP = 4.0


def _env_counter(smiles: Iterable[str], radius: int, n_jobs: int) -> Counter:
    from functools import partial

    from gctplus_tpu.chem.mapper import pmap
    from gctplus_tpu.chem.sa_fragments import _env_hashes_of_smiles

    counts: Counter = Counter()
    for hashes in pmap(partial(_env_hashes_of_smiles, radius=radius),
                       list(smiles), n_jobs):
        counts.update(hashes)
    return counts


def build_np_contributions(natural_smiles: Iterable[str],
                           synthetic_smiles: Optional[Iterable[str]] = None,
                           radius: int = 2, n_jobs: int = 1
                           ) -> Dict[str, float]:
    nat = _env_counter(natural_smiles, radius, n_jobs)
    if not nat:
        return {}
    n_tot = sum(nat.values())
    if synthetic_smiles is not None:
        syn = _env_counter(synthetic_smiles, radius, n_jobs)
        s_tot = max(1, sum(syn.values()))
        out = {}
        for h, c in nat.items():
            f_nat = c / n_tot
            f_syn = (syn.get(h, 0) + 1) / (s_tot + len(nat))
            out[str(h)] = round(
                max(-CLIP, min(CLIP, math.log10(f_nat / f_syn))), 4)
        return out
    mean = n_tot / len(nat)
    return {str(h): round(max(-CLIP, min(CLIP, math.log10(c / mean))), 4)
            for h, c in nat.items()}


def save_np_contributions(table: Dict[str, float], path: str) -> None:
    with open(path, "w") as f:
        json.dump(table, f)


def load_np_contributions(path: str) -> Dict[str, float]:
    with open(path) as f:
        return json.load(f)


def np_likeness(mol: Mol, table: Dict[str, float], radius: int = 2) -> float:
    """Average environment contribution with Ertl's tail compression
    (scores beyond +-4 are log-damped instead of hard-clipped)."""
    hashes = atom_environment_hashes(mol, radius)
    if not hashes or not table:
        return 0.0
    score = sum(table.get(str(h), UNSEEN) for h in hashes) / len(hashes)
    if score > CLIP:
        score = CLIP + math.log10(score - CLIP + 1.0)
    elif score < -CLIP:
        score = -CLIP - math.log10(-score - CLIP + 1.0)
    return float(score)
