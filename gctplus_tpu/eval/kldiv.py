"""GuacaMol-style KL-divergence score for model selection.

Reference Inference/model_selection.py:46-85 scores each epoch by
S = mean(exp(-KL)) over physchem descriptor distributions between
generated and reference molecules, plus the internal-similarity
distribution; the best epoch maximizes S (README.md:105-109).

Descriptors: the guacamol 9-descriptor set — logP, MW, tPSA, HBA,
HBD, RBN, AIRN, ARRN, BertzCT (Bertz-style complexity; see
chem/descriptors.py) — plus the nearest-neighbor similarity
distribution. KL is histogram-based with shared bins.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from gctplus_tpu.chem.descriptors import PROPERTY_FN
from gctplus_tpu.chem.fingerprints import bulk_tanimoto_matrix, smiles_to_morgan
from gctplus_tpu.chem.mapper import pmap
from gctplus_tpu.chem.sanitize import mol_from_smiles

KLDIV_DESCRIPTORS = ["logP", "MW", "tPSA", "HBA", "HBD", "RBN", "AIRN",
                     "ARRN", "BertzCT"]


def _descriptor_matrix(smiles: Sequence[str], n_jobs: int = 1) -> np.ndarray:
    from functools import partial

    from gctplus_tpu.chem.descriptors import props_row

    vals = [v for v in pmap(partial(props_row, props=KLDIV_DESCRIPTORS),
                            smiles, n_jobs) if v is not None]
    return np.asarray(vals, float) if vals else np.zeros((0, len(KLDIV_DESCRIPTORS)))


def histogram_kl(p_samples: np.ndarray, q_samples: np.ndarray,
                 n_bins: int = 20, eps: float = 1e-10) -> float:
    lo = min(p_samples.min(), q_samples.min())
    hi = max(p_samples.max(), q_samples.max())
    if hi <= lo:
        return 0.0
    bins = np.linspace(lo, hi, n_bins + 1)
    p, _ = np.histogram(p_samples, bins=bins, density=False)
    q, _ = np.histogram(q_samples, bins=bins, density=False)
    p = p / p.sum() + eps
    q = q / q.sum() + eps
    return float(np.sum(p * np.log(p / q)))


def _nn_similarity_dist(smiles: Sequence[str], n_jobs: int = 1,
                        cap: int = 2000) -> np.ndarray:
    fps = [f for f in pmap(smiles_to_morgan, smiles[:cap], n_jobs)
           if f is not None]
    if len(fps) < 2:
        return np.zeros(1)
    fps = np.stack(fps)
    sims = np.array(bulk_tanimoto_matrix(fps, fps))  # writable copy
    np.fill_diagonal(sims, -1.0)
    return sims.max(axis=1)


def kldiv_score(gen: Sequence[str], ref: Sequence[str],
                n_jobs: int = 1) -> Dict[str, float]:
    """Returns per-descriptor KL plus the aggregate S score."""
    g = _descriptor_matrix(gen, n_jobs)
    r = _descriptor_matrix(ref, n_jobs)
    out: Dict[str, float] = {}
    kls: List[float] = []
    if len(g) == 0 or len(r) == 0:
        return {"score": 0.0}
    for j, d in enumerate(KLDIV_DESCRIPTORS):
        kl = histogram_kl(r[:, j], g[:, j])
        out[f"KL_{d}"] = kl
        kls.append(kl)
    kl_sim = histogram_kl(_nn_similarity_dist(ref, n_jobs),
                          _nn_similarity_dist(gen, n_jobs))
    out["KL_internal_similarity"] = kl_sim
    kls.append(kl_sim)
    out["score"] = float(np.mean(np.exp(-np.asarray(kls))))
    return out
