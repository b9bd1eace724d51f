"""Latent-space molecular interpolation (reference
Inference/mol_interpolation.py:110-374).

Pipeline: sample constrained molecular pairs (Tanimoto < threshold,
optional same-scaffold, :32-85) -> encode both to (mu, logvar) ->
for each alpha: slerp both (:18-29,216-217) -> decode with a growing-
noise retry loop until a valid molecule appears (:213-259) ->
smoothness metrics smooth_start / smooth_prev (:143-151)."""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from gctplus_tpu.chem.fingerprints import tanimoto_similarity
from gctplus_tpu.chem.sanitize import is_valid_smiles
from gctplus_tpu.chem.scaffold import murcko_scaffold
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def slerp(v0: np.ndarray, v1: np.ndarray, alpha: float) -> np.ndarray:
    """Spherical interpolation on flattened latents
    (mol_interpolation.py:18-29)."""
    f0, f1 = v0.ravel(), v1.ravel()
    denom = np.linalg.norm(f0) * np.linalg.norm(f1)
    omega = math.acos(float(np.clip(np.dot(f0, f1) / max(denom, 1e-12),
                                    -1.0, 1.0)))
    if abs(math.sin(omega)) < 1e-9:
        return lerp(v0, v1, alpha)
    a = math.sin((1 - alpha) * omega) / math.sin(omega)
    b = math.sin(alpha * omega) / math.sin(omega)
    return a * v0 + b * v1


def lerp(v0: np.ndarray, v1: np.ndarray, alpha: float) -> np.ndarray:
    return (1 - alpha) * v0 + alpha * v1


def approximate_z(z: np.ndarray, target_len: int,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Token-wise Gaussian refit to a different latent length
    (mol_interpolation.py:124-131): fit a per-dimension Gaussian over
    the token axis and draw target_len rows from it."""
    rng = rng or np.random.default_rng(0)
    mean = z.mean(axis=0)
    std = z.std(axis=0)
    return mean[None, :] + std[None, :] * rng.standard_normal(
        (target_len, z.shape[-1]))


def sample_molecular_pairs(smiles: Sequence[str], n_pairs: int,
                           similarity_threshold: float = 0.5,
                           same_scaffold: bool = False, seed: int = 0,
                           max_tries: int = 20000
                           ) -> List[Tuple[str, str]]:
    """Constrained pair selection (mol_interpolation.py:32-85)."""
    rng = np.random.default_rng(seed)
    smiles = [s for s in smiles if isinstance(s, str)]
    pairs: List[Tuple[str, str]] = []
    tries = 0
    while len(pairs) < n_pairs and tries < max_tries:
        tries += 1
        i, j = rng.choice(len(smiles), 2, replace=False)
        s0, s1 = smiles[i], smiles[j]
        sim = tanimoto_similarity(s0, s1)
        if sim is None or sim >= similarity_threshold:
            continue
        if same_scaffold and murcko_scaffold(s0) != murcko_scaffold(s1):
            continue
        pairs.append((s0, s1))
    return pairs


def interpolate_pair(sampler, s0: str, s1: str, n_interp: int = 8,
                     interp_fn=slerp, max_retry: int = 40,
                     std_step: float = 0.005) -> List[Optional[str]]:
    """Decode molecules along the latent path; growing-noise retry
    (mol_interpolation.py:213-259). Returns one SMILES (or None) per
    alpha in linspace(0,1,n_interp+2)."""
    # pad both to a common length so mu/logvar shapes line up
    t0 = sampler.tokenizer(s0)
    t1 = sampler.tokenizer(s1)
    L = max(len(t0), len(t1))
    # encode together with shared padding
    _, mu, logvar = sampler.encode_smiles([s0, s1])
    mu0, mu1 = mu[0], mu[1]
    lv0, lv1 = logvar[0], logvar[1]
    rng = sampler.rng
    if len(t0) != len(t1):
        # length-mismatched pair: token-wise Gaussian refit of each
        # latent to the common length (reference interpolate_z_pair,
        # mol_interpolation.py:124-142) instead of trusting pad rows
        mu0 = approximate_z(mu0[: len(t0)], L, rng)
        mu1 = approximate_z(mu1[: len(t1)], L, rng)
        lv0 = approximate_z(lv0[: len(t0)], L, rng)
        lv1 = approximate_z(lv1[: len(t1)], L, rng)

    # interior alphas only: the endpoints of the returned path are the
    # INPUT molecules themselves, not decodes of their latents
    # (mol_interpolation.py:203-204 `if alpha == 0 or alpha == 1:
    # continue` and :258 `gen_smi = [src0] + gen_smi + [src1]`)
    out: List[Optional[str]] = [s0]
    for alpha in np.linspace(0.0, 1.0, n_interp + 2)[1:-1]:
        mu_a = interp_fn(mu0, mu1, float(alpha))
        lv_a = interp_fn(lv0, lv1, float(alpha))
        smi, std = None, 0.0
        for attempt in range(max_retry):
            eps = rng.standard_normal(mu_a.shape) * std
            z = (mu_a + eps * np.exp(0.5 * lv_a))[None]
            cand = sampler.decode_z(z, toklen=np.array([L]))[0]
            if cand and is_valid_smiles(cand):
                smi = cand
                break
            if attempt % 2 == 1:
                std += std_step  # grow noise every 2 tries (:245-250)
            if std >= 1.0:
                break
        out.append(smi)
    out.append(s1)
    return out


def compute_smoothness_prev(sims_prev: Sequence[float],
                            threshold: float = 0.50) -> float:
    """Fraction of adjacent-step similarities >= threshold
    (mol_interpolation.py:142-143)."""
    return sum(1 for s in sims_prev if s >= threshold) / len(sims_prev)


def compute_smoothness_start(sim_fwd: Sequence[float],
                             sim_rev: Sequence[float]) -> float:
    """1 - sqrt(std(d_fwd, ddof=1) * std(d_rev, ddof=1)) over the
    increment series of the similarity-to-first and similarity-to-last
    curves (mol_interpolation.py:145-150)."""
    d_fwd = np.diff(np.asarray(sim_fwd, float))
    d_rev = np.diff(np.asarray(sim_rev, float))
    return 1.0 - float((d_fwd.std(ddof=1) * d_rev.std(ddof=1)) ** 0.5)


def smoothness_metrics(path_smiles: List[Optional[str]],
                       threshold: float = 0.50) -> dict:
    """smooth_start / smooth_prev, reference formulas exactly
    (mol_interpolation.py:142-150,267-296):

    - smooth_prev = fraction of ADJACENT-step Tanimoto similarities
      >= threshold (compute_smoothness_prev, :142-143);
    - smooth_start = 1 - sqrt(std(d_fwd, ddof=1) * std(d_rev, ddof=1))
      where d_fwd/d_rev are the increment series of the similarity-to-
      FIRST and similarity-to-LAST curves over the whole path
      (compute_smoothness_start, :145-150; curves built at :280-290).

    The reference path never contains invalid entries (the retry loop
    exits the process otherwise, :251-256); here failed decodes are
    dropped from the path and surfaced via frac_decoded."""
    valid = [s for s in path_smiles if s]
    frac = len(valid) / max(1, len(path_smiles))
    if len(valid) < 3:
        return {"smooth_start": 0.0, "smooth_prev": 0.0,
                "frac_decoded": frac}
    first, last = valid[0], valid[-1]
    sim_fwd = np.array([tanimoto_similarity(first, s) or 0.0
                        for s in valid])
    sim_rev = np.array([tanimoto_similarity(last, s) or 0.0
                        for s in valid])
    sims_prev = [tanimoto_similarity(a, b) or 0.0
                 for a, b in zip(valid, valid[1:])]
    return {"smooth_start": compute_smoothness_start(sim_fwd, sim_rev),
            "smooth_prev": compute_smoothness_prev(sims_prev, threshold),
            "frac_decoded": frac}


def mol_interpolation(args, smiles_source: Sequence[str], log=None
                      ) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "mol_interpolation")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("mol_interpolation",
                            os.path.join(save_folder, "record.log"))
    sampler = build_sampler(args, log)
    pairs = sample_molecular_pairs(
        smiles_source, args.n_pairs,
        similarity_threshold=getattr(args, "similarity_threshold", 0.5),
        same_scaffold=getattr(args, "same_scaffold", False), seed=args.seed)

    rows = []
    for k, (s0, s1) in enumerate(pairs):
        path = interpolate_pair(sampler, s0, s1,
                                n_interp=getattr(args, "n_interpolations", 8))
        m = smoothness_metrics(path)
        m.update({"pair": k, "src": s0, "dst": s1,
                  "path": "|".join(s or "" for s in path)})
        rows.append(m)
        log.info(f"pair {k}: smooth_start={m['smooth_start']:.3f} "
                 f"smooth_prev={m['smooth_prev']:.3f}")
    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    return out
