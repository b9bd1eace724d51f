"""Latent-space analysis (reference Inference/test_encoder.py — the
deprecated S15 component, rebuilt in its useful form): encoder-output
distribution statistics, PCA projection plots, and latent distances of
similar vs dissimilar molecule pairs."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd

from gctplus_tpu.chem.fingerprints import tanimoto_similarity
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def _pool_latent(mu: np.ndarray) -> np.ndarray:
    """(bs, L, latent) -> (bs, latent) mean over token axis."""
    return mu.mean(axis=1)


def pca_project(x: np.ndarray, k: int = 2) -> np.ndarray:
    xc = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    return xc @ vt[:k].T


def latent_analysis(args, smiles: Sequence[str], log=None) -> dict:
    save_folder = os.path.join(args.save_folder, "latent_analysis")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("latent_analysis",
                            os.path.join(save_folder, "record.log"))
    sampler = build_sampler(args, log)

    n = min(len(smiles), getattr(args, "n_samples", 256))
    smiles = list(smiles)[:n]
    mus = []
    bs = 64
    for s in range(0, n, bs):
        _, mu, _ = sampler.encode_smiles(smiles[s: s + bs])
        mus.append(_pool_latent(mu))
    lat = np.concatenate(mus)

    stats = {
        "mean_abs_mu": float(np.abs(lat).mean()),
        "mu_std": float(lat.std()),
        "dim_collapse_frac": float((lat.std(axis=0) < 1e-3).mean()),
    }

    # similar pairs should be closer in latent space than random pairs
    rng = np.random.default_rng(args.seed)
    dists_sim, dists_rand = [], []
    for _ in range(min(200, n * 2)):
        i, j = rng.choice(n, 2, replace=False)
        t = tanimoto_similarity(smiles[i], smiles[j])
        if t is None:
            continue
        d = float(np.linalg.norm(lat[i] - lat[j]))
        (dists_sim if t > 0.4 else dists_rand).append(d)
    if dists_sim and dists_rand:
        stats["mean_dist_similar"] = float(np.mean(dists_sim))
        stats["mean_dist_random"] = float(np.mean(dists_rand))

    proj = pca_project(lat)
    pd.DataFrame({"pc1": proj[:, 0], "pc2": proj[:, 1],
                  "smiles": smiles}).to_csv(
        os.path.join(save_folder, "latent_pca.csv"), index=False)
    pd.DataFrame([stats]).to_csv(
        os.path.join(save_folder, "stats.csv"), index=False)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(proj[:, 0], proj[:, 1], s=6, alpha=0.6)
        ax.set_xlabel("PC1")
        ax.set_ylabel("PC2")
        ax.set_title("encoder latent space (mean-pooled mu)")
        fig.tight_layout()
        fig.savefig(os.path.join(save_folder, "latent_pca.png"), dpi=110)
        plt.close(fig)
    except Exception as e:
        log.warning(f"latent-analysis plots skipped: {e!r}")

    log.info(f"latent stats: {stats}")
    return stats
