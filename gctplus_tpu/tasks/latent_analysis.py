"""Latent-space analysis (reference Inference/test_encoder.py — the
deprecated S15 component, rebuilt in its useful form): encoder-output
distribution statistics, PCA and t-SNE projection plots
(test_encoder.py:509-789 plots PCA/t-SNE/UMAP), and latent distances
of similar vs dissimilar molecule pairs."""

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


def tsne_project(x: np.ndarray, perplexity: float = 30.0,
                 n_iter: int = 400, seed: int = 0) -> np.ndarray:
    """2-D t-SNE. Uses sklearn when present; otherwise an exact
    in-repo implementation (binary-search perplexity calibration +
    gradient descent with early exaggeration and momentum) — fine for
    the <=2k points this task projects."""
    try:
        from sklearn.manifold import TSNE
        return TSNE(n_components=2, perplexity=min(perplexity,
                                                   (len(x) - 1) / 3),
                    init="pca", random_state=seed).fit_transform(x)
    except Exception:
        pass
    n = len(x)
    perplexity = min(perplexity, max(2.0, (n - 1) / 3))
    d2 = np.sum((x[:, None] - x[None]) ** 2, axis=-1)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):  # per-row beta binary search
        lo, hi, beta = 0.0, np.inf, 1.0
        di = np.delete(d2[i], i)
        for _ in range(50):
            p = np.exp(-di * beta)
            s = p.sum()
            if s <= 0:
                beta, (lo, hi) = beta / 2, (lo, beta)
                continue
            h = np.log(s) + beta * (di * p).sum() / s
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo, beta = beta, beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi, beta = beta, (lo + beta) / 2
        row = np.exp(-di * beta)
        row /= max(row.sum(), 1e-12)
        P[i, np.arange(n) != i] = row
    P = (P + P.T) / (2 * n)
    P = np.maximum(P, 1e-12)
    rng = np.random.default_rng(seed)
    y = pca_project(x, 2) * 1e-2 + rng.normal(scale=1e-4, size=(n, 2))
    vel = np.zeros_like(y)
    for it in range(n_iter):
        ex = 12.0 if it < 100 else 1.0
        yd2 = np.sum((y[:, None] - y[None]) ** 2, axis=-1)
        q = 1.0 / (1.0 + yd2)
        np.fill_diagonal(q, 0.0)
        Q = np.maximum(q / q.sum(), 1e-12)
        g = 4.0 * ((ex * P - Q) * q)[:, :, None] * (y[:, None] - y[None])
        grad = g.sum(axis=1)
        vel = (0.5 if it < 250 else 0.8) * vel - 200.0 * grad
        y = y + vel
        y -= y.mean(axis=0, keepdims=True)
    return y


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
    emb = tsne_project(lat, seed=args.seed)
    pd.DataFrame({"t1": emb[:, 0], "t2": emb[:, 1],
                  "smiles": smiles}).to_csv(
        os.path.join(save_folder, "latent_tsne.csv"), index=False)
    pd.DataFrame([stats]).to_csv(
        os.path.join(save_folder, "stats.csv"), index=False)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for name, pts, labels in (
                ("latent_pca", proj, ("PC1", "PC2")),
                ("latent_tsne", emb, ("t-SNE 1", "t-SNE 2"))):
            fig, ax = plt.subplots(figsize=(5, 5))
            ax.scatter(pts[:, 0], pts[:, 1], s=6, alpha=0.6)
            ax.set_xlabel(labels[0])
            ax.set_ylabel(labels[1])
            ax.set_title("encoder latent space (mean-pooled mu)")
            fig.tight_layout()
            fig.savefig(os.path.join(save_folder, f"{name}.png"), dpi=110)
            plt.close(fig)
    except Exception as e:
        log.warning(f"latent-analysis plots skipped: {e!r}")

    log.info(f"latent stats: {stats}")
    return stats
