"""Token-length distribution sampling.

At inference the reference samples generation lengths from the
histogram CDF of the train-set token lengths
(Inference/toklen_sampling.py:9-35, data from Utils/dataset.py:51-57).
Same construction, vectorized: histogram -> CDF -> inverse-CDF draws
with half-bin Gaussian jitter.
"""

from __future__ import annotations

import numpy as np


def sample_toklens(toklen_data: np.ndarray, size: int,
                   rng: np.random.Generator | None = None,
                   n_bins: int | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    data = np.asarray(toklen_data, float).ravel()
    if n_bins is None:
        n_bins = max(1, int(data.max() - data.min()))
    counts, edges = np.histogram(data, bins=n_bins)
    pdf = counts / counts.sum()
    dx = np.diff(edges)[0]
    centers = edges[:-1] + 0.5 * dx
    cdf = np.zeros(len(edges))
    cdf[1:] = np.cumsum(pdf)
    u = rng.uniform(0, 1, size)
    idx = np.searchsorted(cdf, u, side="left") - 1
    idx = np.clip(idx, 0, len(centers) - 1)
    vals = centers[idx] + dx * rng.standard_normal(size) / 2
    return np.rint(vals).astype(int)
