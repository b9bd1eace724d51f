"""Evaluation plots (reference uc_sampling.py:26-39 KDE/bar plots and
p_sampling conditional KDEs): generated-vs-reference property
distribution overlays, per-property conditional distributions."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd


def _mpl():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def plot_property_distributions(gen_props: pd.DataFrame,
                                ref_props: Optional[pd.DataFrame],
                                save_folder: str,
                                density_props: Sequence[str] = (
                                    "logP", "tPSA", "QED", "MW", "SAS"),
                                count_props: Sequence[str] = (
                                    "HAC", "HBA", "HBD", "RBN", "AIRN",
                                    "ARRN")):
    """Continuous props as density overlays, counts as bars
    (Utils/properties.py property_type split)."""
    plt = _mpl()
    if plt is None:
        return None
    os.makedirs(save_folder, exist_ok=True)
    cols = [c for c in list(density_props) + list(count_props)
            if c in gen_props.columns]
    n = len(cols)
    fig, axes = plt.subplots((n + 3) // 4, 4, figsize=(16, 3 * ((n + 3) // 4)),
                             squeeze=False)
    for i, col in enumerate(cols):
        ax = axes[i // 4][i % 4]
        g = gen_props[col].dropna()
        if col in density_props:
            ax.hist(g, bins=40, density=True, alpha=0.55, label="gen")
            if ref_props is not None and col in ref_props:
                ax.hist(ref_props[col].dropna(), bins=40, density=True,
                        alpha=0.55, label="ref")
        else:
            vals = g.value_counts(normalize=True).sort_index()
            ax.bar(vals.index - 0.15, vals.values, width=0.3, label="gen")
            if ref_props is not None and col in ref_props:
                rv = ref_props[col].dropna().value_counts(
                    normalize=True).sort_index()
                ax.bar(rv.index + 0.15, rv.values, width=0.3, label="ref")
        ax.set_title(col)
        ax.legend(fontsize=7)
    for j in range(n, axes.size):
        axes[j // 4][j % 4].axis("off")
    fig.tight_layout()
    path = os.path.join(save_folder, "prop_distributions.png")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_conditional_property(gen_vals: Dict[float, np.ndarray],
                              prop_name: str, save_folder: str):
    """Per-target-value distribution overlays (p_sampling conditional
    KDE plots, Inference/p_sampling.py:268-318)."""
    plt = _mpl()
    if plt is None:
        return None
    os.makedirs(save_folder, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    for target, vals in sorted(gen_vals.items()):
        vals = np.asarray(vals)
        vals = vals[np.isfinite(vals)]
        if len(vals) == 0:
            continue
        ax.hist(vals, bins=40, density=True, alpha=0.5,
                label=f"target {target:g}")
        ax.axvline(target, color="k", lw=0.8, ls="--")
    ax.set_xlabel(prop_name)
    ax.set_ylabel("density")
    ax.legend(fontsize=8)
    fig.tight_layout()
    path = os.path.join(save_folder, f"cond_{prop_name}.png")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
