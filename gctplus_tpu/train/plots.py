"""Training-curve plots (reference Train/train_results.py +
Train/plot_results.py): per-epoch history CSVs -> RCE/KLD/LOSS curves."""

from __future__ import annotations

import os
import re
from typing import List, Optional

import pandas as pd


def collect_history(model_folder: str, kind: str = "train") -> pd.DataFrame:
    """Concatenate {kind}_{epoch}.csv files into one frame with an
    'epoch' column."""
    rows: List[pd.DataFrame] = []
    for f in sorted(os.listdir(model_folder)):
        m = re.match(rf"{kind}_(\d+)\.csv$", f)
        if not m:
            continue
        df = pd.read_csv(os.path.join(model_folder, f))
        df["epoch"] = int(m.group(1))
        rows.append(df)
    if not rows:
        return pd.DataFrame()
    return pd.concat(rows, ignore_index=True)


def plot_training_curves(model_folder: str, out_path: Optional[str] = None):
    """RCE/KLD/LOSS per-epoch means, train vs valid."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    train = collect_history(model_folder, "train")
    valid = collect_history(model_folder, "valid")
    if train.empty:
        return None
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.5))
    for ax, col in zip(axes, ("RCE", "KLD", "LOSS")):
        t = train.groupby("epoch")[col].mean()
        ax.plot(t.index, t.values, label="train")
        if not valid.empty:
            v = valid.groupby("epoch")[col].mean()
            ax.plot(v.index, v.values, label="valid")
        ax.set_title(col)
        ax.set_xlabel("epoch")
        ax.legend()
    fig.tight_layout()
    out_path = out_path or os.path.join(model_folder, "train_curves.png")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
