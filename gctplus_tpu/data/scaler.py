"""Property scaler (sklearn RobustScaler replacement, no deps).

Parity: the reference fits RobustScaler(quantile_range=(25,75)) on the
train-set properties and pickles it (Utils/scaler.py:13-36,
preprocess.py:145). Same math: x' = (x - median) / IQR. Persisted as
JSON instead of joblib pickle.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np


class RobustScaler:
    def __init__(self, center: Optional[np.ndarray] = None,
                 scale: Optional[np.ndarray] = None,
                 columns: Optional[Sequence[str]] = None):
        self.center_ = None if center is None else np.asarray(center, float)
        self.scale_ = None if scale is None else np.asarray(scale, float)
        self.columns = list(columns) if columns else None

    def fit(self, X, columns: Optional[Sequence[str]] = None) -> "RobustScaler":
        X = np.asarray(X, float)
        self.center_ = np.nanmedian(X, axis=0)
        q75 = np.nanpercentile(X, 75, axis=0)
        q25 = np.nanpercentile(X, 25, axis=0)
        iqr = q75 - q25
        iqr[iqr == 0] = 1.0
        self.scale_ = iqr
        if columns is not None:
            self.columns = list(columns)
        return self

    def transform(self, X) -> np.ndarray:
        X = np.asarray(X, float)
        return (X - self.center_) / self.scale_

    def inverse_transform(self, X) -> np.ndarray:
        X = np.asarray(X, float)
        return X * self.scale_ + self.center_

    # --- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"center": self.center_.tolist(),
                       "scale": self.scale_.tolist(),
                       "columns": self.columns}, f)

    @classmethod
    def load(cls, path: str) -> "RobustScaler":
        with open(path) as f:
            d = json.load(f)
        return cls(np.asarray(d["center"]), np.asarray(d["scale"]),
                   d.get("columns"))
