"""Compute the 27-combo property-error summary directly from the
p_sampling task's cached per-combo gen CSVs (for when the full task's
per-combo metric pass hasn't finished inside a round's wall-clock —
the decode outputs are the expensive part and are already on disk).

Usage: python scripts/psamp_salvage.py SAVE_FOLDER [max_per_combo]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main():
    folder = sys.argv[1]
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2500

    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.chem.sanitize import is_valid_smiles
    from gctplus_tpu.config import PROP_TOLERANCES

    props = ["logP", "tPSA", "QED"]
    rows = []
    for path in sorted(glob.glob(os.path.join(folder, "gen_*.csv"))):
        m = re.match(r"gen_([-\d.]+)_([-\d.]+)_([-\d.]+)\.csv",
                     os.path.basename(path))
        if not m:
            continue
        combo = tuple(float(g) for g in m.groups())
        smis = pd.read_csv(path)["smiles"].dropna().tolist()[:cap]
        vals = [v for v in (props_row(s, props) for s in smis)
                if v is not None]
        if not vals:
            continue
        vals = np.asarray(vals)
        row = {"logP": combo[0], "tPSA": combo[1], "QED": combo[2],
               "n": len(smis), "valid": len(vals) / len(smis)}
        for j, p in enumerate(props):
            err = vals[:, j] - combo[j]
            row[f"{p}_MAE"] = float(np.abs(err).mean())
            row[f"{p}_MSE"] = float((err ** 2).mean())
            row[f"{p}_SD"] = float(vals[:, j].std())
        in_tol = np.ones(len(vals), bool)
        for j, p in enumerate(props):
            in_tol &= np.abs(vals[:, j] - combo[j]) <= PROP_TOLERANCES.get(
                p, np.inf)
        row["valid_in_tolerance"] = float(in_tol.mean()) * row["valid"]
        rows.append(row)

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(folder, "metric_salvage.csv"), index=False)
    agg = {k: round(float(v), 4)
           for k, v in out.mean(numeric_only=True).items()}
    agg["n_combos"] = len(out)
    print("PSAMP_SALVAGE " + json.dumps(agg), flush=True)


if __name__ == "__main__":
    main()
