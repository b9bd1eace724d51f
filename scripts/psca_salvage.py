"""Aggregate partial psca/sca protocol cells (row_*.json) into the
final-table metrics, exactly as tasks/psca_sampling.py:120-126 /
sca_sampling would have — for runs cut mid-protocol by the wall clock
(cells are written atomically per (scaffold, combo), so every present
row is complete and the mean over present rows is an unbiased
protocol estimate at reduced n_scaffolds/cells).

Usage: python scripts/psca_salvage.py DIR [DIR...]
where DIR holds row_*.json (a psca_sampling/ save folder or an
evidence/bigrun_r4/partial/* copy). Prints one PSCA_MEAN json line
per DIR and writes metric.csv next to the rows.
"""

import glob
import json
import os
import sys

import pandas as pd


def salvage(d: str):
    rows = []
    for p in sorted(glob.glob(os.path.join(d, "row_*.json"))):
        with open(p) as f:
            rows.append(json.load(f))
    if not rows:
        print(f"{d}: no rows")
        return
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(d, "metric.csv"), index=False)
    # average only true metric columns — config fields in the rows
    # (target logP/tPSA/QED/SAS, seeds) would otherwise pollute the
    # aggregate (mirrors tasks/psca_sampling.py's final table)
    config_cols = {"logP", "tPSA", "QED", "SAS", "seed", "epoch",
                   "top_p", "scaffold"}
    metric_cols = [c for c in df.columns
                   if c not in config_cols
                   and pd.api.types.is_numeric_dtype(df[c])]
    mean = df[metric_cols].mean(numeric_only=True).to_dict()
    mean["n_cells"] = len(df)
    mean["n_scaffolds"] = df["scaffold"].nunique()
    print(f"PSCA_MEAN {d} " + json.dumps(
        {k: round(float(v), 4) for k, v in mean.items()}))


if __name__ == "__main__":
    for d in sys.argv[1:]:
        salvage(d)
