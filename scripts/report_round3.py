"""Assemble the round-3 at-scale protocol results into side-by-side
tables vs the published baselines (BASELINE.md rows; reference
aggregation per Inference/sca_sampling.py:196-234 and
psca_sampling.py:173-298).

Reads the git-committed eval snapshots under evidence/bigrun_r3/
(written by scripts/chain_round3_{k,l}.sh::commit_eval as each
protocol eval finishes) so the report survives VM wipes.  Pure CPU —
never touches the TPU.

Usage: python scripts/report_round3.py [evidence/bigrun_r3]
"""

from __future__ import annotations

import glob
import os
import re
import sys

import pandas as pd

# BASELINE.md: published GCT numbers (Plot/plot_some.ipynb cell 10)
PUBLISHED = {
    ("sca", "train"): {"valid": 0.990, "SSF": 0.964},
    ("sca", "test_scaffolds"): {"valid": 0.990, "SSF": 0.937},
    ("psca", "train"): {"valid": 0.801, "SSF": 0.676},
    ("psca", "test_scaffolds"): {"valid": 0.769, "SSF": 0.627},
}


def tag_info(tag: str):
    """'sca_train_ep40' -> (protocol, source, epoch)."""
    m = re.match(r"(sca|psca|scacurve)_?(train|test_scaffolds)?_ep(\d+)", tag)
    if not m:
        return None
    proto, source, ep = m.group(1), m.group(2) or "train", int(m.group(3))
    return proto, source, ep


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "evidence/bigrun_r3"
    rows = []
    for d in sorted(glob.glob(os.path.join(root, "*"))):
        tag = os.path.basename(d)
        info = tag_info(tag)
        if info is None:
            continue
        proto, source, ep = info
        csvs = glob.glob(os.path.join(d, "*metric.csv"))
        if not csvs:
            continue
        df = pd.concat([pd.read_csv(c) for c in csvs], ignore_index=True)
        agg = df.mean(numeric_only=True)
        pub = PUBLISHED.get((proto, source), {})
        rows.append({
            "tag": tag, "protocol": proto, "source": source, "epoch": ep,
            "n_rows": len(df),
            "valid": round(float(agg.get("valid", float("nan"))), 4),
            "valid_pub": pub.get("valid"),
            "SSF": round(float(agg.get("SSF", float("nan"))), 4),
            "SSF_pub": pub.get("SSF"),
            "sim80": round(float(agg.get("sim80", float("nan"))), 4)
            if "sim80" in agg else None,
            "unique": round(float(agg.get("unique", float("nan"))), 4)
            if "unique" in agg else None,
            "novel": round(float(agg.get("novel", float("nan"))), 4)
            if "novel" in agg else None,
            "intDiv": round(float(agg.get("intDiv", float("nan"))), 4)
            if "intDiv" in agg else None,
        })
    if not rows:
        print(f"no protocol snapshots under {root} yet")
        return
    out = pd.DataFrame(rows).sort_values(["protocol", "source", "epoch"])
    with pd.option_context("display.width", 200,
                           "display.max_columns", 40):
        print(out.to_string(index=False))
    # markdown table for EVIDENCE.md paste-in
    print()
    print(out.to_markdown(index=False))


if __name__ == "__main__":
    main()
