"""Scaffold-conditioned sampling task (reference Inference/sca_sampling.py).

Sample n molecules per scaffold (scaffolds drawn from the train set or
test_scaffolds source, deduplicated, sca_sampling.py:20-31); metrics
include SSF (scaffold-similarity == 1 fraction) and sim80
(sca_sampling.py:221-232)."""

from __future__ import annotations

import json
import os
from collections import Counter
from typing import List, Sequence

import numpy as np
import pandas as pd

from gctplus_tpu.eval.metrics import (
    analyze_all,
    internal_diversity,
    scaffold_metrics,
)
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def select_scaffolds(scaffold_source: Sequence[str], n_scaffolds: int,
                     seed: int = 0) -> List[str]:
    """Dedup then UNIFORM sample over unique scaffolds (reference
    get_sample, sca_sampling.py:20-31: drop_duplicates + .sample)."""
    counts = Counter(s for s in scaffold_source if isinstance(s, str) and s)
    uniq = list(counts)
    rng = np.random.default_rng(seed)
    if len(uniq) <= n_scaffolds:
        return uniq
    idx = rng.choice(len(uniq), n_scaffolds, replace=False)
    return [uniq[i] for i in idx]


def sca_sampling(args, scaffold_source: Sequence[str], train=None,
                 log=None) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "sca_sampling")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("sca_sampling",
                            os.path.join(save_folder, "record.log"))
    sampler = build_sampler(args, log)
    scaffolds = select_scaffolds(scaffold_source, args.n_scaffolds,
                                 args.seed)

    rows = []
    for si, sca in enumerate(scaffolds):
        # restart-resumable at metric granularity: the axon tunnel can
        # hang mid-protocol and the rerun must skip finished scaffolds
        # entirely (recomputing 2.5k-sample metrics costs ~10-20 s each)
        row_path = os.path.join(save_folder, f"row_s{si}.json")
        if os.path.exists(row_path):
            with open(row_path) as f:
                row = json.load(f)
            rows.append(row)
            log.info(f"[{si+1}/{len(scaffolds)}] cached "
                     f"(valid={row['valid']:.3f} SSF={row['SSF']:.3f})")
            continue
        gen_path = os.path.join(save_folder, f"gen_s{si}.csv")
        if os.path.exists(gen_path):
            gen = pd.read_csv(gen_path)
        else:
            smiles, _ = sampler.sample_smiles(args.n_samples, sca)
            gen = pd.DataFrame({"smiles": smiles, "scaffold": sca})
            gen.to_csv(gen_path, index=False)
        smiles = gen["smiles"].tolist()
        # reference aggregation (sca_sampling.py:196-234): canonicalize
        # ONCE; unique over valid, novelty/intDiv over the unique set
        ana = analyze_all(smiles, n_jobs=args.n_jobs, morgan_bits=1024)
        canon = ana["canonical"]
        valid_idx = [i for i, c in enumerate(canon) if c is not None]
        valid = [canon[i] for i in valid_idx]
        # unique set + the index of each unique string's first
        # occurrence (for its precomputed fingerprint row)
        first: dict = {}
        for i, c in zip(valid_idx, valid):
            first.setdefault(c, i)
        uniq = list(first)
        row = {"scaffold": sca,
               "valid": len(valid) / max(1, len(smiles)),
               "unique": len(uniq) / max(1, len(valid)),
               "intDiv": internal_diversity(
                   uniq, args.n_jobs,
                   fps=ana["morgan"][list(first.values())])}
        if train is not None:
            tset = train if isinstance(train, set) else set(train)
            row["novel"] = (sum(1 for u in uniq if u not in tset)
                            / max(1, len(uniq)))
        row.update(scaffold_metrics(
            valid, sca, args.n_jobs, canonical=True, n_total=len(smiles),
            scas=[ana["murcko"][i] for i in valid_idx]))
        with open(row_path + ".tmp", "w") as f:
            json.dump(row, f, default=float)
        os.replace(row_path + ".tmp", row_path)
        rows.append(row)
        log.info(f"[{si+1}/{len(scaffolds)}] valid={row['valid']:.3f} "
                 f"SSF={row['SSF']:.3f} sim80={row['sim80']:.3f}")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    return out
