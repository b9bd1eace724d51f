"""Property+scaffold joint sampling task (reference
Inference/psca_sampling.py:99-351): scaffold x 27 property combos x n
samples; joint metrics include the molgpt-style sim>=0.8 validity
filter (psca_sampling.py:222-224) plus per-scaffold and per-property
aggregations."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd

from gctplus_tpu.chem.mapper import pmap
from gctplus_tpu.config import target_prop_combinations
from gctplus_tpu.eval.metrics import (
    fraction_unique,
    fraction_valid,
    property_error_stats,
    scaffold_metrics,
)
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.tasks.sca_sampling import select_scaffolds
from gctplus_tpu.utils import get_logger


def psca_sampling(args, scaffold_source: Sequence[str], log=None
                  ) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "psca_sampling")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("psca_sampling",
                            os.path.join(save_folder, "record.log"))
    props = list(args.property_list) or ["logP", "tPSA", "QED"]
    sampler = build_sampler(args, log)
    scaffolds = select_scaffolds(scaffold_source, args.n_scaffolds, args.seed)
    combos = target_prop_combinations()

    rows = []
    for si, sca in enumerate(scaffolds):
        for combo in combos:
            tag = f"s{si}_" + "_".join(f"{v:g}" for v in combo)
            gen_path = os.path.join(save_folder, f"gen_{tag}.csv")
            if os.path.exists(gen_path):
                gen = pd.read_csv(gen_path)
            else:
                targets = np.tile(np.asarray(combo, np.float32),
                                  (args.n_samples, 1))
                smiles, _ = sampler.sample_smiles(targets, sca)
                gen = pd.DataFrame({"smiles": smiles})
                gen.to_csv(gen_path, index=False)
            smiles = gen["smiles"].tolist()
            row = {"scaffold": sca, "logP": combo[0], "tPSA": combo[1],
                   "QED": combo[2],
                   "valid": fraction_valid(smiles, args.n_jobs),
                   "unique": fraction_unique(smiles, None, args.n_jobs)}
            sm = scaffold_metrics(smiles, sca, args.n_jobs)
            row.update(sm)
            # molgpt validity: valid AND scaffold-sim >= 0.8
            row["valid_molgpt"] = row["valid"] * sm["sim80"]

            from functools import partial

            from gctplus_tpu.chem.descriptors import props_row

            vals = [v for v in pmap(partial(props_row, props=props),
                                    smiles, args.n_jobs) if v is not None]
            if vals:
                row.update(property_error_stats(
                    np.asarray(vals), np.asarray(combo)[None, :], props))
            rows.append(row)
        log.info(f"scaffold {si+1}/{len(scaffolds)} done")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    # per-scaffold and per-property aggregations (psca_sampling.py:278-298)
    out.groupby("scaffold").mean(numeric_only=True).to_csv(
        os.path.join(save_folder, "metric_by_scaffold.csv"))
    out.groupby(["logP", "tPSA", "QED"]).mean(numeric_only=True).to_csv(
        os.path.join(save_folder, "metric_by_property.csv"))
    return out
