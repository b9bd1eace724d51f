"""Property+scaffold joint sampling task (reference
Inference/psca_sampling.py:99-351): scaffold x 27 property combos x n
samples; joint metrics include the molgpt-style sim>=0.8 validity
filter (psca_sampling.py:222-224) plus per-scaffold and per-property
aggregations."""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pandas as pd

from gctplus_tpu.config import PROP_TOLERANCES, target_prop_combinations
from gctplus_tpu.eval.metrics import (
    analyze_all,
    internal_diversity,
    property_error_stats,
    scaffold_metrics,
)
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.tasks.sca_sampling import select_scaffolds
from gctplus_tpu.utils import get_logger


def psca_sampling(args, scaffold_source: Sequence[str], train=None,
                  log=None) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "psca_sampling")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("psca_sampling",
                            os.path.join(save_folder, "record.log"))
    props = list(args.property_list) or ["logP", "tPSA", "QED"]
    sampler = build_sampler(args, log)
    # reference psca_sampling.py:134-139: 'molgpt' scaffold source
    # switches both the scaffold list (Data/scaffold-condition/
    # molgpt.csv; config.MOLGPT_SCAFFOLDS fixture here) and the
    # property grid (molgpt_selected_target_prop, 2x2x2), and the
    # metric aggregation filters to scaffold-sim >= 0.8 (:222-224).
    source_name = getattr(args, "scaffold_source", None)
    molgpt = source_name == "molgpt"
    scaffolds = select_scaffolds(scaffold_source, args.n_scaffolds, args.seed)
    combos = target_prop_combinations(props, scaffold_source=source_name)

    rows = []
    for si, sca in enumerate(scaffolds):
        for combo in combos:
            tag = f"s{si}_" + "_".join(f"{v:g}" for v in combo)
            # restart-resumable at cell granularity (tunnel hangs)
            row_path = os.path.join(save_folder, f"row_{tag}.json")
            if os.path.exists(row_path):
                with open(row_path) as f:
                    rows.append(json.load(f))
                continue
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
            # reference aggregation (psca_sampling.py:200-276):
            # canonicalize once; unique over valid, novelty over the
            # unique set, intDiv over VALID (the reference's psca
            # choice — p_sampling uses unique). One-parse native
            # analysis: canonical + murcko + morgan + props together
            # (eval/metrics.py::analyze_all).
            ana = analyze_all(smiles, props=props, n_jobs=args.n_jobs,
                              morgan_bits=1024)
            canon = ana["canonical"]
            valid_idx = [i for i, c in enumerate(canon) if c is not None]
            valid_smis = [canon[i] for i in valid_idx]
            sm, scas, sims = scaffold_metrics(
                valid_smis, sca, args.n_jobs, canonical=True,
                n_total=len(smiles), return_details=True,
                scas=[ana["murcko"][i] for i in valid_idx])
            if molgpt:
                # molgpt validity (psca_sampling.py:217-224): the
                # sim>=0.8 subset REPLACES the valid set for every
                # downstream metric; SSF/sim stats follow the subset.
                keep_local = [k for k, s in enumerate(sims)
                              if s is not None and s >= 0.8]
                valid_idx = [valid_idx[k] for k in keep_local]
                valid_smis = [valid_smis[k] for k in keep_local]
                scas = [scas[k] for k in keep_local]
                sims_kept = [sims[k] for k in keep_local]
                sm = {
                    "SSF": (sum(1 for s in sims_kept if s == 1.0)
                            / len(sims_kept) if sims_kept
                            else float("nan")),
                    "sim80": 1.0 if sims_kept else float("nan"),
                    "avg_scaffold_sim": (float(np.mean(sims_kept))
                                         if sims_kept else float("nan")),
                }
            uniq = list(dict.fromkeys(valid_smis))
            n_valid = len(valid_smis)
            row = {"scaffold": sca}
            row.update({p: combo[j] for j, p in enumerate(props)})
            row.update({
                "valid": n_valid / max(1, len(smiles)),
                "unique": len(uniq) / max(1, n_valid),
                "intDiv": internal_diversity(
                    valid_smis, args.n_jobs,
                    fps=ana["morgan"][valid_idx])})
            if train is not None:
                tset = train if isinstance(train, set) else set(train)
                row["novel"] = (sum(1 for u in uniq if u not in tset)
                                / max(1, len(uniq)))
            # psca's own in-tolerance is JOINT (scaffold AND props,
            # psca_sampling.py:267-276) — computed below; drop the
            # scaffold-only variants scaffold_metrics returns
            sm = {k: v for k, v in sm.items()
                  if not k.endswith("_in_tolerance")}
            row.update(sm)
            # molgpt validity: valid AND scaffold-sim >= 0.8
            row["valid_molgpt"] = row["valid"] * sm["sim80"]

            vals = [ana["props"][i] for i in valid_idx]
            keep = [(s, sc, v) for s, sc, v in
                    zip(valid_smis, scas, vals) if v is not None]
            if keep:
                arr = np.asarray([v for _, _, v in keep])
                row.update(property_error_stats(
                    arr, np.asarray(combo)[None, :], props))
                # joint tolerance: scaffold match AND every property
                # inside its tolerance box; denominator n_samples
                good = np.asarray([sc == sca for _, sc, _ in keep])
                for j, p in enumerate(props):
                    good &= np.abs(arr[:, j] - combo[j]) <= \
                        PROP_TOLERANCES.get(p, np.inf)
                row["valid_in_tolerance"] = \
                    float(good.sum()) / max(1, len(smiles))
                row["unique_in_tolerance"] = len(
                    {s for (s, _, _), ok in zip(keep, good) if ok}
                ) / max(1, len(smiles))
            with open(row_path + ".tmp", "w") as f:
                json.dump(row, f, default=float)
            os.replace(row_path + ".tmp", row_path)
            rows.append(row)
        log.info(f"scaffold {si+1}/{len(scaffolds)} done")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    # per-scaffold and per-property aggregations (psca_sampling.py:278-298)
    out.groupby("scaffold").mean(numeric_only=True).to_csv(
        os.path.join(save_folder, "metric_by_scaffold.csv"))
    out.groupby(props).mean(numeric_only=True).to_csv(
        os.path.join(save_folder, "metric_by_property.csv"))
    return out
