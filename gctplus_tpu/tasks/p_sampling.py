"""Property-conditioned sampling task (reference Inference/p_sampling.py).

For each of the 27 target (logP, tPSA, QED) combinations
(config_default.py:7-12): sample n molecules, compute
valid/unique/novel/intDiv, per-property MSE/MAE/SD and the
in-tolerance success rates (p_sampling.py:157-318)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from gctplus_tpu.config import PROP_TOLERANCES, target_prop_combinations
from gctplus_tpu.eval.metrics import (
    canonicalize_all,
    internal_diversity,
    property_error_stats,
)
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def get_n_train_near_prop(combos, props, tolerances, train_props):
    """Per target combo: number of train molecules with all properties
    within tolerance (reference Inference/p_sampling.py:36-45)."""
    out = []
    for combo in combos:
        mask = np.ones(len(train_props), bool)
        for j, p in enumerate(props):
            col = train_props[p].to_numpy(float)
            mask &= np.abs(col - combo[j]) <= tolerances.get(p, np.inf)
        out.append(int(mask.sum()))
    return out


def p_sampling(args, train=None, train_props=None, log=None) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "p_sampling")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("p_sampling",
                            os.path.join(save_folder, "record.log"))
    props = list(args.property_list) or ["logP", "tPSA", "QED"]
    sampler = build_sampler(args, log)

    combos = target_prop_combinations()
    n_train_near = None
    if train_props is not None and all(p in train_props for p in props):
        n_train_near = get_n_train_near_prop(
            combos, props, PROP_TOLERANCES, train_props)

    rows = []
    cond_values = {p: {} for p in props}  # prop -> target -> gen values
    for ci, combo in enumerate(combos):
        tag = "_".join(f"{v:g}" for v in combo)
        gen_path = os.path.join(save_folder, f"gen_{tag}.csv")
        if os.path.exists(gen_path):
            gen = pd.read_csv(gen_path)
        else:
            targets = np.tile(np.asarray(combo, np.float32),
                              (args.n_samples, 1))
            smiles, _ = sampler.sample_smiles(targets)
            gen = pd.DataFrame({"smiles": smiles})
            gen.to_csv(gen_path, index=False)
            log.info(f"combo {combo}: sampled {len(gen)}")

        smiles = gen["smiles"].tolist()
        # reference aggregation (p_sampling.py:234-266): canonicalize
        # once; unique over valid, novelty/intDiv over the UNIQUE set
        canon = canonicalize_all(smiles, args.n_jobs)
        valid_smis = [c for c in canon if c is not None]
        uniq = list(dict.fromkeys(valid_smis))
        n_valid = len(valid_smis)
        row = {
            "logP": combo[0], "tPSA": combo[1], "QED": combo[2],
            "valid": n_valid / max(1, len(smiles)),
            "unique": len(uniq) / max(1, n_valid),
            "intDiv": internal_diversity(uniq, args.n_jobs),
        }
        if train is not None:
            tset = train if isinstance(train, set) else set(train)
            row["novel"] = (sum(1 for u in uniq if u not in tset)
                            / max(1, len(uniq)))

        # property errors over valid molecules (aligned with valid_smis)
        from gctplus_tpu.chem.descriptors import props_rows

        vals = props_rows(valid_smis, props, args.n_jobs)
        keep = [(s, v) for s, v in zip(valid_smis, vals) if v is not None]
        if keep:
            kept_smis = [s for s, _ in keep]
            vals = np.asarray([v for _, v in keep])
            for j, p in enumerate(props):
                cond_values[p].setdefault(combo[j], []).extend(
                    vals[:, j].tolist())
            row.update(property_error_stats(
                vals, np.asarray(combo)[None, :], props))
            in_tol = np.ones(len(vals), bool)
            for j, p in enumerate(props):
                in_tol &= np.abs(vals[:, j] - combo[j]) <= PROP_TOLERANCES.get(
                    p, np.inf)
            # denominators are n_samples; unique_in_tolerance dedups
            # the in-box molecules (p_sampling.py:261-266)
            row["valid_in_tolerance"] = float(in_tol.sum()) / len(smiles)
            row["unique_in_tolerance"] = len(
                {s for s, ok in zip(kept_smis, in_tol) if ok}) / len(smiles)
        if n_train_near is not None:
            row["n_train"] = n_train_near[ci]
        rows.append(row)

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    # conditional distribution plots per property (p_sampling.py:268-318)
    try:
        from gctplus_tpu.eval.plots import plot_conditional_property
        for p in props:
            plot_conditional_property(
                {t: np.asarray(v) for t, v in cond_values[p].items()},
                p, save_folder)
    except Exception as e:
        log.warning(f"conditional-property plots skipped: {e!r}")
    log.info(f"mean valid: {out['valid'].mean():.4f}")
    return out
