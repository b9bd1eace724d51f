"""Unconditioned sampling task (reference Inference/uc_sampling.py).

Sample n SMILES in batches, compute the MOSES-style metric report and
the 12-descriptor property distributions vs the test set; all outputs
are CSV-cached and reruns skip finished work (uc_sampling.py:132-191).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

from gctplus_tpu.chem.descriptors import PROPERTY_FN
from gctplus_tpu.chem.sanitize import mol_from_smiles
from gctplus_tpu.eval.metrics import get_all_metrics
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger

DESCRIPTORS = ["logP", "tPSA", "QED", "MW", "SAS", "NP", "HAC", "HBA",
               "HBD", "RBN", "AIRN", "ARRN"]


def _compute_props(smiles, props, n_jobs):
    from gctplus_tpu.chem.descriptors import props_rows

    vals = props_rows(smiles, props, n_jobs)
    vals = [v if v is not None else [np.nan] * len(props) for v in vals]
    return pd.DataFrame(vals, columns=props)


def uc_sampling(args, train=None, test=None, test_scaffolds=None,
                log=None) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "uc_sampling")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("uc_sampling",
                            os.path.join(save_folder, "record.log"))

    gen_path = os.path.join(save_folder, "gen.csv")
    if os.path.exists(gen_path):  # idempotent rerun (uc_sampling.py:132)
        gen = pd.read_csv(gen_path)
        log.info(f"reusing {gen_path}")
    else:
        sampler = build_sampler(args, log)
        smiles, toklen = sampler.sample_smiles(args.n_samples)
        gen = pd.DataFrame({"smiles": smiles, "toklen": toklen})
        gen.to_csv(gen_path, index=False)
        log.info(f"sampled {len(gen)} SMILES -> {gen_path}")

    metric_path = os.path.join(save_folder, "metric.csv")
    if not os.path.exists(metric_path):
        metrics = get_all_metrics(gen["smiles"].tolist(),
                                  train=train, test=test,
                                  test_scaffolds=test_scaffolds,
                                  n_jobs=args.n_jobs)
        pd.DataFrame([metrics]).to_csv(metric_path, index=False)
        log.info(f"metrics: {metrics}")

    prop_path = os.path.join(save_folder, "prop.csv")
    if not os.path.exists(prop_path):
        props = _compute_props(gen["smiles"].tolist(), DESCRIPTORS,
                               args.n_jobs)
        props.to_csv(prop_path, index=False)
        log.info(f"property distributions -> {prop_path}")

    # gen-vs-test distribution overlays (uc_sampling.py:158-191)
    try:
        from gctplus_tpu.eval.plots import plot_property_distributions
        gen_props = pd.read_csv(prop_path)
        ref_props = None
        if test is not None:
            ref_props = _compute_props(list(test)[:5000], DESCRIPTORS,
                                       args.n_jobs)
        plot_property_distributions(gen_props, ref_props, save_folder)
    except Exception as e:
        log.warning(f"distribution plots skipped: {e}")

    return pd.read_csv(metric_path)
