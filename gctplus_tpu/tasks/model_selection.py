"""Epoch selection by KL-divergence score (reference
Inference/model_selection.py:88-260): for each saved epoch, sample n
molecules and compute the GuacaMol-style S = mean(exp(-KL)) score vs a
reference set; pick the argmax epoch (:156-158)."""

from __future__ import annotations

import os
import re
from typing import Sequence

import pandas as pd

from gctplus_tpu.eval.kldiv import kldiv_score
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def list_epochs(model_folder: str):
    out = []
    for f in os.listdir(model_folder):
        m = re.match(r"model_(\d+)\.(msgpack|pt)$", f)
        if m:
            out.append((int(m.group(1)), f))
    return sorted(out)


def model_selection(args, ref_smiles: Sequence[str], log=None
                    ) -> pd.DataFrame:
    save_folder = os.path.join(args.save_folder, "model_selection")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("model_selection",
                            os.path.join(save_folder, "record.log"))
    rows = []
    epochs = list_epochs(args.model_folder)
    if getattr(args, "epoch_list", None):
        wanted = set(args.epoch_list)
        epochs = [(e, f) for e, f in epochs if e in wanted]
    for epoch, fname in epochs:
        gen_path = os.path.join(save_folder, f"gen_e{epoch}.csv")
        if os.path.exists(gen_path):
            gen = pd.read_csv(gen_path)["smiles"].tolist()
        else:
            args.model_name = fname
            sampler = build_sampler(args, log)
            gen, _ = sampler.sample_smiles(args.n_samples)
            pd.DataFrame({"smiles": gen}).to_csv(gen_path, index=False)
        scores = kldiv_score(gen, ref_smiles, args.n_jobs)
        scores["epoch"] = epoch
        rows.append(scores)
        log.info(f"epoch {epoch}: score={scores['score']:.4f}")
    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(save_folder, "metric.csv"), index=False)
    if len(out):
        best = out.loc[out["score"].idxmax()]
        best_epoch = int(best["epoch"])
        log.info(f"best epoch: {best_epoch} (score={best['score']:.4f})")
        # publish the winner under the conventional name used by the
        # sampling tasks' default -model_name
        import shutil
        src = dict(epochs)[best_epoch]
        if src.endswith(".msgpack"):
            shutil.copyfile(os.path.join(args.model_folder, src),
                            os.path.join(args.model_folder,
                                         "model_best.msgpack"))
    return out
