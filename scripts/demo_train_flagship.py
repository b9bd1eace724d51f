"""Flagship-scale end-to-end run: 50k-molecule synthetic corpus,
reference-size vaetf (N=6, d_model=512, d_ff=2048, latent 128 —
Configuration/config.py:2-7), 30 epochs, then 10k-sample metrics.
Resumable chunks like the other demos.

Usage: python scripts/demo_train_flagship.py [workdir] [epochs]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gct_flagship"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    t0 = time.time()
    os.makedirs(workdir, exist_ok=True)

    from gctplus_tpu.data.preprocess import preprocess
    if not os.path.exists(os.path.join(workdir, "prepared", "train.csv")):
        print(f"[{time.time()-t0:.0f}s] generating 50k corpus...")
        preprocess(workdir, n_jobs=8, n_synthetic=50000, seed=21)
    print(f"[{time.time()-t0:.0f}s] preprocess ready")

    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=epochs, batch_size=256,
        property_list=[], model_type="vaetf",
        model_folder=os.path.join(workdir, "run_vaetf512"),
        use_scaffold=False, randomize_prob=0.1,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=2000, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=1, n_model_shards=1,
        compute_dtype="bfloat16",
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False, skip_valid=True, fixed_seqlen=80)

    done = 0
    if os.path.isdir(args.model_folder):
        for f in os.listdir(args.model_folder):
            m = re.match(r"model_(\d+)\.msgpack$", f)
            if m:
                done = max(done, int(m.group(1)))
    args.start_epoch = done + 1
    if args.start_epoch <= epochs:
        from gctplus_tpu.tasks.train_task import train_task
        print(f"[{time.time()-t0:.0f}s] training epochs "
              f"{args.start_epoch}..{epochs}")
        train_task(args)

    import numpy as np
    import pandas as pd
    from gctplus_tpu.eval.metrics import (
        fraction_unique, fraction_valid, internal_diversity, novelty)
    from gctplus_tpu.tasks.common import build_sampler

    sargs = types.SimpleNamespace(
        model_type="vaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack", util_folder=args.util_folder,
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.0,
        property_list=[], max_strlen=80, decode_algo="multinomial",
        top_k=None, seed=7, batch_size=1024)
    sampler = build_sampler(sargs)
    smiles, _ = sampler.sample_smiles(10000)
    train_smi = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))[
        "smiles"].tolist()
    m = {
        "valid": fraction_valid(smiles, 8),
        "unique": fraction_unique(smiles, None, 8),
        "novelty": novelty(smiles, train_smi, 8, train_is_canonical=True),
        "IntDiv": internal_diversity(smiles, 8),
        "n_train": len(train_smi), "epochs": epochs,
        "model": "vaetf N=6 d512 dff2048 latent128",
        "wall_min": round((time.time() - t0) / 60, 1),
    }
    print("DEMO_FLAGSHIP " + json.dumps(m))
    with open(os.path.join(workdir, "demo_flagship_result.json"), "w") as f:
        json.dump(m, f)


if __name__ == "__main__":
    main()
