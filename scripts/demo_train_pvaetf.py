"""Conditioned end-to-end demo: train pvaetf (logP/tPSA/QED-conditioned)
on the synthetic corpus, then sample at 3 property targets and report
per-property MAE. Resumable like demo_train.py.

Usage: python scripts/demo_train_pvaetf.py [workdir] [epochs]
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
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gct_demo"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    t0 = time.time()

    from gctplus_tpu.data.preprocess import preprocess
    if not os.path.exists(os.path.join(workdir, "prepared", "train.csv")):
        preprocess(workdir, n_jobs=8, n_synthetic=12000, seed=11)

    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=epochs, batch_size=256,
        property_list=["logP", "tPSA", "QED"], model_type="pvaetf",
        model_folder=os.path.join(workdir, "run_pvaetf"),
        use_scaffold=False, randomize_prob=0.1,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=400, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=1, n_model_shards=1,
        compute_dtype="bfloat16",
        N=4, H=8, d_ff=1024, d_model=256, latent_dim=64, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=True,
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

    # sample at 3 property targets and measure conditioning error
    import numpy as np
    import pandas as pd
    from functools import partial
    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.chem.mapper import pmap
    from gctplus_tpu.eval.metrics import fraction_valid, property_error_stats
    from gctplus_tpu.tasks.common import build_sampler

    sargs = types.SimpleNamespace(
        model_type="pvaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack", util_folder=args.util_folder,
        N=4, H=8, d_ff=1024, d_model=256, latent_dim=64, dropout=0.0,
        property_list=["logP", "tPSA", "QED"], max_strlen=80,
        decode_algo="multinomial", top_k=None, seed=7, batch_size=512)
    sampler = build_sampler(sargs)

    # targets drawn from the synthetic corpus's property range
    raw = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
    med = raw[["logP", "tPSA", "QED"]].median().to_numpy()
    targets = [med * [0.7, 0.7, 1.0], med, med * [1.3, 1.3, 1.0]]

    results = []
    for tgt in targets:
        props = np.tile(np.asarray(tgt, np.float32), (600, 1))
        smiles, _ = sampler.sample_smiles(props)
        valid = fraction_valid(smiles, 8)
        vals = [v for v in pmap(partial(
            props_row, props=["logP", "tPSA", "QED"]), smiles, 8)
            if v is not None]
        stats = property_error_stats(
            np.asarray(vals), np.asarray(tgt)[None, :],
            ["logP", "tPSA", "QED"]) if vals else {}
        row = {"target_logP": float(tgt[0]), "target_tPSA": float(tgt[1]),
               "target_QED": float(tgt[2]), "valid": valid}
        row.update({k: v for k, v in stats.items() if k.endswith("MAE")})
        results.append(row)
        print("target", np.round(tgt, 2).tolist(), "->", row)

    out = {"epochs": epochs, "rows": results,
           "wall_min": round((time.time() - t0) / 60, 1)}
    with open(os.path.join(workdir, "demo_pvaetf_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_PVAETF " + json.dumps(out))


if __name__ == "__main__":
    main()
