"""Joint property+scaffold flagship run: pscavaetf (the reference's
hardest variant, Bashscript/train/train_pscavaetf.sh recipe) on the
50k corpus, then scaffold x property-target sampling with joint
metrics. Resumable chunks.

Usage: python scripts/demo_train_pscavaetf.py [workdir] [epochs]
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
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    t0 = time.time()

    args = types.SimpleNamespace(
        seed=1, start_epoch=1, num_epoch=epochs, batch_size=128,
        property_list=["logP", "tPSA", "QED"], model_type="pscavaetf",
        model_folder=os.path.join(workdir, "run_pscavaetf"),
        use_scaffold=True, randomize_prob=0.0,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=3000, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=1, n_model_shards=1,
        compute_dtype="bfloat16",
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=True,
        get_attn=False, skip_valid=True, fixed_seqlen=72)

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
    from functools import partial
    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.chem.mapper import pmap
    from gctplus_tpu.eval.metrics import (
        fraction_valid, property_error_stats, scaffold_metrics)
    from gctplus_tpu.tasks.common import build_sampler
    from gctplus_tpu.tasks.sca_sampling import select_scaffolds

    sargs = types.SimpleNamespace(
        model_type="pscavaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack", util_folder=args.util_folder,
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.0,
        property_list=["logP", "tPSA", "QED"], max_strlen=72,
        decode_algo="multinomial", top_k=None, seed=7, batch_size=256)
    sampler = build_sampler(sargs)

    raw = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
    med = raw[["logP", "tPSA", "QED"]].median().to_numpy()
    scaffolds = select_scaffolds(raw["scaffold"].tolist(), 3, seed=5)

    rows = []
    for sca in scaffolds:
        targets = np.tile(np.asarray(med, np.float32), (300, 1))
        smiles, _ = sampler.sample_smiles(targets, sca)
        row = {"scaffold": sca, "valid": fraction_valid(smiles, 8)}
        row.update(scaffold_metrics(smiles, sca, 8))
        vals = [v for v in pmap(partial(
            props_row, props=["logP", "tPSA", "QED"]), smiles, 8)
            if v is not None]
        if vals:
            stats = property_error_stats(
                np.asarray(vals), np.asarray(med)[None, :],
                ["logP", "tPSA", "QED"])
            row.update({k: v for k, v in stats.items()
                        if k.endswith("MAE")})
        rows.append(row)
        print({k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in row.items()})

    out = {"epochs": epochs, "rows": rows,
           "wall_min": round((time.time() - t0) / 60, 1)}
    with open(os.path.join(workdir, "demo_pscavaetf_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_PSCAVAETF " + json.dumps(out))


if __name__ == "__main__":
    main()
