"""Scaffold-conditioned end-to-end demo: train scavaetf on the
synthetic corpus (scaffold+<sep>+smiles plumbing), then sample around
held-out scaffolds and report SSF/sim80. Resumable.

Usage: python scripts/demo_train_scavaetf.py [workdir] [epochs]
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
    if not os.path.exists(os.path.join(workdir, "prepared", "train_sca.csv")):
        preprocess(workdir, n_jobs=8, n_synthetic=12000, seed=11)

    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=epochs, batch_size=192,
        property_list=[], model_type="scavaetf",
        model_folder=os.path.join(workdir, "run_scavaetf"),
        use_scaffold=True, randomize_prob=0.0,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
        lr_WarmUpSteps=600, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
        lr_eps=1e-9, n_data_shards=1, n_model_shards=1,
        compute_dtype="bfloat16",
        N=4, H=8, d_ff=1024, d_model=256, latent_dim=64, dropout=0.1,
        variational=True, use_cond2dec=False, use_cond2lat=False,
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

    import pandas as pd
    from gctplus_tpu.eval.metrics import fraction_valid, scaffold_metrics
    from gctplus_tpu.tasks.common import build_sampler
    from gctplus_tpu.tasks.sca_sampling import select_scaffolds

    sargs = types.SimpleNamespace(
        model_type="scavaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack", util_folder=args.util_folder,
        N=4, H=8, d_ff=1024, d_model=256, latent_dim=64, dropout=0.0,
        property_list=[], max_strlen=72, decode_algo="multinomial",
        top_k=None, seed=7, batch_size=256)
    sampler = build_sampler(sargs)

    raw = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
    scaffolds = select_scaffolds(raw["scaffold"].tolist(), 4, seed=3)

    rows = []
    for sca in scaffolds:
        smiles, _ = sampler.sample_smiles(400, sca)
        row = {"scaffold": sca, "valid": fraction_valid(smiles, 8)}
        row.update(scaffold_metrics(smiles, sca, 8))
        rows.append(row)
        print(sca, "->", {k: round(v, 3) for k, v in row.items()
                          if k != "scaffold"})

    out = {"epochs": epochs, "rows": rows,
           "wall_min": round((time.time() - t0) / 60, 1)}
    with open(os.path.join(workdir, "demo_scavaetf_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_SCAVAETF " + json.dumps(out))


if __name__ == "__main__":
    main()
