"""Flagship-scale property-conditioned run: pvaetf at the reference
architecture (N=6, d_model=512 — Configuration/config.py:2-7) on the
50k corpus, then the reference's full 27-combo p-sampling protocol
(Inference/p_sampling.py: 3x3x3 logP/tPSA/QED targets with tolerance
success rates). Resumable chunks.

Usage: python scripts/demo_train_pvaetf512.py [workdir] [epochs] [n/combo]
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
    n_per_combo = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    t0 = time.time()

    args = types.SimpleNamespace(
        seed=1, start_epoch=1, num_epoch=epochs, batch_size=128,
        property_list=["logP", "tPSA", "QED"], model_type="pvaetf",
        model_folder=os.path.join(workdir, "run_pvaetf512"),
        use_scaffold=False, randomize_prob=0.0,
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

    import pandas as pd
    from gctplus_tpu.tasks.p_sampling import p_sampling

    sargs = types.SimpleNamespace(
        model_type="pvaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack", util_folder=args.util_folder,
        save_folder=os.path.join(workdir, "results_pvaetf512"),
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.0,
        property_list=["logP", "tPSA", "QED"], max_strlen=72,
        decode_algo="multinomial", top_k=None, seed=7, batch_size=256,
        n_samples=n_per_combo, n_jobs=8)

    raw = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
    df = p_sampling(sargs, train=raw["smiles"].tolist())

    out = {
        "epochs": epochs, "n_per_combo": n_per_combo,
        "mean_valid": round(float(df["valid"].mean()), 4),
        "mean_unique": round(float(df["unique"].mean()), 4),
        "mean_novel": round(float(df["novel"].mean()), 4),
        "mean_intDiv": round(float(df["intDiv"].mean()), 4),
        "logP_MAE": round(float(df["logP_MAE"].mean()), 4),
        "tPSA_MAE": round(float(df["tPSA_MAE"].mean()), 4),
        "QED_MAE": round(float(df["QED_MAE"].mean()), 4),
        "mean_valid_in_tol": round(
            float(df["valid_in_tolerance"].mean()), 4),
        "wall_min": round((time.time() - t0) / 60, 1),
    }
    with open(os.path.join(workdir, "demo_pvaetf512_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_PVAETF512 " + json.dumps(out))


if __name__ == "__main__":
    main()
