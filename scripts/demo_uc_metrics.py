"""Production-scale uc_sampling run against the trained demo vaetf:
30k samples + full in-repo MOSES-style metric report (the reference's
headline UC configuration, uc_sampling.py + BASELINE.md row 1).

Usage: python scripts/demo_uc_metrics.py [workdir] [epoch] [n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gct_demo"
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 30000
    t0 = time.time()

    import pandas as pd

    args = types.SimpleNamespace(
        model_type="vaetf", model_folder=os.path.join(workdir, "run_vaetf"),
        model_name=f"model_{epoch}.msgpack",
        util_folder=os.path.join(workdir, "utils"),
        data_folder=workdir, save_folder=os.path.join(workdir, "results"),
        property_list=[], max_strlen=80, decode_algo="multinomial",
        top_k=None, n_jobs=8, seed=123, batch_size=1024, n_samples=n,
        N=4, H=8, d_ff=1024, d_model=256, latent_dim=64, dropout=0.0,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False)

    from gctplus_tpu.tasks.uc_sampling import uc_sampling
    train = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))[
        "smiles"].tolist()
    test = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
        "smiles"].tolist()
    metrics = uc_sampling(args, train=train, test=test)
    out = metrics.iloc[0].to_dict()
    out["n_samples"] = n
    out["wall_min"] = round((time.time() - t0) / 60, 1)
    with open(os.path.join(workdir, "demo_uc30k_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_UC30K " + json.dumps(out))


if __name__ == "__main__":
    main()
