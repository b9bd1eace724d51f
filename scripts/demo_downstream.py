"""Downstream-task demos against the trained demo vaetf:
1. model-selection across saved epochs (GuacaMol-style KL score,
   reference README.md:105-109),
2. latent interpolation with smoothness metrics
   (mol_interpolation.py parity),
3. latent-space analysis stats.

Usage: python scripts/demo_downstream.py [workdir] [flagship]
(`flagship` switches to the reference-size vaetf512 run folder /
architecture and epochs 5..30.)
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
    flagship = len(sys.argv) > 2 and sys.argv[2] == "flagship"
    t0 = time.time()
    import pandas as pd

    if flagship:  # reference-size vaetf512 run (demo_train_flagship.py)
        arch = dict(N=6, H=8, d_ff=2048, d_model=512, latent_dim=128)
        run, last, epochs = "run_vaetf512", 30, [5, 10, 20, 30]
        result_name = "demo_downstream512_result.json"
    else:
        arch = dict(N=4, H=8, d_ff=1024, d_model=256, latent_dim=64)
        run, last, epochs = "run_vaetf", 40, [5, 10, 20, 30, 40]
        result_name = "demo_downstream_result.json"

    base = dict(
        model_type="vaetf", model_folder=os.path.join(workdir, run),
        model_name=f"model_{last}.msgpack",
        util_folder=os.path.join(workdir, "utils"),
        data_folder=workdir, save_folder=os.path.join(workdir, "results"),
        property_list=[], max_strlen=80, decode_algo="multinomial",
        top_k=None, n_jobs=8, seed=5, batch_size=512, dropout=0.0,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False, **arch)

    test = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
        "smiles"].tolist()

    out = {}

    # 1. model selection over a subset of epochs
    from gctplus_tpu.tasks.model_selection import model_selection
    ms_args = types.SimpleNamespace(**base, n_samples=400,
                                    epoch_list=epochs)
    df = model_selection(ms_args, test)
    out["model_selection"] = df[["epoch", "score"]].to_dict("records")
    out["best_epoch"] = int(df.loc[df["score"].idxmax(), "epoch"])

    # 2. interpolation
    from gctplus_tpu.tasks.mol_interpolation import mol_interpolation
    mi_args = types.SimpleNamespace(**base, n_pairs=10, n_interpolations=6,
                                    similarity_threshold=0.5,
                                    same_scaffold=False)
    mi = mol_interpolation(mi_args, test)
    if len(mi):
        out["interpolation"] = {
            "n_pairs": int(len(mi)),
            "smooth_start": float(mi["smooth_start"].mean()),
            "smooth_prev": float(mi["smooth_prev"].mean()),
            "frac_decoded": float(mi["frac_decoded"].mean()),
        }

    # 3. latent stats
    from gctplus_tpu.tasks.latent_analysis import latent_analysis
    la_args = types.SimpleNamespace(**base, n_samples=200)
    out["latent"] = latent_analysis(la_args, test)

    out["wall_min"] = round((time.time() - t0) / 60, 1)
    with open(os.path.join(workdir, result_name), "w") as f:
        json.dump(out, f)
    print("DEMO_DOWNSTREAM " + json.dumps(out))


if __name__ == "__main__":
    main()
