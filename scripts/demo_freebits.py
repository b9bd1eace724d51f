"""Free-bits ablation: retrain the flagship vaetf512 with the
-KLA_free_bits posterior-collapse guard (train/loss.py) on the same
50k corpus, then compare latent health (latent_analysis) and sample
quality against the collapsed baseline run
(evidence/demo_downstream512_result.json: mean|mu| 0.0026,
dim_collapse_frac 1.0).

Usage: python scripts/demo_freebits.py [workdir] [epochs] [free_bits]
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
    free_bits = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    t0 = time.time()

    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=epochs, batch_size=256,
        property_list=[], model_type="vaetf",
        model_folder=os.path.join(workdir, "run_vaetf512fb"),
        use_scaffold=False, randomize_prob=0.1,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1, KLA_free_bits=free_bits,
        lr_scheduler="WarmUpDefault",
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
              f"{args.start_epoch}..{epochs} (free_bits={free_bits})")
        train_task(args)

    import pandas as pd
    from gctplus_tpu.eval.metrics import (
        fraction_unique, fraction_valid, internal_diversity)
    from gctplus_tpu.tasks.common import build_sampler
    from gctplus_tpu.tasks.latent_analysis import latent_analysis

    base = dict(
        model_type="vaetf", model_folder=args.model_folder,
        model_name=f"model_{epochs}.msgpack",
        util_folder=args.util_folder,
        data_folder=workdir, save_folder=os.path.join(workdir, "results"),
        property_list=[], max_strlen=80, decode_algo="multinomial",
        top_k=None, n_jobs=8, seed=5, batch_size=512,
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.0,
        variational=True, use_cond2dec=False, use_cond2lat=False,
        get_attn=False)

    test = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
        "smiles"].tolist()
    out = {"free_bits": free_bits, "epochs": epochs}
    out["latent"] = latent_analysis(
        types.SimpleNamespace(**base, n_samples=200), test)

    sampler = build_sampler(types.SimpleNamespace(**base))
    smiles, _ = sampler.sample_smiles(5000)
    out["valid"] = round(fraction_valid(smiles, 8), 4)
    out["unique"] = round(fraction_unique(smiles, None, 8), 4)
    out["IntDiv"] = round(internal_diversity(smiles, 8), 4)
    out["wall_min"] = round((time.time() - t0) / 60, 1)

    with open(os.path.join(workdir, "demo_freebits_result.json"), "w") as f:
        json.dump(out, f)
    print("DEMO_FREEBITS " + json.dumps(out))


if __name__ == "__main__":
    main()
