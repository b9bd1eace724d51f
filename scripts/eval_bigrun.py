"""Headline evaluation for the MOSES-scale run: the reference's own
benchmark protocols (Inference/uc_sampling.py:101-191,
p_sampling.py:157-318, sca_sampling.py:137-260, psca_sampling.py:99-351).

Usage:
  python scripts/eval_bigrun.py uc    [workdir] [epoch] [n]
  python scripts/eval_bigrun.py psamp [workdir] [epoch] [n_per_combo]
  python scripts/eval_bigrun.py sca   [workdir] [epoch] [n_per_scaffold]
                                      [n_scaffolds] [source]
  python scripts/eval_bigrun.py psca  [workdir] [epoch] [n_per_cell]
                                      [n_scaffolds] [source]

source: 'train' (seen) or 'test_scaffolds' (unseen: test-set scaffolds
absent from the train scaffold set — the MOSES test_scaffolds analog).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _args(workdir, variant, epoch, **kw):
    suffix = os.environ.get("GCT_RUN_SUFFIX", "")  # experiment arm
    # GCT_EVAL_SEED varies the sampling seed for the 3-seed error-bar
    # protocol (the published numbers are 3-seed means,
    # Plot/plot_some.ipynb); non-default seeds get their own results
    # dir so the gen caches don't collide
    seed = int(os.environ.get("GCT_EVAL_SEED", "7"))
    seed_tag = "" if seed == 7 else f"_s{seed}"
    base = dict(
        model_type=variant,
        model_folder=os.path.join(workdir, f"run_{variant}512{suffix}"),
        model_name=f"model_{epoch}.msgpack",
        util_folder=os.path.join(workdir, "utils"),
        data_folder=workdir,
        save_folder=os.path.join(
            workdir, f"results_{variant}{suffix}_{epoch}{seed_tag}"),
        property_list=(["logP", "tPSA", "QED"]
                       if variant in ("pvaetf", "pscavaetf") else []),
        max_strlen=80, decode_algo="multinomial", top_k=None, n_jobs=1,
        seed=seed, batch_size=512, N=6, H=8, d_ff=2048, d_model=512,
        latent_dim=128, dropout=0.0, variational=True,
        use_cond2dec=False, use_cond2lat=(variant != "vaetf"),
        get_attn=False, compute_dtype="bfloat16")
    base.update(kw)
    return types.SimpleNamespace(**base)


def main():
    mode = sys.argv[1]
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_work/bigrun"
    epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    t0 = time.time()

    import pandas as pd

    if mode == "uc":
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 30000
        from gctplus_tpu.tasks.uc_sampling import uc_sampling
        train = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))[
            "smiles"].tolist()
        test = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
            "smiles"].tolist()
        tsf_path = os.path.join(workdir, "raw", "test_scaffolds.csv")
        tsf = (pd.read_csv(tsf_path)["smiles"].tolist()
               if os.path.exists(tsf_path) else None)
        m = uc_sampling(_args(workdir, "vaetf", epoch, n_samples=n),
                        train=train, test=test, test_scaffolds=tsf)
        print("UC_METRICS " + json.dumps(
            {k: (float(v) if isinstance(v, (int, float)) else str(v))
             for k, v in m.iloc[0].to_dict().items()}), flush=True)
    elif mode == "psamp":
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 10000
        from gctplus_tpu.tasks.p_sampling import p_sampling
        train_props = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
        # train set membership -> per-combo novelty (the published P
        # row reports novelty 0.953, Plot/plot_some.ipynb cell 10)
        df = p_sampling(_args(workdir, "pvaetf", epoch, n_samples=n),
                        train=set(train_props["smiles"].tolist()),
                        train_props=train_props)
        agg = df.mean(numeric_only=True).to_dict()
        print("PSAMP_MEAN " + json.dumps(
            {k: round(float(v), 4) for k, v in agg.items()}), flush=True)
    elif mode == "interp":
        # latent interpolation smoothness at the reference protocol
        # shape (mol_interpolation.py:329-374; published smooth_start
        # 0.777 / smooth_prev 0.706)
        n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 30
        from gctplus_tpu.tasks.mol_interpolation import mol_interpolation
        test = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
            "smiles"].dropna().tolist()[:20000]
        a = _args(workdir, "vaetf", epoch, n_pairs=n_pairs,
                  n_interpolations=8, batch_size=1,
                  # the reference interpolates with GREEDY decode
                  # (inference.py:37 default, not overridden by the
                  # mol-interpolation subcommand) — the round-3 run
                  # used multinomial, which is the root cause of
                  # smooth_prev 0.322 vs published 0.706 (adjacent-
                  # alpha molecules decode stochastically)
                  decode_algo="greedy",
                  save_folder=os.path.join(workdir,
                                           f"results_interp_{epoch}g"))
        df = mol_interpolation(a, test)
        print("INTERP_MEAN " + json.dumps({
            "smooth_start": round(float(df["smooth_start"].mean()), 4),
            "smooth_prev": round(float(df["smooth_prev"].mean()), 4),
            "frac_decoded": round(float(df["frac_decoded"].mean()), 4),
            "n_pairs": len(df)}), flush=True)
    elif mode == "msel":
        # per-epoch GuacaMol KL score sweep (reference
        # model_selection.py:121-158 picks epoch 37-38 for vaetf)
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 3000
        from gctplus_tpu.tasks.model_selection import model_selection
        ref = pd.read_csv(os.path.join(workdir, "raw", "test.csv"))[
            "smiles"].dropna().tolist()[:10000]
        epoch_list = ([int(x) for x in sys.argv[5].split(",")]
                      if len(sys.argv) > 5 else None)
        a = _args(workdir, "vaetf", epoch, n_samples=n,
                  save_folder=os.path.join(workdir, "results_msel"))
        a.epoch_list = epoch_list
        df = model_selection(a, ref)
        print("MSEL " + df.to_json(orient="records"), flush=True)
    elif mode in ("sca", "psca"):
        n = int(sys.argv[4]) if len(sys.argv) > 4 else \
            (2500 if mode == "sca" else 250)
        n_sca = int(sys.argv[5]) if len(sys.argv) > 5 else \
            (100 if mode == "sca" else 10)
        source = sys.argv[6] if len(sys.argv) > 6 else "train"
        raw_train = pd.read_csv(os.path.join(workdir, "raw", "train.csv"))
        train_set = set(raw_train["smiles"].tolist())
        if source == "train":
            scaffold_source = raw_train["scaffold"].dropna().tolist()
        elif source == "test_scaffolds":
            # the reference reads its test_scaffolds split directly
            # (MOSES guarantees scaffold holdout); our synthetic split
            # shares ~47% of scaffolds with train, so filter to the
            # truly-unseen ones (~14.8k uniques remain)
            raw_test = pd.read_csv(
                os.path.join(workdir, "raw", "test_scaffolds.csv"))
            seen = set(raw_train["scaffold"].dropna())
            scaffold_source = [s for s in raw_test["scaffold"].dropna()
                               if s and s not in seen]
        else:
            raise SystemExit(f"unknown scaffold source {source}")
        variant = "scavaetf" if mode == "sca" else "pscavaetf"
        # scaffold decode shapes: prefix bucket + 80 new tokens
        a = _args(workdir, variant, epoch, n_scaffolds=n_sca, n_samples=n,
                  use_scaffold=True,
                  # one compiled program per 16-wide prefix bucket
                  # ({32,48,64} covers both sources) instead of one per
                  # (8-wide bucket, toklen-max) pair — the remote
                  # compile service costs ~1-2 min per decode program
                  fixed_decode_shapes=True,
                  save_folder=os.path.join(
                      workdir,
                      f"results_{variant}"
                      f"{os.environ.get('GCT_RUN_SUFFIX', '')}"
                      f"_{epoch}_{source}"
                      # non-default eval seeds get their own cell
                      # cache — without this, a seed rerun silently
                      # aggregates the default seed's cached rows
                      # (observed: sca1k s11/s13 == the 10k run)
                      + ("" if os.environ.get("GCT_EVAL_SEED", "7") == "7"
                         else f"_s{os.environ['GCT_EVAL_SEED']}")))
        if mode == "sca":
            from gctplus_tpu.tasks.sca_sampling import sca_sampling
            df = sca_sampling(a, scaffold_source, train=train_set)
        else:
            from gctplus_tpu.tasks.psca_sampling import psca_sampling
            df = psca_sampling(a, scaffold_source, train=train_set)
        # average only true metric columns — the per-cell target
        # values (logP/tPSA/QED) are protocol config, not results
        # (mirrors scripts/psca_salvage.py)
        config_cols = {"logP", "tPSA", "QED", "SAS", "seed", "epoch",
                       "top_p", "scaffold"}
        metric_cols = [c for c in df.columns if c not in config_cols]
        agg = df[metric_cols].mean(numeric_only=True).to_dict()
        print(f"{mode.upper()}_MEAN [{source}] " + json.dumps(
            {k: round(float(v), 4) for k, v in agg.items()}), flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"DONE {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
