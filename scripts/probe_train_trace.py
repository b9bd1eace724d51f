"""Trace the flagship TRAIN step on the real TPU and print an op-class
time breakdown (VERDICT r2 weak #1: where do the other 82% of the
318 ms step go?).

Runs the production history train step at the bigrun shape (bs=512,
len 80, bf16), captures a jax.profiler trace of a few steps, then
aggregates the chrome-trace events by op-name class.

Usage: python scripts/probe_train_trace.py [outdir] [bs] [seqlen]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


import re


def analyze_trace(path: str, n_steps: int, peak_tf=197e12, peak_bw=819e9):
    """Roofline table from the chrome trace's HLO metadata.

    Aggregates device ops by `hlo_category`, with per-category achieved
    TFLOP/s (from `model_flops`) and GB/s (from `raw_bytes_accessed`),
    plus the XLA auto-remat share — enough to read off whether the step
    is MXU- or HBM-limited without xprof tooling."""
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("name") == "process_name"}
    device_pids = {p for p, nm in pid_names.items() if "TPU" in nm}
    cat = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    remat_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        n = e.get("name", "")
        # skip the whole-program envelope and per-step marker events
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue
        a = e.get("args", {})
        dur = e.get("dur", 0) / 1e3  # us -> ms
        c = cat[a.get("hlo_category", "(uncategorized)")]
        c[0] += dur
        c[1] += float(a.get("model_flops", 0) or 0)
        c[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        if ".remat" in n:
            remat_ms += dur
    total_ms = sum(v[0] for v in cat.values())
    total_bytes = sum(v[2] for v in cat.values())
    total_flops = sum(v[1] for v in cat.values())
    print(f"device {total_ms/n_steps:.1f} ms/step, "
          f"{total_bytes/n_steps/1e9:.1f} GB/step touched, "
          f"{total_flops/n_steps/1e12:.2f} TFLOP/step "
          f"(XLA auto-remat {remat_ms/n_steps:.1f} ms/step)", flush=True)
    print(f"  HBM roofline floor {total_bytes/n_steps/peak_bw*1e3:.0f} ms"
          f" | MXU floor {total_flops/n_steps/peak_tf*1e3:.0f} ms", flush=True)
    print(f"  {'category':24s} {'ms/step':>8s} {'%':>6s} "
          f"{'TFLOP/s':>8s} {'GB/s':>6s}", flush=True)
    for c, (ms, fl, by) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        if ms / total_ms < 0.002:
            continue
        s = ms / 1e3
        print(f"  {c:24s} {ms/n_steps:8.2f} {100*ms/total_ms:6.1f} "
              f"{fl/s/1e12:8.1f} {by/s/1e9:6.0f}", flush=True)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_work/trace_train"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()

    import jax

    # production recipe: rbg dropout PRNG (scripts/probe_rng_cost.py)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    cfg = ModelConfig(src_vocab=23, trg_vocab=25, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
                      nconds=0, dtype=jnp.bfloat16)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx, sched = make_optimizer(cfg.d_model, 4000)
    state = TrainState.create(params, tx)
    step = make_history_train_step(model, pad_id=1, use_cond2dec=False,
                                   lr_schedule=sched)

    n_steps = 24
    hist = {k: jnp.zeros(n_steps, jnp.float32) for k in HISTORY_KEYS}
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_steps))

    def batch(i):
        r = np.random.default_rng(i)
        return {"src": jnp.asarray(r.integers(4, 23, (bs, L)), jnp.int32),
                "trg": jnp.asarray(r.integers(4, 25, (bs, L + 2)),
                                   jnp.int32)}

    state, hist = step(state, hist, np.int32(0), batch(0), 0.1, subs[0])
    np.asarray(hist["LOSS"][0])
    print(f"[{time.time()-t0:.0f}s] compiled", flush=True)

    # honest step time: fresh inputs, host materialization as sync
    t1 = time.time()
    for i in range(1, 11):
        state, hist = step(state, hist, np.int32(i), batch(i), 0.1,
                           subs[i])
    np.asarray(hist["LOSS"])
    dt = (time.time() - t1) / 10
    toks = bs * (L + 1)
    print(f"step {dt*1e3:.1f} ms  {toks/dt/1e3:.1f}k tok/s  "
          f"6PT/peak={6*n_params*toks/dt/197e12*100:.1f}% MFU "
          f"(v5lite peak)", flush=True)

    with jax.profiler.trace(outdir):
        for i in range(11, 15):
            state, hist = step(state, hist, np.int32(i), batch(i), 0.1,
                               subs[i])
        np.asarray(hist["LOSS"])
    print(f"[{time.time()-t0:.0f}s] trace captured", flush=True)

    # parse chrome trace: aggregate device-lane events by class
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO TRACE JSON (tunnel may not support device tracing)")
        return
    path = max(paths, key=os.path.getmtime)
    analyze_trace(path, n_steps=4)
    print(f"PROBE_TRAIN_TRACE_DONE {(time.time()-t0)/60:.1f} min",
          flush=True)


if __name__ == "__main__":
    main()
