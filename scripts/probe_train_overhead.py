"""Isolate per-batch host overheads of the training hot loop on the
real TPU (through the axon tunnel, where per-op dispatch latency is
high — see CLAUDE.md). Measures, at flagship shapes:

  1. eager jax.random.split cost (current loop does one per batch)
  2. host->device batch transfer cost (jnp.asarray vs device_put)
  3. pure jitted train-step time, fresh inputs each iteration
  4. the emulated run_epoch loop as written today

Usage: python scripts/probe_train_overhead.py [bs] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import TrainState, make_train_step

    print("devices:", jax.devices(), flush=True)
    V = 44
    model, cfg = build_model("vaetf", V, V, N=6, d_model=512, d_ff=2048,
                             heads=8, latent_dim=128, dropout=0.1,
                             dtype=jnp.bfloat16)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx, sched = make_optimizer(512, 2000)
    state = TrainState.create(params, tx)
    step = make_train_step(model, 1, False, sched, donate=False)

    rng = jax.random.PRNGKey(7)
    mk = lambda i: {"src": np.random.default_rng(i).integers(
                        4, V, (bs, 80), dtype=np.int32),
                    "trg": np.random.default_rng(i + 1).integers(
                        4, V, (bs, 82), dtype=np.int32)}

    # 1. eager split
    t0 = time.time()
    r = rng
    for _ in range(20):
        r, s = jax.random.split(r)
    np.asarray(s)
    print(f"eager split: {(time.time()-t0)/20*1000:.1f} ms/op", flush=True)

    # 2. transfer
    t0 = time.time()
    for i in range(20):
        b = {k: jnp.asarray(v) for k, v in mk(i).items()}
    for v in b.values():
        np.asarray(v)
    print(f"transfer(jnp.asarray src+trg): {(time.time()-t0)/20*1000:.1f} "
          f"ms/batch", flush=True)

    # 3. compile + pure step
    subs = jax.random.split(rng, iters + 1)
    t0 = time.time()
    batch = {k: jnp.asarray(v) for k, v in mk(0).items()}
    state, aux = step(state, batch, 0.02, subs[0])
    np.asarray(aux["LOSS"])
    print(f"compile+first step: {time.time()-t0:.1f} s", flush=True)

    t0 = time.time()
    for i in range(iters):
        batch = {k: jnp.asarray(v) for k, v in mk(100 + i).items()}
        state, aux = step(state, batch, 0.02, subs[i + 1])
    np.asarray(aux["LOSS"])
    dt = (time.time() - t0) / iters
    tok = bs * 82
    print(f"pure step (pre-split rng): {dt*1000:.1f} ms/batch "
          f"= {tok/dt/1e3:.0f}k tok/s", flush=True)

    # 4. emulated current run_epoch loop
    hist = {"RCE": [], "KLD": [], "LOSS": [], "LR": []}
    r = rng
    t0 = time.time()
    for i in range(iters):
        batch = {k: jnp.asarray(v) for k, v in mk(500 + i).items()}
        r, sub = jax.random.split(r)
        state, aux = step(state, batch, 0.02, sub)
        for k in hist:
            hist[k].append(aux.get(k, jnp.zeros(())))
    stacked = {k: np.asarray(jnp.stack(v)) for k, v in hist.items()}
    dt = (time.time() - t0) / iters
    print(f"current-loop emulation: {dt*1000:.1f} ms/batch "
          f"= {tok/dt/1e3:.0f}k tok/s", flush=True)


if __name__ == "__main__":
    main()
