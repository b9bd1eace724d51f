"""Warm the persistent compile cache with the exact big-run train-step
program (the remote compile takes ~6 min; doing it while the CPU-bound
preprocess runs means training starts instantly).

Usage: python scripts/warm_train_compile.py SRC_VOCAB TRG_VOCAB \
           [nconds] [bs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    src_v = int(sys.argv[1])
    trg_v = int(sys.argv[2])
    nconds = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    bs = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    variant = "vaetf" if nconds == 0 else "pvaetf"
    model, cfg = build_model(variant, src_v, trg_v, N=6, d_model=512,
                             d_ff=2048, heads=8, latent_dim=128,
                             dropout=0.1, dtype=jnp.bfloat16)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx, sched = make_optimizer(512, 4000)
    state = TrainState.create(params, tx)
    step = make_history_train_step(model, 1, False, sched,
                                   free_bits=0.05)
    r = np.random.default_rng(0)
    batch = {"src": jnp.asarray(r.integers(4, src_v, (bs, 80)), jnp.int32),
             "trg": jnp.asarray(r.integers(4, trg_v, (bs, 82)), jnp.int32)}
    if nconds:
        conds = jnp.asarray(r.normal(size=(bs, nconds)), jnp.float32)
        batch["econds"] = conds
        batch["dconds"] = conds
    hist = {k: jnp.zeros(4, jnp.float32) for k in HISTORY_KEYS}
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(1), 2))
    t0 = time.time()
    state, hist = step(state, hist, np.int32(0), batch, 0.02, subs[0])
    np.asarray(hist["LOSS"][0])
    t1 = time.time()
    state, hist = step(state, hist, np.int32(1), batch, 0.04, subs[1])
    np.asarray(hist["LOSS"])
    print(f"{variant} V=({src_v},{trg_v}) bs={bs}: compile+1st "
          f"{t1-t0:.0f}s, 2nd step {time.time()-t1:.3f}s", flush=True)


if __name__ == "__main__":
    main()
