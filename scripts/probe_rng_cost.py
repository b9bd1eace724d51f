"""Measure the train-step cost of the dropout/latent RNG: threefry
(JAX default) vs the TPU-cheap 'rbg' generator.

The flagship train step draws ~500M random bits per step (dropout on
13 sublayers + latent eps at bs=512); threefry is compute-heavy on
TPU. rbg changes the random STREAM (not reproducible across
backends) but training is stochastic anyway — if the step-time win is
real, training runs should use it.

Usage: python scripts/probe_rng_cost.py [bs] [seqlen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(impl: str, bs: int, L: int) -> float:
    import jax

    jax.config.update("jax_default_prng_impl", impl)
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
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx, sched = make_optimizer(cfg.d_model, 4000)
    state = TrainState.create(params, tx)
    step = make_history_train_step(model, pad_id=1, use_cond2dec=False,
                                   lr_schedule=sched)
    n_steps = 12
    hist = {k: jnp.zeros(n_steps, jnp.float32) for k in HISTORY_KEYS}
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_steps))
    if subs.shape[-1] != 2:  # rbg keys are wider
        pass

    def batch(i):
        r = np.random.default_rng(i)
        return {"src": jnp.asarray(r.integers(4, 23, (bs, L)), jnp.int32),
                "trg": jnp.asarray(r.integers(4, 25, (bs, L + 2)),
                                   jnp.int32)}

    state, hist = step(state, hist, np.int32(0), batch(0), 0.1, subs[0])
    np.asarray(hist["LOSS"][0])
    t0 = time.time()
    for i in range(1, n_steps):
        state, hist = step(state, hist, np.int32(i), batch(i), 0.1,
                           subs[i])
    np.asarray(hist["LOSS"])
    return (time.time() - t0) / (n_steps - 1)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    for impl in ("threefry2x32", "rbg"):
        try:
            dt = run(impl, bs, L)
            print(f"{impl:14s} step {dt*1e3:.1f} ms "
                  f"({bs*(L+1)/dt/1e3:.1f}k tok/s)", flush=True)
        except Exception as e:
            print(f"{impl}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
