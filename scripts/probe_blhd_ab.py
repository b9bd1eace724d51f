"""On-chip A/B for the transpose-free attention layout (attn_blhd,
models/layers.py::scaled_dot_attention_blhd).

The round-3 train-step roofline (EVIDENCE.md) shows 27 ms/step of pure
layout-change HLOs at 622 GB/s; the prime suspects are the
(bs,L,h,dk)<->(bs,h,L,dk) copies around every attention call (3 splits
+ 1 merge x 6 encoder + 12 decoder attention sites, fwd+bwd). The BLHD
path folds those transposes into the dot_general dimension numbers.

Measures the full production train step (fused FFN on, rbg PRNG,
donation) with ModelConfig.attn_blhd False vs True, plus a one-step
loss agreement check (the math is identical; see
tests/test_train_step.py::test_blhd_attention_layout_parity for the
CPU parity assertion).

Usage: python scripts/probe_blhd_ab.py [bs] [seqlen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(blhd: bool, bs: int, L: int):
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    cfg = ModelConfig(src_vocab=23, trg_vocab=25, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
                      nconds=0, dtype=jnp.bfloat16, use_fused_ffn=True,
                      attn_blhd=blhd)
    model = Vaetf(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx, sched = make_optimizer(cfg.d_model, 4000)
    state = TrainState.create(params, tx)
    step = make_history_train_step(model, pad_id=1, use_cond2dec=False,
                                   lr_schedule=sched)
    n_steps = 12
    hist = {k: jnp.zeros(n_steps, jnp.float32) for k in HISTORY_KEYS}
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_steps))
    return state, step, hist, subs, n_steps


def batch(i, bs, L):
    import jax.numpy as jnp
    r = np.random.default_rng(i)
    return {"src": jnp.asarray(r.integers(4, 23, (bs, L)), jnp.int32),
            "trg": jnp.asarray(r.integers(4, 25, (bs, L + 2)), jnp.int32)}


def timed(state, step, hist, subs, n_steps, bs, L):
    state, hist = step(state, hist, np.int32(0), batch(0, bs, L), 0.1,
                       subs[0])
    np.asarray(hist["LOSS"][0])  # sync after compile+warmup
    t0 = time.time()
    for i in range(1, n_steps):
        state, hist = step(state, hist, np.int32(i), batch(i, bs, L),
                           0.1, subs[i])
    losses = np.asarray(hist["LOSS"])
    dt = (time.time() - t0) / (n_steps - 1)
    return dt, losses


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    # compile both arms BEFORE pausing the trainer (remote compile
    # service does not need the chip); keep the RETURNED buffers
    # (donation).
    arms = {}
    for blhd in (False, True):
        st, stp, hist, subs, n = build(blhd, bs, L)
        st2, h2 = stp(st, hist, np.int32(0), batch(0, bs, L), 0.1, subs[0])
        loss0 = float(np.asarray(h2["LOSS"][0]))
        arms[blhd] = (st2, stp, h2, subs, n)
        print(f"compiled attn_blhd={blhd} loss0={loss0:.3f}", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench
    with bench._pause_tracked_trainers():
        results = {}
        for blhd in (False, True):
            dt, losses = timed(*arms[blhd], bs, L)
            results[blhd] = (dt, losses)
            print(f"attn_blhd={blhd}: step {dt*1e3:.1f} ms "
                  f"({bs*(L+1)/dt/1e3:.1f}k tok/s)", flush=True)
    # same seeds + same math -> per-step losses agree to bf16 noise
    d = np.abs(results[False][1] - results[True][1]).max()
    print(f"max per-step |loss delta| = {d:.4f}", flush=True)


if __name__ == "__main__":
    main()
