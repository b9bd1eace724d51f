"""On-chip A/B for the fused FFN kernel (ops/fused_ffn.py).

Three measurements on the real TPU at the flagship train shape:
  1. numeric: deterministic fused-vs-XLA FFN forward + grads at
     (bs*len, 512)x2048 — the on-chip analog of tests/test_fused_ffn
     (which runs interpret mode; this validates the Mosaic lowering
     and the real in-kernel PRNG path executes).
  2. step time: full train step (rbg PRNG, donation — the production
     hot loop) with ModelConfig.use_fused_ffn False vs True.
  3. trajectory sanity: 8 fused train steps on a fixed batch must
     drop the loss (catches a silently-wrong backward).

Compiles run while any background trainer keeps the chip (remote
compile service does not need it); the timed sections SIGSTOP tracked
trainers via bench.py's pause guard for a quiet chip.

Usage: python scripts/probe_ffn_ab.py [bs] [seqlen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(use_fused: bool, bs: int, L: int):
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    cfg = ModelConfig(src_vocab=23, trg_vocab=25, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
                      nconds=0, dtype=jnp.bfloat16, use_fused_ffn=use_fused)
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


def kernel_parity(bs, L):
    """Deterministic fused-vs-XLA FFN on-chip at flagship shape."""
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.ops.fused_ffn import fused_ffn

    D, F = 512, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, L, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def xla(x, w1, b1, w2, b2):
        h = jax.nn.gelu((x @ w1.astype(x.dtype)
                         + b1.astype(x.dtype)), approximate=False)
        return h @ w2.astype(x.dtype) + b2.astype(x.dtype)

    @jax.jit
    def both(x, w1, b1, w2, b2):
        lf = lambda a: (fused_ffn(*a, seed, rate=0.0,
                                  deterministic=True) ** 2).sum()
        lr = lambda a: (xla(*a) ** 2).sum()
        args = (x, w1, b1, w2, b2)
        return (fused_ffn(*args, seed, rate=0.0, deterministic=True),
                xla(*args), jax.grad(lf)(args), jax.grad(lr)(args))

    yf, yr, gf, gr = jax.tree_util.tree_map(np.asarray, both(x, w1, b1, w2, b2))
    fwd_err = float(np.abs(yf.astype(np.float32) - yr.astype(np.float32)).max())
    rels = {}
    for name, a, b in zip("x w1 b1 w2 b2".split(), gf, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rels[name] = float(np.abs(a - b).max()) / max(1e-9, float(np.abs(b).max()))
    print(f"PARITY fwd_max_abs={fwd_err:.3e} grad_rel={rels}", flush=True)
    assert fwd_err < 0.15, "bf16 fused forward diverges"  # bf16 ulps on ~50-range outputs
    assert all(v < 0.05 for v in rels.values()), rels

    # dropout path executes on-chip (real in-kernel PRNG) and drops
    # ~rate of the hidden mass: E[y_drop] ~= y but with added variance;
    # just assert finite + different-from-deterministic
    @jax.jit
    def drop(x):
        return fused_ffn(x, w1, b1, w2, b2, jnp.asarray([3], jnp.int32),
                         rate=0.5, deterministic=False)
    yd = np.asarray(drop(x), np.float32)
    assert np.isfinite(yd).all()
    assert np.abs(yd - yf.astype(np.float32)).max() > 1e-3
    print("PARITY dropout path executes on-chip, finite, stochastic",
          flush=True)


def timed(state, step, hist, subs, n_steps, bs, L, fixed=False):
    state, hist = step(state, hist, np.int32(0), batch(0, bs, L), 0.1,
                       subs[0])
    np.asarray(hist["LOSS"][0])  # sync after compile+warmup
    t0 = time.time()
    for i in range(1, n_steps):
        state, hist = step(state, hist, np.int32(i),
                           batch(0 if fixed else i, bs, L), 0.1, subs[i])
    losses = np.asarray(hist["LOSS"])
    dt = (time.time() - t0) / (n_steps - 1)
    return dt, losses


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    # PRNG impl for the step's dropout/latent keys.  The production
    # recipe is rbg on TPU (train_task auto-default); threefry is the
    # parity default.  The first A/B ran threefry arms (331.7 vs
    # 268.0 ms); the decision-relevant pair is rbg-vs-rbg.
    prng = sys.argv[3] if len(sys.argv) > 3 else "rbg"
    import jax
    jax.config.update("jax_default_prng_impl", prng)
    print(f"prng_impl={prng}", flush=True)

    kernel_parity(min(bs, 128), L)

    # build + compile both step programs BEFORE pausing the trainer.
    # The step donates (state, hist): keep the RETURNED buffers for
    # timed(), not the originals (passing a donated buffer again
    # surfaces as an opaque InvalidArgument through the tunnel).
    arms = {}
    for fused in (False, True):
        st, stp, hist, subs, n = build(fused, bs, L)
        st2, h2 = stp(st, hist, np.int32(0), batch(0, bs, L), 0.1, subs[0])
        np.asarray(h2["LOSS"][0])
        arms[fused] = (st2, stp, h2, subs, n)
        print(f"compiled use_fused_ffn={fused}", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench
    with bench._pause_tracked_trainers():
        for fused in (False, True):
            dt, _ = timed(*arms[fused], bs, L)
            print(f"use_fused_ffn={fused}: step {dt*1e3:.1f} ms "
                  f"({bs*(L+1)/dt/1e3:.1f}k tok/s)", flush=True)
        # fixed-batch trajectory on the fused arm: loss must drop
        dt, losses = timed(*build(True, bs, L), bs, L, fixed=True)
        print(f"fused fixed-batch losses: {np.round(losses, 2).tolist()}",
              flush=True)
        assert losses[-1] < losses[1], "fused backward does not learn"


if __name__ == "__main__":
    main()
