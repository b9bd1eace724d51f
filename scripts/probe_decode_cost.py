"""Bisect the per-token decode-step cost on the real TPU.

The sampler's while_loop step at flagship shape (bs=512, cache 80,
lat 80, N=6, d512) was ~3.7 ms in round 1 vs a ~1.4 ms memory floor
(self-KV + cross-KV reads in bf16). This probe times sample_prior
variants that isolate each term:

  base   : bs512, cache 80, lat 80, N=6   (the bench configuration)
  lat8   : lat_len 8                       (cross-KV traffic ~0)
  new16  : max_new 16                      (self-KV traffic /5)
  n1     : N=1 layers                      (per-layer vs fixed cost)

Usage: python scripts/probe_decode_cost.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.sample.decode import DecodeEngine

    BS = 512
    key = jax.random.PRNGKey(0)

    def build(N):
        cfg = ModelConfig(src_vocab=40, trg_vocab=44, N=N, d_model=512,
                          d_ff=2048, heads=8, latent_dim=128, dropout=0.0,
                          nconds=0, dtype=jnp.bfloat16)
        model = Vaetf(cfg)
        return model, cfg, init_params(model, cfg)

    def run(name, model, cfg, params, lat, max_new):
        eng = DecodeEngine(model, cfg)
        prefix = jnp.asarray(np.full((BS, 1), 2, np.int32))

        def go(i):
            stop = jnp.asarray(
                np.random.default_rng(i).integers(
                    max(4, lat // 4), lat, (BS,)), jnp.int32)
            out = eng.sample_prior(
                params, prefix, 1, lat, stop, None,
                jax.random.fold_in(key, i), max_new=max_new,
                decode_algo="multinomial", eos_id=-9)
            return np.asarray(out)

        go(99)  # compile
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            go(i)
        dt = (time.perf_counter() - t0) / iters
        per_step = dt / max_new * 1e3
        print(f"{name:8s} lat={lat:3d} max_new={max_new:3d} "
              f"total={dt*1e3:7.1f} ms  per-step={per_step:6.3f} ms",
              flush=True)
        return dt

    model6, cfg6, params6 = build(6)
    run("base", model6, cfg6, params6, 80, 79)
    run("lat8", model6, cfg6, params6, 8, 79)
    run("new16", model6, cfg6, params6, 80, 16)
    model1, cfg1, params1 = build(1)
    run("n1", model1, cfg1, params1, 80, 79)


if __name__ == "__main__":
    main()
