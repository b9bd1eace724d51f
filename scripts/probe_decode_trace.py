"""Capture a jax.profiler trace of the decode while_loop on the real
TPU (if the tunnel supports device tracing) and dump whatever trace
artifacts appear.

Usage: python scripts/probe_decode_trace.py [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_work/trace1"
    os.makedirs(outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.sample.decode import DecodeEngine

    BS = 512
    cfg = ModelConfig(src_vocab=40, trg_vocab=44, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.0,
                      nconds=0, dtype=jnp.bfloat16)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    eng = DecodeEngine(model, cfg)
    prefix = jnp.asarray(np.full((BS, 1), 2, np.int32))
    key = jax.random.PRNGKey(0)

    def go(i):
        stop = jnp.asarray(
            np.random.default_rng(i).integers(20, 80, (BS,)), jnp.int32)
        out = eng.sample_prior(params, prefix, 1, 80, stop, None,
                               jax.random.fold_in(key, i), max_new=79,
                               decode_algo="multinomial", eos_id=-9)
        return np.asarray(out)

    go(99)  # compile (persistent cache should make this fast now)
    print("compiled; tracing...", flush=True)
    with jax.profiler.trace(outdir):
        go(1)
        go(2)
    print("trace done; artifacts:", flush=True)
    for root, _, files in os.walk(outdir):
        for f in files:
            p = os.path.join(root, f)
            print(f"  {p} ({os.path.getsize(p)} B)", flush=True)


if __name__ == "__main__":
    main()
