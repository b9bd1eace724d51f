"""A/B the fused Pallas attention kernel vs the XLA path on the real
TPU, at the shapes that actually use it (deterministic multi-token
attention: encoder forward and decode prefill).

Usage: python scripts/probe_pallas_ab.py [bs] [L]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.masks import get_src_mask
    from gctplus_tpu.models.registry import init_params

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    results = {}
    for use_pallas in (False, True):
        cfg = ModelConfig(src_vocab=40, trg_vocab=44, N=6, d_model=512,
                          d_ff=2048, heads=8, latent_dim=128, dropout=0.0,
                          nconds=0, dtype=jnp.bfloat16,
                          use_pallas_attention=use_pallas)
        model = Vaetf(cfg)
        params = init_params(model, cfg)

        # mask built INSIDE jit and a scalar output: through the
        # tunnel, eager ops cost ~146 ms each and a 21MB transfer
        # dominates wall time (first A/B iteration measured both)
        def _enc(p, src):
            sm = get_src_mask(src, 1, None)
            z, mu, lv = model.apply({"params": p}, src, sm, None, True,
                                    method=Vaetf.encode)
            return jnp.sum(mu.astype(jnp.float32))
        enc = jax.jit(_enc)

        def run(i):
            r = np.random.default_rng(i)
            src = r.integers(4, 40, (bs, L)).astype(np.int32)
            return np.asarray(enc(params, src))

        run(999)  # compile
        t0 = time.perf_counter()
        iters = 8
        for i in range(iters):
            run(i)
        dt = (time.perf_counter() - t0) / iters
        results[use_pallas] = dt
        print(f"pallas={use_pallas}: encode fwd {dt*1e3:.2f} ms/batch "
              f"({bs*L/dt/1e6:.1f}M tok/s)", flush=True)

    print(f"speedup pallas/xla: {results[False]/results[True]:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
