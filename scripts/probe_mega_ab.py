"""On-chip A/B: fused attention kernels vs the decoder-layer
megakernel (ops/decoder_step.py), plus a decode batch-size sweep.

Round-2 decode step (fused path) = 2.26 ms at bs=512: ~1.3 ms HBM
floor + ~1 ms XLA glue (~90 ops/token).  The megakernel collapses each
layer's step into one pallas_call (6 calls/token); this probe measures
what that buys at the flagship shape, checks greedy token parity
against the fused path on the TRAINED checkpoint, and sweeps bs=1024
(the other glue-amortizing lever).

Timing methodology per CLAUDE.md: fresh inputs each iteration, forced
79 steps (eos_id=-9), host materialization as the sync point.

Usage: python scripts/probe_mega_ab.py [reps] [bs_list]
  bs_list: comma-separated decode batch sizes (default "512,1024";
  pass "512" to skip the 1024 sweep when the chip is shared and the
  extra ~2 GB of KV would risk an HBM OOM against a training run).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = "/root/repo/_work/bigrun"


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    bs_list = tuple(int(x) for x in sys.argv[2].split(",")) \
        if len(sys.argv) > 2 else (512, 1024)
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.sample.decode import DecodeEngine
    from gctplus_tpu.tasks.common import load_params_any, load_vocabs

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    MAX_NEW = 79

    def build(vocab):
        cfg = ModelConfig(src_vocab=vocab, trg_vocab=vocab, N=6,
                          d_model=512, d_ff=2048, heads=8, latent_dim=128,
                          dropout=0.0, nconds=0, dtype=jnp.bfloat16)
        model = Vaetf(cfg)
        return model, cfg

    def timed(eng, params, cfg, bs, tag):
        prefix = jnp.asarray(np.full((bs, 1), 2, np.int32))

        def go(i):
            stop = jnp.asarray(
                np.random.default_rng(i).integers(20, 80, (bs,)),
                jnp.int32)
            out = eng.sample_prior(
                params, prefix, 1, 80, stop, None,
                jax.random.fold_in(key, i), max_new=MAX_NEW,
                decode_algo="multinomial", eos_id=-9)
            return np.asarray(out)

        t0 = time.time()
        go(99)
        print(f"{tag}: compiled [{time.time()-t0:.0f}s]", flush=True)
        t0 = time.perf_counter()
        for i in range(reps):
            go(i)
        dt = (time.perf_counter() - t0) / reps
        ms = dt / MAX_NEW * 1e3
        print(f"{tag}: {dt*1e3:.1f} ms/call, {ms:.3f} ms/step, "
              f"{bs/dt:.0f} SMILES/s (forced {MAX_NEW})", flush=True)
        return ms

    # ---- timing: fused vs mega at bs=512 and bs=1024 ------------------
    model, cfg = build(44)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    res = {}
    for bs in bs_list:
        for mode in (True, "mega"):
            eng = DecodeEngine(model, cfg, fused=mode)
            res[(bs, mode)] = timed(eng, params, cfg, bs,
                                    f"bs={bs} fused={mode}")

    # ---- parity: trained ckpt, greedy, fused vs mega ------------------
    ckpt = f"{W}/run_vaetf512/model_15.msgpack"
    if os.path.exists(ckpt):
        src_v, trg_v = load_vocabs(f"{W}/utils", "vaetf")
        tmodel, tcfg = build(0)
        tcfg = ModelConfig(src_vocab=len(src_v), trg_vocab=len(trg_v),
                           N=6, d_model=512, d_ff=2048, heads=8,
                           latent_dim=128, dropout=0.0, nconds=0,
                           dtype=jnp.bfloat16)
        tmodel = Vaetf(tcfg)
        tparams = load_params_any(tmodel, tcfg, ckpt, "vaetf")
        bs = 512
        prefix = jnp.asarray(
            np.concatenate([np.full((bs, 1), 2, np.int32),
                            np.full((bs, 7), 1, np.int32)], axis=1))
        stop = jnp.asarray(
            np.random.default_rng(7).integers(20, 60, (bs,)), jnp.int32)
        outs = {}
        for mode in (True, "mega"):
            eng = DecodeEngine(tmodel, tcfg, fused=mode)
            tok = eng.sample_prior(
                tparams, prefix, 1, 80, stop, None, jax.random.PRNGKey(0),
                MAX_NEW, decode_algo="greedy", top_k=None, eos_id=3,
                pad_id=1)
            outs[mode] = np.asarray(tok)
        # the engines pad the emitted array to different widths (the
        # mega path tile-aligns the cache to a multiple of 8); compare
        # the common prefix and require the tail beyond it to be pad
        wid = min(o.shape[1] for o in outs.values())
        for o in outs.values():
            assert (o[:, wid:] == 1).all(), "non-pad tokens beyond width"
        match = (outs[True][:, :wid] == outs["mega"][:, :wid]).all(axis=-1)
        print(f"PARITY mega-vs-fused trained/greedy: "
              f"{int(match.sum())}/{bs} ({match.mean():.4f})", flush=True)

    s512 = res[(512, True)] / res[(512, "mega")]
    extra = (f" fused1024={res[(1024, True)]:.3f} "
             f"mega1024={res[(1024, 'mega')]:.3f}"
             if (1024, True) in res else "")
    print(f"MEGA_AB_DONE speedup bs512={s512:.2f}x "
          f"fused512={res[(512, True)]:.3f} "
          f"mega512={res[(512, 'mega')]:.3f}{extra} ms/step", flush=True)


if __name__ == "__main__":
    main()
