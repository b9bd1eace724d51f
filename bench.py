"""Sampling-throughput benchmark (runs on the real TPU chip).

Headline metric: sampled SMILES/sec/chip with the flagship-size model
(N=6, d_model=512, d_ff=2048, latent=128 — Configuration/config.py:2-7
scale), batch 512 (inference.py:51), max_strlen 80
(config_default.py:1), multinomial decoding.

vs_baseline: speedup over the reference's decode algorithm executed on
the SAME chip — a faithful re-creation of Inference/sampling_tool.py:
140-184 (full decoder re-run over the whole prefix each step, per-step
host sync for the eos break), bucketed to multiples of 16 tokens to
keep its compile count sane (a concession that makes the BASELINE
faster, so the reported speedup is conservative).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
    from gctplus_tpu.models.masks import get_trg_mask
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.sample.decode import DecodeEngine

    BS = 512
    MAX_STRLEN = 80
    LAT = 80  # z length bucket (reference samples toklen<=80)

    cfg = ModelConfig(src_vocab=40, trg_vocab=44, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.0,
                      nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(BS, LAT, cfg.latent_dim)), jnp.float32)
    toklen = rng.integers(20, LAT, (BS,))
    src_mask = jnp.asarray(
        np.arange(LAT)[None, None, :] < toklen[:, None, None])
    prefix = np.full((BS, 1), 2, np.int32)  # <sos>
    key = jax.random.PRNGKey(0)

    # ---- ours: KV-cached while_loop sampler -------------------------
    eng = DecodeEngine(model, cfg)

    def run_ours(k):
        return eng.sample(params, jnp.asarray(prefix), 1, z, src_mask, None,
                          k, max_new=MAX_STRLEN - 1,
                          decode_algo="multinomial")

    run_ours(key).block_until_ready()  # compile
    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = run_ours(jax.random.fold_in(key, i))
    out.block_until_ready()
    ours_sps = BS * n_iter / (time.perf_counter() - t0)

    # ---- baseline: reference algorithm on the same chip -------------
    decode_full = jax.jit(lambda p, ys, z, sm, tm: model.apply(
        {"params": p}, ys, z, sm, tm, None, deterministic=True,
        method=Vaetf.decode))

    def run_reference(k):
        ys = np.full((BS, 1), 2, np.int32)
        finished = np.zeros(BS, bool)
        kk = k
        for step in range(MAX_STRLEN - 1):
            L = ys.shape[1]
            Lb = ((L + 15) // 16) * 16  # bucket (favor to the baseline)
            ys_pad = np.full((BS, Lb), 1, np.int32)
            ys_pad[:, :L] = ys
            tm = get_trg_mask(jnp.asarray(ys_pad), 1, False)
            logits = decode_full(params, jnp.asarray(ys_pad), z, src_mask, tm)
            probs = jax.nn.softmax(logits[:, L - 1, :])
            kk, sub = jax.random.split(kk)
            nxt = np.asarray(jax.random.categorical(sub, jnp.log(probs)))
            ys = np.concatenate([ys, nxt[:, None].astype(np.int32)], axis=1)
            finished |= nxt == 3
            if finished.all():  # per-step host sync, like the reference
                break
        return ys

    run_reference(key)  # compile all buckets
    t0 = time.perf_counter()
    ref_out = run_reference(jax.random.fold_in(key, 100))
    ref_sps = BS / (time.perf_counter() - t0)

    speedup = ours_sps / ref_sps
    print(json.dumps({
        "metric": "sampled_smiles_per_sec_per_chip",
        "value": round(ours_sps, 1),
        "unit": "SMILES/s",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
