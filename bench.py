"""Sampling-throughput benchmark (runs on the real TPU chip).

Headline metric: sampled SMILES/sec/chip with the flagship-size model
(N=6, d_model=512, d_ff=2048, latent=128 — Configuration/config.py:2-7
scale), batch 512 (inference.py:51), max_strlen 80
(config_default.py:1), multinomial decoding.

vs_baseline: speedup over the reference's decode algorithm EXECUTED on
the SAME chip — a faithful re-creation of Inference/sampling_tool.py:
140-184 (full decoder re-run over the whole prefix each step, per-step
host sync for the eos break/append), run for the full 79-step
schedule. Prefix shapes are bucketed to {16,48,80} so the loop
compiles 3 programs instead of 79 (causal masking makes the bucketed
logits identical; the extra padded columns only ADD baseline compute,
so a fitted per-length cross-check — quadratic cost model through the
3 measured bucket costs, integrated over the exact 1..79 schedule —
is also computed and the SMALLER total is used: conservative for us).

Secondary keys: train-step tokens/s and MFU at the same flagship
shape (per-batch metric history on device, pre-split RNG — the
production hot loop from train/loop.py).

Prints ONE JSON line on stdout (diagnostics on stderr).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


class _pause_tracked_trainers:
    """SIGSTOP any live background training job tracked by the session
    pidfiles (/tmp/train_*.pid, written by scripts/chain_*.sh and the
    bigrun launches) for the duration of the benchmark, SIGCONT after.

    The long-schedule trainings are resumable per-epoch and share the
    single chip; pausing them (never killing) lets the benchmark
    measure a quiet chip without destroying training progress.
    """

    @staticmethod
    def _with_children(pid):
        """pid plus its descendants (a pidfile may point at a shell
        wrapper whose child is the real python trainer)."""
        out, todo = [], [pid]
        while todo:
            p = todo.pop()
            out.append(p)
            try:
                with open(f"/proc/{p}/task/{p}/children") as f:
                    todo.extend(int(c) for c in f.read().split())
            except OSError:
                pass
        return out

    @staticmethod
    def _own_lineage():
        """This process plus its ancestors.  A chain script may write
        its own pid to a pidfile and then launch bench.py as a child;
        pausing that lineage would SIGSTOP bench itself (observed: the
        whole pipeline froze mid-round for hours)."""
        import os
        lineage, p = set(), os.getpid()
        while p > 1:
            lineage.add(p)
            try:
                with open(f"/proc/{p}/status") as f:
                    p = next(int(l.split()[1]) for l in f
                             if l.startswith("PPid:"))
            except (OSError, StopIteration):
                break
        return lineage

    def __enter__(self):
        import glob
        import os
        import signal
        self._paused = []
        skip = self._own_lineage() | set(self._with_children(os.getpid()))
        for pf in glob.glob("/tmp/train_*.pid"):
            try:
                pid = int(open(pf).read().strip())
                os.kill(pid, 0)          # alive?
            except (ValueError, ProcessLookupError, PermissionError,
                    OSError):
                continue
            for p in self._with_children(pid):
                if p in skip:
                    _log(f"bench: NOT pausing own lineage pid {p} ({pf})")
                    continue
                try:
                    os.kill(p, signal.SIGSTOP)
                    self._paused.append(p)
                    _log(f"bench: paused training pid {p} ({pf})")
                except OSError:
                    pass
        if self._paused:
            time.sleep(3.0)  # let in-flight device steps drain
        return self

    def __exit__(self, *exc):
        import os
        import signal
        for pid in self._paused:
            try:
                os.kill(pid, signal.SIGCONT)
                _log(f"bench: resumed training pid {pid}")
            except OSError:
                pass
        return False


def main():
    import jax
    import jax.numpy as jnp

    from gctplus_tpu.models import ModelConfig, Vaetf
    from gctplus_tpu.models.masks import get_trg_mask
    from gctplus_tpu.models.registry import init_params
    from gctplus_tpu.sample.decode import DecodeEngine

    BS = 512
    MAX_STRLEN = 80
    LAT = 80  # z length bucket (reference samples toklen<=80)

    cfg = ModelConfig(src_vocab=40, trg_vocab=44, N=6, d_model=512,
                      d_ff=2048, heads=8, latent_dim=128, dropout=0.0,
                      nconds=0, dtype=jnp.bfloat16)
    model = Vaetf(cfg)
    params = init_params(model, cfg)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(BS, LAT, cfg.latent_dim)), jnp.float32)
    toklen = rng.integers(20, LAT, (BS,))
    src_mask = jnp.asarray(
        np.arange(LAT)[None, None, :] < toklen[:, None, None])
    key = jax.random.PRNGKey(0)

    # ---- ours: KV-cached while_loop sampler -------------------------
    # NOTE on methodology: timings materialize outputs to host
    # (np.asarray) — through the remote-execution tunnel of this
    # environment block_until_ready does not reliably fence, and
    # repeated identical programs can be served from a cache, so every
    # iteration uses fresh inputs and is synced by the host copy.
    # eos_id=-9 forces the full 79 steps (a trained model stops early;
    # random weights would too — this reports the worst case).
    # The decode batch is swept {512, 1024, 2048} and the best
    # SMILES/s is reported (bs=1024 amortized the per-step XLA glue
    # ~35% better than 512 — scripts/probe_mega_ab.py; 2048 added in
    # round 4 to find the knee, VERDICT r3 item 9). The BASELINE stays at the reference's
    # own bs=512 (inference.py:51): its full-decoder re-run cost scales
    # linearly with batch, so its SMILES/s is batch-independent — the
    # sweep advantages only the KV-cached engine, which actually has a
    # fixed-cost component to amortize.
    eng = DecodeEngine(model, cfg)

    def run_ours(i, bs):
        stop = jnp.asarray(
            np.random.default_rng(i).integers(20, LAT, (bs,)), jnp.int32)
        out = eng.sample_prior(
            params, jnp.asarray(np.full((bs, 1), 2, np.int32)), 1, LAT,
            stop, None, jax.random.fold_in(key, i),
            max_new=MAX_STRLEN - 1, decode_algo="multinomial", eos_id=-9)
        return np.asarray(out)

    n_iter = 4
    ours_by_bs = {}
    for bs in (512, 1024, 2048):
        try:
            run_ours(999, bs)  # compile
        except Exception as e:  # e.g. HBM pressure on a shared chip
            _log(f"bench: bs={bs} failed to run ({type(e).__name__}); "
                 f"skipped")
            continue
        _log(f"bench: ours bs={bs} compiled")
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = run_ours(i, bs)
        ours_by_bs[bs] = bs * n_iter / (time.perf_counter() - t0)
        _log(f"bench: ours bs={bs} = {ours_by_bs[bs]:.0f} SMILES/s")
    ours_bs, ours_sps = max(ours_by_bs.items(), key=lambda kv: kv[1])

    # ---- baseline: reference algorithm RUN on the same chip ----------
    decode_full = jax.jit(lambda p, ys, z, sm, tm: model.apply(
        {"params": p}, ys, z, sm, tm, None, deterministic=True,
        method=Vaetf.decode))

    BUCKETS = (16, 48, 80)

    def bucket_of(L):
        for b in BUCKETS:
            if L <= b:
                return b
        return BUCKETS[-1]

    def one_ref_step(ys_np, L, i):
        """One step of sampling_tool.py:144-157: full decoder re-run
        over the whole prefix, host-synced multinomial append."""
        Lb = bucket_of(L)
        ys_pad = np.full((BS, Lb), 1, np.int32)
        ys_pad[:, :L] = ys_np[:, :L]
        tm = get_trg_mask(jnp.asarray(ys_pad), 1, False)
        logits = decode_full(params, jnp.asarray(ys_pad), z, src_mask, tm)
        probs = jax.nn.softmax(logits[:, L - 1, :].astype(jnp.float32))
        nxt = np.asarray(jax.random.categorical(
            jax.random.fold_in(key, 1000 + i), jnp.log(probs)))
        return nxt

    ys_np = np.full((BS, MAX_STRLEN), 1, np.int32)
    ys_np[:, 0] = 2  # <sos>
    for b in BUCKETS:  # compile each bucket shape off the clock
        one_ref_step(ys_np, b - 1, 0)
    _log("bench: baseline compiled (3 bucket shapes)")

    # the real 79-step loop, wall-clocked end to end
    step_cost = {b: [] for b in BUCKETS}
    t0 = time.perf_counter()
    for L in range(1, MAX_STRLEN):
        ts = time.perf_counter()
        nxt = one_ref_step(ys_np, L, L)
        ys_np[:, L] = nxt
        step_cost[bucket_of(L)].append(time.perf_counter() - ts)
    real_total = time.perf_counter() - t0

    # cross-check: quadratic per-length cost model through the median
    # bucket costs, integrated over the exact schedule (removes the
    # round-up padding the buckets charge the baseline)
    xs = np.array(BUCKETS, np.float64)
    ys_med = np.array([np.median(step_cost[b]) for b in BUCKETS])
    coef = np.polyfit(xs, ys_med, 2)
    fitted_total = float(sum(np.polyval(coef, L)
                             for L in range(1, MAX_STRLEN)))
    total = min(real_total, fitted_total)  # conservative for us
    ref_sps = BS / total
    _log(f"bench: baseline real={real_total:.1f}s fitted={fitted_total:.1f}s"
         f" -> {ref_sps:.1f} SMILES/s")

    # ---- train-step throughput + MFU (same flagship shape) ----------
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    # the production training recipe uses the rbg PRNG on TPU
    # (train_task auto-default; threefry costs ~26% of the step —
    # scripts/probe_rng_cost.py)
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass

    tcfg = ModelConfig(src_vocab=40, trg_vocab=44, N=6, d_model=512,
                       d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
                       nconds=0, dtype=jnp.bfloat16,
                       # production default since the round-4 A/B
                       # (234.5 vs 242.7 ms/step; scripts/probe_ffn_ab)
                       use_fused_ffn=True)
    tmodel = Vaetf(tcfg)
    tparams = init_params(tmodel, tcfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(tparams))
    tx, sched = make_optimizer(512, 4000)
    state = TrainState.create(tparams, tx)
    tstep = make_history_train_step(tmodel, 1, False, sched)

    T_TRG = MAX_STRLEN + 2
    n_steps = 6
    # fresh key AFTER the impl switch (keys carry their generator; a
    # threefry key would silently keep threefry dropout in the step)
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(1),
                                       n_steps + 1))
    hist = {k: jnp.zeros(n_steps + 1, jnp.float32) for k in HISTORY_KEYS}

    def tbatch(i):
        r = np.random.default_rng(i)
        return {"src": jnp.asarray(r.integers(4, 40, (BS, MAX_STRLEN)),
                                   jnp.int32),
                "trg": jnp.asarray(r.integers(4, 44, (BS, T_TRG)),
                                   jnp.int32)}

    state, hist = tstep(state, hist, np.int32(0), tbatch(0), 0.02, subs[0])
    np.asarray(hist["LOSS"][0])  # compile + sync
    _log("bench: train step compiled")
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, hist = tstep(state, hist, np.int32(i), tbatch(i), 0.02,
                            subs[i])
    np.asarray(hist["LOSS"])
    dt = (time.perf_counter() - t0) / n_steps
    train_tps = BS * T_TRG / dt

    # MFU: 6*P*T matmul-FLOP estimate (decoder-target tokens only)
    # over the bf16 peak of this chip; None when the chip is not in
    # the table — a made-up peak would mislabel the number
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if "v5 lite" in kind else \
        275e12 if "v4" in kind else 918e12 if "v6" in kind else None
    mfu = 6.0 * n_params * train_tps / peak if peak else None

    speedup = ours_sps / ref_sps
    print(json.dumps({
        "metric": "sampled_smiles_per_sec_per_chip",
        "value": round(ours_sps, 1),
        "unit": "SMILES/s",
        "vs_baseline": round(speedup, 2),
        "decode_batch": ours_bs,
        "smiles_per_sec_by_batch": {str(k): round(v, 1)
                                    for k, v in ours_by_bs.items()},
        "baseline_smiles_per_sec": round(ref_sps, 1),
        "baseline_method": "reference loop executed on-chip "
                           "(79 steps, 3 bucket shapes, min(real, fitted))",
        "train_tokens_per_sec": round(train_tps, 0),
        "train_step_ms": round(dt * 1e3, 1),
        "train_mfu_pct": round(100 * mfu, 1) if mfu is not None else None,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    with _pause_tracked_trainers():
        main()
