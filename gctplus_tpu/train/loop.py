"""Epoch-level training driver (reference Train/trainer1.py:159-255).

Reproduced behaviors:
- KL annealing gate per epoch (trainer1.py:171-176),
- per-epoch reshuffle via loader.set_epoch (DistributedSampler analog),
- per-batch history {RCE, KLD, LOSS, BETA, LR} -> train_{epoch}.csv /
  valid_{epoch}.csv,
- per-epoch checkpoint model_{epoch}.msgpack holding
  {params, opt_state, model_params hyper dict, step} — the analog of
  the reference's {model_state_dict, opt_state_dict, model_params}
  (trainer1.py:33-46),
- resume from epoch N: reload params+opt state, recompute the LR step
  counter as (start_epoch-1)*len(train_loader) (train1.py:97-129,
  trainer1.py:162),
- decode_check smoke test (teacher-forced sampling validity,
  trainer1.py:49-68) via the in-repo chemistry validity oracle.

TPU-native deltas: ONE process drives all local devices (SPMD), so the
reference's per-rank CSVs + rank-0 filesystem merge (trainer1.py:231-252)
collapse to a single already-global history; dist.barrier() disappears
(XLA program order).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from gctplus_tpu.train.loss import kl_annealing_beta, replay_beta
from gctplus_tpu.train.schedule import make_optimizer
from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                       make_history_eval_step,
                                       make_history_train_step)


def _host_saveable(state: TrainState) -> bool:
    """msgpack serialization gathers every leaf to host numpy — only
    possible when each leaf is fully addressable from this process or
    fully replicated (multi-host pure-DP). Model-sharded multi-host
    params must go through the orbax backend instead."""
    for leaf in jax.tree_util.tree_leaves((state.params, state.opt_state)):
        if isinstance(leaf, jax.Array) and not (
                leaf.is_fully_addressable or leaf.is_fully_replicated):
            return False
    return True


def save_checkpoint(path: str, state: TrainState, hyper: Dict) -> None:
    blob = {
        "params": serialization.to_state_dict(state.params),
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": int(state.step),
        "model_params": hyper,
    }
    # atomic write: a kill/reset mid-save must never leave a truncated
    # msgpack as the newest checkpoint (resume + eval pick newest)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, blob)))
    os.replace(tmp, path)


def save_checkpoint_compact(path: str, state: TrainState,
                            hyper: Dict) -> None:
    """Params-only bf16 checkpoint (same layout as
    scripts/export_ckpt.py, ~1/6 the bytes of the full blob).

    Through the remote-device tunnel the full 533 MB gather+serialize
    costs 100-240 s per epoch (measured, round 3) and the gather
    itself is the bottleneck, so the bf16 cast runs ON DEVICE (one
    tiny cached XLA program) and only 89 MB crosses the tunnel.
    Compact epochs serve the eval/task loaders identically
    (load_params_any upcasts); a resume that lands on one warm-restarts
    Adam from bf16-rounded params, which only matters after a rare
    hang-kill, so train_model still writes full blobs every
    `ckpt_full_every` epochs and on the final epoch."""
    cast = getattr(save_checkpoint_compact, "_cast", None)
    if cast is None:
        import jax.numpy as jnp
        cast = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x), p))
        save_checkpoint_compact._cast = cast

    blob = {
        "params": jax.tree_util.tree_map(
            np.asarray, serialization.to_state_dict(cast(state.params))),
        "step": int(state.step),
        "model_params": hyper,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _write_history_csv(path: str, history: Dict[str, List[float]]) -> None:
    keys = list(history.keys())
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + keys)
        for i in range(len(history[keys[0]])):
            w.writerow([i] + [history[k][i] for k in keys])


def decode_check(logits_mol: np.ndarray, trg_vocab, rng=None, n_rows: int = 8):
    """Teacher-forced multinomial sampling validity smoke check
    (trainer1.py:49-68)."""
    from gctplus_tpu.chem.sanitize import is_valid_smiles
    from gctplus_tpu.chem.tokenizer import untokenize

    rng = rng or np.random.default_rng(0)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits_mol[:n_rows]), -1))
    n_valid, out = 0, []
    for row in probs:
        ids = [int(rng.choice(len(p), p=p / p.sum())) for p in row]
        smi = untokenize(ids, trg_vocab.sos_id, trg_vocab.eos_id,
                         trg_vocab.itos)
        out.append(smi)
        n_valid += is_valid_smiles(smi)
    return n_valid / max(1, len(out)), out


def run_epoch(step_fn, state: Optional[TrainState], params, loader, beta,
              rng, log, train: bool, eval_fn=None, device_put_fn=None):
    """Hot loop (trainer1.py:71-156). Returns (state, history).

    Tunnel-aware design (measured in scripts/probe_train_overhead.py):
    - batch RNG keys are pre-split ONCE per epoch and kept as numpy
      (an eager jax.random.split costs ~146 ms/op through the axon
      tunnel — one per batch would dominate the epoch);
    - the per-batch metric history lives inside the compiled step
      (make_history_*_step) and is fetched in ONE transfer at epoch
      end — no per-batch device scalars, no epoch-end jnp.stack over
      thousands of operands;
    - batches go host->device exactly once: device_put_fn receives
      the raw numpy batch (it shards over the mesh / builds the
      global array on multi-host); plain jnp.asarray otherwise.
    """
    n_batches = len(loader)
    subs = np.asarray(jax.random.split(rng, max(n_batches, 1)))
    hist = {k: jnp.zeros(max(n_batches, 1), jnp.float32)
            for k in HISTORY_KEYS}
    t_start = time.time()
    seen = 0
    for i, batch in enumerate(loader):
        if device_put_fn is not None:
            batch = device_put_fn(batch)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if train:
            state, hist = step_fn(state, hist, np.int32(i), batch, beta,
                                  subs[i])
        else:
            hist = eval_fn(params, hist, np.int32(i), batch, beta, subs[i])
        seen += 1
        if log and (i + 1) % 50 == 0:
            loss_now = float(hist["LOSS"][i])
            # failure detection (no reference counterpart, SURVEY.md §5):
            # divergence surfaces immediately instead of poisoning the
            # rest of the epoch
            if not np.isfinite(loss_now):
                raise FloatingPointError(
                    f"non-finite loss at batch {i+1}: {loss_now} "
                    "(check LR warmup / dtype / data)")
            log.info(f"{i+1}/{n_batches}\t"
                     f"LOSS: {loss_now:.5f}\t"
                     f"TIME(s): {time.time()-t_start:.1f}")
    host_hist = {k: np.asarray(v)[:seen] for k, v in hist.items()}
    history: Dict[str, List[float]] = {
        k: host_hist[k].tolist() for k in ("RCE", "KLD", "LOSS")}
    history["BETA"] = [float(beta)] * seen
    history["LR"] = host_hist["LR"].tolist()
    if seen and not np.isfinite(host_hist["LOSS"]).all():
        bad = int(np.argmax(~np.isfinite(host_hist["LOSS"])))
        raise FloatingPointError(
            f"non-finite loss first seen at batch {bad+1}/{seen}")
    return state, history


def train_model(model, cfg, params, train_loader, valid_loader, *,
                model_folder: str, num_epoch: int = 30, start_epoch: int = 1,
                pad_id: int = 1, use_cond2dec: bool = False,
                use_KLA: bool = True, KLA_ini_beta: float = 0.02,
                KLA_inc_beta: float = 0.02, KLA_beg_epoch: int = 1,
                KLA_max_beta: float = 1.0, lr_WarmUpSteps: int = 8000,
                lr_beta1: float = 0.9, lr_beta2: float = 0.98,
                lr_eps: float = 1e-9, seed: int = 0, log=None,
                device_put_fn=None, hyper: Optional[Dict] = None,
                trainable_mask=None, ckpt_backend: str = "msgpack",
                free_bits: float = 0.0, ckpt_full_every: int = 1):
    """Full training run; returns the final TrainState.

    trainable_mask: optional boolean tree (models.registry.freeze_mask)
    — False leaves get zero updates (fine-tuning with frozen modules,
    the reference's requires_grad=False analog).

    ckpt_backend: "msgpack" (single-blob host gather, portable) or
    "orbax" (async sharded writes, train/orbax_io.py — the scaling
    path; the per-epoch msgpack is still written so downstream task
    drivers keep working)."""
    os.makedirs(model_folder, exist_ok=True)
    orbax = None
    if ckpt_backend == "orbax":
        from gctplus_tpu.train.orbax_io import OrbaxCheckpointer
        orbax = OrbaxCheckpointer(model_folder)
    tx, sched = make_optimizer(cfg.d_model, lr_WarmUpSteps,
                               lr_beta1, lr_beta2, lr_eps)
    if trainable_mask is not None:
        from gctplus_tpu.train.schedule import with_frozen
        tx = with_frozen(tx, trainable_mask)
    start_step = (start_epoch - 1) * len(train_loader)
    state = TrainState.create(params, tx, start_step=start_step)

    if start_epoch > 1:
        ckpt_path = os.path.join(model_folder,
                                 f"model_{start_epoch-1}.msgpack")
        if os.path.exists(ckpt_path):
            blob = load_checkpoint(ckpt_path)
            # compact exports (scripts/export_ckpt.py) drop the Adam
            # moments and may store bf16 leaves: cast back to the
            # template dtype and warm-restart the optimizer
            restored = jax.tree_util.tree_map(
                lambda t, s: np.asarray(s, t.dtype),
                state.params,
                serialization.from_state_dict(state.params,
                                              blob["params"]))
            state = state.replace(params=restored)
            if "opt_state" in blob:
                state = state.replace(opt_state=serialization.from_state_dict(
                    state.opt_state, blob["opt_state"]))
            elif log:
                log.warning(f"{ckpt_path} has no opt_state (compact "
                            "export): Adam moments restart fresh")
            if log:
                log.info(f"resumed from {ckpt_path}")

    if free_bits and log:
        # the free-bits floor is the recommended recipe but NOT the
        # reference objective (trainer1.py:19-30) — say so loudly
        log.warning(f"KLA_free_bits={free_bits}: objective deviates "
                    "from the exact reference ELBO; pass "
                    "-exact_reference_objective for parity training")
    step_fn = make_history_train_step(model, pad_id, use_cond2dec, sched,
                                      free_bits=free_bits)
    eval_fn = make_history_eval_step(model, pad_id, use_cond2dec)
    rng = jax.random.PRNGKey(seed)

    # Replay the annealing schedule up to start_epoch so a resumed run
    # sees the same beta sequence as an uninterrupted one (see
    # loss.py::replay_beta for why the closed form overshoots).
    beta = replay_beta(start_epoch, use_KLA, KLA_ini_beta,
                       KLA_inc_beta, KLA_beg_epoch, KLA_max_beta)
    if log and start_epoch > 1:
        # visible marker: if the run's KLA settings changed since
        # epoch 1, this replayed value never actually happened
        log.info(f"resume: replayed KLA schedule to epoch "
                 f"{start_epoch - 1} (prev_beta={beta:.3f})")
    for epoch in range(start_epoch, num_epoch + 1):
        train_loader.set_epoch(epoch)
        beta = kl_annealing_beta(epoch, beta, use_KLA, KLA_ini_beta,
                                 KLA_inc_beta, KLA_beg_epoch, KLA_max_beta)
        if log:
            log.info(f"run epoch: {epoch} (beta={beta:.3f})")

        rng, r1, r2 = jax.random.split(rng, 3)
        state, hist = run_epoch(step_fn, state, None, train_loader, beta,
                                r1, log, train=True,
                                device_put_fn=device_put_fn)
        # multi-host: metrics are already global (computed on the
        # sharded global batch inside jit), so only process 0 writes —
        # the analog of the reference's rank-0 CSV merge
        # (trainer1.py:225-252), minus the filesystem gather
        is_p0 = jax.process_index() == 0
        if is_p0:
            _write_history_csv(
                os.path.join(model_folder, f"train_{epoch}.csv"), hist)

        if valid_loader is not None:
            _, vhist = run_epoch(None, None, state.params, valid_loader,
                                 beta, r2, log, train=False, eval_fn=eval_fn,
                                 device_put_fn=device_put_fn)
            if is_p0:
                _write_history_csv(
                    os.path.join(model_folder, f"valid_{epoch}.csv"), vhist)

        if orbax is not None:
            # async: this epoch's shards flush while the next trains.
            # All processes participate (orbax coordinates internally).
            orbax.save(epoch, state, hyper or {})
        if is_p0:
            if _host_saveable(state):
                full = (ckpt_full_every <= 1
                        or epoch % ckpt_full_every == 0
                        or epoch == num_epoch)
                (save_checkpoint if full else save_checkpoint_compact)(
                    os.path.join(model_folder, f"model_{epoch}.msgpack"),
                    state, hyper or {})
            elif orbax is None:
                raise RuntimeError(
                    "params are model-sharded across hosts — the "
                    "msgpack backend cannot gather them; use "
                    "ckpt_backend='orbax'")
            elif log and epoch == start_epoch:
                log.warning("skipping msgpack checkpoints (multi-host "
                            "model-sharded params); orbax shards only")
    if orbax is not None:
        orbax.close()
    return state
