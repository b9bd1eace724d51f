"""Train-step tests: loss parity vs the reference formula, LR schedule
parity, and a sharded multi-device train step on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
from gctplus_tpu.models.registry import init_params
from gctplus_tpu.parallel import make_mesh, shard_params
from gctplus_tpu.train import (
    TrainState,
    elbo_loss,
    kl_annealing_beta,
    make_optimizer,
    make_train_step,
    noam_schedule,
)


def test_elbo_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    bs, L, V, lat = 4, 10, 12, 6
    logits = rng.normal(size=(bs, L, V)).astype(np.float32)
    labels = rng.integers(0, V, (bs, L))
    labels[2, -3:] = 1  # pad
    mu = rng.normal(size=(bs, 7, lat)).astype(np.float32)
    log_var = rng.normal(size=(bs, 7, lat)).astype(np.float32)
    beta = 0.37

    rce_t = F.cross_entropy(
        torch.from_numpy(logits).reshape(-1, V),
        torch.from_numpy(labels).reshape(-1),
        ignore_index=1, reduction="sum").item()
    kld_t = (-0.5 * torch.sum(
        1 + torch.from_numpy(log_var) - torch.from_numpy(mu).pow(2)
        - torch.from_numpy(log_var).exp())).item()

    loss, aux = elbo_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(mu), jnp.asarray(log_var), beta, pad_id=1)
    assert np.isclose(float(aux["RCE"]), rce_t, rtol=1e-5)
    assert np.isclose(float(aux["KLD"]), kld_t, rtol=1e-5)
    assert np.isclose(float(loss), rce_t + beta * kld_t, rtol=1e-5)


def test_noam_schedule_parity():
    # reference formula at trainer1.py:117-123 with 1-based steps
    d_model, warmup = 512, 8000
    sched = noam_schedule(d_model, warmup)
    for optax_count in [0, 10, 7999, 8000, 20000]:
        step = optax_count + 1
        ref = (d_model ** -0.5) * min(step ** -0.5, step * warmup ** -1.5)
        assert np.isclose(float(sched(optax_count)), ref, rtol=1e-6)


def test_kl_annealer_parity():
    # beta = ini + inc*((epoch+1)-beg), gated, capped (trainer1.py:14-16,171-176)
    beta = 0.0
    betas = []
    for epoch in range(1, 8):
        beta = kl_annealing_beta(epoch, beta, True, 0.02, 0.02, 1, 0.08)
        betas.append(round(beta, 4))
    # epoch1: 0.02+0.02*1=0.04 ... caps once beta >= max
    assert betas[0] == 0.04 and betas[1] == 0.06 and betas[2] == 0.08
    assert betas[3] == 0.08  # frozen after reaching cap


def test_kl_annealer_resume_replay_matches_uninterrupted():
    # The reference freezes beta at the first value >= KLA_max_beta
    # (trainer.py:247-248); a resumed run must reconstruct prev_beta
    # by replaying epochs 1..start_epoch-1, NOT restart from 0.0 —
    # the formula alone overshoots the cap past the crossing epoch
    # (0.02 + 0.02*53 = 1.08 at epoch 53).  Exercises the ACTUAL
    # production replay helper (loss.py::replay_beta, called by
    # train/loop.py::train_model at resume).
    from gctplus_tpu.train.loss import replay_beta

    def betas_from(start_epoch, end_epoch):
        beta = replay_beta(start_epoch, True, 0.02, 0.02, 1, 1.0)
        seq = {}
        for e in range(start_epoch, end_epoch + 1):
            beta = kl_annealing_beta(e, beta, True, 0.02, 0.02, 1, 1.0)
            seq[e] = round(beta, 6)
        return seq

    uninterrupted = betas_from(1, 60)
    for resume_at in (2, 49, 50, 51, 53):  # incl. the cap crossing
        resumed = betas_from(resume_at, 60)
        assert resumed == {e: uninterrupted[e]
                           for e in range(resume_at, 61)}, resume_at
    assert all(b <= 1.0 for b in uninterrupted.values())
    # the naive restart-from-zero resume is what the replay prevents
    naive = kl_annealing_beta(53, 0.0, True, 0.02, 0.02, 1, 1.0)
    assert naive > 1.0  # documents why the replay is required


def _tiny_setup(variant="pvaetf"):
    if variant == "vaetf":
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.1, nconds=0)
        model = Vaetf(cfg)
    else:
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.1,
                          nconds=3, use_cond2lat=True)
        model = Cvaetf(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return model, cfg, params


def _tiny_batch(cfg, bs=8, Ls=10, Lt=12, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "src": jnp.asarray(rng.integers(4, cfg.src_vocab, (bs, Ls))),
        "trg": jnp.asarray(rng.integers(4, cfg.trg_vocab, (bs, Lt))),
    }
    if cfg.nconds > 0:
        conds = jnp.asarray(rng.normal(size=(bs, cfg.nconds)), jnp.float32)
        batch["econds"] = conds
        batch["dconds"] = conds
    return batch


def test_train_step_reduces_loss():
    model, cfg, params = _tiny_setup("vaetf")
    tx, sched = make_optimizer(cfg.d_model, warmup_steps=10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, pad_id=1, use_cond2dec=False,
                           lr_schedule=sched, donate=False)
    batch = _tiny_batch(cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, 0.1, sub)
        losses.append(float(aux["LOSS"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_history_step_matches_plain_step():
    """make_history_train_step (metrics scattered into a donated
    on-device buffer) must be numerically identical to make_train_step
    followed by host-side accumulation."""
    from gctplus_tpu.train.trainer import (HISTORY_KEYS,
                                           make_history_eval_step,
                                           make_history_train_step)

    model, cfg, params = _tiny_setup("vaetf")
    tx, sched = make_optimizer(cfg.d_model, warmup_steps=10)
    step_a = make_train_step(model, pad_id=1, use_cond2dec=False,
                             lr_schedule=sched, donate=False)
    step_b = make_history_train_step(model, pad_id=1, use_cond2dec=False,
                                     lr_schedule=sched)
    n = 5
    subs = np.asarray(jax.random.split(jax.random.PRNGKey(3), n))

    state_a = TrainState.create(params, tx)
    ref_hist = {k: [] for k in HISTORY_KEYS}
    for i in range(n):
        state_a, aux = step_a(state_a, _tiny_batch(cfg, seed=i), 0.1,
                              subs[i])
        for k in HISTORY_KEYS:
            ref_hist[k].append(float(aux.get(k, 0.0)))

    state_b = TrainState.create(params, tx)
    hist = {k: jnp.zeros(n, jnp.float32) for k in HISTORY_KEYS}
    for i in range(n):
        state_b, hist = step_b(state_b, hist, np.int32(i),
                               _tiny_batch(cfg, seed=i), 0.1, subs[i])
    for k in HISTORY_KEYS:
        np.testing.assert_allclose(np.asarray(hist[k]), ref_hist[k],
                                   rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6)

    # eval variant fills its buffer with finite metrics
    ev = make_history_eval_step(model, pad_id=1, use_cond2dec=False)
    ehist = {k: jnp.zeros(2, jnp.float32) for k in HISTORY_KEYS}
    for i in range(2):
        ehist = ev(state_b.params, ehist, np.int32(i),
                   _tiny_batch(cfg, seed=10 + i), 0.1, subs[i])
    assert np.isfinite(np.asarray(ehist["LOSS"])).all()


def test_train_step_sharded_over_mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 CPU devices"
    mesh = make_mesh(n_data=4, n_model=2)
    model, cfg, params = _tiny_setup("pvaetf")
    params = shard_params(params, mesh)
    tx, sched = make_optimizer(cfg.d_model, warmup_steps=10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, pad_id=1, use_cond2dec=False,
                           lr_schedule=sched, donate=False)
    batch = _tiny_batch(cfg, bs=8)
    bsh = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    state, aux = step(state, batch, 0.05, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["LOSS"]))
    # params must remain replicated-over-data after the update
    state2, aux2 = step(state, batch, 0.05, jax.random.PRNGKey(2))
    assert float(aux2["LOSS"]) < float(aux["LOSS"]) * 1.5


def test_free_bits_kl_floor():
    """free_bits floors the per-coordinate batch-mean KL: with a
    near-posterior-collapse latent the objective sees at least
    bs * n_coords * lambda nats; at 0.0 it reduces exactly to the
    reference objective."""
    import numpy as np

    from gctplus_tpu.train.loss import elbo_loss

    rng = np.random.default_rng(0)
    bs, L, V, D = 4, 6, 12, 5
    logits = jnp.asarray(rng.normal(size=(bs, L, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(2, V, size=(bs, L)), jnp.int32)
    # collapsed posterior: mu ~ 0, log_var ~ 0 -> KL ~ 0 per coord
    mu = jnp.full((bs, L, D), 1e-4, jnp.float32)
    log_var = jnp.zeros((bs, L, D), jnp.float32)

    l0, a0 = elbo_loss(logits, labels, mu, log_var, 1.0, pad_id=1)
    l0_fb0, _ = elbo_loss(logits, labels, mu, log_var, 1.0, pad_id=1,
                          free_bits=0.0)
    assert float(l0) == float(l0_fb0)  # exact reference objective at 0

    lam = 0.05
    lfb, afb = elbo_loss(logits, labels, mu, log_var, 1.0, pad_id=1,
                         free_bits=lam)
    # reported KLD is the true KL (unchanged); the objective is floored
    assert np.isclose(float(afb["KLD"]), float(a0["KLD"]))
    floor = bs * L * D * lam
    assert float(lfb) >= float(afb["RCE"]) + floor - 1e-3
    # healthy (large-KL) posteriors are untouched by the floor
    mu2 = jnp.asarray(rng.normal(size=(bs, L, D)) * 3, jnp.float32)
    lh, ah = elbo_loss(logits, labels, mu2, log_var, 1.0, pad_id=1)
    lh_fb, _ = elbo_loss(logits, labels, mu2, log_var, 1.0, pad_id=1,
                         free_bits=lam)
    assert np.isclose(float(lh), float(lh_fb))


def test_blhd_attention_layout_parity():
    """attn_blhd folds the head transposes into the dot_generals
    (models/layers.py::scaled_dot_attention_blhd); forward logits and
    one optimizer step must agree with the default BHLD layout on the
    same params/batch/rng (same math, different HLO layout)."""
    import dataclasses

    model, cfg, params = _tiny_setup("pvaetf")
    cfg_b = dataclasses.replace(cfg, attn_blhd=True)
    model_b = Cvaetf(cfg_b)
    batch = _tiny_batch(cfg)

    from gctplus_tpu.models.masks import get_src_mask, get_trg_mask

    src, trg = batch["src"], batch["trg"][:, :-1]
    src_mask = get_src_mask(src, 1, batch["econds"])
    trg_mask = get_trg_mask(trg, 1, False, batch["dconds"])
    outs = []
    for m in (model, model_b):
        _, out_mol, mu, log_var, _ = m.apply(
            {"params": params}, src, trg, src_mask, trg_mask,
            econds=batch["econds"], dconds=batch["dconds"],
            deterministic=True, rngs={"sample": jax.random.PRNGKey(3)})
        outs.append(np.asarray(out_mol, np.float32))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=2e-5)

    # one non-deterministic train step: dropout draws on the (b,h,q,k)
    # weights are layout-invariant, so losses must match too
    tx, sched = make_optimizer(cfg.d_model, warmup_steps=10)
    auxes = []
    for m in (model, model_b):
        state = TrainState.create(params, tx)
        step = make_train_step(m, pad_id=1, use_cond2dec=False,
                               lr_schedule=sched, donate=False)
        state, aux = step(state, batch, 0.1, jax.random.PRNGKey(5))
        auxes.append(float(aux["LOSS"]))
    assert abs(auxes[0] - auxes[1]) < 1e-2, auxes
