"""ELBO loss and KL annealing.

Parity with the reference trainer (Train/trainer1.py:14-30):

  RCE  = sum cross_entropy(logits, trg[:,1:]) over non-pad tokens
         (reduction='sum', ignore_index=pad)
  KLD  = -0.5 * sum(1 + logvar - mu^2 - exp(logvar))
  loss = RCE + beta * KLD  (+ sum-MSE property term when use_cond2dec)

  beta(epoch) = ini + inc * ((epoch+1) - beg_epoch), gated at
  epoch+1 >= beg_epoch, capped at max_beta (trainer1.py:14-16,171-176).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def kl_annealing_beta(epoch: int, prev_beta: float, use_KLA: bool = True,
                      ini_beta: float = 0.02, inc_beta: float = 0.02,
                      beg_epoch: int = 1, max_beta: float = 1.0) -> float:
    if not use_KLA:
        return 1.0
    beta = prev_beta
    if epoch + 1 >= beg_epoch and prev_beta < max_beta:
        beta = ini_beta + inc_beta * ((epoch + 1) - beg_epoch)
    return float(beta)


def replay_beta(start_epoch: int, use_KLA: bool = True,
                ini_beta: float = 0.02, inc_beta: float = 0.02,
                beg_epoch: int = 1, max_beta: float = 1.0) -> float:
    """Reconstruct prev_beta as of the start of `start_epoch` by
    replaying the annealing schedule over epochs 1..start_epoch-1.

    The reference freezes beta at the first value >= KLA_max_beta
    (Train/trainer1.py:171-176: the recompute is gated on
    beta < max), so past the crossing epoch the closed-form formula
    alone OVERSHOOTS (e.g. 0.02 + 0.02*53 = 1.08 at a resume from
    epoch 53) — prev_beta must be replayed, not recomputed.  Assumes
    the annealing hyperparameters were identical from epoch 1; the
    caller should log the replayed value so a changed-settings resume
    is visible in the training log."""
    beta = 0.0
    for prev_epoch in range(1, start_epoch):
        beta = kl_annealing_beta(prev_epoch, beta, use_KLA, ini_beta,
                                 inc_beta, beg_epoch, max_beta)
    return beta


def elbo_loss(logits_mol, trg_labels, mu, log_var, beta, pad_id: int,
              logits_prop=None, trg_props=None, label_smoothing: float = 0.0,
              free_bits: float = 0.0) -> Tuple[jnp.ndarray, dict]:
    """Sum-reduced ELBO. logits_mol: (bs, L, V); trg_labels: (bs, L).

    label_smoothing > 0 enables the smoothed-CE variant the reference
    keeps but never wires in (LabelSmoothing, Model/modules.py:150-183:
    mass spread over non-pad, non-target classes).

    free_bits > 0 floors the batch-mean KL of each latent coordinate at
    that many nats before weighting by beta (Kingma et al. 2016) — a
    posterior-collapse guard beyond the reference's recipe (its
    KLAnnealer alone collapses on small corpora; see EVIDENCE.md). At
    0.0 the objective is exactly the reference's loss_function
    (Train/loss.py behavior). The reported KLD stays the true KL."""
    logits = logits_mol.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = (trg_labels != pad_id).astype(jnp.float32)
    if label_smoothing > 0.0:
        V = logits.shape[-1]
        conf = 1.0 - label_smoothing
        fill = label_smoothing / (V - 2)
        true_dist = jnp.full_like(logp, fill)
        true_dist = true_dist.at[..., pad_id].set(0.0)
        onehot = jax.nn.one_hot(trg_labels, V)
        true_dist = jnp.where(onehot > 0, conf, true_dist)
        nll = -jnp.sum(true_dist * logp, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, trg_labels[..., None],
                                   axis=-1)[..., 0]
    rce = jnp.sum(nll * valid)

    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    kl_per = -0.5 * (1.0 + log_var - mu ** 2 - jnp.exp(log_var))
    kld = jnp.sum(kl_per)
    if free_bits > 0.0:
        # per-coordinate batch-mean KL, floored, rescaled back to the
        # sum reduction (identical to kld when no coordinate is floored)
        kld_obj = jnp.sum(jnp.maximum(kl_per.mean(axis=0), free_bits)
                          ) * kl_per.shape[0]
    else:
        kld_obj = kld

    loss = rce + beta * kld_obj
    rce_prop = jnp.zeros((), jnp.float32)
    if logits_prop is not None and trg_props is not None:
        rce_prop = jnp.sum((logits_prop.astype(jnp.float32) - trg_props) ** 2)
        loss = loss + rce_prop
    aux = {"RCE": rce, "KLD": kld, "RCE_prop": rce_prop, "LOSS": loss}
    return loss, aux
