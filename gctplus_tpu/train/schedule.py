"""Noam-style LR schedule + Adam, as optax transforms.

Parity: the reference sets lr inline each step as
lr = d_model^-0.5 * min(step^-0.5, step*warmup^-1.5)
(Train/trainer1.py:117-127; same formula as the unused NoamOpt,
Model/modules.py:207-212) on Adam(0.9, 0.98, eps=1e-9)
(train1.py:116-119). Steps are 1-based.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int):
    def schedule(step):
        # optax counts updates from 0; the reference's current_step is
        # 1-based (incremented before the update, trainer1.py:81).
        s = jnp.asarray(step, jnp.float32) + 1.0
        head = s ** -0.5
        tail = s * (warmup_steps ** -1.5)
        return (d_model ** -0.5) * jnp.minimum(head, tail)
    return schedule


def make_optimizer(d_model: int, warmup_steps: int = 8000,
                   b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9,
                   start_step: int = 0):
    sched = noam_schedule(d_model, warmup_steps)
    tx = optax.adam(learning_rate=sched, b1=b1, b2=b2, eps=eps)
    return tx, sched


def with_frozen(tx, trainable_mask):
    """Freeze parameters where trainable_mask is False (the reference's
    freeze_params sets requires_grad=False, Model/build_model.py:28-39;
    the optax analog zeroes those updates via multi_transform)."""
    import jax

    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", trainable_mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)
