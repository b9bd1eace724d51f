"""Jitted train/eval steps over a device mesh.

The reference's per-batch hot loop (Train/trainer1.py:71-156) is:
forward -> ELBO -> backward -> Adam -> inline Noam LR; DDP all-reduce
hides in loss.backward(). Here the whole step is ONE compiled XLA
program: masks are built on device, the gradient all-reduce over the
'data' mesh axis is inserted by XLA (params replicated, batch
sharded), and the optimizer update is fused in. Teacher forcing uses
trg[:, :-1] -> labels trg[:, 1:] (Model/forward_propagation1.py:4-40).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from gctplus_tpu.models.masks import get_src_mask, get_trg_mask
from gctplus_tpu.train.loss import elbo_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, start_step: int = 0):
        return cls(step=jnp.asarray(start_step, jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def _forward_loss(model, params, batch, beta, pad_id, use_cond2dec, rng,
                  free_bits=0.0):
    """batch: dict(src (bs,Ls), trg (bs,Lt) [, econds, dconds])."""
    econds = batch.get("econds")
    dconds = batch.get("dconds")
    src, trg = batch["src"], batch["trg"]
    trg_in = trg[:, :-1]
    labels = trg[:, 1:]
    src_mask = get_src_mask(src, pad_id, econds)
    trg_mask = get_trg_mask(trg_in, pad_id, use_cond2dec, dconds)
    sample_rng, drop_rng = jax.random.split(rng)
    out_prop, out_mol, mu, log_var, _ = model.apply(
        {"params": params}, src, trg_in, src_mask, trg_mask,
        econds=econds, dconds=dconds, deterministic=False,
        rngs={"sample": sample_rng, "dropout": drop_rng})
    if use_cond2dec and dconds is not None:
        trg_props = dconds[..., None]
    else:
        out_prop, trg_props = None, None
    loss, aux = elbo_loss(out_mol, labels, mu, log_var, beta, pad_id,
                          out_prop, trg_props, free_bits=free_bits)
    n = src.shape[0]
    aux = {k: v / n for k, v in aux.items()}  # per-sample history parity
    return loss, aux


def make_train_step(model, pad_id: int, use_cond2dec: bool,
                    lr_schedule: Optional[Callable] = None,
                    donate: bool = True, free_bits: float = 0.0) -> Callable:
    """Returns step(state, batch, beta, rng) -> (state, metrics).

    On a mesh, place batch arrays with NamedSharding(mesh, P('data'));
    XLA all-reduces grads over 'data' automatically (params replicated).
    """

    def step(state: TrainState, batch, beta, rng):
        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(model, p, batch, beta, pad_id,
                                    use_cond2dec, rng, free_bits),
            has_aux=True)
        (_, aux), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads)
        if lr_schedule is not None:
            aux["LR"] = lr_schedule(state.step)  # count used by this update
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())


HISTORY_KEYS = ("RCE", "KLD", "LOSS", "LR")


def make_history_train_step(model, pad_id: int, use_cond2dec: bool,
                            lr_schedule: Optional[Callable] = None,
                            free_bits: float = 0.0) -> Callable:
    """step(state, hist, i, batch, beta, rng) -> (state, hist).

    The per-batch metric history lives ON DEVICE inside the compiled
    step: hist is {key: (n_batches,) f32} and row i is written with a
    fused scatter. This replaces accumulating one tiny device scalar
    per batch on the host — which would end in an epoch-end
    jnp.stack over n_batches operands, i.e. a fresh XLA program with
    thousands of arguments per distinct epoch length (pathological
    through a remote-compile tunnel). One transfer per epoch instead.
    """

    def step(state: TrainState, hist, i, batch, beta, rng):
        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(model, p, batch, beta, pad_id,
                                    use_cond2dec, rng, free_bits),
            has_aux=True)
        (_, aux), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads)
        if lr_schedule is not None:
            aux["LR"] = lr_schedule(state.step)
        new_hist = {k: v.at[i].set(aux.get(k, jnp.zeros((), v.dtype)))
                    for k, v in hist.items()}
        return new_state, new_hist

    # donate BOTH the state (params + Adam moments update in place —
    # halves the optimizer-state HBM high-water mark) and the history
    # buffer; the loop never reuses either input
    return jax.jit(step, donate_argnums=(0, 1))


def make_history_eval_step(model, pad_id: int, use_cond2dec: bool) -> Callable:
    """step(params, hist, i, batch, beta, rng) -> hist (see
    make_history_train_step; validation variant of make_eval_step)."""
    inner = _eval_metrics_fn(model, pad_id, use_cond2dec)

    def step(params, hist, i, batch, beta, rng):
        aux = inner(params, batch, beta, rng)
        return {k: v.at[i].set(aux.get(k, jnp.zeros((), v.dtype)))
                for k, v in hist.items()}

    return jax.jit(step, donate_argnums=(1,))


def make_eval_step(model, pad_id: int, use_cond2dec: bool) -> Callable:
    """Validation step: same loss, no grad, dropout off but latent
    sampling ON (the reference validates with model.eval() yet still
    reparameterizes through Encoder.sampling — trainer1.py:205-210)."""
    return jax.jit(_eval_metrics_fn(model, pad_id, use_cond2dec))


def _eval_metrics_fn(model, pad_id: int, use_cond2dec: bool) -> Callable:
    def step(params, batch, beta, rng):
        econds = batch.get("econds")
        dconds = batch.get("dconds")
        src, trg = batch["src"], batch["trg"]
        trg_in, labels = trg[:, :-1], trg[:, 1:]
        src_mask = get_src_mask(src, pad_id, econds)
        trg_mask = get_trg_mask(trg_in, pad_id, use_cond2dec, dconds)
        out_prop, out_mol, mu, log_var, _ = model.apply(
            {"params": params}, src, trg_in, src_mask, trg_mask,
            econds=econds, dconds=dconds, deterministic=True,
            rngs={"sample": rng})
        if use_cond2dec and dconds is not None:
            trg_props = dconds[..., None]
        else:
            out_prop, trg_props = None, None
        _, aux = elbo_loss(out_mol, labels, mu, log_var, beta, pad_id,
                           out_prop, trg_props)
        n = src.shape[0]
        return {k: v / n for k, v in aux.items()}

    return step
