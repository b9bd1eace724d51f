"""Device mesh + sharding layout.

The reference's only parallelism is DDP data parallelism over NCCL
(train1.py:33-38,111-112; SURVEY.md §2.5). TPU-native equivalent: a
('data', 'model') mesh where

- the batch is sharded over 'data' (the DistributedSampler analog;
  gradient all-reduce is inserted by XLA because params are replicated
  over 'data' — the DDP-backward analog, riding ICI),
- large kernels are optionally sharded over 'model' (tensor
  parallelism the reference never had: attention q/k/v/out and FFN
  kernels split on the feature axis).

No explicit collectives or barriers: XLA derives psum/all-gather from
the shardings, and program order replaces dist.barrier()
(trainer1.py:182,203,223,255).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: the analog of the reference's
    dist.init_process_group + MASTER_ADDR/PORT rendezvous
    (train1.py:34-38,160-161). One call per host; afterwards
    jax.devices() spans all hosts and the same mesh/sharding code
    scales out (collectives ride ICI within a slice, DCN across)."""
    import jax

    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


# Parameter partition rules: path-regex -> PartitionSpec.
# Feature-axis sharding over 'model'; everything else replicated.
_RULES = [
    # attention projections: kernel (d_model, d_model) -> shard out-features
    (re.compile(r".*(q_linear|k_linear|v_linear)/kernel"), P(None, "model")),
    (re.compile(r".*attn[_0-9]*/out/kernel"), P("model", None)),
    # FFN: up-proj shard out, down-proj shard in (megatron layout)
    (re.compile(r".*ff/linear_1/kernel"), P(None, "model")),
    (re.compile(r".*ff/linear_2/kernel"), P("model", None)),
    # vocab head: shard vocab dim
    (re.compile(r"^/out/kernel"), P(None, "model")),
    # embeddings: shard feature dim
    (re.compile(r".*(embed_sentence|embed)/embedding"), P(None, "model")),
]


def param_sharding_rules(path: str) -> P:
    for rx, spec in _RULES:
        if rx.match(path):
            return spec
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the partition rules to a param pytree."""
    flat = jax.tree_util.tree_leaves_with_path(params)

    def spec_for(path_tuple):
        path = "/" + "/".join(
            k.key if hasattr(k, "key") else str(k) for k in path_tuple)
        return param_sharding_rules(path)

    def place(path, leaf):
        spec = spec_for(path)
        # replicate anything whose sharded dim isn't divisible
        try:
            sharding = NamedSharding(mesh, spec)
            for dim, axis in enumerate(spec):
                if axis is not None:
                    size = mesh.shape[axis] if isinstance(axis, str) else 1
                    if leaf.shape[dim] % size != 0:
                        sharding = NamedSharding(mesh, P())
                        break
            return jax.device_put(leaf, sharding)
        except Exception:
            return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
