"""Orbax checkpointing backend — sharded, async, multi-host-safe.

The msgpack path (train/loop.py::save_checkpoint) gathers everything
to host and writes one blob: simple and portable, but serial and
single-host. For large models / multi-chip meshes this module offers
the production path the reference never had (its torch.save gathers to
rank 0, train1.py checkpoint logic):

- each host writes only its shards (orbax handles the layout),
- `save` is async: training continues while the previous checkpoint
  flushes to disk,
- restore applies the target shardings directly (no host round-trip),
  so a checkpoint saved on one mesh restores onto another.

Layout: <folder>/orbax/<step>/ with orbax's own directory format, plus
the `hyper` dict stored as a JSON sidecar (orbax metadata is for
arrays; the hyper dict mirrors the msgpack blob's `model_params`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())


class OrbaxCheckpointer:
    """Async sharded checkpoints for TrainState pytrees."""

    def __init__(self, folder: str):
        self.root = os.path.join(os.path.abspath(folder), "orbax")
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = _checkpointer()

    def save(self, step: int, state, hyper: Optional[Dict] = None,
             wait: bool = False) -> str:
        """Kick off an async save of {params, opt_state, step}; the
        previous save is awaited first (orbax requirement)."""
        path = os.path.join(self.root, str(step))
        tree = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
        self._ckptr.save(path, args=_std_args().StandardSave(tree),
                         force=True)
        with open(path + ".hyper.json", "w") as f:
            json.dump(hyper or {}, f)
        if wait:
            self.wait()
        return path

    def restore(self, step: int, template: Optional[Any] = None) -> Any:
        """Restore onto `template`'s structure/shardings (an abstract or
        concrete FULL {params, opt_state, step} tree — partial trees
        don't match the on-disk structure). With template=None the
        checkpoint is returned as host arrays in its saved structure."""
        self.wait()
        path = os.path.join(self.root, str(step))
        args = (_std_args().StandardRestore(template)
                if template is not None else _std_args().StandardRestore())
        return self._ckptr.restore(path, args=args)

    def hyper(self, step: int) -> Dict:
        with open(os.path.join(self.root, f"{step}.hyper.json")) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        steps = [int(d) for d in os.listdir(self.root) if d.isdigit()]
        return max(steps) if steps else None

    def wait(self) -> None:
        """Block until the in-flight async save has committed."""
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def _std_args():
    import orbax.checkpoint as ocp

    return ocp.args


def abstract_like(tree, mesh=None, rules=None):
    """ShapeDtypeStruct template for restore-without-init. With a mesh,
    leaves carry NamedShardings (parallel/mesh.py rules) so orbax lands
    shards directly on devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _leaf(x):
        sharding = None
        if mesh is not None:
            sharding = NamedSharding(mesh, P())
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree_util.tree_map(_leaf, tree)
