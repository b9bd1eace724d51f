"""Export a compact, git-committable checkpoint from a training
msgpack: params only (Adam moments dropped), bf16 leaves (~1/6 the
bytes of the full blob).  The eval loader (tasks/common.py::
load_params_any) and the training resume path (train/loop.py) both
upcast bf16 leaves to the f32 template on load; resuming from a
compact export warm-restarts the optimizer.

Usage: python scripts/export_ckpt.py IN.msgpack OUT.msgpack
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import ml_dtypes
    import numpy as np
    from flax import serialization

    with open(src, "rb") as f:
        blob = serialization.msgpack_restore(f.read())

    def compact(x):
        x = np.asarray(x)
        if x.dtype == np.float32:
            return x.astype(ml_dtypes.bfloat16)
        return x

    out = {
        "params": __import__("jax").tree_util.tree_map(
            compact, blob["params"]),
        "step": blob.get("step", 0),
        "model_params": blob.get("model_params", {}),
    }
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    os.replace(tmp, dst)
    print(f"{src} ({os.path.getsize(src)/1e6:.0f} MB) -> "
          f"{dst} ({os.path.getsize(dst)/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
