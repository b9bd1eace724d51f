"""Reference-PyTorch-checkpoint -> JAX parameter converter.

The reference saves `{'model_state_dict', 'opt_state_dict',
'model_params'}` per epoch (Train/trainer1.py:33-46) and its loader
tolerates raw state dicts and strips the DDP `module.` prefix
(Model/build_model.py:59-76); we replicate both behaviors.

Name mapping is mechanical because the Flax modules were named after
the reference layout:

  encoder.layers.3.attn.q_linear.weight  ->  encoder/layers_3/attn/q_linear/kernel (transposed)
  encoder.embed_sentence.embed.weight    ->  encoder/embed_sentence/embedding
  decoder.norm.alpha                     ->  decoder/norm/alpha

Known discards: positional-encoding buffers (`*.pe.pe`) are
recomputed, and the unused encoder-level fc_mu/fc_log_var of `vaetf`
checkpoints (reference Model/vaetf.py:26-27 — dead heads; the live
ones are sampler.fc_mu/fc_log_var).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

# torch Linear stores weight as (out, in); flax Dense kernel is (in, out).
_LINEAR_NAMES = {
    "q_linear", "k_linear", "v_linear", "out", "linear_1", "linear_2",
    "fc_mu", "fc_log_var", "fc_z", "embed_cond2enc", "embed_cond2dec",
    "embed_cond2lat", "prop_fc",
}

_LAYER_IDX = re.compile(r"^layers\.(\d+)$")


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _set_nested(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict, model_type: str = "cvaetf") -> dict:
    """Convert a reference torch state dict (tensors or numpy) into a
    Flax param tree. Returns the nested dict to use as
    `{'params': tree}`."""
    params: dict = {}
    skipped: List[str] = []
    # DDP prefix strip (build_model.py:70-72)
    items = {
        (k[7:] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    is_vaetf = model_type == "vaetf"

    for key, tensor in items.items():
        parts = key.split(".")
        # positional-encoding buffers: recomputed, skip
        if "pe" in parts:
            skipped.append(key)
            continue
        # vaetf's dead encoder-level latent heads
        if is_vaetf and parts[0] == "encoder" and parts[1] in ("fc_mu", "fc_log_var"):
            skipped.append(key)
            continue

        path: List[str] = []
        i = 0
        while i < len(parts) - 1:
            p = parts[i]
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            m = _LAYER_IDX.match(p + "." + nxt) if nxt and nxt.isdigit() and p == "layers" else None
            if m:
                path.append(f"layers_{nxt}")
                i += 2
                continue
            if p == "embed_sentence" and nxt == "embed":
                path.append("embed_sentence")
                i += 2
                continue
            if p == "embed" and nxt == "embed":
                path.append("embed")
                i += 2
                continue
            path.append(p)
            i += 1
        leaf = parts[-1]
        arr = _to_numpy(tensor)

        module_name = path[-1] if path else ""
        if leaf == "weight":
            if module_name in ("embed_sentence", "embed"):
                _set_nested(params, tuple(path) + ("embedding",), arr)
            elif module_name in _LINEAR_NAMES:
                _set_nested(params, tuple(path) + ("kernel",), arr.T)
            else:
                raise ValueError(f"unrecognized weight key: {key}")
        elif leaf == "bias":
            _set_nested(params, tuple(path) + ("bias",), arr)
        elif leaf in ("alpha",):
            _set_nested(params, tuple(path) + ("alpha",), arr)
        else:
            raise ValueError(f"unrecognized key: {key}")
    return params


def load_torch_checkpoint(path: str, model_type: str) -> Tuple[dict, dict]:
    """Load a reference `model_{epoch}.pt`; returns (params, model_params).

    `model_params` is the embedded hyperparameter dict when present
    (trainer1.py:37-44), else {}.
    """
    import torch  # local import: torch is host-side only

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        state = blob["model_state_dict"]
        hyper = blob.get("model_params", {})
    else:
        state = blob
        hyper = {}
    return convert_state_dict(state, model_type), hyper
