"""Attention-map dump + heatmaps (reference
Inference/visualize_attention.py:126-186): run encoder/decoder with
attention capture on one molecule, save .npy tensors and per-head
heatmap PNGs (matplotlib; the reference's bertviz HTML depends on a
browser widget stack and is out of scope)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from gctplus_tpu.models.masks import get_src_mask, get_trg_mask
from gctplus_tpu.tasks.common import build_sampler
from gctplus_tpu.utils import get_logger


def visualize_attention(args, smiles: str, scaffold: Optional[str] = None,
                        log=None):
    save_folder = os.path.join(args.save_folder, "visualize_attention")
    os.makedirs(save_folder, exist_ok=True)
    log = log or get_logger("visualize_attention",
                            os.path.join(save_folder, "record.log"))
    sampler = build_sampler(args, log)
    tok, sv, tv = sampler.tokenizer, sampler.src_vocab, sampler.trg_vocab

    text = (scaffold + "<sep>" + smiles) if scaffold else smiles
    toks = (tok(scaffold) + ["<sep>"] + tok(smiles)) if scaffold else tok(smiles)
    src = jnp.asarray([sv.encode(toks)], jnp.int32)
    trg_tokens = ["<sos>"] + toks + ["<eos>"]
    trg = jnp.asarray([tv.encode(trg_tokens[:-1]) + [tv.eos_id]], jnp.int32)

    src_mask = get_src_mask(src, sv.pad_id)
    trg_mask = get_trg_mask(trg, tv.pad_id, False)

    enc, dec_self, dec_cross = sampler.model.apply(
        {"params": sampler.params}, src, trg, src_mask, trg_mask,
        method=type(sampler.model).attention_maps)

    arrays = {"encoder": np.stack([np.asarray(a) for a in enc]),
              "decoder_self": np.stack([np.asarray(a) for a in dec_self]),
              "decoder_cross": np.stack([np.asarray(a) for a in dec_cross])}
    for name, arr in arrays.items():
        np.save(os.path.join(save_folder, f"attn_{name}.npy"), arr)
        _plot_heatmaps(arr, toks, name, save_folder)
        log.info(f"{name}: {arr.shape} saved")
    return arrays


def _plot_heatmaps(arr: np.ndarray, tokens, name: str, folder: str):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    n_layers, _, n_heads = arr.shape[0], arr.shape[1], arr.shape[2]
    fig, axes = plt.subplots(n_layers, n_heads,
                             figsize=(2.2 * n_heads, 2.2 * n_layers),
                             squeeze=False)
    for li in range(n_layers):
        for hi in range(n_heads):
            ax = axes[li][hi]
            ax.imshow(arr[li, 0, hi], cmap="viridis", aspect="auto")
            ax.set_xticks([])
            ax.set_yticks([])
            if li == 0:
                ax.set_title(f"h{hi}", fontsize=8)
    fig.suptitle(name)
    fig.tight_layout()
    fig.savefig(os.path.join(folder, f"attn_{name}.png"), dpi=100)
    plt.close(fig)
