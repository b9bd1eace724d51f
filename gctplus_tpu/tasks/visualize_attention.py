"""Attention-map dump + heatmaps + interactive HTML view (reference
Inference/visualize_attention.py:18-186): run encoder/decoder with
attention capture on one molecule, save .npy tensors, per-head heatmap
PNGs, and a SELF-CONTAINED attention.html (the bertviz model_view
analog, :75-110 — rebuilt dependency-free: layer/head selectable
canvas heatmaps with token-pair hover readout, data embedded as
JSON)."""

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
    _write_html_view(arrays, toks, trg_tokens, save_folder)
    log.info("attention.html saved")
    return arrays


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>attention view</title>
<style>
body {{ font-family: monospace; margin: 16px; }}
select {{ margin-right: 10px; }}
#info {{ margin-top: 8px; min-height: 1.2em; }}
canvas {{ border: 1px solid #888; image-rendering: pixelated; }}
.lbl {{ font-size: 11px; }}
</style></head><body>
<h3>gctplus-tpu attention view</h3>
<div>
  kind <select id="kind"></select>
  layer <select id="layer"></select>
  head <select id="head"></select>
  <label><input type="checkbox" id="avg"> mean over heads</label>
</div>
<div id="info"></div>
<canvas id="cv" width="640" height="640"></canvas>
<script>
const DATA = {data_json};
const TOKENS = {tokens_json};
const kindSel = document.getElementById('kind');
const laySel = document.getElementById('layer');
const headSel = document.getElementById('head');
const avgBox = document.getElementById('avg');
const info = document.getElementById('info');
const cv = document.getElementById('cv');
const ctx = cv.getContext('2d');
for (const k of Object.keys(DATA)) kindSel.add(new Option(k, k));
function fill(sel, n, pfx) {{
  sel.innerHTML = '';
  for (let i = 0; i < n; i++) sel.add(new Option(pfx + i, i));
}}
function cur() {{
  const k = kindSel.value;
  const arr = DATA[k];
  return {{k: k, arr: arr, L: arr.length, H: arr[0].length}};
}}
function grid() {{
  const c = cur();
  fill(laySel, c.L, 'L');
  fill(headSel, c.H, 'h');
}}
function draw() {{
  const c = cur();
  const li = +laySel.value || 0, hi = +headSel.value || 0;
  let m = c.arr[Math.min(li, c.L-1)][Math.min(hi, c.H-1)];
  if (avgBox.checked) {{
    const hs = c.arr[Math.min(li, c.L-1)];
    m = hs[0].map((row, i) => row.map((_, j) =>
      hs.reduce((s, h) => s + h[i][j], 0) / hs.length));
  }}
  const R = m.length, C = m[0].length;
  const s = Math.max(1, Math.floor(640 / Math.max(R, C)));
  cv.width = C * s; cv.height = R * s;
  let mx = 0;
  for (const row of m) for (const v of row) mx = Math.max(mx, v);
  for (let i = 0; i < R; i++) for (let j = 0; j < C; j++) {{
    const t = mx > 0 ? m[i][j] / mx : 0;
    ctx.fillStyle = `rgb(${{Math.round(255*(1-t))}},` +
      `${{Math.round(255*(1-0.55*t))}},255)`;
    ctx.fillRect(j*s, i*s, s, s);
  }}
  cv.onmousemove = (e) => {{
    const r = cv.getBoundingClientRect();
    const j = Math.floor((e.clientX - r.left) / s);
    const i = Math.floor((e.clientY - r.top) / s);
    if (i >= 0 && i < R && j >= 0 && j < C) {{
      const qt = TOKENS[c.k].q[i] ?? i, kt = TOKENS[c.k].k[j] ?? j;
      info.textContent = `q[${{i}}]=${{qt}}  k[${{j}}]=${{kt}}  ` +
        `w=${{m[i][j].toFixed(4)}}`;
    }}
  }};
}}
kindSel.onchange = () => {{ grid(); draw(); }};
laySel.onchange = draw; headSel.onchange = draw; avgBox.onchange = draw;
grid(); draw();
</script></body></html>
"""


def _write_html_view(arrays, src_tokens, trg_tokens, folder: str) -> None:
    """Self-contained interactive HTML (reference bertviz model_view,
    visualize_attention.py:75-110, minus the widget-stack dependency).
    arrays: name -> (layers, 1, heads, Lq, Lk)."""
    import json

    data = {name: np.round(arr[:, 0], 5).tolist()
            for name, arr in arrays.items()}
    dec_in = list(trg_tokens[:-1])
    tokens = {
        "encoder": {"q": list(src_tokens), "k": list(src_tokens)},
        "decoder_self": {"q": dec_in, "k": dec_in},
        # cross keys attend over the latent memory (positions)
        "decoder_cross": {
            "q": dec_in,
            "k": [f"z{i}" for i in range(
                arrays["decoder_cross"].shape[-1])]},
    }
    html = _HTML_TEMPLATE.format(data_json=json.dumps(data),
                                 tokens_json=json.dumps(tokens))
    with open(os.path.join(folder, "attention.html"), "w") as f:
        f.write(html)


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
