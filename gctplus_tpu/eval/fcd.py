"""Frechet ChemNet Distance (FCD) — the real code path.

The reference reports FCD through moses.get_all_metrics
(/root/reference/Inference/uc_sampling.py:26-39), which runs the
pretrained ChemNet (Preuer 2018) over canonical SMILES and computes a
Frechet distance between activation Gaussians. The *weights* are a
data artifact (moses downloads them at install time; this environment
has no network egress), but the *code path* lives here:

  - a JAX featurizer covering ChemNet's layer types (1-D conv, LSTM,
    dense) built from an artifact-described stack, jitted and batched;
  - SMILES one-hot encoding against the artifact's own charset (the
    artifact defines charset + sequence length, so the real ChemNet
    .npz drops in without code changes);
  - the Frechet distance over activation statistics (shared with the
    descriptor-space stand-in in eval/metrics.py).

Artifact format (single .npz):
  charset     array of str — one-hot channels (multi-char tokens like
              "Cl"/"Br" allowed; greedy longest-match encoding)
  pad_idx     int scalar — channel used for padding / unknown chars
  seq_len     int scalar — fixed sequence length (real ChemNet: 350)
  layers      JSON string: list of layer specs, executed in order:
              {"type":"conv1d","w":K,"b":K,"activation":A,
               "stride":s,"padding":"valid"|"same"}   w:(k,inC,outC)
              {"type":"lstm","wi":K,"wh":K,"b":K,
               "return_sequences":bool}  wi:(in,4H) wh:(H,4H) b:(4H,)
              (Keras gate order i,f,c,o)
              {"type":"dense","w":K,"b":K,"activation":A}
  <K>         the referenced weight arrays
The activation output of the final layer is the FCD feature vector
(real ChemNet: the 512-d penultimate layer).

To produce the real artifact from the published ChemNet Keras .h5,
export each layer's kernels into this layout offline (h5py) — the
charset and 350-token one-hot encoding are part of the published FCD
reference implementation.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": lambda x: _jnp().maximum(x, 0),
    "selu": lambda x: 1.0507009873554805 * _jnp().where(
        x > 0, x, 1.6732632423543772 * (_jnp().exp(x) - 1)),
    "tanh": lambda x: _jnp().tanh(x),
    "sigmoid": lambda x: 1.0 / (1.0 + _jnp().exp(-x)),
}


def _jnp():
    import jax.numpy as jnp
    return jnp


class ChemNet:
    """Artifact-defined SMILES activation network (see module doc)."""

    def __init__(self, charset: Sequence[str], pad_idx: int, seq_len: int,
                 layers: List[Dict], weights: Dict[str, np.ndarray]):
        self.charset = list(charset)
        self.pad_idx = int(pad_idx)
        self.seq_len = int(seq_len)
        self.layers = layers
        self.weights = {k: np.asarray(v, np.float32)
                        for k, v in weights.items()}
        # greedy longest-match token table
        self._tokens = sorted(
            ((tok, i) for i, tok in enumerate(self.charset) if tok),
            key=lambda t: -len(t[0]))
        self._apply = None

    @classmethod
    def load(cls, path: str) -> "ChemNet":
        data = np.load(path, allow_pickle=False)
        charset = [str(c) for c in data["charset"]]
        layers = json.loads(str(data["layers"]))
        weights = {k: data[k] for k in data.files
                   if k not in ("charset", "pad_idx", "seq_len", "layers")}
        return cls(charset, int(data["pad_idx"]), int(data["seq_len"]),
                   layers, weights)

    def save(self, path: str) -> None:
        np.savez(
            path, charset=np.asarray(self.charset),
            pad_idx=np.int64(self.pad_idx), seq_len=np.int64(self.seq_len),
            layers=json.dumps(self.layers), **self.weights)

    # ---------------------------------------------------------- encoding
    def encode(self, smiles: str) -> np.ndarray:
        """SMILES -> (seq_len,) int channel ids, greedy longest match."""
        ids = []
        i = 0
        while i < len(smiles) and len(ids) < self.seq_len:
            for tok, idx in self._tokens:
                if smiles.startswith(tok, i):
                    ids.append(idx)
                    i += len(tok)
                    break
            else:
                ids.append(self.pad_idx)   # unknown char
                i += 1
        ids += [self.pad_idx] * (self.seq_len - len(ids))
        return np.asarray(ids, np.int32)

    def encode_batch(self, smiles: Sequence[str]) -> np.ndarray:
        return np.stack([self.encode(s) for s in smiles])

    # ----------------------------------------------------------- forward
    def _build(self):
        import jax
        import jax.numpy as jnp

        layers = self.layers
        weights = {k: jnp.asarray(v) for k, v in self.weights.items()}
        n_ch = len(self.charset)

        def forward(ids):                      # ids: (B, T) int32
            x = jax.nn.one_hot(ids, n_ch, dtype=jnp.float32)
            for spec in layers:
                kind = spec["type"]
                if kind == "conv1d":
                    w = weights[spec["w"]]     # (k, inC, outC)
                    b = weights[spec["b"]]
                    pad = spec.get("padding", "valid").upper()
                    x = jax.lax.conv_general_dilated(
                        x, w, (spec.get("stride", 1),), pad,
                        dimension_numbers=("NWC", "WIO", "NWC")) + b
                    x = _ACTIVATIONS[spec.get("activation", "linear")](x)
                elif kind == "lstm":
                    wi = weights[spec["wi"]]   # (in, 4H)
                    wh = weights[spec["wh"]]   # (H, 4H)
                    b = weights[spec["b"]]     # (4H,)
                    h_dim = wh.shape[0]

                    def step(carry, xt, wi=wi, wh=wh, b=b, h_dim=h_dim):
                        h, c = carry
                        z = xt @ wi + h @ wh + b
                        zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
                        i_g = jax.nn.sigmoid(zi)
                        f_g = jax.nn.sigmoid(zf)
                        c = f_g * c + i_g * jnp.tanh(zc)
                        o_g = jax.nn.sigmoid(zo)
                        h = o_g * jnp.tanh(c)
                        return (h, c), h

                    bsz = x.shape[0]
                    h0 = jnp.zeros((bsz, h_dim), jnp.float32)
                    (h_last, _), hs = jax.lax.scan(
                        step, (h0, h0), jnp.swapaxes(x, 0, 1))
                    if spec.get("return_sequences", False):
                        x = jnp.swapaxes(hs, 0, 1)
                    else:
                        x = h_last
                elif kind == "dense":
                    x = x @ weights[spec["w"]] + weights[spec["b"]]
                    x = _ACTIVATIONS[spec.get("activation", "linear")](x)
                else:
                    raise ValueError(f"unknown ChemNet layer: {kind}")
            return x

        return jax.jit(forward)

    def activations(self, smiles: Sequence[str],
                    batch_size: int = 512) -> np.ndarray:
        """(N, D) activation matrix; fixed batch shapes (pad last)."""
        if self._apply is None:
            self._apply = self._build()
        out = []
        for i in range(0, len(smiles), batch_size):
            chunk = list(smiles[i: i + batch_size])
            n = len(chunk)
            if n < batch_size:                 # static shapes for XLA
                chunk += [""] * (batch_size - n)
            acts = np.asarray(self._apply(self.encode_batch(chunk)))
            out.append(acts[:n])
        return np.concatenate(out) if out else np.zeros((0, 1))


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 (C1 C2)^{1/2})."""
    import scipy.linalg
    covmean = scipy.linalg.sqrtm(cov1 @ cov2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    d2 = float(np.sum((mu1 - mu2) ** 2)
               + np.trace(cov1 + cov2 - 2.0 * covmean))
    return max(0.0, d2)


def activation_statistics(acts: np.ndarray):
    return acts.mean(axis=0), np.cov(acts, rowvar=False)


def default_chemnet_path() -> Optional[str]:
    """GCTPLUS_CHEMNET env var, else <repo>/artifacts/chemnet.npz."""
    p = os.environ.get("GCTPLUS_CHEMNET")
    if p:
        return p
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "artifacts", "chemnet.npz")
    return cand if os.path.exists(cand) else None


def fcd(gen: Sequence[str], ref: Sequence[str],
        model_path: Optional[str] = None,
        canonicalize: bool = True, n_jobs: int = 1,
        batch_size: int = 512) -> float:
    """Frechet ChemNet Distance between two SMILES sets.

    moses parity (Inference/uc_sampling.py:26-39): canonicalize, drop
    invalids, featurize with ChemNet, Frechet over activation stats.
    Requires a ChemNet artifact (see module doc); raises with guidance
    when none is available."""
    path = model_path or default_chemnet_path()
    if path is None or not os.path.exists(path):
        raise NotImplementedError(
            "FCD needs a ChemNet checkpoint artifact (.npz, see "
            "gctplus_tpu/eval/fcd.py docstring for the layout). Set "
            "GCTPLUS_CHEMNET or pass model_path; "
            "frechet_descriptor_distance is the in-repo stand-in.")
    net = ChemNet.load(path)
    if canonicalize:
        from gctplus_tpu.eval.metrics import canonicalize_all
        gen = [s for s in canonicalize_all(gen, n_jobs) if s is not None]
        ref = [s for s in canonicalize_all(ref, n_jobs) if s is not None]
    if len(gen) < 2 or len(ref) < 2:
        return float("nan")
    mu1, c1 = activation_statistics(net.activations(gen, batch_size))
    mu2, c2 = activation_statistics(net.activations(ref, batch_size))
    return frechet_distance(mu1, c1, mu2, c2)


def build_surrogate_chemnet(path: str, hidden: int = 16,
                            seq_len: int = 48, seed: int = 0) -> str:
    """Small random-weight artifact with the real ChemNet layer stack
    (conv1d -> 2x LSTM -> dense), for exercising the FCD path in tests
    and validating user-converted artifacts load correctly."""
    rng = np.random.default_rng(seed)
    charset = ["", "C", "N", "O", "S", "F", "Cl", "Br", "I", "P",
               "c", "n", "o", "s", "(", ")", "[", "]", "=", "#",
               "+", "-", "@", "1", "2", "3", "4", "5", "6", "7",
               "8", "9", "%", "/", "\\", "H"]
    n_ch = len(charset)
    k, c1 = 5, hidden

    def g(*shape):
        # larger-than-init gain: the surrogate must map different
        # SMILES to visibly different activations to exercise the
        # Frechet statistics (a cold random init collapses states)
        return (2.5 * rng.standard_normal(shape) / np.sqrt(shape[0])
                ).astype(np.float32)

    def b(n):
        return (0.3 * rng.standard_normal(n)).astype(np.float32)

    weights = {
        "conv_w": g(k, n_ch, c1), "conv_b": b(c1),
        "lstm1_wi": g(c1, 4 * hidden), "lstm1_wh": g(hidden, 4 * hidden),
        "lstm1_b": b(4 * hidden),
        "lstm2_wi": g(hidden, 4 * hidden), "lstm2_wh": g(hidden, 4 * hidden),
        "lstm2_b": b(4 * hidden),
        "dense_w": g(hidden, 2 * hidden),
        "dense_b": b(2 * hidden),
    }
    layers = [
        {"type": "conv1d", "w": "conv_w", "b": "conv_b",
         "activation": "selu", "stride": 1, "padding": "valid"},
        {"type": "lstm", "wi": "lstm1_wi", "wh": "lstm1_wh",
         "b": "lstm1_b", "return_sequences": True},
        {"type": "lstm", "wi": "lstm2_wi", "wh": "lstm2_wh",
         "b": "lstm2_b", "return_sequences": False},
        {"type": "dense", "w": "dense_w", "b": "dense_b",
         "activation": "tanh"},
    ]
    net = ChemNet(charset, 0, seq_len, layers, weights)
    net.save(path)
    return path
