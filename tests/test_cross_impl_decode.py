"""Capstone cross-implementation test: the upstream torch model,
decoded greedily with its own decode() semantics, must produce the
SAME token sequences as our KV-cached engine running the converted
weights — the sampling-path analog of the logits golden tests."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gctplus_tpu.convert import convert_state_dict
from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
from gctplus_tpu.sample.decode import DecodeEngine

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref(reference_path):
    sys.path.insert(0, str(reference_path))
    import Model.vaetf as rv
    import Model.cvaetf as rc
    yield rv, rc
    sys.path.remove(str(reference_path))


def _torch_greedy(tmodel, z, src_mask_np, prefix, max_new, dconds=None,
                  pad=1, eos=3):
    """Greedy decode with the reference decode() (full re-run per step,
    trg mask rebuilt each step — sampling_tool.py:140-184 semantics)."""
    import Model.modules as m

    ys = torch.from_numpy(np.asarray(prefix, np.int64))
    bs = ys.shape[0]
    finished = np.zeros(bs, bool)
    src_mask = torch.from_numpy(src_mask_np)
    z_t = torch.from_numpy(np.asarray(z, np.float32))
    dc = None if dconds is None else torch.from_numpy(
        np.asarray(dconds, np.float32))
    with torch.no_grad():
        for _ in range(max_new):
            np_mask = m.nopeak_mask(ys.shape[1], False, pad, 0)
            trg_mask = (ys != pad).unsqueeze(-2) & (np_mask != 0)
            if dc is not None:
                logits = tmodel.decode(ys, z_t, src_mask, trg_mask, dc)
            else:
                logits = tmodel.decode(ys, z_t, src_mask, trg_mask)
            nxt = logits[:, -1, :].argmax(-1)
            nxt = torch.where(torch.from_numpy(finished),
                              torch.full_like(nxt, pad), nxt)
            ys = torch.cat([ys, nxt[:, None]], dim=1)
            finished |= nxt.numpy() == eos
            if finished.all():
                break
    return ys.numpy()


def _trim(row, prefix_len, eos=3, pad=1):
    out = []
    for t in row[prefix_len:]:
        if t in (eos, pad):
            break
        out.append(int(t))
    return out


SMALL = dict(N=2, d_model=64, dff=128, h=4, latent_dim=16, dropout=0.0)


def test_vaetf_cross_impl_greedy(ref):
    rv, _ = ref
    torch.manual_seed(3)
    tm = rv.Vaetf(25, 29, nconds=0, use_cond2dec=False, use_cond2lat=False,
                  **SMALL)
    tm.eval()
    cfg = ModelConfig(src_vocab=25, trg_vocab=29, N=2, d_model=64, d_ff=128,
                      heads=4, latent_dim=16, dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = convert_state_dict(tm.state_dict(), "vaetf")

    bs, lat, max_new = 3, 14, 16
    rng = np.random.default_rng(0)
    z = rng.normal(size=(bs, lat, 16)).astype(np.float32)
    toklen = np.array([8, 14, 11])
    src_mask = (np.arange(lat)[None, None, :] < toklen[:, None, None])
    prefix = np.full((bs, 1), 2, np.int32)

    ref_tokens = _torch_greedy(tm, z, src_mask, prefix, max_new)

    eng = DecodeEngine(model, cfg)
    ours = np.asarray(eng.sample(
        params, jnp.asarray(prefix), 1, jnp.asarray(z),
        jnp.asarray(src_mask), None, jax.random.PRNGKey(0),
        max_new=max_new, decode_algo="greedy"))

    for b in range(bs):
        assert _trim(ref_tokens[b], 1) == _trim(ours[b], 1), (
            f"row {b}: ref={ref_tokens[b]} ours={ours[b]}")


def test_pscavaetf_cross_impl_greedy_with_scaffold_prefix(ref):
    """cond2lat + scaffold token prefix, the pscavaetf decode shape."""
    _, rc = ref
    torch.manual_seed(4)
    tm = rc.Cvaetf(25, 29, nconds=3, use_cond2dec=False, use_cond2lat=True,
                   **SMALL)
    tm.eval()
    cfg = ModelConfig(src_vocab=25, trg_vocab=29, N=2, d_model=64, d_ff=128,
                      heads=4, latent_dim=16, dropout=0.0, nconds=3,
                      use_cond2lat=True)
    model = Cvaetf(cfg)
    params = convert_state_dict(tm.state_dict(), "cvaetf")

    bs, max_new = 2, 12
    sca_ids = [5, 6, 7, 8]          # pretend scaffold
    prefix_list = [2] + sca_ids + [4]  # <sos> + sca + <sep>
    prefix = np.tile(np.asarray(prefix_list, np.int32), (bs, 1))
    lat = len(sca_ids) + 1 + 10
    rng = np.random.default_rng(1)
    z = rng.normal(size=(bs, lat, 16)).astype(np.float32)
    dconds = rng.normal(size=(bs, 3)).astype(np.float32)
    toklen = np.array([lat, lat - 3])
    src_mask = (np.arange(lat)[None, None, :] < toklen[:, None, None])

    ref_tokens = _torch_greedy(tm, z, src_mask, prefix, max_new,
                               dconds=dconds)

    eng = DecodeEngine(model, cfg)
    ours = np.asarray(eng.sample(
        params, jnp.asarray(prefix), len(prefix_list), jnp.asarray(z),
        jnp.asarray(src_mask), jnp.asarray(dconds), jax.random.PRNGKey(0),
        max_new=max_new, decode_algo="greedy"))

    P = len(prefix_list)
    for b in range(bs):
        assert _trim(ref_tokens[b], P) == _trim(ours[b], P), (
            f"row {b}: ref={ref_tokens[b]} ours={ours[b]}")
