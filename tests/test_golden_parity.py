"""Golden parity: our Flax models vs the upstream PyTorch reference.

The reference repo is imported read-only, purely as an oracle: we
instantiate its torch modules with random weights, convert the state
dict with our converter, and assert encoder mu/logvar and decoder
logits agree to float32 tolerance. (The reference has no test suite of
its own — SURVEY.md §4 — so this is the substitute for loading its
published checkpoints, which require network access.)
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gctplus_tpu.convert import convert_state_dict
from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
from gctplus_tpu.models.masks import get_src_mask, get_trg_mask, nopeak_mask

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref(reference_path):
    sys.path.insert(0, str(reference_path))
    import Model.vaetf as ref_vaetf
    import Model.cvaetf as ref_cvaetf
    import Model.modules as ref_modules
    yield ref_vaetf, ref_cvaetf, ref_modules
    sys.path.remove(str(reference_path))


def _torch_trg_mask(trg, pad_id, use_cond2dec, conds=None):
    """Reference get_trg_mask without its CUDA-only .to(get_device())."""
    import Model.modules as m

    mask = (trg != pad_id).unsqueeze(-2)
    if use_cond2dec and conds is not None:
        cond_mask = torch.ones_like(conds.unsqueeze(-2), dtype=torch.bool)
        mask = torch.cat([cond_mask, mask], dim=2)
    cond_dim = 0 if conds is None else conds.size(-1)
    np_mask = m.nopeak_mask(trg.size(1), use_cond2dec, pad_id, cond_dim)
    return mask & (np_mask != 0)


SMALL = dict(N=2, d_model=64, dff=128, h=4, latent_dim=16, dropout=0.0)


def _small_cfg(src_v, trg_v, nconds, use_cond2lat, use_cond2dec=False):
    return ModelConfig(
        src_vocab=src_v, trg_vocab=trg_v, N=2, d_model=64, d_ff=128, heads=4,
        latent_dim=16, dropout=0.0, nconds=nconds, use_cond2dec=use_cond2dec,
        use_cond2lat=use_cond2lat)


def _batch(src_v, trg_v, bs=3, Ls=11, Lt=9, pad_id=1, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, src_v, (bs, Ls)).astype(np.int64)
    trg = rng.integers(4, trg_v, (bs, Lt)).astype(np.int64)
    # realistic ragged padding
    src[0, -3:] = pad_id
    trg[1, -2:] = pad_id
    return src, trg


def test_vaetf_parity(ref):
    ref_vaetf, _, ref_modules = ref
    src_v, trg_v, pad = 25, 29, 1
    torch.manual_seed(0)
    tm = ref_vaetf.Vaetf(src_v, trg_v, nconds=0, use_cond2dec=False,
                         use_cond2lat=False, **SMALL)
    tm.eval()

    src_np, trg_np = _batch(src_v, trg_v)
    src_t, trg_t = torch.from_numpy(src_np), torch.from_numpy(trg_np)
    sm_t = ref_modules.get_src_mask(src_t, pad)
    tmm_t = _torch_trg_mask(trg_t, pad, False)

    with torch.no_grad():
        x = tm.encoder(src_t, sm_t, None)
        _, mu_t, logvar_t = tm.sampler(x)
        z_t = torch.randn(3, src_np.shape[1], 16)
        logits_t = tm.decode(trg_t, z_t, sm_t, tmm_t)

    cfg = _small_cfg(src_v, trg_v, 0, False)
    model = Vaetf(cfg)
    params = convert_state_dict(tm.state_dict(), "vaetf")

    src_j, trg_j = jnp.asarray(src_np), jnp.asarray(trg_np)
    sm_j = get_src_mask(src_j, pad)
    tmm_j = get_trg_mask(trg_j, pad, False)
    np.testing.assert_array_equal(np.asarray(sm_j), sm_t.numpy())
    np.testing.assert_array_equal(np.asarray(tmm_j), tmm_t.numpy())

    _, mu_j, logvar_j = model.apply(
        {"params": params}, src_j, sm_j, deterministic=True,
        method=Vaetf.encode, eps=jnp.zeros((3, src_np.shape[1], 16)))
    logits_j = model.apply(
        {"params": params}, trg_j, jnp.asarray(z_t.numpy()), sm_j, tmm_j,
        deterministic=True, method=Vaetf.decode)

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=2e-4)


@pytest.mark.parametrize("use_cond2dec", [False, True])
def test_cvaetf_parity(ref, use_cond2dec):
    _, ref_cvaetf, ref_modules = ref
    src_v, trg_v, pad, nc = 25, 29, 1, 3
    torch.manual_seed(1)
    tm = ref_cvaetf.Cvaetf(src_v, trg_v, nconds=nc,
                           use_cond2dec=use_cond2dec,
                           use_cond2lat=not use_cond2dec, **SMALL)
    tm.eval()

    src_np, trg_np = _batch(src_v, trg_v, seed=2)
    econds_np = np.random.default_rng(3).normal(size=(3, nc)).astype(np.float32)
    src_t, trg_t = torch.from_numpy(src_np), torch.from_numpy(trg_np)
    econds_t = torch.from_numpy(econds_np)
    sm_t = ref_modules.get_src_mask(src_t, pad, econds_t)
    tmm_t = _torch_trg_mask(trg_t, pad, use_cond2dec, econds_t)

    with torch.no_grad():
        mu_and_more = tm.encoder(src_t, sm_t, econds_t)
        _, mu_t, logvar_t = mu_and_more
        z_len = nc + src_np.shape[1]
        z_t = torch.randn(3, z_len, 16)
        logits_t = tm.decode(trg_t, z_t, sm_t, tmm_t, econds_t)

    cfg = _small_cfg(src_v, trg_v, nc, use_cond2lat=not use_cond2dec,
                     use_cond2dec=use_cond2dec)
    model = Cvaetf(cfg)
    params = convert_state_dict(tm.state_dict(), "cvaetf")

    src_j, trg_j = jnp.asarray(src_np), jnp.asarray(trg_np)
    econds_j = jnp.asarray(econds_np)
    sm_j = get_src_mask(src_j, pad, econds_j)
    tmm_j = get_trg_mask(trg_j, pad, use_cond2dec, econds_j)
    np.testing.assert_array_equal(np.asarray(sm_j), sm_t.numpy())
    np.testing.assert_array_equal(np.asarray(tmm_j), tmm_t.numpy())

    _, mu_j, logvar_j = model.apply(
        {"params": params}, src_j, sm_j, econds_j, deterministic=True,
        method=Cvaetf.encode, eps=jnp.zeros((3, z_len, 16)))
    logits_j = model.apply(
        {"params": params}, trg_j, jnp.asarray(z_t.numpy()), sm_j, tmm_j,
        econds_j, deterministic=True, method=Cvaetf.decode)

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(), atol=2e-4)


def test_converter_covers_all_params(ref):
    """Every live torch parameter lands in the flax tree and vice versa."""
    _, ref_cvaetf, _ = ref
    torch.manual_seed(0)
    tm = ref_cvaetf.Cvaetf(25, 29, nconds=3, use_cond2dec=False,
                           use_cond2lat=True, **SMALL)
    params = convert_state_dict(tm.state_dict(), "cvaetf")

    cfg = _small_cfg(25, 29, 3, use_cond2lat=True)
    model = Cvaetf(cfg)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 5), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        jnp.ones((1, 1, 8), bool), jnp.ones((1, 4, 4), bool),
        econds=jnp.zeros((1, 3)), dconds=jnp.zeros((1, 3)),
        deterministic=True)["params"]

    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    paths_conv = {jax.tree_util.keystr(p) for p, _ in flat_conv}
    paths_init = {jax.tree_util.keystr(p) for p, _ in flat_init}
    assert paths_conv == paths_init
    conv_by_path = {jax.tree_util.keystr(p): a for p, a in flat_conv}
    init_by_path = {jax.tree_util.keystr(p): b for p, b in flat_init}
    for path, a in conv_by_path.items():
        assert a.shape == init_by_path[path].shape, (
            f"{path}: {a.shape} vs {init_by_path[path].shape}")
