"""KV-cached decode must match the naive full-redecode path exactly
(greedy), for both unconditioned and cond2lat+scaffold-prefix settings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gctplus_tpu.models import Cvaetf, ModelConfig, Vaetf
from gctplus_tpu.models.masks import get_trg_mask
from gctplus_tpu.models.registry import init_params
from gctplus_tpu.sample.decode import DecodeEngine


def _naive_greedy(model, params, prefix_ids, z, src_mask, dconds, max_new,
                  eos_id, pad_id):
    """Reference decode algorithm (sampling_tool.py:140-184): re-run the
    full decoder each step, greedy argmax on the last position."""
    decode = jax.jit(lambda p, ys, z, sm, tm, dc: model.apply(
        {"params": p}, ys, z, sm, tm, dc, deterministic=True,
        method=type(model).decode))
    ys = np.array(prefix_ids, dtype=np.int32)
    bs = ys.shape[0]
    finished = np.zeros(bs, bool)
    for _ in range(max_new):
        trg_mask = get_trg_mask(jnp.asarray(ys), pad_id, False,
                                None if dconds is None else jnp.asarray(dconds))
        logits = decode(params, jnp.asarray(ys), z, src_mask, trg_mask, dconds)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1)).astype(np.int32)
        nxt = np.where(finished, pad_id, nxt)
        ys = np.concatenate([ys, nxt[:, None]], axis=1)
        finished |= nxt == eos_id
        if finished.all():
            break
    return ys


def _trim(row, eos_id, pad_id):
    out = []
    for t in row[1:]:  # skip sos
        if t in (eos_id, pad_id):
            break
        out.append(int(t))
    return out


@pytest.mark.parametrize("variant", ["vaetf", "cvaetf"])
def test_kv_cache_matches_naive_greedy(variant):
    pad_id, sos_id, eos_id = 1, 2, 3
    bs, lat_len, max_new = 4, 24, 20
    if variant == "vaetf":
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=2, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.0, nconds=0)
        model = Vaetf(cfg)
        dconds = None
    else:
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=2, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.0,
                          nconds=3, use_cond2lat=True)
        model = Cvaetf(cfg)
        dconds = jnp.asarray(np.random.default_rng(1).normal(size=(bs, 3)),
                             jnp.float32)

    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(bs, lat_len, cfg.latent_dim)), jnp.float32)
    toklen = np.array([10, 15, 24, 7])
    src_mask = jnp.asarray(np.arange(lat_len)[None, None, :] < toklen[:, None, None])

    prefix = np.full((bs, 4), pad_id, np.int32)
    prefix[:, 0] = sos_id
    prefix[:, 1] = 5
    prefix[:, 2] = 6
    prefix[:, 3] = 7  # pretend scaffold prefix, uniform length 4
    prefix_len = 4

    naive = _naive_greedy(model, params, prefix, z, src_mask, dconds,
                          max_new, eos_id, pad_id)

    eng = DecodeEngine(model, cfg)
    fast = np.asarray(eng.sample(
        params, jnp.asarray(prefix), prefix_len, z, src_mask, dconds,
        jax.random.PRNGKey(0), max_new=max_new, decode_algo="greedy",
        eos_id=eos_id, pad_id=pad_id))

    for b in range(bs):
        assert _trim(naive[b], eos_id, pad_id) == _trim(fast[b], eos_id, pad_id), (
            f"row {b}: naive={naive[b]} fast={fast[b]}")


@pytest.mark.parametrize("variant", ["vaetf", "cvaetf"])
def test_fused_packed_decode_matches_xla_path(variant):
    """The fused Pallas decode path (packed (bs,T,D) caches, in-kernel
    cache update — ops/decode_attention.py) must reproduce the XLA
    KV-cache path token-for-token (greedy). Runs the kernels in
    interpreter mode on CPU."""
    pad_id, sos_id, eos_id = 1, 2, 3
    bs, lat_len, max_new = 4, 16, 14
    if variant == "vaetf":
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=2, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.0,
                          nconds=0)
        model = Vaetf(cfg)
        dconds = None
    else:
        cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=2, d_model=32,
                          d_ff=64, heads=4, latent_dim=8, dropout=0.0,
                          nconds=3, use_cond2lat=True)
        model = Cvaetf(cfg)
        dconds = jnp.asarray(np.random.default_rng(1).normal(size=(bs, 3)),
                             jnp.float32)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(bs, lat_len, cfg.latent_dim)),
                    jnp.float32)
    toklen = np.array([9, 16, 12, 5])
    src_mask = jnp.asarray(
        np.arange(lat_len)[None, None, :] < toklen[:, None, None])
    prefix = np.full((bs, 2), pad_id, np.int32)
    prefix[:, 0] = sos_id
    prefix[:, 1] = 5

    outs = {}
    for mode in (False, "interpret", "mega_interpret"):
        eng = DecodeEngine(model, cfg, fused=mode)
        outs[mode] = np.asarray(eng.sample(
            params, jnp.asarray(prefix), 2, z, src_mask, dconds,
            jax.random.PRNGKey(0), max_new=max_new, decode_algo="greedy",
            eos_id=eos_id, pad_id=pad_id))
    for mode in ("interpret", "mega_interpret"):
        for b in range(bs):
            assert (_trim(outs[False][b], eos_id, pad_id)
                    == _trim(outs[mode][b], eos_id, pad_id)), (
                f"row {b} [{mode}]: xla={outs[False][b]} "
                f"fused={outs[mode][b]}")


def test_kv_cache_with_padded_prefix_bucket():
    """A prefix right-padded into a larger bucket must decode the same
    tokens as the tight prefix (positions stay compact)."""
    pad_id, sos_id, eos_id = 1, 2, 3
    cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=2, d_model=32, d_ff=64,
                      heads=4, latent_dim=8, dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    bs, lat_len, max_new = 2, 16, 12
    z = jnp.asarray(np.random.default_rng(2).normal(size=(bs, lat_len, 8)),
                    jnp.float32)
    src_mask = jnp.ones((bs, 1, lat_len), bool)
    eng = DecodeEngine(model, cfg)

    tight = np.full((bs, 3), pad_id, np.int32)
    tight[:, :3] = [sos_id, 5, 6]
    padded = np.full((bs, 8), pad_id, np.int32)
    padded[:, :3] = [sos_id, 5, 6]

    out_tight = np.asarray(eng.sample(
        params, jnp.asarray(tight), 3, z, src_mask, None,
        jax.random.PRNGKey(0), max_new=max_new, decode_algo="greedy",
        eos_id=eos_id, pad_id=pad_id))
    out_padded = np.asarray(eng.sample(
        params, jnp.asarray(padded), 3, z, src_mask, None,
        jax.random.PRNGKey(0), max_new=max_new, decode_algo="greedy",
        eos_id=eos_id, pad_id=pad_id))

    def gen_tokens(row, start):
        toks = []
        for t in row[start:]:
            if t in (eos_id, pad_id):
                break
            toks.append(int(t))
        return toks

    assert gen_tokens(out_tight[0], 3) == gen_tokens(out_padded[0], 3)
    assert gen_tokens(out_tight[1], 3) == gen_tokens(out_padded[1], 3)


def test_multinomial_and_topk_run():
    cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32, d_ff=64,
                      heads=4, latent_dim=8, dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    bs, lat_len = 3, 12
    z = jnp.zeros((bs, lat_len, 8))
    src_mask = jnp.ones((bs, 1, lat_len), bool)
    prefix = np.full((bs, 1), 2, np.int32)
    eng = DecodeEngine(model, cfg)
    for algo, k in (("multinomial", None), ("multinomial", 4)):
        out = np.asarray(eng.sample(
            params, jnp.asarray(prefix), 1, z, src_mask, None,
            jax.random.PRNGKey(7), max_new=10, decode_algo=algo, top_k=k))
        assert out.shape == (bs, 11)
