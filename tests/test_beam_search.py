"""Beam search: width-1 must equal greedy; wider beams score >= greedy."""

import numpy as np

import jax
import jax.numpy as jnp

from gctplus_tpu.models import ModelConfig, Vaetf
from gctplus_tpu.models.registry import init_params
from gctplus_tpu.sample.decode import DecodeEngine


def _setup():
    cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32, d_ff=64,
                      heads=4, latent_dim=8, dropout=0.0, nconds=0)
    model = Vaetf(cfg)
    params = init_params(model, cfg)
    bs, lat = 2, 12
    z = jnp.asarray(np.random.default_rng(0).normal(size=(bs, lat, 8)),
                    jnp.float32)
    src_mask = jnp.ones((bs, 1, lat), bool)
    prefix = jnp.asarray(np.full((bs, 1), 2, np.int32))
    return model, cfg, params, z, src_mask, prefix


def _seq_logprob(model, params, row, z, src_mask, eos_id=3, pad_id=1):
    """Log-prob of a generated row under the model (teacher-forced)."""
    from gctplus_tpu.models.masks import get_trg_mask

    toks = [int(t) for t in row]
    # trim at pad
    while toks and toks[-1] == pad_id:
        toks.pop()
    ys = jnp.asarray([toks])
    tm = get_trg_mask(ys, pad_id, False)
    logits = model.apply({"params": params}, ys, z[:1], src_mask[:1], tm,
                         None, deterministic=True, method=Vaetf.decode)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
    lp = 0.0
    for i, t in enumerate(toks[1:]):
        lp += float(logp[i, t])
    return lp


def test_beam1_equals_greedy():
    model, cfg, params, z, src_mask, prefix = _setup()
    eng = DecodeEngine(model, cfg)
    greedy = np.asarray(eng.sample(
        params, prefix, 1, z, src_mask, None, jax.random.PRNGKey(0),
        max_new=10, decode_algo="greedy", eos_id=3, pad_id=1))
    beam1 = np.asarray(eng.beam_search(
        params, prefix, 1, z, src_mask, None, max_new=10, beam_width=1,
        eos_id=3, pad_id=1))

    def trim(r):
        out = []
        for t in r[1:]:
            if t in (1, 3):
                break
            out.append(int(t))
        return out

    for b in range(2):
        assert trim(greedy[b]) == trim(beam1[b])


def test_wider_beam_not_worse():
    model, cfg, params, z, src_mask, prefix = _setup()
    eng = DecodeEngine(model, cfg)
    beam1 = np.asarray(eng.beam_search(
        params, prefix, 1, z, src_mask, None, max_new=10, beam_width=1,
        length_penalty=0.0, eos_id=3, pad_id=1))
    beam4 = np.asarray(eng.beam_search(
        params, prefix, 1, z, src_mask, None, max_new=10, beam_width=4,
        length_penalty=0.0, eos_id=3, pad_id=1))
    lp1 = _seq_logprob(model, params, beam1[0], z, src_mask)
    lp4 = _seq_logprob(model, params, beam4[0], z, src_mask)
    assert lp4 >= lp1 - 1e-4


def test_beam_with_conditions():
    import numpy as np
    from gctplus_tpu.models import Cvaetf, ModelConfig
    from gctplus_tpu.models.registry import init_params

    cfg = ModelConfig(src_vocab=20, trg_vocab=20, N=1, d_model=32, d_ff=64,
                      heads=4, latent_dim=8, dropout=0.0, nconds=3,
                      use_cond2lat=True)
    model = Cvaetf(cfg)
    params = init_params(model, cfg)
    bs, lat = 2, 10
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(bs, lat, 8)), jnp.float32)
    src_mask = jnp.ones((bs, 1, lat), bool)
    dconds = jnp.asarray(rng.normal(size=(bs, 3)), jnp.float32)
    prefix = jnp.asarray(np.full((bs, 1), 2, np.int32))
    eng = DecodeEngine(model, cfg)
    out = np.asarray(eng.beam_search(params, prefix, 1, z, src_mask, dconds,
                                     max_new=8, beam_width=3))
    assert out.shape == (bs, 9)
