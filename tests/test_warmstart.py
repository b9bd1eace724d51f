"""Cross-variant warm-start (scripts/warmstart_ckpt.py).

The reference's transfer recipe (Model/build_model.py:17-25, used by
Bashscript/train/train_pscavaetf.sh) copies overlapping tensors from a
trained trunk into a fresh variant.  Ours additionally supports
cross-VOCAB transfer (scavaetf -> vaetf: `<sep>` vocabs order tokens
differently) by remapping embedding rows / out-head columns by token
string, and aliases the latent heads between the Cvaetf (folded into
encoder) and Vaetf (top-level sampler) layouts.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from flax import serialization

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOKS = ["C", "N", "O", "c", "1", "(", ")", "="]


def _write_vocab(path, itos):
    with open(path, "w") as f:
        json.dump({"itos": itos}, f)


@pytest.fixture(scope="module")
def util_folder(tmp_path_factory):
    """Plain + sep vocab pairs over the same tokens, different order
    (the sep vocabs carry <sep> and a different frequency order, as
    torchtext builds them — Utils/field.py:98-125)."""
    d = tmp_path_factory.mktemp("utils")
    specials = ["<unk>", "<pad>", "<sos>", "<eos>"]
    _write_vocab(d / "SRC.json", specials[:2] + TOKS)
    _write_vocab(d / "TRG.json", specials + TOKS)
    toks_r = list(reversed(TOKS))
    _write_vocab(d / "SRC_sep.json", specials[:2] + ["<sep>"] + toks_r)
    _write_vocab(d / "TRG_sep.json", specials + ["<sep>"] + toks_r)
    return str(d)


def _run_warmstart(src_blob, dst, src_variant, dst_variant, util_folder,
                   tmp_path):
    src_path = os.path.join(str(tmp_path), "src.msgpack")
    with open(src_path, "wb") as f:
        f.write(serialization.msgpack_serialize(src_blob))
    dst_path = os.path.join(str(tmp_path), dst)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/warmstart_ckpt.py"),
         src_path, dst_path, src_variant, dst_variant, util_folder],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr[-2000:]
    with open(dst_path, "rb") as f:
        return serialization.msgpack_restore(f.read()), out.stdout


TINY = dict(N=2, d_model=16, d_ff=32, H=2, latent_dim=8, dropout=0.1)


def _tiny_params(variant, util_folder, seed=0):
    import jax
    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.tasks.common import load_vocabs

    sv, tv = load_vocabs(util_folder, variant)
    nconds = 3 if variant in ("pvaetf", "pscavaetf") else 0
    model, cfg = build_model(
        variant, len(sv), len(tv), N=TINY["N"], d_model=TINY["d_model"],
        d_ff=TINY["d_ff"], heads=TINY["H"], latent_dim=TINY["latent_dim"],
        dropout=TINY["dropout"], use_cond2dec=False,
        use_cond2lat=(nconds > 0))
    params = init_params(model, cfg, jax.random.PRNGKey(seed))
    return serialization.to_state_dict(params), (sv, tv)


@pytest.mark.slow
def test_cross_vocab_transfer_scavaetf_to_vaetf(util_folder, tmp_path):
    src_sd, (ssv, stv) = _tiny_params("scavaetf", util_folder, seed=3)
    blob = {"params": src_sd, "step": 777, "model_params": dict(TINY)}
    out_blob, stdout = _run_warmstart(blob, "vaetf.msgpack", "scavaetf",
                                      "vaetf", util_folder, tmp_path)
    dst_sd = out_blob["params"]
    assert out_blob["step"] == 777
    assert out_blob["model_params"]["model_type"] == "vaetf"

    from gctplus_tpu.tasks.common import load_vocabs
    dsv, dtv = load_vocabs(util_folder, "vaetf")

    # every shared token's embedding row moved with its string
    emb_src = np.asarray(src_sd["decoder"]["embed"]["embedding"])
    emb_dst = np.asarray(dst_sd["decoder"]["embed"]["embedding"])
    for i, tok in enumerate(dtv.itos):
        j = stv.stoi[tok]
        np.testing.assert_array_equal(emb_dst[i], emb_src[j], err_msg=tok)

    # out head: kernel columns + bias entries follow the same map
    ok_src = np.asarray(src_sd["out"]["kernel"])
    ok_dst = np.asarray(dst_sd["out"]["kernel"])
    ob_src = np.asarray(src_sd["out"]["bias"])
    ob_dst = np.asarray(dst_sd["out"]["bias"])
    for i, tok in enumerate(dtv.itos):
        j = stv.stoi[tok]
        np.testing.assert_array_equal(ok_dst[:, i], ok_src[:, j])
        assert ob_dst[i] == ob_src[j]

    # encoder embedding via the SRC vocab pair
    es_src = np.asarray(src_sd["encoder"]["embed_sentence"]["embedding"])
    es_dst = np.asarray(dst_sd["encoder"]["embed_sentence"]["embedding"])
    for i, tok in enumerate(dsv.itos):
        np.testing.assert_array_equal(es_dst[i], es_src[ssv.stoi[tok]])

    # latent heads aliased encoder -> sampler
    np.testing.assert_array_equal(
        np.asarray(dst_sd["sampler"]["fc_mu"]["kernel"]),
        np.asarray(src_sd["encoder"]["fc_mu"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(dst_sd["sampler"]["fc_log_var"]["bias"]),
        np.asarray(src_sd["encoder"]["fc_log_var"]["bias"]))

    # a non-vocab leaf transfers verbatim
    np.testing.assert_array_equal(
        np.asarray(dst_sd["decoder"]["fc_z"]["kernel"]),
        np.asarray(src_sd["decoder"]["fc_z"]["kernel"]))


@pytest.mark.slow
def test_same_vocab_transfer_scavaetf_to_pscavaetf(util_folder, tmp_path):
    """The chain's production call: conditioning heads stay fresh,
    everything shared copies verbatim (reference transfer_params)."""
    src_sd, _ = _tiny_params("scavaetf", util_folder, seed=5)
    blob = {"params": src_sd, "step": 42, "model_params": dict(TINY)}
    out_blob, stdout = _run_warmstart(blob, "psca.msgpack", "scavaetf",
                                      "pscavaetf", util_folder, tmp_path)
    dst_sd = out_blob["params"]
    np.testing.assert_array_equal(
        np.asarray(dst_sd["decoder"]["embed"]["embedding"]),
        np.asarray(src_sd["decoder"]["embed"]["embedding"]))
    np.testing.assert_array_equal(
        np.asarray(dst_sd["encoder"]["fc_mu"]["kernel"]),
        np.asarray(src_sd["encoder"]["fc_mu"]["kernel"]))
    # pscavaetf-only conditioning embeddings exist and are fresh
    assert "embed_cond2enc" in dst_sd["encoder"] or any(
        "cond" in k for k in dst_sd["encoder"])
