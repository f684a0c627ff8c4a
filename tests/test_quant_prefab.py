"""Quantization round-trip accuracy + prefab save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu import prefab
from ai00_server_tpu.loader import LoadedModel
from ai00_server_tpu.models import ModelVersion, get_version_module
from ai00_server_tpu.ops import quant
from ai00_server_tpu.testing import make_raw_weights, make_params, tiny_info


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.2
    q = quant.quantize_int8(w)
    back = np.asarray(q.dequant())
    err = np.abs(back - w).max() / np.abs(w).max()
    assert err < 0.02


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 64)).astype(np.float32) * 0.2
    x = rng.standard_normal((3, 256)).astype(np.float32)
    q = quant.quantize_int8(w)
    got = np.asarray(q.matmul(jnp.asarray(x)))
    want = x @ np.asarray(q.dequant())
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("mode", ["nf4", "sf4"])
def test_4bit_roundtrip(mode):
    rng = np.random.default_rng(2)
    w = rng.standard_normal((128, 128)).astype(np.float32) * 0.3
    q = quant.QUANTIZERS[mode](w)
    back = np.asarray(q.dequant())
    assert back.shape == w.shape
    # 4-bit: coarse but bounded relative error per block.
    err = np.abs(back - w).max() / np.abs(w).max()
    assert err < 0.25
    got = np.asarray(q.matmul(jnp.asarray(w[:1, :])))  # smoke matmul
    assert got.shape == (1, 128)


def test_4bit_code_order():
    # Monotone along the (blocked, nibble-packed) in axis must survive.
    w = (np.arange(128, dtype=np.float32)[:, None] / 128.0
         * np.ones((1, 8), np.float32))
    q = quant.quantize_nf4(w)
    back = np.asarray(q.dequant())
    assert back.shape == (128, 8)
    assert (np.diff(back[:, 0]) >= -1e-6).all()


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_quantized_model_forward(mode):
    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=11)
    params_fp = make_params(info, raw, dtype=np.float32)
    params_q = make_params(info, raw, dtype=np.float32,
                           quant={0: mode, 1: mode})
    m = get_version_module(info.version)
    toks = jnp.asarray(np.arange(8, dtype=np.int32)[None])
    lens = jnp.array([8], jnp.int32)
    s = m.init_state(info, 1)
    h_fp, _ = jax.jit(m.forward)(params_fp, s, toks, lens)
    h_q, _ = jax.jit(m.forward)(params_q, s, toks, lens)
    if mode == "int8":
        rel = float(jnp.abs(h_q - h_fp).max() / jnp.abs(h_fp).max())
        assert rel < 0.1
    else:
        # 4-bit on max-entropy random weights amplifies through layers;
        # trained weights fare far better.  Structural sanity: outputs
        # must stay strongly aligned.
        a = np.asarray(h_fp).ravel()
        b = np.asarray(h_q).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.85, cos


def test_prefab_roundtrip(tmp_path):
    info = tiny_info(ModelVersion.V6, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=12)
    params = make_params(info, raw, dtype=np.float32,
                         quant={0: "int8"})
    model = LoadedModel(info=info, params=params, init_wkv=None)
    path = str(tmp_path / "m.prefab")
    prefab.save_prefab(path, model, config={"max_batch": 4})

    lm = prefab.load_prefab(path)
    assert lm.info.version == info.version
    assert lm.info.num_layer == 2

    m = get_version_module(info.version)
    toks = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    lens = jnp.array([6], jnp.int32)
    s = m.init_state(info, 1)
    h1, _ = jax.jit(m.forward)(params, s, toks, lens)
    h2, _ = jax.jit(m.forward)(lm.params, s, toks, lens)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_prefab_bf16(tmp_path):
    info = tiny_info(ModelVersion.V5, num_layer=1, num_emb=64,
                     head_size=32, num_vocab=32)
    raw = make_raw_weights(info, seed=13)
    params = make_params(info, raw, dtype=jnp.bfloat16)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    path = str(tmp_path / "m.prefab")
    prefab.save_prefab(path, model)
    lm = prefab.load_prefab(path)
    assert lm.params["emb"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(lm.params["emb"].astype(jnp.float32)),
        np.asarray(params["emb"].astype(jnp.float32)))
