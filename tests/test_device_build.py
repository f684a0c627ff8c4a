"""Device-side random model builder (bench fast path) mirrors
``loader.stack_params``: identical pytree structure, shapes and dtypes,
and the result decodes through the real engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai00_server_tpu.loader import stack_params
from ai00_server_tpu.models.info import ModelVersion
from ai00_server_tpu.ops.quant import (
    QuantizedLinear, quantize_int8, quantize_int8_jax, quantize_nf4,
    quantize_4bit_jax)
from ai00_server_tpu.testing import (
    make_raw_weights, make_stacked_random_device, tiny_info)


def _sig(tree):
    leaves, treedef = jax.tree.flatten(
        tree, is_leaf=lambda x: isinstance(x, QuantizedLinear))
    sig = []
    for leaf in leaves:
        if isinstance(leaf, QuantizedLinear):
            sig.append(("Q", leaf.mode, tuple(leaf.q.shape),
                        str(leaf.q.dtype), tuple(leaf.scale.shape),
                        tuple(leaf.shape)))
        else:
            sig.append((tuple(np.shape(leaf)), str(jnp.asarray(leaf).dtype)))
    return str(treedef), sig


@pytest.mark.parametrize("version", list(ModelVersion))
@pytest.mark.parametrize("quant", [None, "int8", "nf4"])
def test_structure_matches_stack_params(version, quant):
    if version == ModelVersion.V4 and quant:
        pytest.skip("same quant machinery as v5-v7; structure covered")
    L, C, V = 3, 256, 512
    info = tiny_info(version, num_layer=L, num_emb=C, head_size=64,
                     num_vocab=V)
    raw = make_raw_weights(info, seed=0, dtype=np.float32)
    qmap = {i: quant for i in range(L)} if quant else None
    host = stack_params(info, raw, dtype=jnp.bfloat16, quant=qmap)
    dev = make_stacked_random_device(info, seed=0, dtype=jnp.bfloat16,
                                     quant=quant)
    h_def, h_sig = _sig(host)
    d_def, d_sig = _sig(dev)
    assert h_def == d_def
    assert h_sig == d_sig


def test_v7_layer0_value_residual_zero():
    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    dev = make_stacked_random_device(info, seed=0)
    att = dev["groups"][0]["layers"]["att"]
    assert float(jnp.abs(att["v0"][0]).max()) == 0.0
    assert float(jnp.abs(att["v1"][0]).max()) == 0.0
    assert float(jnp.abs(att["v0"][1]).max()) > 0.0


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_jax_quantizers_match_numpy(mode):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.4
    host = (quantize_int8 if mode == "int8" else quantize_nf4)(w)
    dev = (quantize_int8_jax(jnp.asarray(w)) if mode == "int8"
           else quantize_4bit_jax(jnp.asarray(w), "nf4"))
    assert host.mode == dev.mode and host.shape == dev.shape
    np.testing.assert_array_equal(np.asarray(host.q), np.asarray(dev.q))
    np.testing.assert_allclose(np.asarray(host.scale),
                               np.asarray(dev.scale), rtol=1e-6)


def test_device_built_model_decodes():
    from ai00_server_tpu.engine import Engine
    from ai00_server_tpu.loader import LoadedModel

    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=512)
    params = make_stacked_random_device(info, seed=0, quant="int8")
    model = LoadedModel(info=info, params=params, init_wkv=None)
    engine = Engine(model, max_batch=2, token_chunk_size=16)
    engine.set_row_sampler(0, {"kind": 0})
    engine.set_row_sampler(1, {"kind": 0})
    toks = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
    res = engine.step(toks, np.array([4, 4], np.int32),
                      np.array([True, True]))
    out, _ = engine.decode_chunk(res.tokens.astype(np.int32),
                                 np.array([True, True]), 4)
    assert out.shape == (4, 2)
    assert np.all(out >= 0) and np.all(out < 512)
