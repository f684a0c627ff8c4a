"""Pallas 4-bit dequant-matmul (interpret mode) vs the XLA dequant path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.ops import quant
from ai00_server_tpu.ops.quant_pallas import matmul_4bit


@pytest.mark.parametrize("mode", ["nf4", "sf4", "int4"])
@pytest.mark.parametrize("shape", [(128, 256), (256, 512)])
def test_matmul_4bit_matches_dequant(mode, shape):
    rng = np.random.default_rng(0)
    in_dim, out = shape
    w = rng.standard_normal((in_dim, out)).astype(np.float32) * 0.1
    q = quant.QUANTIZERS[mode](w)
    x = jnp.asarray(rng.standard_normal((4, in_dim)).astype(np.float32))

    want = x @ q.dequant()
    got = matmul_4bit(x, q.q, q.scale, mode=mode, out_tile=128,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_matmul_4bit_3d_input():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 128)).astype(np.float32) * 0.1
    q = quant.quantize_nf4(w)
    x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    want = x @ q.dequant()
    got = matmul_4bit(x, q.q, q.scale, out_tile=128, interpret=True)
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(128, 256), (512, 512)])
def test_matmul_int8_matches_dequant(shape):
    from ai00_server_tpu.ops.quant_pallas import matmul_int8

    rng = np.random.default_rng(2)
    in_dim, out = shape
    w = rng.standard_normal((in_dim, out)).astype(np.float32) * 0.1
    q = quant.quantize_int8(w)
    x = jnp.asarray(rng.standard_normal((4, in_dim)).astype(np.float32))

    want = x @ q.dequant()
    got = matmul_int8(x, q.q, q.scale, out_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_matmul_int8_3d_input():
    from ai00_server_tpu.ops.quant_pallas import matmul_int8

    rng = np.random.default_rng(3)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    q = quant.quantize_int8(w)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    want = x @ q.dequant()
    got = matmul_int8(x, q.q, q.scale, out_tile=128, interpret=True)
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("mode", ["int8", "nf4", "int4"])
def test_stacked_layer_matmul(mode):
    """Scalar-prefetch layer indexing into stacked codes == slicing."""
    from ai00_server_tpu.ops.quant_pallas import matmul_4bit_l, matmul_int8_l

    rng = np.random.default_rng(5)
    L = 3
    w = rng.standard_normal((L, 256, 128)).astype(np.float32) * 0.2
    q = quant.QUANTIZERS[mode](w)   # stacked: q.q has leading L dim
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    for l in range(L):
        per = quant.QuantizedLinear(
            mode, q.q[l], q.scale[l], q.shape)
        want = x @ per.dequant()
        if mode == "int8":
            got = matmul_int8_l(x, q.q, q.scale, jnp.int32(l),
                                out_tile=128, interpret=True)
        else:
            got = matmul_4bit_l(x, q.q, q.scale, jnp.int32(l), mode=mode,
                                out_tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_hoisted_scan_matches_sliced():
    """A quantized model forward (scan with hoisted codes) still matches
    the fp32 reference within int8 tolerance."""
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params
    from ai00_server_tpu.models import ModelVersion
    from ai00_server_tpu.models import v7

    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=12, dtype=np.float32)
    p_fp = make_params(info, raw, dtype=np.float32)
    p_q = make_params(info, raw, dtype=np.float32,
                      quant={0: "int8", 1: "int8"})
    toks = jnp.asarray(np.arange(8, dtype=np.int32)[None])
    lens = jnp.array([8], jnp.int32)
    s = v7.init_state(info, 1)
    h_fp, _ = jax.jit(v7.forward)(p_fp, s, toks, lens)
    h_q, _ = jax.jit(v7.forward)(p_q, s, toks, lens)
    rel = float(jnp.abs(h_q - h_fp).max() / jnp.abs(h_fp).max())
    assert rel < 0.1, rel


def test_int4_quantizer_roundtrip_error():
    """Uniform int4: dequant error bounded by half a step (absmax/16)
    everywhere except the +absmax element, which clips to 7/8*absmax
    (the [-8, 7] grid is asymmetric) — so one full step bounds all; the
    device quantizer matches numpy exactly."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    q = quant.quantize_int4(w)
    deq = np.asarray(q.dequant())
    blocks = w.reshape(-1, quant.NF4_BLOCK, 128)
    absmax = np.abs(blocks).max(axis=1, keepdims=True)
    step = (absmax / 8.0).repeat(quant.NF4_BLOCK, axis=1).reshape(w.shape)
    err = np.abs(deq - w)
    assert np.all(err <= step + 1e-6)
    # Interior (non-clipped) elements stay within half a step.
    assert np.mean(err <= step / 2 + 1e-6) > 0.95

    qd = quant.quantize_int4_jax(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(qd.q), np.asarray(q.q))
    np.testing.assert_allclose(np.asarray(qd.scale), np.asarray(q.scale),
                               rtol=1e-6)
