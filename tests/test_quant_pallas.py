"""Pallas 4-bit dequant-matmul (interpret mode) vs the XLA dequant path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.ops import quant
from ai00_server_tpu.ops.quant_pallas import matmul_4bit


@pytest.mark.parametrize("mode", ["nf4", "sf4"])
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
