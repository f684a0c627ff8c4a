"""Pallas WKV kernels (interpreter mode on CPU) vs the lax.scan references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models.v5 import wkv_scan as wkv56_scan
from ai00_server_tpu.models.v7 import _wkv_scan as wkv7_scan
from ai00_server_tpu.ops.wkv_pallas import wkv56_chunk, wkv7_chunk


def rand(rng, *shape, scale=0.5):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("T", [16, 23, 1])
def test_wkv7_matches_scan(T):
    rng = np.random.default_rng(0)
    B, H, N = 2, 3, 8
    S = rand(rng, B, H, N, N)
    r, k, v = (rand(rng, B, T, H, N) for _ in range(3))
    w = jnp.asarray(
        np.exp(-np.exp(rng.standard_normal((B, T, H, N)) * 0.5))
        .astype(np.float32))
    kk = rand(rng, B, T, H, N)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    a = jax.nn.sigmoid(rand(rng, B, T, H, N))
    mask = jnp.asarray(np.array(
        [[t < (T - 1 if b == 0 else T) for t in range(T)] for b in range(B)]))

    s_ref, y_ref = wkv7_scan(S, r, w, k, v, kk, a, mask)
    s_pal, y_pal = wkv7_chunk(S, r, w, k, v, kk, a, mask, t_block=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               atol=1e-5, rtol=1e-5)
    # Masked positions have unspecified y; compare only valid ones.
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(y_pal) * m, np.asarray(y_ref) * m,
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("T", [16, 9])
def test_wkv56_matches_scan(T):
    rng = np.random.default_rng(1)
    B, H, N = 2, 2, 8
    S = rand(rng, B, H, N, N)
    r, k, v = (rand(rng, B, T, H, N) for _ in range(3))
    w = jnp.asarray(
        np.exp(-np.exp(rng.standard_normal((B, T, H, N)) * 0.5))
        .astype(np.float32))
    u = rand(rng, H, N)
    mask = jnp.asarray(np.array(
        [[t < (T - 2 if b == 1 else T) for t in range(T)] for b in range(B)]))

    s_ref, y_ref = wkv56_scan(S, r, k, v, w, u, mask)
    s_pal, y_pal = wkv56_chunk(S, r, k, v, w, u, mask, t_block=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               atol=1e-5, rtol=1e-5)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(y_pal) * m, np.asarray(y_ref) * m,
                               atol=1e-5, rtol=1e-5)


def test_model_forward_with_pallas_interpret(monkeypatch):
    """Whole v7 forward with the pallas path (interpreted) == scan path."""
    from ai00_server_tpu.models import ModelVersion, v7
    from ai00_server_tpu.testing import make_tiny_model

    info, raw, params = make_tiny_model(ModelVersion.V7, seed=6,
                                        dtype=np.float32)
    toks = jnp.asarray(np.arange(12, dtype=np.int32)[None] % info.num_vocab)
    lens = jnp.array([12], jnp.int32)
    state = v7.init_state(info, 1, jnp.float32)

    monkeypatch.setenv("AI00_WKV_IMPL", "scan")
    h_scan, s_scan = jax.jit(v7.forward)(params, state, toks, lens)

    monkeypatch.setenv("AI00_WKV_IMPL", "pallas_interpret")
    h_pal, s_pal = jax.jit(v7.forward)(params, state, toks, lens)

    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_scan),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_pal["wkv"]),
                               np.asarray(s_scan["wkv"]),
                               atol=1e-4, rtol=1e-4)
