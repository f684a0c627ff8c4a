"""Chunked (MXU) WKV forms vs the lax.scan references, incl. extreme decay."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models.v5 import wkv_scan as wkv56_scan
from ai00_server_tpu.models.v7 import _wkv_scan as wkv7_scan
from ai00_server_tpu.ops.wkv_chunked import wkv56_chunk_mm, wkv7_chunk_mm


def rand(rng, *shape, scale=0.4):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("T,sub", [(16, 16), (23, 16), (40, 8), (128, 16)])
def test_wkv56_chunked_matches_scan(T, sub):
    rng = np.random.default_rng(T + sub)
    B, H, N = 2, 3, 8
    S = rand(rng, B, H, N, N)
    r, k, v = (rand(rng, B, T, H, N) for _ in range(3))
    # Extreme decays: log w down to ~ -exp(4) (stress the suffix-sum form).
    w = jnp.asarray(
        np.exp(-np.exp(rng.standard_normal((B, T, H, N)) * 2.0))
        .astype(np.float32))
    u = rand(rng, H, N)
    mask = jnp.asarray(np.array(
        [[t < (T - 1 if b == 0 else T) for t in range(T)] for b in range(B)]))

    s_ref, y_ref = jax.jit(wkv56_scan)(S, r, k, v, w, u, mask)
    s_mm, y_mm = wkv56_chunk_mm(S, r, k, v, w, u, mask, subchunk=sub)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(s_mm), np.asarray(s_ref),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_mm) * m, np.asarray(y_ref) * m,
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("T,sub", [(16, 16), (23, 16), (128, 16), (128, 32)])
def test_wkv7_chunked_matches_scan(T, sub):
    rng = np.random.default_rng(T + sub + 7)
    B, H, N = 2, 3, 8
    S = rand(rng, B, H, N, N)
    r, k, v = (rand(rng, B, T, H, N) for _ in range(3))
    # v7-realistic decay: w = exp(-exp(-0.5) sigmoid(.)) in [0.545, 1).
    w = jnp.exp(-np.exp(-0.5) * jax.nn.sigmoid(rand(rng, B, T, H, N) * 3))
    kk = rand(rng, B, T, H, N)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    a = jax.nn.sigmoid(rand(rng, B, T, H, N) * 2)
    mask = jnp.asarray(np.array(
        [[t < (T - 1 if b == 0 else T) for t in range(T)] for b in range(B)]))

    s_ref, y_ref = jax.jit(wkv7_scan)(S, r, w, k, v, kk, a, mask)
    s_mm, y_mm = wkv7_chunk_mm(S, r, w, k, v, kk, a, mask, subchunk=sub)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(s_mm), np.asarray(s_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_mm) * m, np.asarray(y_ref) * m,
                               atol=1e-5, rtol=1e-4)


def test_v7_forward_with_chunked(monkeypatch):
    """Whole v7 forward: chunked impl == scan impl."""
    from ai00_server_tpu.models import ModelVersion, v7
    from ai00_server_tpu.testing import make_tiny_model

    info, raw, params = make_tiny_model(ModelVersion.V7, seed=61,
                                        dtype=np.float32)
    toks = jnp.asarray(np.arange(12, dtype=np.int32)[None] % info.num_vocab)
    lens = jnp.array([12], jnp.int32)
    state = v7.init_state(info, 1, jnp.float32)

    monkeypatch.setenv("AI00_WKV_IMPL", "scan")
    h_scan, s_scan = jax.jit(v7.forward)(params, state, toks, lens)

    monkeypatch.setenv("AI00_WKV_IMPL", "chunked")
    h_mm, s_mm = jax.jit(v7.forward)(params, state, toks, lens)

    np.testing.assert_allclose(np.asarray(h_mm), np.asarray(h_scan),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s_mm["wkv"]),
                               np.asarray(s_scan["wkv"]),
                               atol=1e-4, rtol=1e-3)
