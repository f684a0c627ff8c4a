"""Single-pass T=1 WKV kernels (interpret mode) vs the scan recurrences."""

import numpy as np

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import v5, v7
from ai00_server_tpu.ops.wkv_t1 import wkv56_t1, wkv7_t1


def test_wkv7_t1_matches_scan():
    rng = np.random.default_rng(0)
    B, H, N = 3, 16, 64
    S = jnp.asarray(rng.standard_normal((B, H, N, N)), jnp.float32)
    ins = [jnp.asarray(rng.standard_normal((B, 1, H, N)) * 0.3, jnp.float32)
           for _ in range(6)]
    r, w, k, v, kk, a = ins
    w = jax.nn.sigmoid(w)  # decay in (0, 1)
    mask = jnp.asarray([[True], [True], [False]])

    S_ref, y_ref = v7._wkv_scan(S, r, w, k, v, kk, a, mask)
    S_got, y_got = wkv7_t1(S, r[:, 0], w[:, 0], k[:, 0], v[:, 0],
                           kk[:, 0], a[:, 0], mask[:, 0], interpret=True)
    np.testing.assert_allclose(np.asarray(S_got), np.asarray(S_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref[:, 0]),
                               rtol=1e-5, atol=1e-5)
    # Inactive row's state untouched.
    np.testing.assert_array_equal(np.asarray(S_got[2]), np.asarray(S[2]))


def test_wkv56_t1_matches_scan():
    rng = np.random.default_rng(1)
    B, H, N = 3, 16, 64
    S = jnp.asarray(rng.standard_normal((B, H, N, N)), jnp.float32)
    ins = [jnp.asarray(rng.standard_normal((B, 1, H, N)) * 0.3, jnp.float32)
           for _ in range(4)]
    r, k, v, w = ins
    w = jax.nn.sigmoid(w)
    u = jnp.asarray(rng.standard_normal((H, N)) * 0.3, jnp.float32)
    mask = jnp.asarray([[True], [True], [False]])

    S_ref, y_ref = v5.wkv_scan(S, r, k, v,
                               jnp.broadcast_to(w, (B, 1, H, N)), u, mask)
    S_got, y_got = wkv56_t1(S, r[:, 0], k[:, 0], v[:, 0], w[:, 0], u,
                            mask[:, 0], interpret=True)
    np.testing.assert_allclose(np.asarray(S_got), np.asarray(S_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref[:, 0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(S_got[2]), np.asarray(S[2]))
