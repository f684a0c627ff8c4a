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


def test_quantized_forward_t1_kernels_match_generic(monkeypatch):
    """Full v7 T=1 forward with the single-pass WKV + fused FFN kernels
    (interpret) == the generic XLA path, on a quantized model."""
    import numpy as np
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params
    from ai00_server_tpu.models import ModelVersion

    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=15, dtype=np.float32)
    params = make_params(info, raw, dtype=np.float32,
                         quant={0: "int8", 1: "int8"})
    B = 3
    state = v7.init_state(info, B, jnp.float32)
    toks = jnp.asarray(np.arange(B * 4, dtype=np.int32).reshape(B, 4) % 64)
    lens = jnp.full((B,), 4, jnp.int32)
    _, state = jax.jit(v7.forward)(params, state, toks, lens)

    t1 = jnp.asarray([[1], [2], [3]], jnp.int32)
    l1 = jnp.asarray([1, 0, 1], jnp.int32)

    monkeypatch.delenv("AI00_WKV_IMPL", raising=False)
    h_ref, s_ref = v7.forward(params, state, t1, l1)

    monkeypatch.setenv("AI00_WKV_IMPL", "pallas_interpret")
    h_got, s_got = v7.forward(params, state, t1, l1)

    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               rtol=3e-4, atol=3e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_got[k]),
                                   np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=3e-4, err_msg=k)
