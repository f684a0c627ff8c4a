"""Fused whole-network T=1 decode kernels vs the generic v4/v5/v6
forwards (the v7 kernel has its own file, test_fused_decode.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, v4, v5, v6
from ai00_server_tpu.ops import (v4_decode_pallas, v5_decode_pallas,
                                 v6_decode_pallas)
from ai00_server_tpu.testing import make_tiny_model

CASES = {
    "v4": (ModelVersion.V4, v4, v4_decode_pallas),
    "v5": (ModelVersion.V5, v5, v5_decode_pallas),
    "v6": (ModelVersion.V6, v6, v6_decode_pallas),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def stack(request):
    ver, mod, fd = CASES[request.param]
    info, raw, params = make_tiny_model(
        ver, seed=6, dtype=np.float32, num_layer=3,
        num_emb=128, head_size=64, num_vocab=64)
    return info, params, mod, fd


def _advanced_state(info, mod, params, B, seed=0):
    rng = np.random.default_rng(seed)
    state = mod.init_state(info, B, jnp.float32)
    toks = jnp.asarray(rng.integers(0, info.num_vocab, (B, 5)), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    _, state = jax.jit(mod.forward)(params, state, toks, lens)
    return state


def test_fused_matches_generic(stack):
    info, params, mod, fd = stack
    B = 4
    state = _advanced_state(info, mod, params, B)
    rng = np.random.default_rng(1)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 0, 1], jnp.int32)  # includes an inactive row

    assert fd.can_fuse(params)
    h_ref, s_ref = jax.jit(mod.forward)(params, state, t1, l1)
    fparams = dict(params)
    fparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    h_f, s_f = fd.forward_t1(fparams, state, t1, l1, interpret=True)

    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_f[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=2e-4, err_msg=k)
    # Inactive row's state must be untouched.
    for k in s_ref:
        np.testing.assert_array_equal(np.asarray(s_f[k][:, 2]),
                                      np.asarray(state[k][:, 2]))


def test_fused_multi_step_chain(stack):
    """Several fused steps chained == several generic steps chained."""
    info, params, mod, fd = stack
    B = 2
    state_f = _advanced_state(info, mod, params, B)
    state_r = jax.tree.map(lambda x: x, state_f)
    rng = np.random.default_rng(2)
    fwd = jax.jit(mod.forward)
    fparams = dict(params)
    fparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    for _ in range(3):
        t = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
        l = jnp.ones((B,), jnp.int32)
        h_r, state_r = fwd(params, state_r, t, l)
        h_f, state_f = fd.forward_t1(fparams, state_f, t, l, interpret=True)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                                   rtol=5e-4, atol=5e-4)


def test_fused_bf16_tracks_f32_reference(stack):
    """bf16 fused must track the f32 reference at least as closely as the
    generic bf16 step (elementwise chains round at different points)."""
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params

    info0, _, mod, fd = stack
    info = tiny_info(info0.version, num_layer=3, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=6, dtype=np.float32)
    p32 = make_params(info, raw, dtype=np.float32)
    p16 = make_params(info, raw, dtype=jnp.bfloat16)

    B = 4
    state = _advanced_state(info, mod, p32, B)
    rng = np.random.default_rng(3)
    t1 = jnp.asarray(rng.integers(0, 64, (B, 1)), jnp.int32)
    l1 = jnp.ones((B,), jnp.int32)

    h32, _ = jax.jit(mod.forward)(p32, state, t1, l1)
    h16, _ = jax.jit(mod.forward)(p16, state, t1, l1)
    fp = dict(p16)
    fp[fd.FUSED_KEY] = fd.make_fused_layout(p16)
    hf, _ = fd.forward_t1(fp, state, t1, l1, interpret=True)

    ref = np.asarray(h32, np.float32)
    err_generic = np.abs(np.asarray(h16, np.float32) - ref).max()
    err_fused = np.abs(np.asarray(hf, np.float32) - ref).max()
    assert err_fused <= max(err_generic * 1.5, 0.05), \
        (err_fused, err_generic)


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_fused_quantized_matches_generic(stack, mode):
    """Quantized big projections stream as codes+scales and dequantize in
    VMEM; fused must match the generic quantized forward."""
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params

    info0, _, mod, fd = stack
    info = tiny_info(info0.version, num_layer=3, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=9, dtype=np.float32)
    params = make_params(info, raw, dtype=np.float32,
                         quant={i: mode for i in range(3)})

    B = 4
    state = _advanced_state(info, mod, params, B)
    rng = np.random.default_rng(4)
    t1 = jnp.asarray(rng.integers(0, 64, (B, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 0, 1], jnp.int32)

    assert fd.can_fuse(params)
    h_ref, s_ref = jax.jit(mod.forward)(params, state, t1, l1)
    fparams = dict(params)
    fparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    h_f, s_f = fd.forward_t1(fparams, state, t1, l1, interpret=True)

    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                               rtol=2e-4, atol=5e-4)
    for k in s_ref:
        # Quantized dequant+dot reassociates differently between the
        # kernel and the XLA path; exp(-exp(.)) decays amplify tiny
        # diffs in near-zero state entries.
        np.testing.assert_allclose(np.asarray(s_f[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=1e-3, err_msg=k)
    for k in s_ref:
        np.testing.assert_array_equal(np.asarray(s_f[k][:, 2]),
                                      np.asarray(state[k][:, 2]))
