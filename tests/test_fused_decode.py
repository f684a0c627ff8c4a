"""Fused whole-network T=1 decode kernel vs the generic v7 forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, v7
from ai00_server_tpu.ops import v7_decode_pallas as fd
from ai00_server_tpu.testing import make_tiny_model


@pytest.fixture(scope="module")
def stack():
    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=7, dtype=np.float32, num_layer=3,
        num_emb=128, head_size=64, num_vocab=64)
    return info, params


def _advanced_state(info, params, B, seed=0):
    rng = np.random.default_rng(seed)
    state = v7.init_state(info, B, jnp.float32)
    toks = jnp.asarray(rng.integers(0, info.num_vocab, (B, 5)), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    _, state = jax.jit(v7.forward)(params, state, toks, lens)
    return state


def test_fused_matches_generic(stack):
    info, params = stack
    B = 4
    state = _advanced_state(info, params, B)
    rng = np.random.default_rng(1)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 0, 1], jnp.int32)  # includes an inactive row

    assert fd.can_fuse(params)
    h_ref, s_ref = jax.jit(v7.forward)(params, state, t1, l1)
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
    info, params = stack
    B = 2
    state_f = _advanced_state(info, params, B)
    state_r = jax.tree.map(lambda x: x, state_f)
    rng = np.random.default_rng(2)
    fwd = jax.jit(v7.forward)
    fparams = dict(params)
    fparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    for _ in range(3):
        t = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
        l = jnp.ones((B,), jnp.int32)
        h_r, state_r = fwd(params, state_r, t, l)
        h_f, state_f = fd.forward_t1(fparams, state_f, t, l, interpret=True)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                                   rtol=5e-4, atol=5e-4)


def test_can_fuse_rejects_mixed(stack):
    """Uniformly-quantized groups fuse; mixed modes and multi-group
    (per-layer quant splits) do not."""
    info, params = stack
    from ai00_server_tpu.testing import make_raw_weights, make_params

    two = {"groups": [params["groups"][0], params["groups"][0]]}
    assert not fd.can_fuse(two)

    raw = make_raw_weights(info, seed=7, dtype=np.float32)
    pq = make_params(info, raw, dtype=np.float32,
                     quant={i: "int8" for i in range(info.num_layer)})
    assert fd.can_fuse(pq)
    # De-quantize one of the big six -> mixed -> rejected.
    mixed = jax.tree.map(lambda x: x, pq,
                         is_leaf=lambda x: hasattr(x, "matmul"))
    mixed["groups"][0]["layers"]["ffn"]["value"] = \
        mixed["groups"][0]["layers"]["ffn"]["value"].dequant()
    assert not fd.can_fuse(mixed)


def test_fused_bf16_tracks_f32_reference(stack):
    """bf16: the kernel does several elementwise chains in f32 that the
    generic path rounds through bf16, so outputs differ within bf16
    noise.  Correctness criterion: the fused bf16 step must track the f32
    reference at least as closely as the generic bf16 step does."""
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params

    info = tiny_info(ModelVersion.V7, num_layer=3, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=7, dtype=np.float32)
    p32 = make_params(info, raw, dtype=np.float32)
    p16 = make_params(info, raw, dtype=jnp.bfloat16)

    B = 4
    state = _advanced_state(info, p32, B)
    rng = np.random.default_rng(3)
    t1 = jnp.asarray(rng.integers(0, 64, (B, 1)), jnp.int32)
    l1 = jnp.ones((B,), jnp.int32)

    h32, _ = jax.jit(v7.forward)(p32, state, t1, l1)
    h16, _ = jax.jit(v7.forward)(p16, state, t1, l1)
    fp = dict(p16)
    fp[fd.FUSED_KEY] = fd.make_fused_layout(p16)
    hf, _ = fd.forward_t1(fp, state, t1, l1, interpret=True)

    ref = np.asarray(h32, np.float32)
    err_generic = np.abs(np.asarray(h16, np.float32) - ref).max()
    err_fused = np.abs(np.asarray(hf, np.float32) - ref).max()
    assert err_fused <= max(err_generic * 1.5, 0.05), \
        (err_fused, err_generic)


@pytest.mark.parametrize("mode", ["int8", "nf4", "int4"])
def test_fused_quantized_matches_generic(mode):
    """Quantized big projections stream as codes+scales and dequantize in
    VMEM; fused must match the generic quantized forward."""
    from ai00_server_tpu.testing import tiny_info, make_raw_weights, \
        make_params

    info = tiny_info(ModelVersion.V7, num_layer=3, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=9, dtype=np.float32)
    params = make_params(info, raw, dtype=np.float32,
                         quant={i: mode for i in range(3)})

    B = 4
    state = _advanced_state(info, params, B)
    rng = np.random.default_rng(4)
    t1 = jnp.asarray(rng.integers(0, 64, (B, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 0, 1], jnp.int32)

    assert fd.can_fuse(params)
    h_ref, s_ref = jax.jit(v7.forward)(params, state, t1, l1)
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
