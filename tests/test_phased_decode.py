"""Phased whole-layer T=1 decode kernel vs the generic v7 forward.

The phased kernel (ops/v7_phased_pallas.py) is the 7B-class decode path:
K-tiled weight windows over a (L, 12*na) grid.  These tests run it in
interpret mode on shapes small enough for CPU but with na > 1 so the
tile accumulation paths are exercised.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, v7
from ai00_server_tpu.ops import v7_decode_pallas as fd
from ai00_server_tpu.ops import v7_phased_pallas as pd
from ai00_server_tpu.testing import make_params, make_raw_weights, \
    make_tiny_model, tiny_info


@pytest.fixture(scope="module")
def stack():
    # C=512, F=2048: na=1 -> Kt=512, Ktf=128, Ktv=512 (all >= 128).
    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=9, dtype=np.float32, num_layer=2,
        num_emb=512, head_size=64, num_vocab=64)
    return info, raw, params


def _advanced_state(info, params, B, seed=0):
    rng = np.random.default_rng(seed)
    state = v7.init_state(info, B, jnp.float32)
    toks = jnp.asarray(rng.integers(0, info.num_vocab, (B, 5)), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    _, state = jax.jit(v7.forward)(params, state, toks, lens)
    return state


def _run_both(info, params, B=4, na=1, seed=1):
    state = _advanced_state(info, params, B)
    rng = np.random.default_rng(seed)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
    l1 = jnp.asarray([1] * (B - 1) + [0], jnp.int32)  # one inactive row
    h_ref, s_ref = jax.jit(v7.forward)(params, state, t1, l1)
    pparams = dict(params)
    pparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    h_p, s_p = pd.forward_t1(pparams, state, t1, l1, na=na, interpret=True)
    return (h_ref, s_ref), (h_p, s_p), state


def test_phased_matches_generic_plain(stack):
    info, raw, params = stack
    assert pd.can_phase(params, batch=4, na=1)
    (h_ref, s_ref), (h_p, s_p), state = _run_both(info, params, na=1)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_p[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=2e-4, err_msg=k)
    # Inactive row untouched.
    for k in s_ref:
        np.testing.assert_array_equal(np.asarray(s_p[k][:, -1]),
                                      np.asarray(state[k][:, -1]))


def test_phased_matches_generic_int8(stack):
    info, raw, params = stack
    pq = make_params(info, make_raw_weights(info, seed=9, dtype=np.float32),
                     dtype=np.float32,
                     quant={i: "int8" for i in range(info.num_layer)})
    assert pd.can_phase(pq, batch=4, na=1)
    (h_ref, s_ref), (h_p, s_p), _ = _run_both(info, pq, na=1)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=3e-4, atol=3e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_p[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=3e-4, err_msg=k)


def test_phased_matches_generic_int4(stack):
    """Uniform int4: the kernel decodes PACKED nibbles in VMEM (split-
    half, (code-8)*scale with scales on the accumulator) — must match
    the generic path's XLA dequant bit for bit at f32."""
    info, raw, params = stack
    pq = make_params(info, make_raw_weights(info, seed=9, dtype=np.float32),
                     dtype=np.float32,
                     quant={i: "int4" for i in range(info.num_layer)})
    assert pd.can_phase(pq, batch=4, na=1)
    (h_ref, s_ref), (h_p, s_p), _ = _run_both(info, pq, na=1)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=3e-4, atol=3e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_p[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=3e-4, err_msg=k)


def test_phased_multi_tile_accumulation():
    """na=2 at C=1024 exercises multi-tile accumulators on every matmul."""
    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=5, dtype=np.float32, num_layer=2,
        num_emb=1024, head_size=64, num_vocab=64)
    assert pd.can_phase(params, batch=2, na=2)
    (h_ref, s_ref), (h_p, s_p), _ = _run_both(info, params, B=2, na=2)
    # K-tiled partial sums accumulate in a different order than one big
    # dot; tolerances cover f32 reassociation noise.
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=5e-4, atol=5e-4)
    for k in s_ref:
        np.testing.assert_allclose(np.asarray(s_p[k]), np.asarray(s_ref[k]),
                                   rtol=3e-3, atol=6e-4, err_msg=k)


def test_phased_chain_matches_generic(stack):
    """Three chained phased steps == three generic steps."""
    info, raw, params = stack
    B = 2
    state_p = _advanced_state(info, params, B)
    state_r = jax.tree.map(lambda x: x, state_p)
    rng = np.random.default_rng(3)
    fwd = jax.jit(v7.forward)
    pparams = dict(params)
    pparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    for _ in range(3):
        t = jnp.asarray(rng.integers(0, info.num_vocab, (B, 1)), jnp.int32)
        l = jnp.ones((B,), jnp.int32)
        h_r, state_r = fwd(params, state_r, t, l)
        h_p, state_p = pd.forward_t1(pparams, state_p, t, l, na=1,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r),
                                   rtol=5e-4, atol=5e-4)


def test_phased_wkvg_bform_matches_tchain(stack):
    """The window-native (B, Hc, N, N) WKV group body (wkvg='bform')
    computes identical outputs/state to the default stacked-transpose
    form — it exists purely as a layout A/B for the hardware race
    (tools/probe_wkvg.py)."""
    info, raw, params = stack
    state = _advanced_state(info, params, 4)
    rng = np.random.default_rng(7)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (4, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 0, 1], jnp.int32)
    pparams = dict(params)
    pparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    h_t, s_t = pd.forward_t1(pparams, state, t1, l1, na=1,
                             interpret=True, wkvg="tchain")
    h_b, s_b = pd.forward_t1(pparams, state, t1, l1, na=1,
                             interpret=True, wkvg="bform")
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_t),
                               rtol=1e-5, atol=1e-6)
    for k in s_t:
        np.testing.assert_allclose(np.asarray(s_b[k]), np.asarray(s_t[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_phased_wkvg_bbatch_matches_tchain(stack):
    """The batch-sliced contiguous state-window body (wkvg='bbatch')
    computes identical outputs/state to the default form.  It is a
    raceable fallback kept after a measured negative result (r5: DMA
    wall unchanged, docs/decode-paths.md §breakdown); this test keeps
    the fallback correct with B split into multiple batch groups."""
    import os
    info, raw, params = stack
    # Per-row state here is H*N*N*4 = 128 KB; cap the window at 256 KB
    # so B=4 splits into two batch groups (Bc=2, ng=2).
    os.environ["AI00_PHASED_BBATCH_WIN"] = str(256 << 10)
    state = _advanced_state(info, params, 4)
    rng = np.random.default_rng(11)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (4, 1)), jnp.int32)
    l1 = jnp.asarray([1, 0, 1, 1], jnp.int32)
    pparams = dict(params)
    pparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    try:
        h_t, s_t = pd.forward_t1(pparams, state, t1, l1, na=1,
                                 interpret=True, wkvg="tchain")
        h_b, s_b = pd.forward_t1(pparams, state, t1, l1, na=1,
                                 interpret=True, wkvg="bbatch")
    finally:
        del os.environ["AI00_PHASED_BBATCH_WIN"]
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_t),
                               rtol=1e-5, atol=1e-6)
    for k in s_t:
        np.testing.assert_allclose(np.asarray(s_b[k]), np.asarray(s_t[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_phased_reachable_with_fused_kernel_off(stack, monkeypatch):
    """AI00_FUSED_DECODE=off must disable only the whole-network kernel:
    a model with the FUSED_KEY layout installed still reaches the phased
    whole-layer kernel through v7.forward (the engine installs the
    layout under the same independent gating)."""
    info, raw, params = stack
    monkeypatch.setenv("AI00_FUSED_DECODE", "off")
    monkeypatch.setenv("AI00_PHASED_DECODE", "interpret")

    pparams = dict(params)
    pparams[fd.FUSED_KEY] = fd.make_fused_layout(params)
    state = _advanced_state(info, params, 4)
    rng = np.random.default_rng(3)
    t1 = jnp.asarray(rng.integers(0, info.num_vocab, (4, 1)), jnp.int32)
    l1 = jnp.asarray([1, 1, 1, 0], jnp.int32)

    h_ref, s_ref = jax.jit(v7.forward)(params, state, t1, l1)

    called = {}
    orig = pd.forward_t1

    def spy(*a, **kw):
        called["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pd, "forward_t1", spy)
    h_p, s_p = v7.forward(pparams, state, t1, l1)
    assert called.get("hit"), "phased kernel not reached with fused off"
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)


def test_can_phase_gates():
    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=5, dtype=np.float32, num_layer=2,
        num_emb=512, head_size=64, num_vocab=64)
    assert pd.can_phase(params, batch=4, na=1)
    # Tile not divisible by 128 -> rejected.
    assert not pd.can_phase(params, batch=4, na=2)
    # nf4 big projections -> rejected (4-bit converts to int8 surrogate
    # codes at load instead).
    pq = make_params(info, make_raw_weights(info, seed=5, dtype=np.float32),
                     dtype=np.float32,
                     quant={i: "nf4" for i in range(info.num_layer)})
    assert not pd.can_phase(pq, batch=4, na=1)


def test_phased_bf16_tracks_f32_reference():
    """bf16: the phased kernel keeps several chains in f32 that the
    generic path rounds through bf16; correctness criterion mirrors the
    fused kernel's — the phased bf16 step must track the f32 reference
    at least as closely as the generic bf16 step does."""
    info = tiny_info(ModelVersion.V7, num_layer=3, num_emb=512,
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
    pp = dict(p16)
    pp[fd.FUSED_KEY] = fd.make_fused_layout(p16)
    hp, _ = pd.forward_t1(pp, state, t1, l1, na=1, interpret=True)

    ref = np.asarray(h32, np.float32)
    err_generic = np.abs(np.asarray(h16, np.float32) - ref).max()
    err_phased = np.abs(np.asarray(hp, np.float32) - ref).max()
    assert err_phased <= max(err_generic * 1.5, 0.05), \
        (err_phased, err_generic)
