import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, v7
from ai00_server_tpu.testing import make_params, make_tiny_model

from reference_impl import v7_forward_ref

# All numeric-consistency tests run in x64 so that rounding differences from
# different matmul tilings (chunked vs full) cannot mask real bugs.  A
# separate f32 smoke test covers the production dtype path.

_fwd = jax.jit(v7.forward)


@pytest.fixture(scope="module")
def model():
    with jax.enable_x64(True):
        yield make_tiny_model(ModelVersion.V7, seed=1, dtype=np.float64)


def run(params, info, tokens_2d, lengths, state=None):
    if state is None:
        state = v7.init_state(
            info, np.asarray(tokens_2d).shape[0], dtype=params["emb"].dtype
        )
    return _fwd(params, state, jnp.asarray(tokens_2d), jnp.asarray(lengths))


def test_matches_float64_reference(model):
    info, raw, params = model
    tokens = np.array([3, 1, 4, 1, 5, 9, 2, 6, 53, 5], dtype=np.int32)
    ref_hidden, ref_state = v7_forward_ref(raw, info, tokens)
    with jax.enable_x64(True):
        hidden, state = run(params, info, tokens[None], [len(tokens)])
        hidden = np.asarray(hidden[0], dtype=np.float64)

    # Residual error comes from the deliberate f32 casts inside the
    # layer/group norms; everything else is exact in x64.
    np.testing.assert_allclose(hidden, ref_hidden, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state["wkv"][:, 0]), ref_state["wkv"][:, 0], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(state["att_x"][:, 0]), ref_state["att_x"][:, 0], atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state["ffn_x"][:, 0]), ref_state["ffn_x"][:, 0], atol=2e-5, rtol=1e-4
    )


def test_chunked_equals_full(model):
    info, raw, params = model
    tokens = np.arange(16, dtype=np.int32) % info.num_vocab

    with jax.enable_x64(True):
        h_full, s_full = run(params, info, tokens[None], [16])

        # Two chunks of 8, carrying state.
        state = v7.init_state(info, 1, dtype=params["emb"].dtype)
        h1, state = run(params, info, tokens[None, :8], [8], state)
        h2, s_split = run(params, info, tokens[None, 8:], [8], state)

        # Sixteen single-token steps.
        state = v7.init_state(info, 1, dtype=params["emb"].dtype)
        for t in tokens:
            h_step, state = run(params, info, [[t]], [1], state)

    np.testing.assert_allclose(
        np.asarray(h_full[0, 8:]), np.asarray(h2[0]), atol=1e-8
    )
    for k in s_full:
        np.testing.assert_allclose(
            np.asarray(s_full[k]), np.asarray(s_split[k]), atol=1e-8
        )
    np.testing.assert_allclose(
        np.asarray(h_full[0, -1]), np.asarray(h_step[0, 0]), atol=1e-8
    )


def test_suffix_mask_freezes_state(model):
    info, raw, params = model
    T = 9
    toks = (np.arange(2 * T, dtype=np.int32) % info.num_vocab).reshape(2, T)
    lengths = np.array([5, 9], dtype=np.int32)

    with jax.enable_x64(True):
        h, s = run(params, info, toks, lengths)
        h0, s0 = run(params, info, toks[:1, :5], [5])

    np.testing.assert_allclose(np.asarray(h[0, 4]), np.asarray(h0[0, 4]), atol=1e-8)
    for k in s:
        np.testing.assert_allclose(
            np.asarray(s[k][:, 0]), np.asarray(s0[k][:, 0]), atol=1e-8
        )


def test_zero_length_row_is_identity(model):
    info, raw, params = model
    toks = np.zeros((1, 4), dtype=np.int32)
    with jax.enable_x64(True):
        state = v7.init_state(info, 1, dtype=params["emb"].dtype)
        state = jax.tree.map(lambda x: x + 0.25, state)
        _, new_state = run(params, info, toks, [0], state)
    for k in state:
        np.testing.assert_allclose(np.asarray(new_state[k]), np.asarray(state[k]))


def test_layer_groups_equivalent(model):
    info, raw, params = model
    with jax.enable_x64(True):
        params_grouped = make_params(info, raw, dtype=np.float64, group_sizes=[1, 2])
        tokens = np.arange(6, dtype=np.int32)[None]
        h1, s1 = run(params, info, tokens, [6])
        h2, s2 = run(params_grouped, info, tokens, [6])
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-9)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]), atol=1e-9)


def test_f32_smoke():
    info, raw, params = make_tiny_model(ModelVersion.V7, seed=2, dtype=np.float32)
    tokens = np.arange(12, dtype=np.int32)[None] % info.num_vocab
    h, s = run(params, info, tokens, [12])
    assert h.dtype == jnp.float32
    assert s["wkv"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(h)))
    assert bool(jnp.all(jnp.isfinite(s["wkv"])))
