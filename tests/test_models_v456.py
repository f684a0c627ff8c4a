"""Numeric-consistency tests for RWKV v4/v5/v6 vs independent f64 references.

Same structure as test_models_v7.py: x64 comparisons against the literal
per-token numpy loop, chunked-vs-full equivalence, suffix masking, and an
f32 smoke test per version.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, get_version_module
from ai00_server_tpu.testing import make_tiny_model

from reference_impl import v4_forward_ref, v5_forward_ref, v6_forward_ref

REFS = {
    ModelVersion.V4: v4_forward_ref,
    ModelVersion.V5: v5_forward_ref,
    ModelVersion.V6: v6_forward_ref,
}

VERSIONS = [ModelVersion.V4, ModelVersion.V5, ModelVersion.V6]


@pytest.fixture(scope="module", params=VERSIONS, ids=lambda v: v.value)
def model(request):
    with jax.enable_x64(True):
        ver = request.param
        yield (ver,) + make_tiny_model(ver, seed=3, dtype=np.float64)


def run(ver, params, info, tokens_2d, lengths, state=None):
    m = get_version_module(ver)
    if state is None:
        state = m.init_state(
            info, np.asarray(tokens_2d).shape[0], dtype=params["emb"].dtype
        )
    fwd = jax.jit(m.forward)
    return fwd(params, state, jnp.asarray(tokens_2d), jnp.asarray(lengths))


def test_matches_float64_reference(model):
    ver, info, raw, params = model
    tokens = np.array([3, 1, 4, 1, 5, 9, 2, 6, 53, 5], dtype=np.int32)
    ref_hidden, ref_state = REFS[ver](raw, info, tokens)
    with jax.enable_x64(True):
        hidden, state = run(ver, params, info, tokens[None], [len(tokens)])
        hidden = np.asarray(hidden[0], dtype=np.float64)

    np.testing.assert_allclose(hidden, ref_hidden, atol=2e-5, rtol=1e-4)
    for k in ref_state:
        np.testing.assert_allclose(
            np.asarray(state[k][:, 0]),
            ref_state[k][:, 0],
            atol=2e-4,
            rtol=1e-3,
            err_msg=f"state[{k}]",
        )


def test_chunked_equals_full(model):
    ver, info, raw, params = model
    m = get_version_module(ver)
    tokens = np.arange(16, dtype=np.int32) % info.num_vocab

    with jax.enable_x64(True):
        h_full, s_full = run(ver, params, info, tokens[None], [16])

        state = m.init_state(info, 1, dtype=params["emb"].dtype)
        _, state = run(ver, params, info, tokens[None, :8], [8], state)
        h2, s_split = run(ver, params, info, tokens[None, 8:], [8], state)

        state = m.init_state(info, 1, dtype=params["emb"].dtype)
        for t in tokens:
            h_step, state = run(ver, params, info, [[t]], [1], state)

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
    ver, info, raw, params = model
    T = 9
    toks = (np.arange(2 * T, dtype=np.int32) % info.num_vocab).reshape(2, T)
    lengths = np.array([5, 9], dtype=np.int32)

    with jax.enable_x64(True):
        h, s = run(ver, params, info, toks, lengths)
        h0, s0 = run(ver, params, info, toks[:1, :5], [5])

    np.testing.assert_allclose(np.asarray(h[0, 4]), np.asarray(h0[0, 4]), atol=1e-8)
    for k in s:
        np.testing.assert_allclose(
            np.asarray(s[k][:, 0]), np.asarray(s0[k][:, 0]), atol=1e-8
        )


def test_f32_smoke(model):
    ver = model[0]
    info, raw, params = make_tiny_model(ver, seed=4, dtype=np.float32)
    tokens = np.arange(12, dtype=np.int32)[None] % info.num_vocab
    h, s = run(ver, params, info, tokens, [12])
    assert h.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(h)))
