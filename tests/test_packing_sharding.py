"""State packing round-trips + sharded serve-step on a virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.models import ModelVersion, get_version_module, packing
from ai00_server_tpu.testing import make_tiny_model, tiny_info


@pytest.mark.parametrize(
    "version", [ModelVersion.V4, ModelVersion.V5, ModelVersion.V7],
    ids=lambda v: v.value)
def test_pack_unpack_roundtrip(version):
    info = tiny_info(version, num_layer=2, num_emb=32, head_size=16,
                     num_vocab=64)
    m = get_version_module(version)
    rng = np.random.default_rng(0)
    state = jax.tree.map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32)),
        m.init_state(info, 1, jnp.float32))
    flat = packing.pack_state(info, state)
    assert flat.shape == packing.state_shape(info)[:3]
    back = packing.unpack_state(info, flat)
    for k in state:
        np.testing.assert_allclose(
            np.asarray(back[k]), np.asarray(state[k]), atol=1e-6,
            err_msg=k)


def test_pack_affects_forward_identically():
    """unpacked state drives the model identically to the original."""
    info, raw, params = make_tiny_model(ModelVersion.V7, seed=30,
                                        dtype=np.float32)
    m = get_version_module(info.version)
    toks = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    lens = jnp.array([6], jnp.int32)
    s0 = m.init_state(info, 1, jnp.float32)
    _, s1 = jax.jit(m.forward)(params, s0, toks, lens)
    s1_rt = packing.unpack_state(info, packing.pack_state(info, s1))
    s1_rt = jax.tree.map(jnp.asarray, s1_rt)
    h_a, _ = jax.jit(m.forward)(params, s1, toks, lens)
    h_b, _ = jax.jit(m.forward)(params, s1_rt, toks, lens)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=1e-6)


def test_sharded_step_matches_single_device():
    """The (dp,tp)-sharded forward+sample equals the unsharded one."""
    from ai00_server_tpu.models import v7
    from ai00_server_tpu.ops import sampling
    from ai00_server_tpu.parallel import sharding as sh

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = sh.make_mesh(dp=4, tp=2)

    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=31, dtype=np.float32,
        num_emb=256, head_size=64, num_vocab=512)
    B, T = 8, 8
    state = v7.init_state(info, B, jnp.float32)
    tokens = jnp.asarray(
        np.arange(B * T, dtype=np.int32).reshape(B, T) % info.num_vocab)
    lengths = jnp.full((B,), T, jnp.int32)
    sparams = {k: jnp.asarray(v) for k, v in sampling.make_params(B).items()}
    ss = sampling.init_sampler_state(B, info.num_vocab)
    rand = jnp.linspace(0.1, 0.9, B)

    def step(params, state, ss, tokens, lengths, rand):
        hidden, new_state = v7.forward(params, state, tokens, lengths)
        logits = jnp.dot(hidden[:, -1], params["head"],
                         preferred_element_type=jnp.float32)
        toks, _, new_ss = sampling.sample_with_rand(rand, logits, sparams, ss)
        return toks, logits, new_state

    toks_ref, logits_ref, state_ref = jax.jit(step)(
        params, state, ss, tokens, lengths, rand)

    params_s = sh.shard_params(params, mesh)
    state_s = sh.shard_state(state, mesh)
    ss_s = sh.shard_sampler_state(ss, mesh)
    with mesh:
        toks_s, logits_s, state_s2 = jax.jit(step)(
            params_s, state_s, ss_s, tokens, lengths, rand)

    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_ref))
    # Resharded matmuls reassociate float adds; only near-equality holds.
    np.testing.assert_allclose(np.asarray(state_s2["wkv"]),
                               np.asarray(state_ref["wkv"]),
                               atol=1e-2, rtol=1e-2)
