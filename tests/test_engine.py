"""Engine-level unit tests: row state management, decode-chunk equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.engine import Engine
from ai00_server_tpu.loader import LoadedModel
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.ops import sampling
from ai00_server_tpu.testing import make_tiny_model


@pytest.fixture(scope="module")
def engine():
    info, raw, params = make_tiny_model(ModelVersion.V7, seed=70,
                                        dtype=np.float32, num_vocab=64)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    return Engine(model, max_batch=4, token_chunk_size=8,
                  state_dtype=jnp.float32), info


def test_row_state_roundtrip(engine):
    eng, info = engine
    rng = np.random.default_rng(0)
    row = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(
            x.shape).astype(np.float32)),
        eng.fresh_row_state())
    eng.load_row_state(2, row)
    back = eng.read_row_state(2)
    for k in back:
        np.testing.assert_allclose(np.asarray(back[k]),
                                   np.asarray(row[k]), atol=1e-6)
    # Other rows untouched (zeros).
    other = eng.read_row_state(0)
    assert float(np.abs(np.asarray(other["wkv"])).max()) == 0.0


def test_decode_chunk_equals_stepwise(engine):
    eng, info = engine
    B = eng.max_batch
    for b in range(B):
        eng.load_row_state(b, None)
        eng.set_row_sampler(b, {"kind": sampling.KIND_GREEDY,
                                "presence": 0.0, "frequency": 0.0})
        eng.set_row_bias(b, None)
        eng.set_row_mask(b, None)

    # Prefill a short prompt on every row.
    tokens = np.tile(np.arange(1, 6, dtype=np.int32), (B, 1))
    lengths = np.full(B, 5, np.int32)
    mask = np.ones(B, np.bool_)
    res = eng.step(tokens, lengths, mask)
    first = res.tokens.copy()

    # Path A: 6 single steps.
    state_snapshot = [eng.read_row_state(b) for b in range(B)]
    cur = first.reshape(B, 1)
    ones = np.ones(B, np.int32)
    seq_a = []
    for _ in range(6):
        r = eng.step(cur.astype(np.int32), ones, mask)
        seq_a.append(r.tokens.copy())
        cur = r.tokens.reshape(B, 1)

    # Path B: one decode_chunk of 6 from the same snapshot.
    for b in range(B):
        eng.load_row_state(b, state_snapshot[b])
        eng.set_row_sampler(b, {"kind": sampling.KIND_GREEDY,
                                "presence": 0.0, "frequency": 0.0})
    toks_seq, _ = eng.decode_chunk(first.astype(np.int32), mask, 6)

    want = np.stack(seq_a)  # (6, B)
    np.testing.assert_array_equal(toks_seq, want)


def test_decode_chunk_inactive_rows_frozen(engine):
    eng, info = engine
    B = eng.max_batch
    for b in range(B):
        eng.load_row_state(b, None)
        eng.set_row_sampler(b, {"kind": sampling.KIND_GREEDY})
    before = eng.read_row_state(3)
    active = np.array([True, True, True, False])
    first = np.array([1, 2, 3, 9], np.int32)
    eng.decode_chunk(first, active, 4)
    after = eng.read_row_state(3)
    for k in before:
        np.testing.assert_allclose(np.asarray(after[k]),
                                   np.asarray(before[k]), atol=0)


def test_position_logps_does_not_advance(engine):
    eng, info = engine
    eng.load_row_state(0, None)
    tokens = np.arange(1, 7, dtype=np.int32)[None]
    eng.step(np.tile(tokens, (eng.max_batch, 1)).astype(np.int32),
             np.full(eng.max_batch, 6, np.int32),
             np.ones(eng.max_batch, np.bool_))
    before = eng.read_row_state(0)
    lp = eng.position_logps([1, 2, 3, 4], b=0)
    assert lp.shape == (3,)
    assert np.all(lp <= 0)
    after = eng.read_row_state(0)
    for k in before:
        np.testing.assert_allclose(np.asarray(after[k]),
                                   np.asarray(before[k]), atol=0)


def test_restore_last_chunk_ring(engine):
    """restore_last_chunk discards exactly one chunk (state + sampler);
    the remaining ring entry still serves rollback_row."""
    eng, info = engine
    B = eng.max_batch
    for b in range(B):
        eng.set_row_sampler(b, {"kind": sampling.KIND_GREEDY})
    first = np.zeros(B, np.int32)
    mask = np.ones(B, np.bool_)

    toks1, _ = eng.decode_chunk(first, mask, 4)         # chunk i
    pool_after_1 = jax.tree.map(np.asarray, eng.state_pool)
    toks2, _ = eng.decode_chunk(toks1[-1], mask, 4)     # chunk i+1

    eng.restore_last_chunk()                            # discard i+1
    pool_restored = jax.tree.map(np.asarray, eng.state_pool)
    for a, b_ in zip(jax.tree.leaves(pool_after_1),
                     jax.tree.leaves(pool_restored)):
        np.testing.assert_array_equal(a, b_)

    # The older ring entry (pre-chunk-i) still backs rollback_row.
    eng.rollback_row(0, [int(first[0])])


def test_quant_head_logits_close(monkeypatch):
    """AI00_QUANT_HEAD=on stores the LM head int8 (per-128-row-block
    scales, f32 accumulators): logits must stay within int8 block-scale
    error of the plain head and greedy decode must agree on a
    well-separated distribution."""
    monkeypatch.setenv("AI00_QUANT_HEAD", "on")
    info, raw, params = make_tiny_model(ModelVersion.V7, seed=71,
                                        dtype=np.float32, num_vocab=64,
                                        num_emb=128)
    head_ref = np.asarray(params["head"], np.float32)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    eng = Engine(model, max_batch=2, token_chunk_size=8,
                 state_dtype=jnp.float32)
    assert "_head_q" in model.params and "head" not in model.params
    # The lossless bf16 head moves to host_params so prefab export and
    # mesh param_specs still see a "head".
    np.testing.assert_allclose(
        np.asarray(model.host_params["head"], np.float32), head_ref)

    from ai00_server_tpu.engine import head_logits
    x = jax.random.normal(jax.random.PRNGKey(3), (2, info.num_emb),
                          jnp.float32)
    lq = np.asarray(head_logits(model.params, x))
    lf = np.asarray(x @ head_ref)
    scale = np.abs(lf).max()
    assert np.abs(lq - lf).max() / scale < 0.02
    # And the engine runs end to end with the quantized head.
    for b in range(2):
        eng.set_row_sampler(b, {"kind": sampling.KIND_GREEDY})
    toks, _ = eng.decode_chunk(np.zeros(2, np.int32),
                               np.ones(2, np.bool_), 4)
    assert np.asarray(toks).shape == (4, 2)


def test_mean_hidden_embed_matches_forward(engine):
    """Engine.mean_hidden_embed == masked mean of v7.forward hiddens,
    computed across chunk boundaries."""
    from ai00_server_tpu.models import v7

    eng, info = engine
    rng = np.random.default_rng(4)
    toks = rng.integers(1, info.num_vocab, size=19).tolist()
    vec = eng.mean_hidden_embed(toks, chunk=8)
    assert vec.shape == (info.num_emb,)
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-5

    state = v7.init_state(info, 1, jnp.float32)
    h, _ = jax.jit(v7.forward)(
        eng.model.params, state,
        jnp.asarray(np.asarray(toks, np.int32)[None]),
        jnp.asarray([len(toks)], jnp.int32))
    ref = np.asarray(h, np.float32)[0].mean(0)
    ref = ref / max(float(np.linalg.norm(ref)), 1e-12)
    np.testing.assert_allclose(vec, ref, rtol=2e-4, atol=2e-4)
