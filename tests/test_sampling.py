"""On-device samplers vs a literal numpy port of the reference CPU samplers
(crates/ai00-core/src/sampler/{nucleus,typical,mirostat}.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ai00_server_tpu.ops import sampling as S


# ---------------------------------------------------------------------------
# Literal numpy ports of the Rust samplers (sorted-scan style).
# ---------------------------------------------------------------------------

def ref_nucleus_sample(probs, rand, top_p, top_k, temperature):
    order = np.argsort(-probs, kind="stable")
    kept = []
    cum = 0.0
    for idx in order[:top_k]:
        if cum > top_p:
            break
        cum += probs[idx]
        kept.append((idx, probs[idx]))
    w = np.array([p ** (1.0 / temperature) for _, p in kept])
    w = w / w.sum()
    cdf = np.cumsum(w)
    for j, c in enumerate(cdf):
        if rand <= c:
            return kept[j][0]
    return kept[0][0]


def ref_typical_sample(probs, rand, tau, top_k, temperature):
    nz = [(i, p, -np.log(p)) for i, p in enumerate(probs) if p > 0]
    entropy = sum(p * y for _, p, y in nz)
    scored = sorted(nz, key=lambda t: abs(t[2] - entropy))
    kept = []
    cum = 0.0
    for idx, p, _ in scored[:top_k]:
        if cum > tau:
            break
        cum += p
        kept.append((idx, p))
    w = np.array([p ** (1.0 / temperature) for _, p in kept])
    w = w / w.sum()
    cdf = np.cumsum(w)
    for j, c in enumerate(cdf):
        if rand <= c:
            return kept[j][0]
    return kept[0][0]


def ref_mirostat_sample(probs, rand, max_surprise):
    order = np.argsort(-probs, kind="stable")
    cums = np.cumsum(probs[order])
    k = len(order)
    for pos, idx in enumerate(order):
        if -np.log2(probs[idx]) > max_surprise:
            k = pos + 1
            break
    order, cums = order[:k], cums[:k]
    total = cums[-1]
    r = rand * total
    sel = 0
    for j, c in enumerate(cums):
        if r <= c:
            sel = j
            break
    token = order[sel]
    token_surprise = np.log2(total) - np.log2(probs[token])
    return token, token_surprise


def ref_penalty_init(tokens, vocab, presence, frequency, decay):
    pen = {}
    for index, token in enumerate(reversed(tokens)):
        pen[token] = pen.pop(token, presence) + frequency * decay ** index
    out = np.zeros(vocab, np.float32)
    for t, p in pen.items():
        out[t] = p
    return out


# ---------------------------------------------------------------------------


def make_probs(rng, vocab=256, concentrated=True):
    logits = rng.standard_normal(vocab) * (3.0 if concentrated else 1.0)
    p = np.exp(logits - logits.max())
    return (p / p.sum()).astype(np.float64)


@pytest.mark.parametrize("seed", range(5))
def test_nucleus_matches_reference(seed):
    rng = np.random.default_rng(seed)
    probs = make_probs(rng)
    vocab = len(probs)
    for rand in (0.01, 0.3, 0.77, 0.999):
        want = ref_nucleus_sample(probs, rand, top_p=0.5, top_k=128,
                                  temperature=1.0)
        params = {k: jnp.asarray(v) for k, v in S.make_params(1).items()}
        params["kind"] = jnp.array([S.KIND_NUCLEUS])
        state = S.init_sampler_state(1, vocab)
        # Feed logits that softmax back to `probs`.
        logits = jnp.log(jnp.asarray(probs, jnp.float32))[None]
        tok, _, _ = S.sample_with_rand(
            jnp.array([rand], jnp.float32), logits, params, state)
        assert int(tok[0]) == want, f"rand={rand}"


@pytest.mark.parametrize("seed", range(5))
def test_typical_matches_reference(seed):
    rng = np.random.default_rng(100 + seed)
    probs = make_probs(rng)
    vocab = len(probs)
    for rand in (0.05, 0.5, 0.95):
        want = ref_typical_sample(probs, rand, tau=0.5, top_k=128,
                                  temperature=1.0)
        params = {k: jnp.asarray(v) for k, v in S.make_params(1).items()}
        params["kind"] = jnp.array([S.KIND_TYPICAL])
        state = S.init_sampler_state(1, vocab)
        logits = jnp.log(jnp.asarray(probs, jnp.float32))[None]
        tok, _, _ = S.sample_with_rand(
            jnp.array([rand], jnp.float32), logits, params, state)
        assert int(tok[0]) == want, f"rand={rand}"


def ref_mirostat_kept_set(probs, max_surprise):
    """The support of the reference sampler: descending-prob prefix up to and
    including the first token with surprise > max_surprise."""
    order = np.argsort(-probs, kind="stable")
    kept = []
    for idx in order:
        kept.append(idx)
        if -np.log2(probs[idx]) > max_surprise:
            break
    return set(kept)


@pytest.mark.parametrize("seed", range(5))
def test_mirostat_matches_reference(seed):
    """Our mirostat draws the inverse-CDF in vocab order rather than the
    reference's descending-prob order — identical distribution (each kept
    token is selected with prob p/total), so we check distribution-level
    invariants: the kept set, and the max_surprise update formula."""
    rng = np.random.default_rng(200 + seed)
    probs = make_probs(rng)
    vocab = len(probs)
    ms = 6.0
    kept = ref_mirostat_kept_set(probs, ms)
    total = sum(probs[i] for i in kept)
    for rand in (0.1, 0.6, 0.99):
        params = {k: jnp.asarray(v) for k, v in S.make_params(1).items()}
        params["kind"] = jnp.array([S.KIND_MIROSTAT])
        state = S.init_sampler_state(1, vocab)
        state["max_surprise"] = jnp.array([ms], jnp.float32)
        logits = jnp.log(jnp.asarray(probs, jnp.float32))[None]
        tok, _, new_state = S.sample_with_rand(
            jnp.array([rand], jnp.float32), logits, params, state)
        token = int(tok[0])
        assert token in kept, f"rand={rand}: sampled outside the kept set"
        # max_surprise update (mirostat.rs:84-88) for the token we sampled.
        surprise = np.log2(total) - np.log2(probs[token])
        exp_ms = min(ms - 0.1 * (surprise - 3.0), 12.0)
        np.testing.assert_allclose(
            float(new_state["max_surprise"][0]), exp_ms, rtol=1e-3)
        ms = 6.0  # state reset each iteration above


def test_mirostat_distribution():
    """Empirical selection frequency matches p/total over the kept set."""
    rng = np.random.default_rng(42)
    probs = make_probs(rng, vocab=64)
    vocab = len(probs)
    ms = 4.0
    kept = ref_mirostat_kept_set(probs, ms)
    total = sum(probs[i] for i in kept)

    params = {k: jnp.asarray(v) for k, v in S.make_params(1).items()}
    params["kind"] = jnp.array([S.KIND_MIROSTAT])
    logits = jnp.log(jnp.asarray(probs, jnp.float32))[None]
    n = 400
    rands = np.linspace(0.000501, 0.9995, n)  # deterministic uniform grid
    counts = np.zeros(vocab)
    f = jax.jit(S.sample_with_rand)
    for r in rands:
        state = S.init_sampler_state(1, vocab)
        state["max_surprise"] = jnp.array([ms], jnp.float32)
        tok, _, _ = f(jnp.array([r], jnp.float32), logits, params, state)
        counts[int(tok[0])] += 1
    for i in kept:
        np.testing.assert_allclose(
            counts[i] / n, probs[i] / total, atol=2.0 / n + 0.01)
    assert counts[[i for i in range(vocab) if i not in kept]].sum() == 0


def test_penalty_init_matches_reference():
    vocab = 64
    tokens = [3, 5, 3, 9, 5, 5, 1]
    want = ref_penalty_init(tokens, vocab, 0.3, 0.3, 0.99654026)
    pen, seen = S.init_penalties_host(tokens, vocab, 0.3, 0.3, 0.99654026)
    np.testing.assert_allclose(pen, want, rtol=1e-6)
    assert set(np.nonzero(seen)[0]) == set(tokens)


def test_penalty_update_and_transform():
    vocab = 32
    B = 2
    params = {k: jnp.asarray(v) for k, v in S.make_params(B).items()}
    params["kind"] = jnp.array([S.KIND_GREEDY, S.KIND_GREEDY])
    state = S.init_sampler_state(B, vocab)

    logits = jnp.zeros((B, vocab), jnp.float32)
    logits = logits.at[0, 7].set(5.0).at[1, 9].set(5.0)
    tok, _, state = S.sample_with_rand(
        jnp.zeros(B, jnp.float32), logits, params, state)
    assert tok.tolist() == [7, 9]
    # First sample: presence penalty installed.
    assert float(state["penalties"][0, 7]) == pytest.approx(0.3)
    assert bool(state["seen"][0, 7])

    tok, _, state = S.sample_with_rand(
        jnp.zeros(B, jnp.float32), logits, params, state)
    assert tok.tolist() == [7, 9]  # penalty (0.3) < margin (5.0)
    # Second sample of same token: decayed then +frequency.
    np.testing.assert_allclose(
        float(state["penalties"][0, 7]), 0.3 * 0.99654026 + 0.3, rtol=1e-5)

    # Penalty large enough flips the argmax.
    state["penalties"] = state["penalties"].at[0, 7].set(10.0)
    tok, _, state = S.sample_with_rand(
        jnp.zeros(B, jnp.float32), logits, params, state)
    assert int(tok[0]) != 7


def test_bias_and_mask():
    vocab = 16
    params = {k: jnp.asarray(v) for k, v in S.make_params(1).items()}
    state = S.init_sampler_state(1, vocab)
    logits = jnp.zeros((1, vocab), jnp.float32).at[0, 3].set(4.0)

    mask = jnp.ones((1, vocab), bool).at[0, 3].set(False)
    tok, sp, _ = S.sample_with_rand(
        jnp.zeros(1, jnp.float32), logits, params, state, allowed_mask=mask)
    assert int(tok[0]) != 3
    assert 0.0 < float(sp[0]) <= 1.0

    bias = jnp.zeros((1, vocab), jnp.float32).at[0, 11].set(100.0)
    tok, _, _ = S.sample_with_rand(
        jnp.zeros(1, jnp.float32), logits, params, state, bias=bias)
    assert int(tok[0]) == 11


def test_jit_and_batch_heterogeneous():
    vocab = 128
    B = 4
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, vocab)), jnp.float32)
    params = {k: jnp.asarray(v) for k, v in S.make_params(B).items()}
    params["kind"] = jnp.array(
        [S.KIND_NUCLEUS, S.KIND_TYPICAL, S.KIND_MIROSTAT, S.KIND_GREEDY])
    state = S.init_sampler_state(B, vocab)
    f = jax.jit(S.sample_step)
    tok, probs, state2 = f(jax.random.PRNGKey(0), logits, params, state)
    assert tok.shape == (B,)
    assert int(tok[3]) == int(jnp.argmax(logits[3]))
    assert all(0 <= int(t) < vocab for t in tok)


def test_full_vocab_top_k_bucket():
    """top_k = 0 (unbounded) or > TOP_K_CAP selects a full-vocab sampler
    bucket: tokens ranked beyond the 1024-wide fast path stay reachable
    (reference arbitrary-k fidelity, nucleus.rs:69-134)."""
    import jax.numpy as jnp
    from ai00_server_tpu.ops import sampling as S

    V = 4096
    # Strictly descending logits: sorted order == index order.
    logits = jnp.asarray(-np.arange(V, dtype=np.float32)[None] * 1e-4)
    params = S.make_params(1)
    params["top_k"][0] = 0          # unbounded
    params["top_p"][0] = 1.0
    state = S.init_sampler_state(1, V)
    sparams = {k: jnp.asarray(v) for k, v in params.items()}
    rand = jnp.asarray([0.9999], jnp.float32)

    assert S.k_cap_key(params["top_k"], V) == V
    toks_full, _, _ = S.sample_with_rand(
        rand, logits, sparams, state, kinds=(S.KIND_NUCLEUS,), k_cap=V)
    assert int(toks_full[0]) > S.TOP_K_CAP  # deep-tail token reachable

    toks_cap, _, _ = S.sample_with_rand(
        rand, logits, sparams, state, kinds=(S.KIND_NUCLEUS,),
        k_cap=S.TOP_K_CAP)
    assert int(toks_cap[0]) < S.TOP_K_CAP   # the old clamp cannot reach it

    # Fast-path requests (k <= cap) keep their power-of-two buckets.
    params["top_k"][0] = 100
    assert S.k_cap_key(params["top_k"], V) == 128
