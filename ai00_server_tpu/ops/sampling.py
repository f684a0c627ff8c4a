"""On-device batched samplers: nucleus / typical / mirostat / greedy.

Re-provides the semantics of the reference's CPU samplers
(crates/ai00-core/src/sampler/{nucleus,typical,mirostat}.rs) as fully
vectorized JAX ops that run *inside* the compiled decode step — the
reference's per-token GPU->CPU download of 65536 logits plus a CPU radix
sort (crates/ai00-core/src/run.rs:664-697) is replaced by `lax.top_k` on
the TPU and a (B,) int32 device->host transfer of the sampled tokens.

Exact semantics preserved:

* nucleus (nucleus.rs:69-134): probs sorted desc, top-k cut, keep while the
  cumulative sum *before* an element is <= top_p, temperature as
  ``p ** (1/T)`` renormalized, CDF-inverse draw with find-or-first.
* typical (typical.rs:70-134): rank by |ln(1/p) - entropy| ascending, then
  the same top-k / tau-cumulative / temperature machinery.
* mirostat (mirostat.rs:44-91): keep tokens with surprise <= max_surprise
  plus the first crossing element, draw proportional to p, then adapt
  ``max_surprise -= rate * (surprise - tau)`` clamped to ``4*tau``.
* penalties (nucleus.rs:48-67,104-117): presence/frequency with per-step
  ``penalty_decay``, stored densely as a ``(B, V)`` penalty vector plus a
  "seen" bitmask (the reference's HashMap presence test).

All per-request scalar params are batched arrays so one compiled step
serves heterogeneous requests (continuous batching).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

KIND_NUCLEUS = 0
KIND_TYPICAL = 1
KIND_MIROSTAT = 2
KIND_GREEDY = 3

# Static top-k width for the on-device sort FAST PATH.  Per-row `top_k`
# params mask positions beyond their own k (the reference default is
# 128).  Requests asking for top_k > TOP_K_CAP or top_k = 0 (unbounded)
# compile a FULL-VOCAB bucket instead (k_cap = V: a complete on-device
# sort per step, matching the reference's arbitrary-k CPU radix sort,
# nucleus.rs:69-134, at extra step cost for those requests only).
TOP_K_CAP = 1024

# Reference defaults (nucleus.rs:13-27, typical.rs:14-27, mirostat.rs:10-18).
DEFAULTS = dict(
    top_p=0.5,
    tau=0.5,
    top_k=128,
    temperature=1.0,
    presence_penalty=0.3,
    frequency_penalty=0.3,
    penalty_decay=0.99654026,
    miro_tau=3.0,
    miro_rate=0.1,
)


def make_params(batch: int) -> dict:
    """Default per-row sampler params (host-side numpy, mutated by the
    scheduler as requests come and go, uploaded once per step)."""
    d = DEFAULTS
    return {
        # Default kind = nucleus (the API default sampler): a pool whose
        # unconfigured rows already match the dominant request kind keeps
        # the step's kind-specialized compile key stable from the first
        # request on, so load-time prewarm hits.
        "kind": np.full(batch, KIND_NUCLEUS, np.int32),
        "top_p": np.full(batch, d["top_p"], np.float32),
        "top_k": np.full(batch, d["top_k"], np.int32),
        "temperature": np.full(batch, d["temperature"], np.float32),
        "presence": np.full(batch, d["presence_penalty"], np.float32),
        "frequency": np.full(batch, d["frequency_penalty"], np.float32),
        "decay": np.full(batch, d["penalty_decay"], np.float32),
        "miro_tau": np.full(batch, d["miro_tau"], np.float32),
        "miro_rate": np.full(batch, d["miro_rate"], np.float32),
    }


def init_sampler_state(batch: int, vocab: int):
    """Fresh on-device sampler state pytree."""
    return {
        "penalties": jnp.zeros((batch, vocab), jnp.float32),
        "seen": jnp.zeros((batch, vocab), jnp.bool_),
        "max_surprise": jnp.full((batch,), 2.0 * DEFAULTS["miro_tau"], jnp.float32),
    }


def init_penalties_host(prompt_tokens, vocab: int, presence: float,
                        frequency: float, decay: float):
    """Host-side penalty init from prompt tokens (Sampler::init,
    nucleus.rs:48-58): reversed iteration, ``penalty = prev_or_presence +
    frequency * decay**index``.  Returns (penalties (V,), seen (V,))."""
    pen = np.zeros(vocab, np.float32)
    seen = np.zeros(vocab, np.bool_)
    for index, token in enumerate(reversed(prompt_tokens)):
        prev = pen[token] if seen[token] else presence
        pen[token] = prev + frequency * (decay ** index)
        seen[token] = True
    return pen, seen


def transform_logits(logits, state, bias=None, allowed_mask=None):
    """Reference transform order (run.rs:664-697): penalties, then the BNF
    formatter mask, then logit bias.

    logits: (B, V); bias: (B, V) or None; allowed_mask: (B, V) bool or None
    (True = token allowed).
    """
    x = logits.astype(jnp.float32) - state["penalties"]
    if allowed_mask is not None:
        x = jnp.where(allowed_mask, x, -jnp.inf)
    if bias is not None:
        x = x + bias
    return x


def _topk_cut_sample(probs_sorted, rand, cut_param, top_k, temperature):
    """Shared nucleus/typical machinery on an already-ranked (K,) prob
    row.  ``top_k <= 0`` means unbounded (no positional cut)."""
    cum_before = jnp.cumsum(probs_sorted) - probs_sorted
    pos = jnp.arange(probs_sorted.shape[0], dtype=jnp.int32)
    keep = (cum_before <= cut_param) & ((top_k <= 0) | (pos < top_k))
    t = jnp.maximum(temperature, 1e-4)
    w = jnp.where(keep, jnp.power(jnp.maximum(probs_sorted, 1e-38), 1.0 / t), 0.0)
    total = jnp.sum(w)
    cdf = jnp.cumsum(w) / jnp.maximum(total, 1e-38)
    hit = rand <= cdf
    first_hit = jnp.argmax(hit)  # 0 if none hit -> find_or_first
    return first_hit


def _typical_row(probs, rand, p, k_cap=None):
    logp = jnp.log(jnp.maximum(probs, 1e-38))
    entropy = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0))
    # Rank by |(-ln p) - entropy| ascending == top_k of the negated score.
    score = -jnp.abs(-logp - entropy)
    score = jnp.where(probs > 0, score, -jnp.inf)
    K = min(int(k_cap or TOP_K_CAP), probs.shape[0])
    _, idx = jax.lax.top_k(score, K)
    vals = probs[idx]
    sel = _topk_cut_sample(vals, rand, p["tau"], p["top_k"], p["temperature"])
    return idx[sel]


def _mirostat_row(probs, rand, max_surprise):
    """Threshold form of mirostat.rs:44-91 — no full-vocab sort needed.

    The reference sorts descending and keeps elements until the first one
    with ``-log2(p) > max_surprise`` (inclusive).  Equivalently: keep
    ``p >= 2**-max_surprise`` plus the single largest p below the
    threshold.  Sampling within the kept set is order-independent.
    """
    thresh = jnp.exp2(-max_surprise)
    above = probs >= thresh
    below = jnp.where(above, -jnp.inf, probs)
    crossing = jnp.argmax(below)  # largest prob below threshold
    any_below = jnp.any(~above)
    keep = above.at[crossing].set(above[crossing] | any_below)

    w = jnp.where(keep, probs, 0.0)
    total = jnp.sum(w)
    cdf = jnp.cumsum(w)
    r = rand * total
    hit = r <= cdf
    # find_or_first over kept elements: fall back to the argmax prob.
    token = jnp.where(jnp.any(hit & keep),
                      jnp.argmax(hit & keep),
                      jnp.argmax(w))
    token_prob = jnp.maximum(probs[token], 1e-38)
    token_surprise = jnp.log2(jnp.maximum(total, 1e-38)) - jnp.log2(token_prob)
    return token, token_surprise


def sample_step(rng, logits, params, state, bias=None, allowed_mask=None,
                kinds=None):
    """One batched sampling step.  Fully jit-able; fuses into the decode step.

    rng: PRNG key; logits: (B, V) raw model logits.
    Returns (tokens (B,) int32, probs (B, V) f32, new_state).
    """
    rand = jax.random.uniform(rng, (logits.shape[0],), jnp.float32)
    return sample_with_rand(rand, logits, params, state, bias, allowed_mask,
                            kinds=kinds)


def sample_with_rand(rand, logits, params, state, bias=None,
                     allowed_mask=None, kinds=None, k_cap=None):
    """Deterministic core of :func:`sample_step` given uniform draws
    ``rand`` (B,) in [0, 1) — split out so tests can pin the randomness.

    ``kinds``: static tuple of sampler kinds present in this batch; only
    those branches are compiled (a vmap'd switch would execute ALL of
    them — two full top-k sorts plus a 65k cumsum per decode step).
    ``k_cap``: static top-k width (defaults to TOP_K_CAP).
    """
    B, V = logits.shape
    if kinds is None:
        kinds = (KIND_NUCLEUS, KIND_TYPICAL, KIND_MIROSTAT, KIND_GREEDY)
    kinds = tuple(sorted(set(int(k) for k in kinds)))
    K = min(int(k_cap or TOP_K_CAP), V)

    x = transform_logits(logits, state, bias, allowed_mask)
    lse = jax.nn.logsumexp(x, axis=-1)  # (B,) log partition

    pb = {k: params[k] for k in
          ("kind", "top_p", "top_k", "temperature", "miro_tau", "miro_rate")}
    ms = state["max_surprise"]

    # Full-vocab probs only if a branch needs them (typical / mirostat).
    need_full = (KIND_TYPICAL in kinds) or (KIND_MIROSTAT in kinds)
    probs_full = jnp.exp(x - lse[:, None]) if need_full else None

    tokens = jnp.zeros(B, jnp.int32)
    new_ms = ms

    if KIND_NUCLEUS in kinds:
        # top-k on logits == top-k on probs; normalize the k slice by lse.
        vals, idx = jax.lax.top_k(x, K)
        pk = jnp.exp(vals - lse[:, None])  # (B, K) descending probs

        def nuc_row(pk_b, idx_b, rand_b, p):
            sel = _topk_cut_sample(pk_b, rand_b, p["top_p"], p["top_k"],
                                   p["temperature"])
            return idx_b[sel]

        nuc = jax.vmap(nuc_row)(pk, idx, rand, pb)
        tokens = jnp.where(pb["kind"] == KIND_NUCLEUS, nuc, tokens)

    if KIND_TYPICAL in kinds:
        def typ_row(probs_b, rand_b, p):
            return _typical_row(probs_b, rand_b,
                                {**p, "tau": p["top_p"]}, k_cap=K)

        typ = jax.vmap(typ_row)(probs_full, rand, pb)
        tokens = jnp.where(pb["kind"] == KIND_TYPICAL, typ, tokens)

    if KIND_MIROSTAT in kinds:
        mir, surprise = jax.vmap(_mirostat_row)(probs_full, rand, ms)
        tokens = jnp.where(pb["kind"] == KIND_MIROSTAT,
                           mir.astype(jnp.int32), tokens)
        # Mirostat state update (mirostat.rs:84-88).
        err = surprise - pb["miro_tau"]
        upd = jnp.minimum(ms - pb["miro_rate"] * err, 4.0 * pb["miro_tau"])
        new_ms = jnp.where(pb["kind"] == KIND_MIROSTAT, upd, new_ms)

    if KIND_GREEDY in kinds:
        greedy = jnp.argmax(x, axis=-1).astype(jnp.int32)
        tokens = jnp.where(pb["kind"] == KIND_GREEDY, greedy, tokens)

    tokens = tokens.astype(jnp.int32)
    rows = jnp.arange(B)
    sp = jnp.exp(x[rows, tokens] - lse)  # prob of the sampled token

    # Penalty update (nucleus.rs:104-117): decay all, then bump the sampled
    # token: seen ? decayed + frequency : presence.
    pen = state["penalties"] * params["decay"][:, None]
    tok_seen = state["seen"][rows, tokens]
    new_val = jnp.where(
        tok_seen, pen[rows, tokens] + params["frequency"], params["presence"]
    )
    pen = pen.at[rows, tokens].set(new_val)
    seen = state["seen"].at[rows, tokens].set(True)

    new_state = {"penalties": pen, "seen": seen, "max_surprise": new_ms}
    return tokens, sp, new_state


def kinds_key(kind_array) -> tuple:
    """Static compile key: the sampler kinds present in a host batch."""
    return tuple(sorted({int(k) for k in kind_array}))


def k_cap_key(top_k_array, vocab: int | None = None) -> int:
    """Static top-k width bucket: powers of two from 128 to TOP_K_CAP
    for the fast path; the FULL VOCAB when any row asks for top_k beyond
    the cap or 0 (= unbounded) — reference fidelity over arbitrary k
    (nucleus.rs:69-134) at a full on-device sort for that bucket."""
    ks = [int(k) for k in top_k_array]
    if vocab and any(k <= 0 or k > TOP_K_CAP for k in ks):
        return vocab
    need = int(max(1, min(TOP_K_CAP, max(ks))))
    cap = 128
    while cap < need:
        cap *= 2
    return min(cap, TOP_K_CAP)
