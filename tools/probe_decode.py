"""Decompose decode-step time on the real device: forward vs head matmul
vs sampling vs full engine scan.  Run: python tools/probe_decode.py
(env: PROBE_LAYERS/EMB/VOCAB/BATCH/K)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=20, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from bench import build_model
    from ai00_server_tpu.engine import Engine
    from ai00_server_tpu.models import v7
    from ai00_server_tpu.ops import sampling

    B = int(os.environ.get("PROBE_BATCH", "16"))
    L = int(os.environ.get("PROBE_LAYERS", "24"))
    C = int(os.environ.get("PROBE_EMB", "1024"))
    V = int(os.environ.get("PROBE_VOCAB", "65536"))
    K = int(os.environ.get("PROBE_K", "16"))
    quant = os.environ.get("PROBE_QUANT") or None

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16, quant=quant)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    state = v7.init_state(info, B, jnp.float32)
    tokens = jnp.zeros((B, 1), jnp.int32)
    lengths = jnp.ones((B,), jnp.int32)

    fwd = jax.jit(lambda p, s, t, l: v7.forward(p, s, t, l))
    ms_fwd = timed(fwd, model.params, state, tokens, lengths)
    print(f"forward T=1 (no head): {ms_fwd:.3f} ms")

    def fwd_head(p, s, t, l):
        hidden, ns = v7.forward(p, s, t, l)
        logits = jnp.dot(hidden[:, 0], p["head"].astype(hidden.dtype),
                         preferred_element_type=jnp.float32)
        return logits, ns

    fwd_head_j = jax.jit(fwd_head)
    ms_fwd_head = timed(fwd_head_j, model.params, state, tokens, lengths)
    print(f"forward+head T=1:      {ms_fwd_head:.3f} ms "
          f"(head ~{ms_fwd_head - ms_fwd:.3f})")

    # Sampling alone on random logits (nucleus defaults, k_cap=128).
    ss = sampling.init_sampler_state(B, V)
    sparams = {k: jnp.asarray(v) for k, v in sampling.make_params(B).items()}
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, V)), jnp.float32)

    def sample(rng, logits, ss):
        rand = jax.random.uniform(rng, (B,), jnp.float32)
        return sampling.sample_with_rand(
            rand, logits, sparams, ss,
            kinds=(sampling.KIND_NUCLEUS,), k_cap=128)

    sample_j = jax.jit(sample)
    ms_sample = timed(sample_j, jax.random.PRNGKey(0), logits, ss)
    print(f"sampling (nucleus,128): {ms_sample:.3f} ms")

    # Full engine decode scan (the production path).
    engine = Engine(model, max_batch=B, token_chunk_size=128,
                    state_dtype=jnp.float32)
    for b in range(B):
        engine.set_row_sampler(b, {"kind": 0})
    first = np.zeros(B, np.int32)
    active = np.ones(B, np.bool_)
    engine.decode_chunk(first, active, K)  # compile
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        engine.decode_chunk(first, active, K)
    ms_scan = (time.perf_counter() - t0) / (n * K) * 1e3
    print(f"engine scan per-token:  {ms_scan:.3f} ms (K={K})")
    print(f"sum of parts:           "
          f"{ms_fwd_head + ms_sample:.3f} ms")


if __name__ == "__main__":
    main()
