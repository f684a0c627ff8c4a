"""Headline benchmark: RWKV v7 batched decode throughput through the full
engine (forward + on-device sampling + token download), on the default JAX
device (the real TPU chip under the driver; CPU if forced).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Baseline: the reference publishes no benchmark numbers (BASELINE.md); the
only end-to-end figure in its repo is the OpenAPI doc example of 97
completion tokens in 8.381 s ≈ 11.6 tok/s on an RWKV-x060 3B
(crates/ai00-server/src/api/oai/chat.rs:239-247).  ``vs_baseline`` is
this bench's aggregate tok/s over that figure.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def build_model(num_layer, num_emb, head_size, num_vocab, dtype):
    """Random v7 weights at production shape, generated in f32 for speed."""
    import jax.numpy as jnp

    from ai00_server_tpu.loader import LoadedModel, stack_params
    from ai00_server_tpu.models.info import ModelInfo, ModelVersion
    from ai00_server_tpu.testing import make_raw_weights, tiny_info

    info = tiny_info(ModelVersion.V7, num_layer=num_layer, num_emb=num_emb,
                     head_size=head_size, num_vocab=num_vocab)
    raw = make_raw_weights(info, seed=0)
    params = stack_params(info, raw, dtype=dtype)
    return LoadedModel(info=info, params=params, init_wkv=None), info


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the remote-compile path is slow; cached
    # executables make repeat bench runs start in seconds.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from ai00_server_tpu.engine import Engine

    B = int(os.environ.get("BENCH_BATCH", "16"))
    L = int(os.environ.get("BENCH_LAYERS", "24"))
    C = int(os.environ.get("BENCH_EMB", "1024"))
    V = int(os.environ.get("BENCH_VOCAB", "65536"))
    decode_steps = int(os.environ.get("BENCH_STEPS", "64"))

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16)
    engine = Engine(model, max_batch=B, token_chunk_size=128,
                    state_dtype=jnp.float32)
    build_s = time.time() - t0

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(model.params))

    rng = np.random.default_rng(0)
    for b in range(B):
        engine.set_row_sampler(b, {"kind": 0})  # nucleus, default params

    # Prefill one 128-token chunk for every row (compiles the T=128 step).
    tokens = rng.integers(0, V, size=(B, 128)).astype(np.int32)
    lengths = np.full(B, 128, np.int32)
    mask = np.ones(B, np.bool_)
    t0 = time.time()
    res = engine.step(tokens, lengths, mask)
    prefill_compile_s = time.time() - t0
    t0 = time.time()
    engine.step(tokens, lengths, mask)
    prefill_s = time.time() - t0
    prefill_tok_s = B * 128 / prefill_s

    # Decode via the production fast path: K tokens per device dispatch
    # (the runtime's chunked-decode scan).  Warmup compiles, then timed.
    K = int(os.environ.get("BENCH_DECODE_CHUNK", "16"))
    cur = res.tokens.astype(np.int32)
    toks_seq, _ = engine.decode_chunk(cur, mask, K)
    cur = toks_seq[-1]
    t0 = time.time()
    steps_done = 0
    while steps_done < decode_steps:
        toks_seq, _ = engine.decode_chunk(cur, mask, K)
        cur = toks_seq[-1]
        steps_done += K
    dt = time.time() - t0
    decode_tok_s = B * steps_done / dt
    step_ms = dt / steps_done * 1e3

    baseline = 11.6  # reference doc-example tok/s (see module docstring)
    result = {
        "metric": f"rwkv7_{n_params/1e6:.0f}M_decode_batch{B}",
        "value": round(decode_tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(decode_tok_s / baseline, 2),
    }
    detail = {
        "params_millions": round(n_params / 1e6, 1),
        "batch": B,
        "decode_step_ms": round(step_ms, 2),
        "prefill_tok_s": round(prefill_tok_s, 1),
        "prefill_compile_s": round(prefill_compile_s, 1),
        "build_s": round(build_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    print(json.dumps({"detail": detail}), file=sys.stderr)


if __name__ == "__main__":
    main()
