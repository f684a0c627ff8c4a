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


def build_model(num_layer, num_emb, head_size, num_vocab, dtype,
                quant=None):
    """Random v7 weights at production shape, generated in f32 for speed.

    Multi-billion-parameter builds (random gen + quantization on host)
    take tens of minutes, so the built model is cached as a prefab under
    BENCH_CACHE_DIR (default /tmp/ai00_bench_cache; disable with
    BENCH_CACHE_DIR=)."""
    import jax.numpy as jnp

    from ai00_server_tpu import prefab
    from ai00_server_tpu.loader import LoadedModel, stack_params
    from ai00_server_tpu.models.info import ModelVersion
    from ai00_server_tpu.testing import make_raw_weights, tiny_info

    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/ai00_bench_cache")
    dt = jnp.dtype(dtype).name
    cache = (os.path.join(
        cache_dir, f"v7_L{num_layer}_C{num_emb}_V{num_vocab}"
        f"_{dt}_{quant or 'none'}_{prefab.PREFAB_MAGIC}.st")
        if cache_dir else None)

    info = tiny_info(ModelVersion.V7, num_layer=num_layer, num_emb=num_emb,
                     head_size=head_size, num_vocab=num_vocab)
    if cache and os.path.exists(cache):
        model = prefab.load_prefab(cache)
        return model, model.info

    raw = make_raw_weights(info, seed=0, dtype=np.float32)
    qmap = ({i: quant for i in range(num_layer)} if quant else None)
    params = stack_params(info, raw, dtype=dtype, quant=qmap)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        try:
            prefab.save_prefab(cache, model)
        except Exception as e:  # cache is best-effort
            print(f"prefab cache skipped: {e}", file=sys.stderr)
    return model, info


def bench_retrieval():
    """Embeddings-retrieval QPS at 1M vectors (BASELINE.md north star:
    >= 10k QPS with recall@10 at 1M vectors on one v5e chip)."""
    import jax
    import jax.numpy as jnp

    from ai00_server_tpu.ops import retrieval as R

    N = int(os.environ.get("BENCH_RET_N", "1000000"))
    D = int(os.environ.get("BENCH_RET_DIM", "1024"))
    Q = int(os.environ.get("BENCH_RET_BATCH", "64"))
    rounds = int(os.environ.get("BENCH_RET_ROUNDS", "20"))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = x[:Q] + 0.01 * rng.standard_normal((Q, D)).astype(np.float32)

    xd = jnp.asarray(x, jnp.bfloat16)
    qd = jnp.asarray(q, jnp.bfloat16)
    scores, ids = R.exact_search(xd, qd, k=10)
    jax.block_until_ready((scores, ids))
    # recall@1 sanity: perturbed vectors find themselves
    recall1 = float(np.mean(np.asarray(ids)[:, 0] == np.arange(Q)))

    t0 = time.time()
    for _ in range(rounds):
        scores, ids = R.exact_search(xd, qd, k=10)
    jax.block_until_ready((scores, ids))
    dt = time.time() - t0
    qps = Q * rounds / dt

    result = {
        "metric": f"exact_mips_qps_{N // 1000}k_d{D}",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10000.0, 2),  # north-star 10k QPS
    }
    print(json.dumps(result))
    print(json.dumps({"detail": {"recall1": recall1, "batch": Q,
                                 "ms_per_batch": round(dt / rounds * 1e3, 2),
                                 "device": str(jax.devices()[0])}}),
          file=sys.stderr)


def bench_ivf():
    """IVF retrieval at the 10M-vector north star (BASELINE.json: full
    RAG serve, IVF over 10M vectors): int8-coded clusters (~10.5 GB on
    device), recall@10 measured against chunked-exact ground truth."""
    import jax
    import jax.numpy as jnp

    from ai00_server_tpu.ops import retrieval as R

    N = int(os.environ.get("BENCH_RET_N", str(10_000_000)))
    D = int(os.environ.get("BENCH_RET_DIM", "1024"))
    Q = int(os.environ.get("BENCH_RET_BATCH", "64"))
    nlist = int(os.environ.get("BENCH_RET_NLIST", "4096"))
    rounds = int(os.environ.get("BENCH_RET_ROUNDS", "20"))
    nq = 256

    rng = np.random.default_rng(0)
    t0 = time.time()
    x = np.empty((N, D), np.float32)
    step = 1 << 20
    for i in range(0, N, step):
        n = min(step, N - i)
        v = rng.standard_normal((n, D)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        x[i:i + n] = v
    qi = rng.choice(N, nq, replace=False)
    q = x[qi] + 0.01 * rng.standard_normal((nq, D)).astype(np.float32)
    gen_s = time.time() - t0

    t0 = time.time()
    _, gt = R.exact_search_chunked(x, q, k=10)
    gt_s = time.time() - t0

    t0 = time.time()
    ivf = R.build_ivf(x, nlist=nlist, iters=8, quant="int8")
    jax.block_until_ready(ivf.packed)
    build_s = time.time() - t0

    out = {}
    for nprobe in (8, 16, 32):
        _, ids = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                              jnp.asarray(q), k=10, nprobe=nprobe,
                              pscale=ivf.pscale)
        ids = np.asarray(ids)
        recall = np.mean([
            len(set(ids[r]) & set(gt[r])) / 10 for r in range(nq)])
        qd = jnp.asarray(q[:Q])
        s, i = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                            qd, k=10, nprobe=nprobe, pscale=ivf.pscale)
        jax.block_until_ready(i)
        t0 = time.time()
        for _ in range(rounds):
            s, i = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                                qd, k=10, nprobe=nprobe, pscale=ivf.pscale)
        jax.block_until_ready(i)
        qps = Q * rounds / (time.time() - t0)
        out[nprobe] = (round(recall, 4), round(qps, 1))

    best = max(out.items(), key=lambda kv: (kv[1][1] >= 10000, kv[1][0]))
    print(json.dumps({
        "metric": f"ivf_int8_qps_{N // 1000000}M_d{D}_nprobe{best[0]}",
        "value": best[1][1],
        "unit": "qps",
        "vs_baseline": round(best[1][1] / 10000.0, 2),
    }))
    print(json.dumps({"detail": {
        "recall_qps_by_nprobe": {str(k): v for k, v in out.items()},
        "nlist": nlist, "cap": ivf.cap, "gen_s": round(gen_s, 1),
        "ground_truth_s": round(gt_s, 1), "build_s": round(build_s, 1),
        "device": str(jax.devices()[0]),
    }}), file=sys.stderr)


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
    quant = os.environ.get("BENCH_QUANT") or None  # int8 | nf4 | sf4

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16, quant=quant)
    engine = Engine(model, max_batch=B, token_chunk_size=128,
                    state_dtype=jnp.float32)
    build_s = time.time() - t0

    # Logical parameter count: quantized leaves report their logical
    # (in, out), not the packed code elements (nf4 packs 2 per byte).
    from ai00_server_tpu.ops.quant import QuantizedLinear

    def leaf_params(x):
        if isinstance(x, QuantizedLinear):
            lead = x.q.shape[:-3]
            return int(np.prod(lead)) * int(np.prod(x.shape))
        return int(np.prod(x.shape))

    n_params = sum(
        leaf_params(x) for x in jax.tree.leaves(
            model.params,
            is_leaf=lambda x: isinstance(x, QuantizedLinear)))

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
    # (the runtime's chunked-decode scan).  The sampled tokens stay on
    # device between chunks (sync=False) so dispatch/transfer round-trips
    # overlap with compute — the serving loop gets the same effect from
    # its bucketed chunk sizes.  Warmup compiles, then timed.
    K = int(os.environ.get("BENCH_DECODE_CHUNK", "32"))
    cur = res.tokens.astype(np.int32)
    toks_seq, _ = engine.decode_chunk(cur, mask, K, sync=False)
    cur = toks_seq[-1]
    jax.block_until_ready(cur)
    t0 = time.time()
    steps_done = 0
    while steps_done < decode_steps:
        toks_seq, _ = engine.decode_chunk(cur, mask, K, sync=False)
        cur = toks_seq[-1]
        steps_done += K
    np.asarray(toks_seq)  # block: all chunks complete + tokens on host
    dt = time.time() - t0
    decode_tok_s = B * steps_done / dt
    step_ms = dt / steps_done * 1e3

    baseline = 11.6  # reference doc-example tok/s (see module docstring)
    qtag = f"_{quant}" if quant else ""
    result = {
        "metric": f"rwkv7_{n_params/1e6:.0f}M{qtag}_decode_batch{B}",
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
    if os.environ.get("BENCH_MODE") == "retrieval":
        bench_retrieval()
    elif os.environ.get("BENCH_MODE") == "ivf":
        bench_ivf()
    else:
        main()
