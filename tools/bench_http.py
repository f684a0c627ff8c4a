"""End-to-end HTTP serving benchmark: full stack (aiohttp -> runtime ->
engine -> TPU) with concurrent streaming completions.

Measures the VERDICT round-3 "serving-loop gap" metric: aggregate tok/s
for N concurrent completions of M tokens each on the 742M-class bench
model (the engine alone does ~4,400-4,800 tok/s at batch 16; the round-2
serving loop delivered 516-624).

Usage (real TPU):
    python tools/bench_http.py                 # 16 x 256, 742M bf16
    BENCH_CONC=8 BENCH_TOKENS=64 python tools/bench_http.py
    BENCH_SINGLE=1 python tools/bench_http.py  # 1 x 256 single stream

North-star configs (BASELINE.json):
    BENCH_BNF=1 BENCH_SINGLE=1 python tools/bench_http.py
        BNF-constrained single stream (VERDICT r3 item 4: >=50 tok/s
        through the tunnel; grammar is a sticky JSON shape so chunked
        BNF decode engages).
    BENCH_CTX=8192 BENCH_QUANT=nf4 BENCH_BNF=1 BENCH_SINGLE=1 \
        BENCH_LAYERS=32 BENCH_EMB=4096 python tools/bench_http.py
        north-star config 4: 7B-class NF4, ctx-8192 prompt, BNF sampling.
    BENCH_MIXED=1 python tools/bench_http.py
        north-star config 5 serving half: concurrent /embeddings +
        completions through one batched runtime (mixed embed/decode).

Prints one JSON line: {"metric": ..., "value": tok/s aggregate, ...}.
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


WORLD_VOCAB = "/root/reference/assets/tokenizer/rwkv_vocab_v20230424.json"


async def run():
    import jax

    if os.environ.get("BENCH_CPU"):
        # Tiny-scale validation runs: the interpreter may be pinned to
        # the axon TPU platform at start; env JAX_PLATFORMS=cpu alone
        # is not enough (see conftest.py) — override before backend init.
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from aiohttp.test_utils import TestClient, TestServer

    from bench import build_model
    from ai00_server_tpu.engine import Engine
    from ai00_server_tpu.middleware import Environment, ReloadRequest
    from ai00_server_tpu.runtime import Runtime
    from ai00_server_tpu.server.app import Server
    from ai00_server_tpu.server.config import Config
    from ai00_server_tpu.tokenizer import Tokenizer

    B = int(os.environ.get("BENCH_BATCH", "16"))
    conc = 1 if os.environ.get("BENCH_SINGLE") else int(
        os.environ.get("BENCH_CONC", "16"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "256"))
    L = int(os.environ.get("BENCH_LAYERS", "24"))
    C = int(os.environ.get("BENCH_EMB", "1024"))
    V = int(os.environ.get("BENCH_VOCAB", "65536"))
    quant = os.environ.get("BENCH_QUANT") or None
    chunk = int(os.environ.get("BENCH_DECODE_CHUNK", "16"))

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16, quant=quant)
    engine = Engine(model, max_batch=B, token_chunk_size=128,
                    state_dtype=jnp.float32)
    tokenizer = Tokenizer.from_file(
        os.environ.get("BENCH_TOKENIZER", WORLD_VOCAB))
    runtime = Runtime(engine, tokenizer, decode_chunk_size=chunk)
    build_s = time.time() - t0

    server = Server(Config())
    req = ReloadRequest(model_path="bench-742M", max_batch=B,
                        token_chunk_size=128, decode_chunk_size=chunk)
    server.middleware.env = Environment(
        reload=req, model=model, engine=engine, runtime=runtime,
        tokenizer=tokenizer, states=[])

    t0 = time.time()
    engine.prewarm(chunk)
    warm_s = time.time() - t0

    loop = asyncio.get_event_loop()
    runtime.start()
    client = TestClient(TestServer(server.app), loop=loop)
    await client.start_server()

    rng = np.random.default_rng(0)
    prompts = []
    # Distinct ~40-char prompts (different lengths exercise admission
    # staggering and the prefix cache negatively).
    words = ["alpha", "bravo", "delta", "gamma", "osprey", "quartz",
             "lattice", "monsoon", "harbor", "zenith"]
    ctx = int(os.environ.get("BENCH_CTX", "0"))
    for i in range(conc):
        n = 6 + (i % 5)
        p = " ".join(rng.choice(words, size=n)) + f" {i}"
        if ctx:
            # Pad the prompt to ~ctx tokens (world tokenizer: these
            # words are ~1 token each incl. leading space).
            p = " ".join(rng.choice(words, size=ctx - n - 2)) + " " + p
        prompts.append(p)

    # Sticky-mask BNF grammar (VERDICT item 4): inside the quoted
    # string and the digit run the allowed-token mask is constant, so
    # the runtime's chunked BNF decode engages; the structural
    # punctuation forces mask switches + rollbacks at the joints.
    bnf_schema = None
    if os.environ.get("BENCH_BNF"):
        bnf_schema = (
            "start ::= '{\"name\": \"' text '\", \"value\": ' num '}';\n"
            "text ::= tchar | tchar text;\n"
            "tchar ::= 'a'|'b'|'c'|'d'|'e'|'f'|'g'|'h'|'i'|'j'|'k'|'l'"
            "|'m'|'n'|'o'|'p'|'q'|'r'|'s'|'t'|'u'|'v'|'w'|'x'|'y'|'z'"
            "|' '|'.'|','|'-';\n"
            "num ::= digit | digit num;\n"
            "digit ::= '0'|'1'|'2'|'3'|'4'|'5'|'6'|'7'|'8'|'9';\n")

    async def one(i):
        t0 = time.time()
        body = {
            "prompt": prompts[i], "max_tokens": n_tokens,
            "sampler": {"type": "Nucleus", "top_k": 128, "top_p": 0.5},
        }
        if bnf_schema:
            body["bnf_schema"] = bnf_schema
        r = await client.post("/api/oai/completions", json=body)
        body = await r.json()
        u = body["usage"]
        return u["completion"], time.time() - t0, \
            body["choices"][0]["finish_reason"]

    async def embed_one(i):
        t0 = time.time()
        r = await client.post("/api/oai/embeddings", json={
            "input": prompts[i % conc] + " embedding probe " + str(i)})
        await r.json()
        return time.time() - t0

    if os.environ.get("BENCH_MIXED"):
        # North-star config 5 (serving half): completions and native
        # embeddings interleave through ONE batched runtime; embeds ride
        # the same slot scheduler as decode rows.
        n_embed = int(os.environ.get("BENCH_EMBEDS", str(4 * conc)))
        await asyncio.gather(one(0), embed_one(0))      # warm both paths
        t0 = time.time()
        gen_jobs = [one(i) for i in range(conc)]
        emb_jobs = [embed_one(i) for i in range(n_embed)]
        results = await asyncio.gather(*gen_jobs, *emb_jobs)
        wall = time.time() - t0
        gen_res = results[:conc]
        emb_lat = results[conc:]
        total_tokens = sum(r[0] for r in gen_res)
        agg = total_tokens / wall
        stats = dict(runtime.metrics)
        await client.close()
        await runtime.stop()
        print(json.dumps({
            "metric": f"e2e_http_mixed_{conc}gen_{n_embed}embed",
            "value": round(agg, 1),
            "unit": "tok/s",
            "vs_baseline": round(agg / 11.6, 2),
        }))
        print(json.dumps({"detail": {
            "decode_tokens": total_tokens, "wall_s": round(wall, 2),
            "embed_qps": round(n_embed / wall, 1),
            "embed_p50_s": round(float(np.median(emb_lat)), 3),
            "embed_p99_s": round(float(np.quantile(emb_lat, 0.99)), 3),
            "gen_finish": [r[2] for r in gen_res[:8]],
        }}), file=sys.stderr)
        print(json.dumps({"runtime_metrics": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in stats.items()}}), file=sys.stderr)
        return

    # Warmup round (compiles remaining buckets, fills caches).
    await asyncio.gather(*[one(i) for i in range(min(conc, 4))])

    t0 = time.time()
    results = await asyncio.gather(*[one(i) for i in range(conc)])
    wall = time.time() - t0
    total_tokens = sum(r[0] for r in results)
    agg = total_tokens / wall

    stats = dict(runtime.metrics)
    await client.close()
    await runtime.stop()

    name = "single_stream" if conc == 1 else f"{conc}x{n_tokens}"
    qtag = f"_{quant}" if quant else ""
    if bnf_schema:
        qtag += "_bnf"
    if ctx:
        qtag += f"_ctx{ctx}"
    print(json.dumps({
        "metric": f"e2e_http{qtag}_{name}",
        "value": round(agg, 1),
        "unit": "tok/s",
        "vs_baseline": round(agg / 11.6, 2),
    }))
    print(json.dumps({"detail": {
        "total_tokens": total_tokens, "wall_s": round(wall, 2),
        "per_request_s": [round(r[1], 2) for r in results[:8]],
        "finish": [r[2] for r in results[:8]],
        "build_s": round(build_s, 1), "warm_s": round(warm_s, 1),
        "decode_chunk": chunk,
    }}), file=sys.stderr)
    stats = {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in stats.items()}
    print(json.dumps({"runtime_metrics": stats}), file=sys.stderr)


if __name__ == "__main__":
    asyncio.run(run())
