"""Decompose decode-step time on the real device with TRUE synchronization.

block_until_ready does NOT wait for execution through the axon tunnel
(calibration showed impossible 26 PFLOP/s) — only a device->host transfer
of the freshly produced output synchronizes.  Every measurement here runs
n dependent iterations and transfers one scalar of the last output; the
tunnel RTT is measured separately and subtracted.

Run: python tools/probe_decode.py  (env: PROBE_LAYERS/EMB/VOCAB/BATCH/K)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RTT_MS = None


def _sync(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timed(fn, *args, n=30):
    """Per-call ms, RTT-corrected, true transfer sync."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    total = (time.perf_counter() - t0) * 1e3
    return max(0.0, (total - RTT_MS)) / n


def main():
    global RTT_MS
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
    from ai00_server_tpu.models import v7
    from ai00_server_tpu.ops import sampling

    B = int(os.environ.get("PROBE_BATCH", "16"))
    L = int(os.environ.get("PROBE_LAYERS", "24"))
    C = int(os.environ.get("PROBE_EMB", "1024"))
    V = int(os.environ.get("PROBE_VOCAB", "65536"))
    quant = os.environ.get("PROBE_QUANT") or None

    # RTT baseline: trivial op + scalar transfer.
    tiny = jnp.zeros((8,), jnp.float32)
    f0 = jax.jit(lambda x: x + 1.0)
    _sync(f0(tiny))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        _sync(f0(tiny))
    RTT_MS = (time.perf_counter() - t0) / reps * 1e3
    print(f"sync RTT:               {RTT_MS:.1f} ms")

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16, quant=quant)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    state = v7.init_state(info, B, jnp.float32)
    tokens = jnp.zeros((B, 1), jnp.int32)
    lengths = jnp.ones((B,), jnp.int32)

    fwd = jax.jit(lambda p, s, t, l: v7.forward(p, s, t, l))
    print(f"forward T=1 (generic):  {timed(fwd, model.params, state, tokens, lengths):.3f} ms")

    # Fused whole-network kernel (if eligible): both the raw kernel and
    # the dispatched forward.
    from ai00_server_tpu.ops import fused_decode as fdisp

    fd = fdisp.module_for(info.version.value)
    if fd is not None and fd.can_fuse(model.params):
        fparams = dict(model.params)
        fparams[fd.FUSED_KEY] = fd.make_fused_layout(model.params)
        print(f"forward T=1 (fused):    {timed(jax.jit(fd.forward_t1), fparams, state, tokens, lengths):.3f} ms")
        model.params = fparams

    def fwd_head(p, s, t, l):
        hidden, ns = v7.forward(p, s, t, l)
        logits = jnp.dot(hidden[:, 0], p["head"].astype(hidden.dtype),
                         preferred_element_type=jnp.float32)
        return logits, ns

    print(f"forward+head T=1:       {timed(jax.jit(fwd_head), model.params, state, tokens, lengths):.3f} ms")

    ss = sampling.init_sampler_state(B, V)
    sparams = {k: jnp.asarray(v) for k, v in sampling.make_params(B).items()}
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, V)), jnp.float32)

    def sample(rng, logits, ss):
        rand = jax.random.uniform(rng, (B,), jnp.float32)
        return sampling.sample_with_rand(
            rand, logits, sparams, ss,
            kinds=(sampling.KIND_NUCLEUS,), k_cap=128)

    print(f"sampling (nucleus,128): {timed(jax.jit(sample), jax.random.PRNGKey(0), logits, ss):.3f} ms")

    def sample_1024(rng, logits, ss):
        rand = jax.random.uniform(rng, (B,), jnp.float32)
        return sampling.sample_with_rand(
            rand, logits, sparams, ss,
            kinds=(sampling.KIND_NUCLEUS,), k_cap=1024)

    print(f"sampling (nucleus,1024):{timed(jax.jit(sample_1024), jax.random.PRNGKey(0), logits, ss):.3f} ms")

    # Raw scans: forward-only vs forward+sampling, K tokens per dispatch.
    for with_sampling in (False, True):
        for Ksteps in (16, 64):
            def scan_fn(params, state, ss, first, rng, _K=Ksteps,
                        _ws=with_sampling):
                def body(carry, rng_t):
                    state, ss, toks = carry
                    hidden, state = v7.forward(
                        params, state, toks[:, None],
                        jnp.ones((B,), jnp.int32))
                    logits = jnp.dot(
                        hidden[:, 0], params["head"].astype(hidden.dtype),
                        preferred_element_type=jnp.float32)
                    if _ws:
                        rand = jax.random.uniform(rng_t, (B,), jnp.float32)
                        t2, sp, ss2 = sampling.sample_with_rand(
                            rand, logits, sparams, ss,
                            kinds=(sampling.KIND_NUCLEUS,), k_cap=128)
                    else:
                        t2, ss2 = jnp.argmax(
                            logits, -1).astype(jnp.int32), ss
                    return (state, ss2, t2), t2

                rngs = jax.random.split(rng, _K)
                (state, ss, _), toks = jax.lax.scan(
                    body, (state, ss, first), rngs)
                return toks

            fn = jax.jit(scan_fn)
            first = jnp.zeros(B, jnp.int32)
            ms = timed(fn, model.params, state, ss, first,
                       jax.random.PRNGKey(0), n=8)
            tag = "fwd+sample" if with_sampling else "fwd-only  "
            print(f"scan {tag} K={Ksteps:3d}:  {ms / Ksteps:.3f} ms/token")

    # State snapshot copy (chunk rollback support).
    cp = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    print(f"state snapshot copy:    {timed(cp, state):.3f} ms")


if __name__ == "__main__":
    main()
