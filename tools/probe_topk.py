"""Probe top-k variants + raw decode scan on the real device."""

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
    return (time.perf_counter() - t0) / n * 1e3


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

    B, V, K = 16, 65536, 128
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, V)), jnp.float32)

    t = timed(jax.jit(lambda x: jax.lax.top_k(x, K)), x)
    print(f"lax.top_k(65536,{K}):        {t:.3f} ms")

    t = timed(jax.jit(lambda x: jax.lax.approx_max_k(x, K)), x)
    print(f"approx_max_k(default):       {t:.3f} ms")

    t = timed(jax.jit(
        lambda x: jax.lax.approx_max_k(x, K, recall_target=0.99)), x)
    print(f"approx_max_k(0.99):          {t:.3f} ms")

    def two_stage(x, k=K, bs=128):
        Bb, Vv = x.shape
        nb = Vv // bs
        xb = x.reshape(Bb, nb, bs)
        bmax = xb.max(-1)
        _, bidx = jax.lax.top_k(bmax, k)           # (B, k) blocks
        cand = jnp.take_along_axis(xb, bidx[..., None], axis=1)
        cand = cand.reshape(Bb, k * bs)
        vals, ci = jax.lax.top_k(cand, k)
        blk = jnp.take_along_axis(bidx, ci // bs, axis=1)
        idx = blk * bs + ci % bs
        return vals, idx

    t = timed(jax.jit(two_stage), x)
    print(f"two-stage exact:             {t:.3f} ms")

    # correctness of two-stage
    v1, i1 = jax.jit(lambda x: jax.lax.top_k(x, K))(x)
    v2, i2 = jax.jit(two_stage)(x)
    print("two-stage exact matches:", bool(jnp.allclose(v1, v2)),
          bool(jnp.all(i1 == i2)))

    t = timed(jax.jit(lambda x: jax.nn.logsumexp(x, -1)), x)
    print(f"logsumexp(B,V):              {t:.3f} ms")

    pen = jnp.zeros((B, V), jnp.float32)
    t = timed(jax.jit(lambda p, d: p * d), pen, jnp.float32(0.99))
    print(f"penalty decay pass:          {t:.3f} ms")

    # Raw scan: forward+head+sample inside lax.scan, single dispatch.
    from bench import build_model
    from ai00_server_tpu.models import v7
    from ai00_server_tpu.ops import sampling

    model, info = build_model(24, 1024, 64, V, jnp.bfloat16)
    state = v7.init_state(info, B, jnp.float32)
    ss = sampling.init_sampler_state(B, V)
    sparams = {k: jnp.asarray(v) for k, v in sampling.make_params(B).items()}
    Ksteps = 16

    def scan_fn(params, state, ss, first, rng):
        def body(carry, rng_t):
            state, ss, toks = carry
            hidden, state = v7.forward(params, state, toks[:, None],
                                       jnp.ones((B,), jnp.int32))
            logits = jnp.dot(hidden[:, 0], params["head"].astype(hidden.dtype),
                             preferred_element_type=jnp.float32)
            rand = jax.random.uniform(rng_t, (B,), jnp.float32)
            t2, sp, ss2 = sampling.sample_with_rand(
                rand, logits, sparams, ss,
                kinds=(sampling.KIND_NUCLEUS,), k_cap=128)
            return (state, ss2, t2), t2

        rngs = jax.random.split(rng, Ksteps)
        (state, ss, _), toks = jax.lax.scan(
            body, (state, ss, first), rngs)
        return toks, state, ss

    fn = jax.jit(scan_fn)
    first = jnp.zeros(B, jnp.int32)
    t = timed(fn, model.params, state, ss, first, jax.random.PRNGKey(0), n=5)
    print(f"raw scan K={Ksteps} per-token:     {t / Ksteps:.3f} ms")


if __name__ == "__main__":
    main()
