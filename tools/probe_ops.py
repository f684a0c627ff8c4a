"""Micro-ops probe: per-op overhead vs bandwidth on the tunneled TPU.
True transfer sync (see probe_decode.py)."""

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


def timed(fn, *args, n=50):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max(0.0, (time.perf_counter() - t0) * 1e3 - RTT_MS) / n


def main():
    global RTT_MS
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    except Exception:
        pass

    tiny = jnp.zeros((8,), jnp.float32)
    f0 = jax.jit(lambda x: x + 1.0)
    _sync(f0(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _sync(f0(tiny))
    RTT_MS = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync RTT: {RTT_MS:.1f} ms")

    B, C = 16, 1024
    x16 = jnp.ones((B, C), jnp.bfloat16)
    x128 = jnp.ones((128, C), jnp.bfloat16)
    W = jnp.ones((C, C), jnp.bfloat16)

    m1 = jax.jit(lambda x, w: jnp.dot(x, w,
                                      preferred_element_type=jnp.float32))
    print(f"1x (16,1024)@(1024,1024):  {timed(m1, x16, W)*1e3:.1f} us")
    print(f"1x (128,1024)@(1024,1024): {timed(m1, x128, W)*1e3:.1f} us")

    def chain(x, w, k):
        for _ in range(k):
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
        return x

    for k in (8, 32):
        mk = jax.jit(lambda x, w, _k=k: chain(x, w, _k))
        print(f"{k}x chained matmul:        {timed(mk, x16, W)*1e3/k:.1f} us/mm")

    # Batched einsum: 3 stacked (C,C) in one op vs 3 separate ops.
    W3 = jnp.ones((3, C, C), jnp.bfloat16)
    e3 = jax.jit(lambda x, w: jnp.einsum(
        "bc,tco->tbo", x, w, preferred_element_type=jnp.float32))
    print(f"einsum 3x stacked:         {timed(e3, x16, W3)*1e3:.1f} us "
          f"(vs 3 separate)")

    def sep3(x, w3):
        return (jnp.dot(x, w3[0], preferred_element_type=jnp.float32),
                jnp.dot(x, w3[1], preferred_element_type=jnp.float32),
                jnp.dot(x, w3[2], preferred_element_type=jnp.float32))

    print(f"3 separate matmuls:        {timed(jax.jit(sep3), x16, W3)*1e3:.1f} us")

    # Elementwise op overhead: K small ops chained.
    v = jnp.ones((B, C), jnp.float32)

    def echain(x, k):
        for i in range(k):
            x = x * 1.0001 + 0.0001
        return x

    for k in (16, 64):
        ek = jax.jit(lambda x, _k=k: echain(x, _k))
        print(f"{k}x elementwise (16,1024): {timed(ek, v)*1e3/k:.2f} us/op")

    # v7 forward at B=128 (8x matmul work, same op count as B=16).
    from bench import build_model
    from ai00_server_tpu.models import v7

    model, info = build_model(24, 1024, 64, 65536, jnp.bfloat16)
    for BB in (16, 128):
        state = v7.init_state(info, BB, jnp.float32)
        tokens = jnp.zeros((BB, 1), jnp.int32)
        lengths = jnp.ones((BB,), jnp.int32)
        fwd = jax.jit(lambda p, s, t, l: v7.forward(p, s, t, l))
        print(f"forward T=1 B={BB}: "
              f"{timed(fwd, model.params, state, tokens, lengths, n=20):.3f} ms")


if __name__ == "__main__":
    main()
