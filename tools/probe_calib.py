"""Calibrate timing methodology on the tunneled TPU: known-cost ops vs
measured, n=1 vs n=20, shapes/layout effects."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
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
    except Exception:
        pass

    # Calibration: big matmul with known FLOPs (v5e bf16 peak ~197 TF/s).
    a = jnp.ones((8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))
    ms = timed(f, a, n=5)
    tf = 2 * 8192**3 / (ms / 1e3) / 1e12
    print(f"matmul 8192^3 bf16: {ms:.3f} ms -> {tf:.1f} TFLOP/s")

    # Bandwidth calibration: big elementwise (read+write 2x256MB).
    big = jnp.ones((8192, 8192), jnp.float32)
    f = jax.jit(lambda x: x * 1.0001)
    ms = timed(f, big, n=5)
    gbps = 2 * big.size * 4 / (ms / 1e3) / 1e9
    print(f"elementwise 256MB f32: {ms:.3f} ms -> {gbps:.0f} GB/s")

    B, V = 16, 65536
    pen = jnp.zeros((B, V), jnp.float32)
    f = jax.jit(lambda p: p * jnp.float32(0.99))
    for n in (1, 5, 20):
        print(f"penalty (16,65536) n={n}: {timed(f, pen, n=n):.3f} ms")

    penT = jnp.zeros((V, B), jnp.float32)
    print(f"penalty (65536,16):      {timed(f, penT):.3f} ms")
    pen2 = jnp.zeros((B, 512, 128), jnp.float32)
    print(f"penalty (16,512,128):    {timed(f, pen2):.3f} ms")
    pen3 = jnp.zeros((1024, 1024), jnp.float32)
    print(f"penalty (1024,1024):     {timed(f, pen3):.3f} ms")

    f = jax.jit(lambda x: jax.nn.logsumexp(x, -1))
    print(f"lse (16,65536):          {timed(f, pen):.3f} ms")
    f2 = jax.jit(lambda x: jax.nn.logsumexp(x.reshape(B, 512, 128), (-2, -1)))
    print(f"lse reshaped:            {timed(f2, pen):.3f} ms")

    # n=1 forward sanity at 438M.
    from bench import build_model
    from ai00_server_tpu.models import v7

    model, info = build_model(24, 1024, 64, V, jnp.bfloat16)
    state = v7.init_state(info, B, jnp.float32)
    tokens = jnp.zeros((B, 1), jnp.int32)
    lengths = jnp.ones((B,), jnp.int32)
    fwd = jax.jit(lambda p, s, t, l: v7.forward(p, s, t, l))
    for n in (1, 5, 20):
        print(f"forward T=1 n={n}: {timed(fwd, model.params, state, tokens, lengths, n=n):.3f} ms")


if __name__ == "__main__":
    main()
