"""Does one Pallas kernel with 4 internal dots beat 4 XLA matmul ops?
And: concat-fused single matmul vs separate ops.  True transfer sync."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RTT_MS = None


def _sync(out):
    import jax

    return np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    x = jnp.ones((B, C), jnp.bfloat16)
    dx = jnp.ones((B, C), jnp.bfloat16)
    W4 = jnp.ones((4, C, C), jnp.bfloat16)
    M4 = jnp.ones((4, C), jnp.bfloat16)

    # Baseline: 4 separate XLA matmuls (with the mix elementwise).
    def sep(x, dx, W4, M4):
        outs = []
        for i in range(4):
            xi = x + dx * M4[i]
            outs.append(jnp.dot(xi, W4[i],
                                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, -1)

    print(f"4 XLA matmuls:        {timed(jax.jit(sep), x, dx, W4, M4)*1e3:.1f} us")

    # Pallas: ONE kernel, 4 dots inside.
    def kernel(x_ref, dx_ref, w_ref, m_ref, y_ref):
        xv = x_ref[:]
        dxv = dx_ref[:]
        for i in range(4):
            xi = xv + dxv * m_ref[i]
            y_ref[:, i * C:(i + 1) * C] = jnp.dot(
                xi, w_ref[i], preferred_element_type=jnp.float32)

    @jax.jit
    def fused(x, dx, W4, M4):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 4 * C), jnp.float32),
        )(x, dx, W4, M4)

    print(f"1 Pallas kernel 4dots: {timed(fused, x, dx, W4, M4)*1e3:.1f} us")
    # correctness
    a = jax.jit(sep)(x, dx, W4, M4)
    b = fused(x, dx, W4, M4)
    print("match:", bool(jnp.allclose(a, b, rtol=1e-2)))

    # Concat-fused single XLA matmul: [x|dx] @ [[W],[M*W]] -> (B, 4C).
    Wtop = jnp.concatenate([W4[i] for i in range(4)], -1)          # (C, 4C)
    Wbot = jnp.concatenate([M4[i][:, None] * W4[i]
                            for i in range(4)], -1)                # (C, 4C)
    Wcat = jnp.concatenate([Wtop, Wbot], 0)                        # (2C, 4C)

    def cat(x, dx, Wcat):
        xin = jnp.concatenate([x, dx], -1)
        return jnp.dot(xin, Wcat, preferred_element_type=jnp.float32)

    print(f"concat 1 matmul (2x w): {timed(jax.jit(cat), x, dx, Wcat)*1e3:.1f} us")
    c = jax.jit(cat)(x, dx, Wcat)
    print("match:", bool(jnp.allclose(a, c, rtol=1e-2)))

    # 24-layer scan of each variant (per-layer amortized).
    W4L = jnp.ones((24, 4, C, C), jnp.bfloat16)
    M4L = jnp.ones((24, 4, C), jnp.bfloat16)
    WcatL = jnp.ones((24, 2 * C, 4 * C), jnp.bfloat16)

    def scan_sep(x, dx, W, M):
        def body(carry, wm):
            x, dx = carry
            w4, m4 = wm
            y = sep(x, dx, w4, m4)
            x2 = y[:, :C].astype(jnp.bfloat16)
            return (x2, dx), ()

        (xf, _), _ = jax.lax.scan(body, (x, dx), (W, M))
        return xf

    print(f"scan24 sep:   {timed(jax.jit(scan_sep), x, dx, W4L, M4L, n=20)*1e3:.0f} us")

    def scan_cat(x, dx, W):
        def body(carry, w):
            x, dx = carry
            y = cat(x, dx, w)
            x2 = y[:, :C].astype(jnp.bfloat16)
            return (x2, dx), ()

        (xf, _), _ = jax.lax.scan(body, (x, dx), W)
        return xf

    print(f"scan24 cat:   {timed(jax.jit(scan_cat), x, dx, WcatL, n=20)*1e3:.0f} us")

    def scan_pallas(x, dx, W, M):
        def body(carry, wm):
            x, dx = carry
            w4, m4 = wm
            y = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 4 * C), jnp.float32),
            )(x, dx, w4, m4)
            x2 = y[:, :C].astype(jnp.bfloat16)
            return (x2, dx), ()

        (xf, _), _ = jax.lax.scan(body, (x, dx), (W, M))
        return xf

    print(f"scan24 pallas: {timed(jax.jit(scan_pallas), x, dx, W4L, M4L, n=20)*1e3:.0f} us")


if __name__ == "__main__":
    main()
