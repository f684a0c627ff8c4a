"""Probe quantized matmul variants at 7B decode shapes on the real device.

Compares the Pallas dequant-in-matmul kernels against XLA alternatives at
the shapes that dominate 7B decode: (B=16, 4096) x (4096, 4096) and the
FFN pair.  True transfer sync (see probe_decode.py).
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
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max(0.0, ((time.perf_counter() - t0) * 1e3 - RTT_MS)) / n


def timed_chain(op, x, inner=256, outer=4):
    """Per-op ms via a device-side fori_loop of ``inner`` dependent calls
    (one dispatch, no RTT noise).  ``op``: (B, in) -> (B, out).  An
    optimization_barrier keeps each iteration's result live (XLA folds
    arithmetic tricks like ``x + 0*y`` away)."""
    import jax

    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        eps = jnp.asarray(1e-8, x.dtype)  # non-foldable, negligible drift

        def body(_, xx):
            y = op(xx)
            return xx + y[:, :1].astype(xx.dtype) * eps

        return jax.lax.fori_loop(0, inner, body, x)

    _sync(loop(x))
    t0 = time.perf_counter()
    for _ in range(outer):
        _sync(loop(x))
    return ((time.perf_counter() - t0) * 1e3 - outer * RTT_MS) \
        / (outer * inner)


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

    from ai00_server_tpu.ops import quant
    from ai00_server_tpu.ops.quant_pallas import matmul_4bit, matmul_int8

    B = int(os.environ.get("PROBE_BATCH", "16"))
    tiny = jnp.zeros((8,), jnp.float32)
    f0 = jax.jit(lambda x: x + 1.0)
    _sync(f0(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _sync(f0(tiny))
    RTT_MS = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync RTT: {RTT_MS:.1f} ms")

    rng = np.random.default_rng(0)
    for (cin, cout) in ((4096, 4096), (4096, 16384), (16384, 4096)):
        w = rng.standard_normal((cin, cout)).astype(np.float32) * 0.05
        x = jnp.asarray(rng.standard_normal((B, cin)), jnp.bfloat16)
        gb_int8 = cin * cout / 1e9
        gb_nf4 = gb_int8 / 2

        q8 = quant.quantize_int8(w)
        ms = timed_chain(lambda x, q=q8.q, s=q8.scale:
                         matmul_int8(x, q, s), x)
        print(f"int8 pallas  {cin}x{cout}: {ms:6.3f} ms "
              f"({gb_int8 / ms * 1e3:6.1f} GB/s)", flush=True)

        # XLA per-block contraction (the pre-kernel decode path): int8
        # codes convert inside the dot, scales applied to the accumulator.
        def xla_block(x, q=q8.q, s=q8.scale):
            nb, blk, out = q.shape
            xb = x.reshape(B, nb, blk)
            part = jnp.einsum("bnk,nko->bno", xb.astype(jnp.bfloat16),
                              q.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            return (part * s[None, :, 0]).sum(1)

        ms = timed_chain(xla_block, x)
        print(f"int8 xla-blk {cin}x{cout}: {ms:6.3f} ms "
              f"({gb_int8 / ms * 1e3:6.1f} GB/s)", flush=True)

        # XLA full dequant then single dot (materializes bf16 copy).
        def xla_deq(x, q=q8.q, s=q8.scale):
            wdq = (q.astype(jnp.bfloat16)
                   * s.astype(jnp.bfloat16)).reshape(cin, cout)
            return jnp.dot(x, wdq, preferred_element_type=jnp.float32)

        ms = timed_chain(xla_deq, x)
        print(f"int8 xla-deq {cin}x{cout}: {ms:6.3f} ms "
              f"({gb_int8 / ms * 1e3:6.1f} GB/s)", flush=True)

        q4 = quant.quantize_nf4(w)
        ms = timed_chain(lambda x, q=q4.q, s=q4.scale:
                         matmul_4bit(x, q, s), x)
        print(f"nf4 pallas   {cin}x{cout}: {ms:6.3f} ms "
              f"({gb_nf4 / ms * 1e3:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
