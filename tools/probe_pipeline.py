"""Measure Pallas TPU auto-pipeline behavior for phase-windowed inputs.

The phased decode kernel (ops/v7_phased_pallas.py) gives every weight
matrix a window whose index map CLAMPS outside its active phase range,
assuming the pipeline skips the copy when the block index is unchanged
between consecutive grid steps.  If Mosaic instead re-fetches whenever
the index map *depends* on the grid step, the kernel streams ~7x the
model bytes and lands at ~50 GB/s (the round-3 2.86B probe measured
109.6 ms/step vs a ~7 ms weight floor).

Three kernels, same total useful bytes (NW x (R, C) bf16 windows, dot
each against x once):

  const : grid=(NW,), index map = i            (each window once)
  clamp : grid=(G,),  6 inputs, each active in its own phase, clamped
          outside  (tests the skip-on-unchanged-index optimization)
  wide  : grid=(NW,), ONE stacked input, index map = i, same traffic
          as const but window twice as large (sanity upper bound)

If clamp >> const at equal useful traffic, the re-fetch hypothesis is
confirmed and the phased kernel must move to manual DMA double
buffering (pltpu.emit_pipeline or make_async_copy).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B = int(os.environ.get("PROBE_B", "16"))
    NODOT = bool(os.environ.get("PROBE_NODOT"))
    R = int(os.environ.get("PROBE_R", "512"))   # window rows
    C = 2560         # window cols
    NI = 6           # inputs in the clamp variant
    NT = int(os.environ.get("PROBE_NT", "5"))   # tiles (phases) per input
    NW = NI * NT     # total windows; default 30 x 2.6MB = 75 MB
    reps = int(os.environ.get("PROBE_REPS", "20"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, R)), jnp.bfloat16)
    wbig = jnp.asarray(rng.standard_normal((NW, R, C)), jnp.bfloat16)

    total_bytes = NW * R * C * 2

    # ---- const: one input, grid over windows, index = i ----
    def k_const(x_ref, w_ref, o_ref):
        i = pl.program_id(0)
        if NODOT:
            # Pure-DMA probe: touch one row of the window per step.
            part = jnp.broadcast_to(
                w_ref[0, :1].astype(jnp.float32)[:, :C], (B, C))
        else:
            part = jnp.dot(x_ref[:], w_ref[0].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        if True:
            @pl.when(i == 0)
            def _():
                o_ref[:] = part

            @pl.when(i > 0)
            def _():
                o_ref[:] = o_ref[:] + part

    @jax.jit
    def run_const(x, w):
        return pl.pallas_call(
            k_const,
            grid=(NW,),
            in_specs=[pl.BlockSpec((B, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    # ---- clamp: 6 inputs, each active for NT steps of a (G,) grid,
    #      index clamped to its range elsewhere (phased-kernel pattern).
    G = NI * NT

    def k_clamp(x_ref, *refs):
        w_refs = refs[:NI]
        o_ref = refs[NI]
        i = pl.program_id(0)
        for n in range(NI):
            for t in range(NT):
                @pl.when(i == n * NT + t)
                def _(n=n, t=t):
                    part = jnp.dot(x_ref[:],
                                   w_refs[n][0].astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                    if n == 0 and t == 0:
                        o_ref[:] = part
                    else:
                        o_ref[:] = o_ref[:] + part

    ws = [wbig[n * NT:(n + 1) * NT] for n in range(NI)]

    @jax.jit
    def run_clamp(x, *ws):
        def mk_spec(n):
            def imap(i, _n=n):
                t = jnp.clip(i - _n * NT, 0, NT - 1)
                return (t, 0, 0)
            return pl.BlockSpec((1, R, C), imap, memory_space=pltpu.VMEM)

        return pl.pallas_call(
            k_clamp,
            grid=(G,),
            in_specs=[pl.BlockSpec((B, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)]
            + [mk_spec(n) for n in range(NI)],
            out_specs=pl.BlockSpec((B, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *ws)

    # ---- manual: same phase structure, but weights stay in ANY/HBM and
    #      an inner emit_pipeline streams the windows (runtime
    #      has_changed skip => each window fetched exactly once).
    def k_manual(x_ref, *refs):
        w_refs = refs[:NI]       # ANY-space, full (NT, R, C) per input
        o_ref = refs[NI]         # VMEM (B, C)

        def body(*win_refs):
            i = pl.program_id(0)
            for n in range(NI):
                for t in range(NT):
                    @pl.when(i == n * NT + t)
                    def _(n=n, t=t):
                        part = jnp.dot(
                            x_ref[:], win_refs[n][0].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                        if n == 0 and t == 0:
                            o_ref[:] = part
                        else:
                            o_ref[:] = o_ref[:] + part

        nbufs = int(os.environ.get("PROBE_BUFS", "2"))

        def mk_spec(n):
            def imap(i, _n=n):
                t = jnp.clip(i - _n * NT, 0, NT - 1)
                return (t, 0, 0)
            return pl.BlockSpec((1, R, C), imap,
                                pipeline_mode=pl.Buffered(
                                    buffer_count=nbufs))

        pipeline = pltpu.emit_pipeline(
            body,
            grid=(G,),
            in_specs=[mk_spec(n) for n in range(NI)],
        )
        pipeline(*w_refs)

    @jax.jit
    def run_manual(x, *ws):
        return pl.pallas_call(
            k_manual,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * NI,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *ws)

    ref = np.asarray(
        jnp.einsum("br,wrc->bc", x.astype(jnp.float32),
                   wbig.astype(jnp.float32)))

    def timed(name, fn, *args):
        """Tunnel-safe timing: chain the kernel inside ONE jit with a
        real data dependence, at TWO chain lengths; the slope
        (t_long - t_short)/(n_long - n_short) cancels the dispatch RTT
        exactly (30-114 ms through the tunnel — dividing a single
        dispatch by reps is NOT enough for sub-ms kernels)."""
        out = fn(x, *args)
        jax.block_until_ready(out)
        err = float(np.max(np.abs(np.asarray(out) - ref))
                    / max(1e-9, float(np.max(np.abs(ref)))))

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x0, *args, n=reps):
            def body(i, carry):
                xc, acc = carry
                out = fn(xc, *args)
                xc = xc + (out[:, :R] * 1e-8).astype(xc.dtype)
                return (xc, acc + out[0, 0])
            return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))

        n1, n2 = reps, 5 * reps
        ts = {}
        for n in (n1, n2):
            o = chain(x, *args, n=n)
            jax.block_until_ready(o[1])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                o = chain(x, *args, n=n)
                jax.block_until_ready(o[1])
                best = min(best, time.time() - t0)
            ts[n] = best
        dt = (ts[n2] - ts[n1]) / (n2 - n1)
        bw = total_bytes / dt / 1e9
        print(f"{name}: {dt*1e3:.3f} ms  ({bw:.0f} GB/s useful)  "
              f"relerr={err:.2e}  [raw {ts[n1]*1e3:.1f}/{ts[n2]*1e3:.1f}ms]")
        return dt

    # ---- empty: same grid length, NO windowed input at all -> pure
    #      per-grid-step overhead.
    def k_empty(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:, :1] = o_ref[:, :1] + x_ref[:, :1].astype(jnp.float32)

    @jax.jit
    def run_empty(x):
        return pl.pallas_call(
            k_empty,
            grid=(NW,),
            in_specs=[pl.BlockSpec((B, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        )(x)

    only = os.environ.get("PROBE_ONLY")
    if only == "empty":
        timed("empty", run_empty)
        return
    if not only or only == "const":
        timed("const", run_const, wbig)
    if not only or only == "clamp":
        timed("clamp", run_clamp, *ws)
    if not only or only == "manual":
        timed("manual", run_manual, *ws)


if __name__ == "__main__":
    main()
