"""Race WKV head-group body variants in a standalone Pallas kernel.

The phased kernel's WKV group step costs ~390us at 2.86B geometry
(Hc=8, B=16, N=64) while its weight-window DMA budget is ~5us/step;
both the per-head-loop form and the stacked-MXU-transpose form measure
the same, so the cost sits in the state math / relayouts themselves.
This probe isolates ONE group step in a tiny kernel (grid=(reps,),
state window revolving over a ring to keep DMA realistic) and times
variants:

    PROBE_VAR=loop    per-head python loop (the fused kernel's form)
    PROBE_VAR=tchain  stacked MXU-transpose relayout + (Hc,B,N,N) math
    PROBE_VAR=pass    read state, write it back (DMA/layout floor)
    PROBE_VAR=math    tchain minus the relayouts: vectors arrive
                      pre-shaped (Hc, B, N) (upper bound on the win)

Timing: slope of two chain lengths (tunnel RTT cancels).
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

    var = os.environ.get("PROBE_VAR", "loop")
    B = int(os.environ.get("PROBE_BATCH", "16"))
    Hc = 8
    N = 64
    GW = Hc * N
    RING = 16          # state ring slots so the window DMA is real
    steps = int(os.environ.get("PROBE_STEPS", "64"))
    cd = jnp.bfloat16

    rng = np.random.default_rng(0)
    svals = jnp.asarray(rng.standard_normal((RING, B, Hc, N, N)) * 0.1,
                        jnp.float32)
    vecs = jnp.asarray(rng.standard_normal((7, B, GW)) * 0.1, jnp.float32)
    vecs4 = jnp.asarray(
        np.moveaxis(np.asarray(vecs).reshape(7, B, Hc, N), 2, 1),
        jnp.float32)  # (7, Hc, B, N) pre-shaped

    GN_EPS = 64e-5

    def body_loop(s_in, vref, yg, oac, s_out):
        for hh in range(Hc):
            sl = slice(hh * N, (hh + 1) * N)
            kk_h = vref[0][:, sl]
            kk_h = kk_h / jnp.maximum(
                jnp.sqrt(jnp.sum(kk_h * kk_h, -1, keepdims=True)), 1e-12)
            kk_h = kk_h.astype(cd).astype(jnp.float32)
            s = s_in[:, hh]
            skk = jnp.sum(s * kk_h[:, None, :], axis=-1)
            s_new = (s * vref[1][:, sl][:, None, :]
                     - skk[:, :, None]
                     * (kk_h * vref[2][:, sl])[:, None, :]
                     + vref[6][:, sl][:, :, None]
                     * vref[3][:, sl][:, None, :])
            s_out[0, :, hh] = s_new
            r = vref[4][:, sl].astype(cd).astype(jnp.float32)
            y_h = jnp.sum(s_new * r[:, None, :], axis=-1)
            mean = jnp.mean(y_h, -1, keepdims=True)
            vvar = jnp.var(y_h, -1, keepdims=True)
            yg[:, sl] = (y_h - mean) * jax.lax.rsqrt(vvar + GN_EPS)
            oac[:, sl] = jnp.sum(vref[5][:, sl], -1, keepdims=True) \
                * vref[6][:, sl]

    def body_tchain(s_in, vref, yg, oac, s_out):
        stacked = jnp.concatenate([vref[i] for i in range(7)], axis=0)
        t = jnp.transpose(stacked)
        t = t.reshape(Hc, N, 7 * B)
        t = jnp.swapaxes(t, -1, -2)        # (Hc, 7B, N)

        def v4(i):
            return t[:, i * B:(i + 1) * B][:, :, None, :]

        _math(jnp.swapaxes(s_in[...], 0, 1), v4, yg, oac, s_out, True)

    def _math(s, v4, yg, oac, s_out, back):
        kk4 = v4(0)
        kk4 = kk4 / jnp.maximum(
            jnp.sqrt(jnp.sum(kk4 * kk4, -1, keepdims=True)), 1e-12)
        kk4 = kk4.astype(cd).astype(jnp.float32)
        r4 = v4(4).astype(cd).astype(jnp.float32)
        v24 = jnp.swapaxes(v4(6), -1, -2)
        skk = jnp.sum(s * kk4, axis=-1, keepdims=True)
        s_new = s * v4(1) - skk * (kk4 * v4(2)) + v24 * v4(3)
        s_out[0] = jnp.swapaxes(s_new, 0, 1) if back else s_new
        y = jnp.sum(s_new * r4, axis=-1)
        mean = jnp.mean(y, -1, keepdims=True)
        vvar = jnp.var(y, -1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(vvar + GN_EPS)
        rksum = jnp.sum(v4(5), axis=-1)
        ob = rksum * v24[..., 0]
        o = jnp.swapaxes(jnp.concatenate([yn, ob], axis=1), -1, -2)
        o = jnp.transpose(o.reshape(GW, 2 * B))
        yg[...] = o[:B]
        oac[...] = o[B:]

    def make_kernel(variant):
        def kernel(sv_ref, v_ref, v4_ref, yg_ref, oac_ref, sout_ref,
                   yg_scr, oac_scr):
            i = pl.program_id(0)

            if variant == "pass":
                sout_ref[0] = sv_ref[0]
                yg_ref[...] = v_ref[0]
                oac_ref[...] = v_ref[1]
                return

            if variant == "loop":
                body_loop(sv_ref[0], v_ref, yg_scr, oac_scr, sout_ref)
            elif variant == "tchain":
                body_tchain(sv_ref[0], v_ref, yg_scr, oac_scr,
                            sout_ref)
            elif variant == "math":
                def v4(j):
                    return v4_ref[j][:, :, None, :]
                _math(jnp.swapaxes(sv_ref[0], 0, 1), v4,
                      yg_scr, oac_scr, sout_ref, True)
            yg_ref[...] = yg_scr[...]
            oac_ref[...] = oac_scr[...]
        return kernel

    def ring_spec():
        return pl.BlockSpec((1, B, Hc, N, N), lambda i: (i % RING, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    @functools.partial(jax.jit, static_argnames=("variant", "n"))
    def run(sv, vecs, vecs4, variant="loop", n=steps):
        return pl.pallas_call(
            make_kernel(variant),
            grid=(n,),
            in_specs=[ring_spec(),
                      pl.BlockSpec(vecs.shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(vecs4.shape, lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((B, GW), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((B, GW), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       ring_spec()],
            out_shape=[jax.ShapeDtypeStruct((B, GW), jnp.float32),
                       jax.ShapeDtypeStruct((B, GW), jnp.float32),
                       jax.ShapeDtypeStruct(sv.shape, jnp.float32)],
            scratch_shapes=[pltpu.VMEM((B, GW), jnp.float32),
                            pltpu.VMEM((B, GW), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(sv, vecs, vecs4)

    # Correctness cross-check loop vs tchain vs math (single step each).
    outs = {}
    for v in ("loop", "tchain", "math"):
        o = run(svals, vecs, vecs4, variant=v, n=1)
        jax.block_until_ready(o[0])
        outs[v] = [np.asarray(x) for x in o]
    for v in ("tchain", "math"):
        dy = np.max(np.abs(outs[v][0] - outs["loop"][0]))
        ds = np.max(np.abs(outs[v][2][0] - outs["loop"][2][0]))
        print(f"{v} vs loop: d_yg={dy:.2e} d_s={ds:.2e}", file=sys.stderr)

    which = [var] if var != "all" else ["pass", "loop", "tchain", "math"]
    n1, n2 = steps, 5 * steps
    for v in which:
        ts = {}
        for n in (n1, n2):
            o = run(svals, vecs, vecs4, variant=v, n=n)
            jax.block_until_ready(o[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                o = run(svals, vecs, vecs4, variant=v, n=n)
                jax.block_until_ready(o[0])
                best = min(best, time.time() - t0)
            ts[n] = best
        dt = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{v}: {dt*1e6:.1f} us/step  [raw {ts[n1]*1e3:.1f}/"
              f"{ts[n2]*1e3:.1f}ms]")


if __name__ == "__main__":
    main()
