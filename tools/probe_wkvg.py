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
    PROBE_VAR=bform   math in the WINDOW's native (B, Hc, N, N) layout
                      (no 2MB state swapaxes; vectors relayouted)
    PROBE_VAR=slab    state window stored as a 2-D (B*N, Hc*N) slab:
                      every elementwise op runs on full 512 lanes and
                      the per-head segment reductions/broadcasts become
                      tiny MXU matmuls against 0/1 block masks

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
    svals_np = rng.standard_normal((RING, B, Hc, N, N)) * 0.1
    svals = jnp.asarray(svals_np, jnp.float32)
    vecs_np = rng.standard_normal((7, B, GW)) * 0.1
    vecs = jnp.asarray(vecs_np, jnp.float32)
    vecs4 = jnp.asarray(
        np.moveaxis(vecs_np.reshape(7, B, Hc, N), 2, 1),
        jnp.float32)  # (7, Hc, B, N) pre-shaped
    vecsB = jnp.asarray(vecs_np.reshape(7, B, Hc, N), jnp.float32)
    # slab layout: state[(b*N+i), (h*N+j)]; i-indexed v2 as (B*N, Hc)
    sslab = jnp.asarray(
        np.moveaxis(svals_np, 2, 3).reshape(RING, B * N, GW), jnp.float32)
    v2i = jnp.asarray(
        np.moveaxis(vecs_np[6].reshape(B, Hc, N), 1, 2).reshape(B * N, Hc),
        jnp.float32)
    bones_np = np.zeros((GW, Hc), np.float32)
    for h in range(Hc):
        bones_np[h * N:(h + 1) * N, h] = 1.0
    bones = jnp.asarray(bones_np)          # (GW, Hc) block mask
    bonesT = jnp.asarray(bones_np.T)       # (Hc, GW)

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

    def body_bform(s_in, vB_ref, yg, oac, s_out):
        """Math in the window's native (B, Hc, N, N) layout: no state
        swapaxes at all; vectors arrive (B, Hc, N)."""
        def vb(i):                               # (B, Hc, 1, N)
            return vB_ref[i][:, :, None, :]

        kk4 = vb(0)
        kk4 = kk4 / jnp.maximum(
            jnp.sqrt(jnp.sum(kk4 * kk4, -1, keepdims=True)), 1e-12)
        kk4 = kk4.astype(cd).astype(jnp.float32)
        r4 = vb(4).astype(cd).astype(jnp.float32)
        v24 = jnp.swapaxes(vb(6), -1, -2)        # (B, Hc, N, 1): i
        s = s_in[...]
        skk = jnp.sum(s * kk4, axis=-1, keepdims=True)
        s_new = s * vb(1) - skk * (kk4 * vb(2)) + v24 * vb(3)
        s_out[0] = s_new
        y = jnp.sum(s_new * r4, axis=-1)         # (B, Hc, N)
        mean = jnp.mean(y, -1, keepdims=True)
        vvar = jnp.var(y, -1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(vvar + GN_EPS)
        rksum = jnp.sum(vb(5), axis=-1)          # (B, Hc, 1)
        ob = rksum * v24[..., 0]                 # (B, Hc, N)
        # (B, Hc, N) i-lanes -> (B, GW) via (Hc, N, 2B)->(GW, 2B)->T.
        o = jnp.swapaxes(jnp.concatenate([yn, ob], axis=0), 0, 1)
        o = jnp.swapaxes(o, -1, -2)              # (Hc, N, 2B)
        o = jnp.transpose(o.reshape(GW, 2 * B))  # (2B, GW)
        yg[...] = o[:B]
        oac[...] = o[B:]

    def body_slab(s_in, v_ref, v2i_ref, bo_ref, boT_ref, yg, oac, s_out):
        """State as a 2-D (B*N, Hc*N) slab: full 512-lane elementwise
        ops; per-head-segment reductions/broadcasts via tiny MXU dots
        against 0/1 block masks."""
        BN = B * N

        def vj(i):                               # j-vec -> (BN, GW)
            v = v_ref[i][:, None, :]             # (B, 1, GW)
            return jnp.broadcast_to(v, (B, N, GW)).reshape(BN, GW)

        bo = bo_ref[...]                         # (GW, Hc)
        boT = boT_ref[...]                       # (Hc, GW)

        def seg_sum(x):                          # (BN, GW) -> (BN, Hc)
            return jnp.dot(x, bo, preferred_element_type=jnp.float32)

        def seg_bcast(x):                        # (BN, Hc) -> (BN, GW)
            return jnp.dot(x, boT, preferred_element_type=jnp.float32)

        kk = vj(0)
        nrm = seg_bcast(seg_sum(kk * kk))
        kk = kk / jnp.maximum(jnp.sqrt(nrm), 1e-12)
        kk = kk.astype(cd).astype(jnp.float32)
        r = vj(4).astype(cd).astype(jnp.float32)
        v2b = seg_bcast(v2i_ref[...])            # (BN, GW): i-indexed
        s = s_in[...]                            # (BN, GW)
        skk = seg_bcast(seg_sum(s * kk))
        s_new = s * vj(1) - skk * (kk * vj(2)) + v2b * vj(3)
        s_out[0] = s_new
        y = seg_sum(s_new * r)                   # (BN, Hc)
        # groupnorm over i within (b, h): rows b*N..b*N+N-1 per col.
        y3 = y.reshape(B, N, Hc)
        mean = jnp.mean(y3, axis=1, keepdims=True)
        vvar = jnp.var(y3, axis=1, keepdims=True)
        yn = ((y3 - mean) * jax.lax.rsqrt(vvar + GN_EPS)).reshape(BN, Hc)
        rksum = seg_sum(vj(5))                   # (BN, Hc) (const in i)
        ob = rksum * v2i_ref[...]                # (BN, Hc)
        # (BN, Hc) i-rows -> (B, GW) lane layout: T -> (Hc, B, N) ->
        # minor swap -> (Hc, N, B) -> (GW, B) -> T.
        o = jnp.transpose(jnp.concatenate([yn, ob], axis=1))  # (2Hc, BN)
        o = o.reshape(2 * Hc, B, N)
        o = jnp.swapaxes(o, -1, -2)              # (2Hc, N, B)
        o = jnp.transpose(o.reshape(2 * GW, B))  # (B, 2GW)
        yg[...] = o[:, :GW]
        oac[...] = o[:, GW:]

    def make_kernel(variant):
        if variant == "slab":
            def kernel(sv_ref, v_ref, v2i_ref, bo_ref, boT_ref,
                       yg_ref, oac_ref, sout_ref, yg_scr, oac_scr):
                body_slab(sv_ref[0], v_ref, v2i_ref, bo_ref, boT_ref,
                          yg_scr, oac_scr, sout_ref)
                yg_ref[...] = yg_scr[...]
                oac_ref[...] = oac_scr[...]
            return kernel

        def kernel(sv_ref, v_ref, v4_ref, yg_ref, oac_ref, sout_ref,
                   yg_scr, oac_scr):
            i = pl.program_id(0)

            if variant == "pass":
                sout_ref[0] = sv_ref[0]
                yg_ref[...] = v_ref[0]
                oac_ref[...] = v_ref[1]
                return

            def body():
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
                elif variant == "bform":
                    body_bform(sv_ref[0], v4_ref, yg_scr, oac_scr,
                               sout_ref)
                yg_ref[...] = yg_scr[...]
                oac_ref[...] = oac_scr[...]

            if not PRED:
                body()
                return
            # PROBE_PRED mode: mimic the INTEGRATED phased kernel's
            # conditions — the body runs under pl.when on 1 of PH grid
            # steps, the ring window index map is constant within each
            # PH-step "layer" (like the clamped windows), and the other
            # steps run a trivial predicated touch (like the dot tiles).
            if WIDE and variant == "tchain":
                # PROBE_WIDE: vectors arrive as LANE-SLICES of a wide
                # (B, NG*GW) array, with NG unrolled group bodies doing
                # the transpose chain + math and lane-sliced stores —
                # the integrated phased kernel's exact read/write
                # pattern inside its wkv phase.
                for g in range(NG):
                    @pl.when((i % PH == 0) & ((i // PH) % NG == g))
                    def _(g=g):
                        if WIDE == 4:      # unrolled bodies, narrow refs
                            body_tchain(sv_ref[0], v_ref, yg_scr,
                                        oac_scr, sout_ref)
                            yg_ref[...] = yg_scr[...]
                            oac_ref[...] = oac_scr[...]
                            return
                        gsl = slice(g * GW, (g + 1) * GW)
                        if WIDE == 3:      # narrow reads, sliced stores
                            stacked = jnp.concatenate(
                                [v_ref[j][:, 0:GW] for j in range(7)],
                                axis=0)
                        else:
                            stacked = jnp.concatenate(
                                [v_ref[j][:, gsl] for j in range(7)],
                                axis=0)
                        t = jnp.transpose(stacked)
                        t = t.reshape(Hc, N, 7 * B)
                        t = jnp.swapaxes(t, -1, -2)

                        def v4(j):
                            return t[:, j * B:(j + 1) * B][:, :, None, :]

                        if WIDE == 2:      # sliced reads, narrow stores
                            _math(jnp.swapaxes(sv_ref[0], 0, 1), v4,
                                  yg_scr.at[:, 0:GW], oac_scr.at[:, 0:GW],
                                  sout_ref, True)
                            yg_ref[...] = yg_scr[:, 0:GW]
                            oac_ref[...] = oac_scr[:, 0:GW]
                        else:
                            _math(jnp.swapaxes(sv_ref[0], 0, 1), v4,
                                  yg_scr.at[:, gsl], oac_scr.at[:, gsl],
                                  sout_ref, True)
                            yg_ref[...] = yg_scr[:, gsl]
                            oac_ref[...] = oac_scr[:, gsl]
            else:
                pl.when(i % PH == 0)(body)

            @pl.when(i % PH == 1)
            def _():
                yg_ref[...] = yg_ref[...] * 1.0000001

        return kernel

    PRED = os.environ.get("PROBE_PRED") == "1"
    PH = int(os.environ.get("PROBE_PH", "13"))
    WIDE = int(os.environ.get("PROBE_WIDE", "0"))
    NG = int(os.environ.get("PROBE_NG", "5"))
    vecs_wide = jnp.asarray(np.tile(vecs_np, (1, 1, NG)), jnp.float32)

    def ring_spec():
        if PRED:
            return pl.BlockSpec(
                (1, B, Hc, N, N),
                lambda i: ((i // PH) % RING, 0, 0, 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, B, Hc, N, N), lambda i: (i % RING, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def slab_spec():
        return pl.BlockSpec((1, B * N, GW), lambda i: (i % RING, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    out2 = [pl.BlockSpec((B, GW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)] * 2
    shp2 = [jax.ShapeDtypeStruct((B, GW), jnp.float32)] * 2

    interp = os.environ.get("PROBE_INTERPRET") == "1"

    @functools.partial(jax.jit, static_argnames=("variant", "n"))
    def run(variant="loop", n=steps):
        if variant == "slab":
            return pl.pallas_call(
                make_kernel(variant),
                grid=(n,),
                in_specs=[slab_spec(), const_spec(vecs), const_spec(v2i),
                          const_spec(bones), const_spec(bonesT)],
                out_specs=out2 + [slab_spec()],
                out_shape=shp2 + [jax.ShapeDtypeStruct(sslab.shape,
                                                       jnp.float32)],
                scratch_shapes=[pltpu.VMEM((B, GW), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interp,
            )(sslab, vecs, v2i, bones, bonesT)
        v3 = vecsB if variant == "bform" else vecs4
        vin = vecs_wide if (WIDE in (1, 2, 3) and variant == "tchain" and PRED) else vecs
        scr_w = NG * GW if (WIDE in (1, 2, 3) and variant == "tchain" and PRED) else GW
        return pl.pallas_call(
            make_kernel(variant),
            grid=(n * PH,) if PRED else (n,),
            in_specs=[ring_spec(), const_spec(vin), const_spec(v3)],
            out_specs=out2 + [ring_spec()],
            out_shape=shp2 + [jax.ShapeDtypeStruct(svals.shape,
                                                   jnp.float32)],
            scratch_shapes=[pltpu.VMEM((B, scr_w), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(svals, vecs, v3)

    def sout_as_bhnn(v, arr):
        if v == "slab":
            return np.moveaxis(np.asarray(arr).reshape(B, N, Hc, N), 1, 2)
        return np.asarray(arr)

    all_vars = ["pass", "loop", "tchain", "math", "bform", "slab"]
    which = [var] if var != "all" else all_vars

    # Correctness cross-check vs loop (single step each).  A variant
    # Mosaic can't compile (e.g. an unsupported shape cast) is reported
    # and dropped instead of aborting the race.
    check = sorted({x for x in which + ["loop"] if x != "pass"})
    outs = {}
    failed = set()
    for v in check:
        try:
            o = run(variant=v, n=1)
            jax.block_until_ready(o[0])
        except Exception as e:
            failed.add(v)
            msg = str(e).splitlines()[0][:160]
            print(f"{v}: COMPILE/RUN FAILED — {msg}", file=sys.stderr,
                  flush=True)
            continue
        outs[v] = [np.asarray(o[0]), np.asarray(o[1]),
                   sout_as_bhnn(v, o[2][0])]
    which = [v for v in which if v not in failed]
    base = outs.get("loop")
    if base is not None:
        for v, o in outs.items():
            if v == "loop":
                continue
            dy = np.max(np.abs(o[0] - base[0]))
            do = np.max(np.abs(o[1] - base[1]))
            ds = np.max(np.abs(o[2] - base[2]))
            print(f"{v} vs loop: d_yg={dy:.2e} d_oa={do:.2e} "
                  f"d_s={ds:.2e}", file=sys.stderr)

    n1, n2 = steps, 5 * steps
    timed = 0
    for v in which:
        ts = {}
        try:
            for n in (n1, n2):
                o = run(variant=v, n=n)
                jax.block_until_ready(o[0])
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    o = run(variant=v, n=n)
                    jax.block_until_ready(o[0])
                    best = min(best, time.time() - t0)
                ts[n] = best
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"{v}: TIMING FAILED — {msg}", file=sys.stderr,
                  flush=True)
            continue
        dt = (ts[n2] - ts[n1]) / (n2 - n1)
        timed += 1
        print(f"{v}: {dt*1e6:.1f} us/step  [raw {ts[n1]*1e3:.1f}/"
              f"{ts[n2]*1e3:.1f}ms]", flush=True)
    if not timed:
        print("probe: no variant produced timings", file=sys.stderr,
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
