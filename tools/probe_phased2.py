"""Bisect the phased decode kernel's DMA slowdown.

The full phased kernel streams at ~68 GB/s while a probe with the same
window geometry (probe_pipeline.py) hits ~712 GB/s, and stripping all
compute (AI00_PHASED_ABLATE=dma) does not help — so some piece of the
SPEC STRUCTURE degrades DMA 10x.  This probe rebuilds the kernel's spec
structure from synthetic arrays, adding one suspect at a time:

    PROBE_FEAT=base        6 clamped weight windows, 2-D grid (L, W)
    PROBE_FEAT=flat        same but flattened 1-D grid (L*W,)
    PROBE_FEAT=smalls      base + 13 per-layer lspec inputs
    PROBE_FEAT=state       base + wkv/att/ffn state windows in+out
                           (with input_output_aliases)
    PROBE_FEAT=full        everything (= the real kernel's structure)

Timing is slope-based (two chain lengths) so tunnel RTT cancels.
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

    feat = os.environ.get("PROBE_FEAT", "base")
    B = int(os.environ.get("PROBE_BATCH", "16"))
    L = int(os.environ.get("PROBE_LAYERS", "4"))
    C = int(os.environ.get("PROBE_EMB", "1024"))
    na = int(os.environ.get("PROBE_NA", "2"))
    reps = int(os.environ.get("PROBE_REPS", "20"))
    F = 4 * C
    H, N = C // 64, 64
    Hc = min(8, H)
    ng = H // Hc
    nf = 4 * na
    Kt, Ktf, Ktv = C // na, C // nf, F // nf
    W = 12 * na + ng

    # Generate ON DEVICE: host numpy RNG at 7B geometry (13 GB) takes
    # ~40 min on the single-core bench host.  PROBE_WDTYPE=int8 matches
    # the real quantized kernel's stored width.
    rng = np.random.default_rng(0)
    wdtype = dict(int8=jnp.int8, bf16=jnp.bfloat16)[
        os.environ.get("PROBE_WDTYPE", "bf16")]
    _key = [0]

    def mk(shape, dtype=None):
        dtype = dtype or wdtype
        _key[0] += 1

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def gen(k, shape, dtype):
            if dtype == jnp.int8:
                return jax.random.randint(k, shape, -127, 128, jnp.int32
                                          ).astype(jnp.int8)
            return (jax.random.normal(k, shape, jnp.float32) * 0.01
                    ).astype(dtype)

        return gen(jax.random.PRNGKey(_key[0]), tuple(shape), dtype)

    att = {k: mk((L, C, C)) for k in ("Wr", "Wk", "Wv", "Wo")}
    ffn = {"fkey": mk((L, C, F)), "fval": mk((L, F, C))}
    big = {**att, **ffn}
    smalls = {f"s{i}": mk((L, 8, C), jnp.bfloat16) for i in range(13)}
    wkv = mk((L, B, H, N, N), jnp.float32)
    att_x = mk((L, B, C), jnp.float32)
    ffn_x = mk((L, B, C), jnp.float32)
    x0 = mk((B, C), jnp.bfloat16)

    with_smalls = feat in ("smalls", "full")
    with_state = feat in ("state", "full")
    flat = feat == "flat"

    total_bytes = sum(int(v.size) * v.dtype.itemsize for v in big.values())
    if with_smalls:
        total_bytes += sum(int(v.size) * 2 for v in smalls.values())
    if with_state:
        total_bytes += (wkv.size + att_x.size + ffn_x.size) * 4

    ranges = {"Wr": (0, na, Kt), "Wk": (na, na, Kt), "Wv": (2 * na, na, Kt),
              "Wo": (3 * na + ng, na, Kt),
              "fkey": (4 * na + ng, nf, Ktf), "fval": (8 * na + ng, nf, Ktv)}

    def lw(idx):
        """(l, w) from grid ids."""
        if flat:
            i = pl.program_id(0)
            return i // W, i % W
        return pl.program_id(0), pl.program_id(1)

    def kernel(*refs):
        n_in = 1 + len(big) + (len(smalls) if with_smalls else 0) \
            + (3 if with_state else 0)
        ins = refs[:n_in]
        outs = refs[n_in:]
        xout_ref = outs[0]

        def _touch(ref):
            v = ref[...].astype(jnp.float32)
            while v.ndim > 2:
                v = jnp.sum(v, axis=0)
            return jnp.sum(jnp.sum(v, axis=0, keepdims=True),
                           axis=1, keepdims=True)

        tot = None
        for r in ins:
            t = _touch(r)
            tot = t if tot is None else tot + t
        if with_state:
            # outputs: copy the state windows through (in-place stream)
            base = 1 + len(big) + (len(smalls) if with_smalls else 0)
            att_in, wkv_in, ffn_in = ins[base], ins[base + 1], ins[base + 2]
            outs[1][...] = wkv_in[...]
            outs[2][...] = att_in[...]
            outs[3][...] = ffn_in[...]
        xout_ref[0:1, 0:1] = (xout_ref[0:1, 0:1].astype(jnp.float32)
                              + tot).astype(xout_ref.dtype)

    def imap_wrap(f):
        if flat:
            def g(i):
                return f(i // W, i % W)
            return g
        return f

    def win_spec(name, arr):
        lo, count, rows = ranges[name]

        def imap(l, w):
            t = jnp.clip(w - lo, 0, count - 1)
            return (l, t, 0)

        return pl.BlockSpec((1, rows, arr.shape[2]), imap_wrap(imap),
                            memory_space=pltpu.VMEM)

    def lspec(arr):
        blk = (1,) + arr.shape[1:]
        nd = len(blk) - 1

        def imap(l, w, _nd=nd):
            return (l,) + (0,) * _nd

        return pl.BlockSpec(blk, imap_wrap(imap), memory_space=pltpu.VMEM)

    def wkv_spec():
        def imap(l, w):
            g = jnp.clip(w - 3 * na, 0, ng - 1)
            return (l, 0, g, 0, 0)

        return pl.BlockSpec((1, B, Hc, N, N), imap_wrap(imap),
                            memory_space=pltpu.VMEM)

    in_arrays = [x0]
    in_specs = [pl.BlockSpec((B, C), imap_wrap(lambda l, w: (0, 0)),
                             memory_space=pltpu.VMEM)]
    for k in ("Wr", "Wk", "Wv", "Wo", "fkey", "fval"):
        in_arrays.append(big[k])
        in_specs.append(win_spec(k, big[k]))
    if with_smalls:
        for k, v in smalls.items():
            in_arrays.append(v)
            in_specs.append(lspec(v))
    io_alias = {}
    out_shape = [jax.ShapeDtypeStruct((B, C), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((B, C), imap_wrap(lambda l, w: (0, 0)),
                              memory_space=pltpu.VMEM)]
    if with_state:
        in_arrays += [att_x, wkv, ffn_x]
        in_specs += [lspec(att_x), wkv_spec(), lspec(ffn_x)]
        out_shape += [jax.ShapeDtypeStruct(wkv.shape, jnp.float32),
                      jax.ShapeDtypeStruct(att_x.shape, jnp.float32),
                      jax.ShapeDtypeStruct(ffn_x.shape, jnp.float32)]
        out_specs += [wkv_spec(), lspec(att_x), lspec(ffn_x)]
        nin = len(in_arrays)
        io_alias = {nin - 2: 1}   # wkv in-place

    grid = (L * W,) if flat else (L, W)

    @jax.jit
    def run(x0, *arrs):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=io_alias,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x0, *arrs)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x0, *arrs, n=reps):
        def body(i, carry):
            xc, acc = carry
            outs = run(xc, *arrs)
            out = outs[0] if isinstance(outs, (tuple, list)) else outs
            xc = xc + out * jnp.bfloat16(1e-8)
            return (xc, acc + out[0:1, 0:1].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, (x0, jnp.zeros((1, 1),
                                                            jnp.float32)))

    arrs = in_arrays[1:]
    n1, n2 = reps, 5 * reps
    ts = {}
    for n in (n1, n2):
        # block_until_ready does NOT wait through the axon tunnel (see
        # probe_decode.py) — only a device->host transfer syncs.
        o = chain(x0, *arrs, n=n)
        np.asarray(o[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            o = chain(x0, *arrs, n=n)
            np.asarray(o[1])
            best = min(best, time.time() - t0)
        ts[n] = best
    dt = (ts[n2] - ts[n1]) / (n2 - n1)
    bw = total_bytes / dt / 1e9
    print(f"{feat}: {dt*1e3:.3f} ms  ({bw:.0f} GB/s)  grid={grid} "
          f"bytes={total_bytes/1e6:.0f}MB  [raw {ts[n1]*1e3:.1f}/"
          f"{ts[n2]*1e3:.1f}ms]  acc={float(np.asarray(o[1])[0, 0]):.4g}")


if __name__ == "__main__":
    main()
