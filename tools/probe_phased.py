"""Probe the phased whole-layer decode kernel on the real chip.

Usage:
    python tools/probe_phased.py                 # small compile check
    PROBE_EMB=2560 PROBE_LAYERS=32 python tools/probe_phased.py
    PROBE_QUANT=int8 PROBE_EMB=4096 PROBE_LAYERS=32 ...   # 7B-class

Compares the phased kernel against the generic forward at T=1 (values +
chained step timing via a device-side fori-style chain of real steps).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import build_model

    version = os.environ.get("PROBE_VERSION", "V7").upper()
    if version == "V7":
        from ai00_server_tpu.models import v7 as vmod
        from ai00_server_tpu.ops import v7_decode_pallas as fd
        from ai00_server_tpu.ops import v7_phased_pallas as pd

        def can_phase(params, batch):
            return pd.can_phase(params, batch)

        def phased_t1(p, state, tok, lens, na):
            return pd.forward_t1(p, state, tok, lens, na=na)
    else:
        from ai00_server_tpu.ops import v56_phased_pallas as pd

        if version == "V5":
            from ai00_server_tpu.models import v5 as vmod
            from ai00_server_tpu.ops import v5_decode_pallas as fd
        else:
            from ai00_server_tpu.models import v6 as vmod
            from ai00_server_tpu.ops import v6_decode_pallas as fd

        def can_phase(params, batch):
            return pd.can_phase(params, batch, version)

        def phased_t1(p, state, tok, lens, na):
            return pd.forward_t1(p, state, tok, lens, version, na=na)

    B = int(os.environ.get("PROBE_BATCH", "16"))
    L = int(os.environ.get("PROBE_LAYERS", "4"))
    C = int(os.environ.get("PROBE_EMB", "1024"))
    V = int(os.environ.get("PROBE_VOCAB", "65536"))
    quant = os.environ.get("PROBE_QUANT") or None
    steps = int(os.environ.get("PROBE_STEPS", "32"))

    t0 = time.time()
    model, info = build_model(L, C, 64, V, jnp.bfloat16, quant=quant,
                              version=version)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)
    params = model.params
    if model.surrogate_modes is None:
        from ai00_server_tpu.ops import quant as qm

        if qm.use_int8_surrogate():
            model.surrogate_modes = qm.surrogate_group(params)
    assert can_phase(params, B), "can_phase rejected this shape"
    mode, Cg, F, H, N = (pd._geometry(params) if version == "V7"
                         else pd._geometry(params, version))
    esz = 1 if mode == "int8" else 2
    na = int(os.environ.get("PROBE_NA", "0")) or (
        pd.pick_na(Cg, F, H, N, B, esz) if version == "V7"
        else pd.pick_na(Cg, F, H, N, B, esz, version))
    print(f"mode={mode} C={Cg} F={F} H={H} na={na}", file=sys.stderr)
    params = dict(params)
    params[fd.FUSED_KEY] = fd.make_fused_layout(model.params)

    rng = np.random.default_rng(0)
    state = vmod.init_state(info, B, jnp.float32)
    toks = jnp.asarray(rng.integers(0, V, (B, 5)), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    _, state = jax.jit(vmod.forward)(model.params, state, toks, lens)
    jax.block_until_ready(state["wkv"])

    t1 = jnp.asarray(rng.integers(0, V, (B, 1)), jnp.int32)
    l1 = jnp.ones((B,), jnp.int32)

    # Correctness vs the generic path (single step).
    if not os.environ.get("PROBE_SKIP_REF"):
        os.environ["AI00_FUSED_DECODE"] = "off"  # force generic reference
        h_ref, s_ref = jax.jit(vmod.forward)(model.params, state, t1, l1)
        os.environ.pop("AI00_FUSED_DECODE", None)
        t0 = time.time()
        h_p, s_p = phased_t1(params, state, t1, l1, na)
        jax.block_until_ready(h_p)
        print(f"phased compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        dh = float(jnp.max(jnp.abs(h_p.astype(jnp.float32)
                                   - h_ref.astype(jnp.float32))))
        ds = float(jnp.max(jnp.abs(s_p["wkv"] - s_ref["wkv"])))
        hs = float(jnp.max(jnp.abs(h_ref.astype(jnp.float32))))
        ss = float(jnp.max(jnp.abs(s_ref["wkv"])))
        print(f"max|dh|={dh:.4g} (ref max {hs:.4g})  max|dwkv|={ds:.4g} "
              f"(ref max {ss:.4g})", file=sys.stderr)

    # Chained timing: feed argmax token back in, N steps, at TWO chain
    # lengths — the slope (t2-t1)/(n2-n1) cancels the 30-114 ms tunnel
    # dispatch RTT that would otherwise swamp sub-ms steps.  Params are
    # ARGUMENTS (closure constants embed in the remote-compile payload
    # and trip its ~100 MB limit — .claude/skills/verify).
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_phased(p, state, tok, n=steps):
        def body(i, carry):
            state, tok = carry
            h, state = phased_t1(p, state, tok, l1, na)
            nt = jnp.argmax(
                jnp.dot(h[:, 0], p["head"].astype(h.dtype)),
                axis=-1).astype(jnp.int32)[:, None]
            return (state, nt)
        return jax.lax.fori_loop(0, n, body, (state, tok))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_generic(p, state, tok, n=steps):
        def body(i, carry):
            state, tok = carry
            h, state = vmod.forward(p, state, tok, l1)
            nt = jnp.argmax(
                jnp.dot(h[:, 0], p["head"].astype(h.dtype)),
                axis=-1).astype(jnp.int32)[:, None]
            return (state, nt)
        return jax.lax.fori_loop(0, n, body, (state, tok))

    which = os.environ.get("PROBE_ONLY", "")
    runs = [("phased", chain_phased, params),
            ("generic", chain_generic, model.params)]
    n1, n2 = steps, 3 * steps
    for name, fn, p in runs:
        if which and name != which:
            continue
        ts = {}
        compile_s = 0.0
        for n in (n1, n2):
            t0 = time.time()
            out = fn(p, state, t1, n=n)
            jax.block_until_ready(out[1])
            compile_s += time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = fn(p, state, t1, n=n)
                jax.block_until_ready(out[1])
                best = min(best, time.time() - t0)
            ts[n] = best
        dt = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{name}: {dt*1e3:.2f} ms/step ({B/dt:.0f} tok/s)  "
              f"[raw {ts[n1]*1e3:.0f}/{ts[n2]*1e3:.0f}ms, "
              f"compile {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
