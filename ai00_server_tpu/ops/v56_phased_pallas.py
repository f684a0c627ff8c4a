"""Phased whole-layer single-token (T=1) decode kernel for RWKV v5/v6.

Same design as the v7 phased kernel (ops/v7_phased_pallas.py, see its
docstring): ONE Pallas op for the whole decode step with a flat 1-D grid
of K-tiled weight windows per layer, so 7B-class v5/v6 models whose
layers exceed the fused whole-network kernel's VMEM window stream their
weights at HBM speed-of-light.  The WKV head-group body uses the
window-native (B, Hc, N, N) layout ("bform"), the winner of the
tools/probe_wkvg.py race (11.4 us/group-step vs 35.8 tchain, 8.4 floor).

Per-layer grid phases (W = 14*na + ng steps):

    w == 0              entry: ln1, token-shift mixes (v6: 5 low-rank
                        maa stages + data-dependent decay lora)
    [0,    na)          r_acc += xr[:, tile] @ Wr[tile]
    [na,  2na)          k_acc += xk[:, tile] @ Wk[tile]
    [2na, 3na)          v_acc += xv[:, tile] @ Wv[tile]
    [3na, 4na)          g_acc += xg[:, tile] @ Wg[tile]
    [4na, 4na+ng)       WKV + GroupNorm, 8 heads per step (state
                        window streams per group; y = r.(S + u*k^T v),
                        S' = w*S + k^T v)
    w == 4na+ng         epilogue: ln_x affine, SiLU(g) gate
    [.., +na)           o_acc += (yf*silu g)[:, tile] @ Wo[tile]
    w == 5na+ng         x += o_acc; ln2 -> fxk, fxr
    [.., +na)           rf_acc += fxr[:, tile] @ frec[tile]
    [6na+ng, +4na)      hk_acc += fxk[:, tile] @ fkey[tile]
    w == 10na+ng        hk = relu(hk_acc)^2 ; rf = sigmoid(rf_acc)
    [.., +4na)          f_acc += hk[:, tile] @ fval[tile]
    last                x += rf * f_acc

v5 and v6 share the projection/WKV/channel-mix structure; they differ
only in the entry phase (v5: static 1-mix token shift and precomputed
static decay; v6: data-dependent maa shift offsets and per-token decay)
— one kernel, parameterized by version.

Consumes the SAME ``params[FUSED_KEY]`` layout as the corresponding
fused whole-network kernel (ops/v5_decode_pallas.py /
v6_decode_pallas.py), so the engine installs one layout and picks the
kernel by size.  Reference capability: single-token decode of
``Runtime::infer`` (crates/ai00-core/src/run.rs:1120-1156) for v5/v6
checkpoints of any size (``ModelBuilder::build_v5/build_v6``,
crates/ai00-core/src/lib.rs:505-515) with ``Quant::Int8``
(reload.rs:23-27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import GN_EPS, LN_EPS
from .v7_phased_pallas import (
    HEAD_GROUP, _ESIZE, _acc_add, _big_entries, _dots_variant, _mono_dot,
    _tiled_dot,
)

_ATT = ("Wr", "Wk", "Wv", "Wg", "Wo")
_FFN = ("fkey", "frec", "fval")

_SMALL_V5 = ["mix", "vecs", "ln1", "ln2"]
_SMALL_V6 = (["mix"]
             + [f"mw1_{i}" for i in range(5)]
             + [f"mw2_{i}" for i in range(5)]
             + ["dw1", "dw2", "vecs", "ln1", "ln2"])


def _modules(version: str):
    if version == "V5":
        from . import v5_decode_pallas as fd

        return fd, _SMALL_V5
    from . import v6_decode_pallas as fd

    return fd, _SMALL_V6


def _geometry(params, version: str):
    from . import fused_decode as fdc

    fd, _ = _modules(version)
    layers = params["groups"][0]["layers"]
    mode = fdc.group_mode(layers, fd._BIG_SRC)
    att = layers["att"]
    first = att["first"] if version == "V6" else att["time_first"]
    H, N = first.shape[-2:]
    C = att["receptance"].shape[-2]
    F = layers["ffn"]["key"].shape[-1]
    return mode, C, F, H, N


def pick_na(C, F, H, N, batch, esize, version="V6",
            max_bytes=76 * 1024 * 1024):
    """Smallest tile count whose windows satisfy alignment and fit the
    VMEM budget; None if impossible.  Same constraints as the v7 kernel
    but with EIGHT double-buffered weight windows (five C x C att
    projections + three channel-mix matrices).

    The budget is deliberately below the 128 MB hardware VMEM: the v6
    body's extra lora/maa stages cost the register allocator ~15 MB of
    spill slots on top of the modeled windows (measured: the 7B v6 int8
    geometry at the old 92 MB budget picked na=4, modeled 88 MB, and
    Mosaic compiled it to 128.75 MB — 768 KB over hardware capacity;
    na=8 compiles and runs).  76 MB keeps ~comparable real headroom
    across geometries without modeling the spill term explicitly."""
    hc = min(HEAD_GROUP, H)
    # Per-layer smalls (double-buffered): mixes/ln/loras stay in MODEL
    # dtype (2 bytes) regardless of big-projection quantization (esize
    # covers only the weight windows), vecs f32, plus the v6 maa/decay
    # loras (12 arrays of C x 8-ish).
    lora = int(12 * (C * 8 + 8 * C) * 2) if version == "V6" else 0
    smalls = int(2 * ((6 * C + 4 * C) * 2 + 6 * C * 4 + lora))
    # 13 (B, C) + (B, F) + mono transposed staging (6 C-sized +
    # fxkT C-sized + hkT F-sized slabs).
    scratch = (13 * batch * C + batch * F
               + (7 * C + F) * batch) * 4
    state = 4 * batch * hc * N * N * 4 + 8 * batch * C * 4
    for na in range(1, 33):
        if C % na or (C // na) % 128:
            continue
        if C % (4 * na) or (C // (4 * na)) % 128:
            continue
        if F % (4 * na) or (F // (4 * na)) % 128:
            continue
        win = int((C * C // na) * esize)
        need = state + 16 * win + smalls + scratch
        if need <= max_bytes:
            return na
    return None


def can_phase(params, batch: int, version: str,
              na: int | None = None) -> bool:
    """Whether the phased kernel applies: one layer group, big
    projections plain or uniformly int8/int4 (NF4/SF4 models convert to
    int8 surrogate codes at load; int4 streams PACKED — ops/quant.py),
    square C = H*N, and a tile count exists whose windows align and fit
    VMEM."""
    if version not in ("V5", "V6") or len(params["groups"]) != 1:
        return False
    mode, C, F, H, N = _geometry(params, version)
    if mode not in _ESIZE:
        return False
    if C != H * N or N % 8 != 0:
        return False
    found = pick_na(C, F, H, N, batch, _ESIZE[mode], version)
    if found is None:
        return False
    return na is None or _na_ok(C, F, na)


def _na_ok(C, F, na):
    return not (C % na or (C // na) % 128 or C % (4 * na)
                or (C // (4 * na)) % 128 or F % (4 * na)
                or (F // (4 * na)) % 128)


def _kernel(H, N, na, F, compute_dtype, qmode, Hc, version, small_keys,
            vec_idx, dots="mono"):
    nf = 4 * na
    ng = H // Hc
    W = 14 * na + ng

    def kernel(*refs):
        (x0_ref, active_ref, att_x_ref, wkv_ref, ffn_x_ref) = refs[:5]
        idx = 5
        small = {}
        for k in small_keys:
            small[k] = refs[idx]
            idx += 1
        big = {}
        for k in _ATT + _FFN:
            big[k] = refs[idx]
            idx += 1
            if qmode in ("int8", "int4"):
                big[k + "_s"] = refs[idx]
                idx += 1
        (xout_ref, natt_x_ref, nwkv_ref, nffn_x_ref) = refs[idx:idx + 4]
        rest = refs[idx + 4:]
        (x_scr, xr_scr, xk_scr, xv_scr, xg_scr, yg_scr, racc, kacc, vacc,
         gacc, oacc, hk_scr, aux_scr) = rest[:13]
        if dots == "mono":
            (xrT, xkT, xvT, xgT, ygT, fxrT, fxkT, hkT) = rest[13:21]

        def stage_T(dst, src_scr, count, K):
            """(B, count*K) lane-layout scratch -> (count, K, B) slabs
            for traced-tile indexing (see v7_phased_pallas)."""
            for t in range(count):
                dst[t] = jnp.transpose(src_scr[:, t * K:(t + 1) * K])

        i = pl.program_id(0)
        l = i // W
        w = i % W
        cd = compute_dtype
        active = active_ref[:] > 0                    # (B, 1)
        B = x0_ref.shape[0]
        C = H * N
        Kt = C // na
        Ktf = C // nf
        Ktv = F // nf

        def vec(name):
            return small["vecs"][0][vec_idx[name]:vec_idx[name] + 1]

        def sref(name):
            return (big.get(name + "_s")
                    if qmode in ("int8", "int4") else None)

        # ---- layer entry: ln1, token-shift mixes (+ v6 loras) ----
        @pl.when(w == 0)
        def _():
            @pl.when(l == 0)
            def _():
                x_scr[:] = x0_ref[:].astype(jnp.float32)

            x = x_scr[:]
            ln1w = small["ln1"][0]
            ln1 = _ln(x, ln1w[0:1], ln1w[1:2], LN_EPS)
            prev = att_x_ref[0].astype(jnp.float32)
            xa_in = ln1.astype(cd)
            dx = (prev - ln1).astype(cd)
            mix = small["mix"][0]

            def dot(a, b):
                return jnp.dot(a, b.astype(cd),
                               preferred_element_type=jnp.float32)

            if version == "V5":
                # mix rows: 1 - time_mix_{k,v,r,g}; static decay (already
                # exponentiated at layout build).
                xk_scr[:] = (xa_in + dx * mix[0:1].astype(cd)
                             ).astype(jnp.float32)
                xv_scr[:] = (xa_in + dx * mix[1:2].astype(cd)
                             ).astype(jnp.float32)
                xr_scr[:] = (xa_in + dx * mix[2:3].astype(cd)
                             ).astype(jnp.float32)
                xg_scr[:] = (xa_in + dx * mix[3:4].astype(cd)
                             ).astype(jnp.float32)
                aux_scr[0] = jnp.broadcast_to(vec("wdec"), (B, C))
            else:
                # v6: mix rows mix_x, mix_w, mix_k, mix_v, mix_r, mix_g;
                # 5 maa stages (order w,k,v,r,g) and the decay lora.
                xxx = xa_in + dx * mix[0:1].astype(cd)
                m = []
                for f in range(5):
                    h = jnp.tanh(dot(xxx, small[f"mw1_{f}"][0])).astype(cd)
                    m.append(dot(h, small[f"mw2_{f}"][0]).astype(cd))
                xw = xa_in + dx * (mix[1:2].astype(cd) + m[0])
                xk_scr[:] = (xa_in + dx * (mix[2:3].astype(cd) + m[1])
                             ).astype(jnp.float32)
                xv_scr[:] = (xa_in + dx * (mix[3:4].astype(cd) + m[2])
                             ).astype(jnp.float32)
                xr_scr[:] = (xa_in + dx * (mix[4:5].astype(cd) + m[3])
                             ).astype(jnp.float32)
                xg_scr[:] = (xa_in + dx * (mix[5:6].astype(cd) + m[4])
                             ).astype(jnp.float32)
                hd = jnp.tanh(dot(xw, small["dw1"][0])).astype(cd)
                ww = vec("decay") + dot(hd, small["dw2"][0])
                aux_scr[0] = jnp.exp(-jnp.exp(ww))

            natt_x_ref[0] = jnp.where(active, ln1, prev
                                      ).astype(natt_x_ref.dtype)
            if dots == "mono":
                stage_T(xrT, xr_scr, na, C // na)
                stage_T(xkT, xk_scr, na, C // na)
                stage_T(xvT, xv_scr, na, C // na)
                stage_T(xgT, xg_scr, na, C // na)

        # ---- projection tiles: ONE predicated body per weight array
        # with a traced tile index (mono, default) or per-(array, tile)
        # unrolled bodies — Mosaic charges every body's vector code per
        # grid step; see v7_phased_pallas._dots_variant ----
        packed4 = qmode == "int4"

        def dot_phase(lo, count, xT, xsrc, accr, name):
            if dots == "mono":
                @pl.when((w >= lo) & (w < lo + count))
                def _():
                    t = w - lo
                    part = _mono_dot(xT[t], big[name], sref(name), cd,
                                     packed4=packed4)
                    accr[:] = jnp.where(t == 0, part, accr[:] + part)
                return
            K = xsrc.shape[1] // count
            for t in range(count):
                @pl.when(w == lo + t)
                def _(t=t):
                    part = _tiled_dot(xsrc, t * K, K, big[name],
                                      sref(name), cd, packed4=packed4)
                    _acc_add(accr, part, t == 0)

        dot_phase(0, na, xrT if dots == "mono" else None, xr_scr,
                  racc, "Wr")
        dot_phase(na, na, xkT if dots == "mono" else None, xk_scr,
                  kacc, "Wk")
        dot_phase(2 * na, na, xvT if dots == "mono" else None, xv_scr,
                  vacc, "Wv")
        dot_phase(3 * na, na, xgT if dots == "mono" else None, xg_scr,
                  gacc, "Wg")

        # ---- WKV prologue (same grid step as group 0, defined first):
        # r/k/v round through the compute dtype like the fused kernels;
        # y is computed UNMASKED (the generic path's inactive-row output
        # is discarded) and only the state write is gated ----
        @pl.when(w == 4 * na)
        def _():
            kacc[:] = kacc[:].astype(cd).astype(jnp.float32)
            vacc[:] = vacc[:].astype(cd).astype(jnp.float32)
            racc[:] = racc[:].astype(cd).astype(jnp.float32)

        # ---- WKV + GroupNorm, one head GROUP per step, in the window's
        # NATIVE (B, Hc, N, N) layout (the "bform" probe winner).  The
        # four per-head C-vector segments cross from lane-layout (B, GW)
        # into head-major via ONE stacked MXU transpose chain (Mosaic
        # has no lane-splitting shape cast; 2-D transposes and row-group
        # reshapes lower natively). ----
        GW = Hc * N
        for g in range(ng):
            @pl.when(w == 4 * na + g)
            def _(g=g):
                gsl = slice(g * GW, (g + 1) * GW)
                u_b = jnp.broadcast_to(vec("first")[:, gsl], (B, GW))
                stacked = jnp.concatenate([
                    kacc[:, gsl],        # 0: k    (i-indexed, masked)
                    racc[:, gsl],        # 1: r    (i)
                    aux_scr[0][:, gsl],  # 2: wdec (i, masked)
                    u_b,                 # 3: u    (i)
                    vacc[:, gsl],        # 4: v    (j-indexed)
                ], axis=0)                          # (5B, GW)
                t = jnp.transpose(stacked)          # (GW, 5B)   MXU
                t = t.reshape(Hc, N, 5 * B)         # row split
                t = jnp.swapaxes(t, -1, -2)         # (Hc, 5B, N)

                def vb(idx2):                       # (B, Hc, N)
                    return jnp.swapaxes(
                        t[:, idx2 * B:(idx2 + 1) * B], 0, 1)

                k4 = vb(0)[:, :, :, None]           # (B, Hc, N, 1)
                r4 = vb(1)[:, :, :, None]
                wd4 = vb(2)[:, :, :, None]
                u4 = vb(3)[:, :, :, None]
                v4 = vb(4)[:, :, None, :]           # (B, Hc, 1, N)
                s = wkv_ref[0]                      # (B, Hc, N, N)
                a = k4 * v4
                y = jnp.sum((s + u4 * a) * r4, axis=-2)     # (B, Hc, N)
                act4 = (active_ref[:] > 0)[:, :, None, None]
                nwkv_ref[0] = jnp.where(act4, wd4 * s + a,
                                        s).astype(nwkv_ref.dtype)
                mean = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.var(y, axis=-1, keepdims=True)
                yn = (y - mean) * jax.lax.rsqrt(var + GN_EPS)
                # (B, Hc, N) -> (B, GW) lane layout.
                o = jnp.swapaxes(yn, 0, 1)          # (Hc, B, N)
                o = jnp.swapaxes(o, -1, -2)         # (Hc, N, B)
                o = jnp.transpose(o.reshape(GW, B))
                yg_scr[:, gsl] = o

        # ---- epilogue: ln_x affine + SiLU gate ----
        @pl.when(w == 4 * na + ng)
        def _():
            g_f = gacc[:]
            g_silu = g_f * jax.nn.sigmoid(g_f)
            yf = yg_scr[:] * vec("lnx_w") + vec("lnx_b")
            yg_scr[:] = yf * g_silu
            if dots == "mono":
                stage_T(ygT, yg_scr, na, Kt)

        dot_phase(4 * na + ng, na, ygT if dots == "mono" else None,
                  yg_scr, oacc, "Wo")

        # ---- ffn entry: residual add + ln2, both shift mixes ----
        @pl.when(w == 5 * na + ng)
        def _():
            x = x_scr[:] + oacc[:]
            x_scr[:] = x
            ln2w = small["ln2"][0]
            ln2 = _ln(x, ln2w[0:1], ln2w[1:2], LN_EPS)
            fprev = ffn_x_ref[0].astype(jnp.float32)
            fdx = (fprev - ln2).astype(cd)
            fxk = ln2.astype(cd) + fdx * vec("fmix_k").astype(cd)
            fxr = ln2.astype(cd) + fdx * vec("fmix_r").astype(cd)
            xk_scr[:] = fxk.astype(jnp.float32)
            xr_scr[:] = fxr.astype(jnp.float32)
            nffn_x_ref[0] = jnp.where(active, ln2, fprev
                                      ).astype(nffn_x_ref.dtype)
            if dots == "mono":
                stage_T(fxrT, xr_scr, na, Kt)
                stage_T(fxkT, xk_scr, nf, Ktf)

        # ---- ffn receptance tiles (the sigmoid gate) ----
        dot_phase(5 * na + ng, na, fxrT if dots == "mono" else None,
                  xr_scr, gacc, "frec")               # reuse gacc

        # ---- ffn key tiles ----
        dot_phase(6 * na + ng, nf, fxkT if dots == "mono" else None,
                  xk_scr, hk_scr, "fkey")

        # ---- relu^2 + sigmoid gate ----
        @pl.when(w == 10 * na + ng)
        def _():
            hk = hk_scr[:]
            hk_scr[:] = jnp.square(jnp.maximum(hk, 0.0)
                                   ).astype(cd).astype(jnp.float32)
            gacc[:] = jax.nn.sigmoid(gacc[:])
            if dots == "mono":
                stage_T(hkT, hk_scr, nf, Ktv)

        # ---- ffn value tiles ----
        dot_phase(10 * na + ng, nf, hkT if dots == "mono" else None,
                  hk_scr, racc, "fval")               # reuse racc

        @pl.when(w == 14 * na + ng - 1)
        def _():
            x = x_scr[:] + gacc[:] * racc[:]
            x_scr[:] = x

            nl = pl.num_programs(0) // W

            @pl.when(l == nl - 1)
            def _():
                xout_ref[:] = x.astype(xout_ref.dtype)

    return kernel


def _ln(x, w, b, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


@functools.partial(jax.jit,
                   static_argnames=("version", "na", "interpret",
                                    "dots"))
def forward_t1(params, state, tokens, lengths, version, na=None,
               interpret=False, dots=None):
    """Phased single-token decode: drop-in for models/v5.forward /
    v6.forward at T=1 on models too large for the fused whole-network
    kernel.  ``na`` (tiles per CxC matrix) defaults to the smallest
    aligned count whose windows fit the VMEM budget (pick_na); ``dots``
    the projection-tile body form (v7_phased_pallas._dots_variant)."""
    if dots is None:
        dots = _dots_variant()
    fd, small_keys = _modules(version)
    fused = params[fd.FUSED_KEY]
    L = fused["ln1"].shape[0]
    x0 = params["emb"][tokens[:, 0]]
    B, C = x0.shape
    cd = x0.dtype
    active = (lengths > 0)[:, None].astype(jnp.float32)

    from . import fused_decode as fdc

    layers = params["groups"][0]["layers"]
    qmode = fdc.group_mode(layers, fd._BIG_SRC)
    mode, _, F, H, N = _geometry(params, version)
    if na is None:
        na = pick_na(C, F, H, N, B, _ESIZE.get(qmode, 2), version)
    nf = 4 * na
    Kt, Ktf, Ktv = C // na, C // nf, F // nf
    Hc = min(HEAD_GROUP, H)
    ng = H // Hc
    W = 14 * na + ng

    def gwrap(f):
        def g(i, _f=f):
            return _f(i // W, i % W)

        return g

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape,
                            gwrap(lambda l, w, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    def lspec(arr):
        blk = (1,) + arr.shape[1:]
        nd = len(blk) - 1
        return pl.BlockSpec(blk,
                            gwrap(lambda l, w, _nd=nd: (l,) + (0,) * _nd),
                            memory_space=pltpu.VMEM)

    def win_spec(arr, lo, count, rows):
        if arr.ndim == 3:
            def imap(l, w, _lo=lo, _count=count):
                t = jnp.clip(w - _lo, 0, _count - 1)
                return (l, t, 0)

            return pl.BlockSpec((1, rows, arr.shape[2]), gwrap(imap),
                                memory_space=pltpu.VMEM)
        nbw = rows // (arr.shape[2] * (2 if qmode == "int4" else 1))

        def imap4(l, w, _lo=lo, _count=count):
            t = jnp.clip(w - _lo, 0, _count - 1)
            return (l, t, 0, 0)

        return pl.BlockSpec((1, nbw, arr.shape[2], arr.shape[3]),
                            gwrap(imap4), memory_space=pltpu.VMEM)

    def wkv_spec():
        def imap(l, w):
            g = jnp.clip(w - 4 * na, 0, ng - 1)
            return (l, 0, g, 0, 0)

        return pl.BlockSpec((1, B, Hc, N, N), gwrap(imap),
                            memory_space=pltpu.VMEM)

    in_arrays = [x0, active, state["att_x"], state["wkv"], state["ffn_x"]]
    in_specs = [const_spec(x0), const_spec(active),
                lspec(state["att_x"]), wkv_spec(), lspec(state["ffn_x"])]
    for k in small_keys:
        in_arrays.append(fused[k])
        in_specs.append(lspec(fused[k]))
    ranges = {"Wr": (0, na, Kt), "Wk": (na, na, Kt),
              "Wv": (2 * na, na, Kt), "Wg": (3 * na, na, Kt),
              "Wo": (4 * na + ng, na, Kt),
              "frec": (5 * na + ng, na, Kt),
              "fkey": (6 * na + ng, nf, Ktf),
              "fval": (10 * na + ng, nf, Ktv)}
    for k in _ATT + _FFN:
        warr, sarr = _big_entries(fused, k)
        lo, count, rows = ranges[k]
        in_arrays.append(warr)
        in_specs.append(win_spec(warr, lo, count, rows))
        if sarr is not None:
            in_arrays.append(sarr)
            nbw = rows // (warr.shape[2] * (2 if qmode == "int4" else 1))

            def smap(l, w, _lo=lo, _count=count):
                t = jnp.clip(w - _lo, 0, _count - 1)
                return (l, t, 0, 0)

            in_specs.append(pl.BlockSpec(
                (1, nbw, 1, sarr.shape[3]), gwrap(smap),
                memory_space=pltpu.VMEM))

    sd = state["wkv"].dtype
    out_shape = [jax.ShapeDtypeStruct((B, C), cd),
                 jax.ShapeDtypeStruct(state["att_x"].shape, sd),
                 jax.ShapeDtypeStruct(state["wkv"].shape, sd),
                 jax.ShapeDtypeStruct(state["ffn_x"].shape, sd)]
    out_specs = [pl.BlockSpec((B, C), gwrap(lambda l, w: (0, 0)),
                              memory_space=pltpu.VMEM),
                 lspec(state["att_x"]), wkv_spec(),
                 lspec(state["ffn_x"])]

    scratch = ([pltpu.VMEM((B, C), jnp.float32)] * 11 + [
               pltpu.VMEM((B, F), jnp.float32),          # hk_scr
               pltpu.VMEM((1, B, C), jnp.float32)])      # aux (wdec)
    if dots == "mono":
        # Transposed x staging slabs for traced-tile mono dot bodies:
        # xrT/xkT/xvT/xgT/ygT/fxrT (na, Kt, B), fxkT (nf, Ktf, B),
        # hkT (nf, Ktv, B).
        nf = 4 * na
        scratch += [pltpu.VMEM((na, C // na, B), jnp.float32)] * 6 + [
            pltpu.VMEM((nf, C // nf, B), jnp.float32),
            pltpu.VMEM((nf, F // nf, B), jnp.float32)]

    kernel = _kernel(H, N, na, F, cd, qmode, Hc, version, tuple(small_keys),
                     dict(fd._VEC_IDX), dots=dots)

    # The WKV state window streams in-place — each head group's block is
    # read before it is written.
    x_final, natt, nwkv, nffn = pl.pallas_call(
        kernel,
        grid=(L * W,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={3: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=117 * 1024 * 1024),
        interpret=interpret,
    )(*in_arrays)

    from ..models.common import layer_norm

    hidden = layer_norm(x_final, params["ln_out_w"], params["ln_out_b"])
    new_state = {"att_x": natt, "wkv": nwkv, "ffn_x": nffn}
    return hidden[:, None, :], new_state
