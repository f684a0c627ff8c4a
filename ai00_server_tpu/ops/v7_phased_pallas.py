"""Phased whole-layer single-token (T=1) decode kernel for RWKV v7.

The fused whole-network kernel (v7_decode_pallas.py) holds a full layer's
weights in one double-buffered VMEM window — impossible for 7B-class
models (>60 MB/layer even int8).  This kernel keeps the ONE-Pallas-op
structure (so the ~45 XLA ops/layer x 32 layers of fixed issue cost
disappear) but adds a second grid dimension of K-TILED WEIGHT WINDOWS:

    grid = (L, 12*na + ng)   # na tiles per CxC matrix, 4*na per ffn
                             # matrix, ng = H/8 head-group state steps

    w in [0,    na): r_acc += xr[:, tile] @ Wr[tile]      (K-tiled)
    w in [na,  2na): k_acc += xk[:, tile] @ Wk[tile]
    w in [2na, 3na): v_acc += xv[:, tile] @ Wv[tile]
    w in [3na, 3na+ng): WKV + GroupNorm + bonus, 8 heads per step —
                     the (B, Hc, N, N) state window streams per group,
                     so the state never needs whole-layer VMEM
    w in [.., +na): o_acc += (yf*g)[:, tile] @ Wo[tile]
    w == 4na+ng    : x += o_acc; ln2 -> fxk
    w in [.., +4na): hk_acc += fxk[:, tile] @ fkey[tile]
    w == 8na+ng    : hk = relu(hk_acc)^2
    w in [.., +4na): f_acc += hk[:, tile] @ fval[tile]
    last           : x += f_acc

Each weight matrix is its own input whose BlockSpec index map CLAMPS to
its active range, so a window is fetched exactly once per layer and the
Pallas pipeline double-buffers the next window's HBM->VMEM DMA under the
current tile's compute.  Weights stream at their stored width (bf16, or
int8 codes + per-block scales applied to the sub-dot accumulators); the
total HBM traffic per step is exactly the stored model bytes plus one
state read+write, which is the decode speed-of-light.

Consumes the SAME ``params[FUSED_KEY]`` layout as the fused kernel (the
big projections are passed through in their original stacked layout; see
v7_decode_pallas.make_fused_layout), so the engine installs one layout
and picks the kernel by size.  Reference capability: single-token decode
of ``Runtime::infer`` (crates/ai00-core/src/run.rs:1120-1156) for
quantized 7B-class models (``Quant::Int8``, reload.rs:23-27).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import GN_EPS, LN_EPS
from .v7_decode_pallas import (
    FUSED_KEY, W_SCALE, _BIG_SRC, _VEC_IDX, _ln,
)

# Small per-layer arrays fetched whole once per layer (index map constant
# in w).  Same entries as the fused kernel minus the big projections.
_SMALL_KEYS = [
    "mix", "w1", "a1", "v1", "g1", "w2", "a2", "v2", "g2",
    "vecs", "ln1", "ln2", "fmix",
]
_ATT = ("Wr", "Wk", "Wv", "Wo")
_FFN = ("fkey", "fval")


def _geometry(params):
    from . import fused_decode as fdc

    layers = params["groups"][0]["layers"]
    mode = fdc.group_mode(layers, _BIG_SRC)
    att = layers["att"]
    H, N = att["r_k"].shape[-2:]
    C = att["receptance"].shape[-2]
    ffn_key = layers["ffn"]["key"]
    F = ffn_key.shape[-1]
    return mode, C, F, H, N


# Heads per WKV grid step (state window = B*HEAD_GROUP*N*N).  Larger
# groups mean fewer, bigger state DMAs: the 2 MB windows at 8 stream at
# only ~240 GB/s (latency-bound), and weight streaming can't progress
# past Mosaic's 1-step prefetch during the group steps — the r5 probe
# measured the full kernel 90% DMA-schedule-bound.  Env-tunable for
# probes; pick_na budgets VMEM for the chosen value.
HEAD_GROUP = int(os.environ.get("AI00_PHASED_HC", "8"))


def pick_na(C, F, H, N, batch, esize, max_bytes=92 * 1024 * 1024):
    """Smallest tile count whose windows satisfy alignment and fit the
    VMEM budget; None if impossible.  Constraints: Kt = C/na, Ktf =
    C/(4na), Ktv = F/(4na) all positive multiples of 128 (lane/quant
    block alignment).  Budget terms: 6 double-buffered weight windows,
    4x-buffered per-head-group wkv windows, double-buffered per-layer
    smalls, f32 scratch."""
    hc = min(HEAD_GROUP, H)
    # Smalls (token-shift mixes/ln/lora staging) stay in MODEL dtype
    # (2 bytes) regardless of big-projection quantization — budgeting
    # them at esize under-counts VMEM for int8/int4 and a geometry near
    # the budget would pick an na whose real footprint fails Mosaic.
    smalls = int(2 * ((6 * C + 4 * C + C) * 2 + (8 * C + 4 * C) * 4
                      + 8 * C * 128 * 2))
    # 12 (B, C) + (B, F) + aux (5, B, C) + mono transposed staging
    # (4 C-sized + fxkT C-sized + hkT F-sized slabs).
    scratch = (12 * batch * C + batch * F + 5 * batch * C
               + (5 * C + F) * batch) * 4
    state = 4 * batch * hc * N * N * 4 + 8 * batch * C * 4
    for na in range(1, 33):
        if C % na or (C // na) % 128:
            continue
        if C % (4 * na) or (C // (4 * na)) % 128:
            continue
        if F % (4 * na) or (F // (4 * na)) % 128:
            continue
        win = int((C * C // na) * esize)
        need = state + 12 * win + smalls + scratch
        if need <= max_bytes:
            return na
    return None


# Stored bytes per weight element by big-projection mode.
_ESIZE = {"none": 2, "int8": 1, "int4": 0.5}


def can_phase(params, batch: int, na: int | None = None) -> bool:
    """Whether the phased kernel applies: one layer group, big
    projections plain or uniformly int8/int4 (NF4/SF4 models convert to
    int8 surrogate codes at load for decode; int4 streams PACKED —
    ops/quant.py), square C = H*N, and a tile count exists whose windows
    align and fit VMEM."""
    if len(params["groups"]) != 1:
        return False
    mode, C, F, H, N = _geometry(params)
    if mode not in _ESIZE:
        return False
    if C != H * N or N % 8 != 0:
        return False
    found = pick_na(C, F, H, N, batch, _ESIZE[mode])
    if found is None:
        return False
    return na is None or _na_ok(C, F, na)


def _na_ok(C, F, na):
    return not (C % na or (C // na) % 128 or C % (4 * na)
                or (C // (4 * na)) % 128 or F % (4 * na)
                or (F // (4 * na)) % 128)


def _acc_add(ref, val, first: bool):
    if first:
        ref[:] = val
    else:
        ref[:] = ref[:] + val


def _dots_variant() -> str:
    """AI00_PHASED_DOTS selects the projection-tile body form:

        mono (default)  ONE body per weight array with a TRACED tile
                        index; the x tile comes from a transposed
                        (tiles, Kt, B) staging scratch (leading-dim
                        indexing is the only traced indexing Mosaic
                        lowers).  6 predicated bodies total.
        unroll          one body per (array, tile) — 12na+8na bodies.

    Mosaic charges every pl.when body's VPU code against every grid
    step (the WKV group bodies hit the same cliff, see the wkv body
    comment): at 7B int8 na=4 the 48 unrolled bodies' per-block scale
    multiplies cost ~48 us/step on top of the 7.3 us DMA floor
    (98.9 ms/step dots-only vs 13.1 ms empty-body, probe_phased
    AI00_PHASED_ONLY/ABLATE)."""
    import os

    return os.environ.get("AI00_PHASED_DOTS", "mono")


_DN_K0 = (((0,), (0,)), ((), ()))  # contract axis 0 of both operands
_DN_STD = (((1,), (0,)), ((), ()))  # standard (B, K) @ (K, out)


def _stage_variant() -> str:
    """AI00_PHASED_STAGE selects the mono staging slab layout:

        t (default)   (count, K, B) slabs via per-tile TRANSPOSES of the
                      (B, C)/(B, F) lane-layout scratch; the dot
                      contracts axis 0 of both operands
        copy          (count, B, K) slabs via static lane-slice COPIES
                      (no transpose at all); the dot is the standard
                      (B, K) @ (K, out) form

    The staging transposes are the phased kernel's main EXPOSED compute
    (the ffn hkT stage is a (B, F) = 16x16384 f32 transpose inside ONE
    grid step, where Mosaic's 1-step window prefetch can't hide it)."""
    import os

    return os.environ.get("AI00_PHASED_STAGE", "t")


def _mono_dot(xt, w_ref, s_ref, cd, packed4=False, transposed=True):
    """x tile @ window -> (B, out) f32.  ``transposed``: xt is the
    (Kt, B) staged slab (contract axis 0 of both); else the (B, Kt)
    copy-staged slab (standard matmul dims).  int8 windows keep the
    per-128-row-block scales on the f32 accumulator (cheap here: ONE
    body instance exists, so the scale multiplies are charged once per
    grid step, not once per unrolled tile body).

    ``packed4``: the window holds PACKED int4 (1, nb, 32, out) uint8 —
    split-half nibbles (low nibble = block rows [0,32), high = [32,64));
    decode is mask/shift + subtract (~3 VPU ops/element, the whole point
    of the uniform grid), scales stay on the accumulator."""
    dn = _DN_K0 if transposed else _DN_STD

    def xsl(lo, n):
        return xt[lo:lo + n] if transposed else xt[:, lo:lo + n]

    if s_ref is None:
        return jax.lax.dot_general(
            xt.astype(cd), w_ref[0].astype(cd), dn,
            preferred_element_type=jnp.float32)
    nb, blk, out = w_ref.shape[1:]
    acc = None
    for j in range(nb):
        if packed4:
            packed = w_ref[0, j].astype(jnp.int32)     # (32, out)
            wlo = ((packed & 0x0F) - 8).astype(cd)
            whi = ((packed >> 4) - 8).astype(cd)
            base = j * 2 * blk
            pj = jax.lax.dot_general(
                xsl(base, blk).astype(cd), wlo, dn,
                preferred_element_type=jnp.float32)
            pj = pj + jax.lax.dot_general(
                xsl(base + blk, blk).astype(cd), whi, dn,
                preferred_element_type=jnp.float32)
        else:
            pj = jax.lax.dot_general(
                xsl(j * blk, blk).astype(cd),
                w_ref[0, j].astype(cd), dn,
                preferred_element_type=jnp.float32)
        pj = pj * s_ref[0, j]
        acc = pj if acc is None else acc + pj
    return acc


def _tiled_dot(x_scr, off: int, Kt: int, w_ref, s_ref, cd, packed4=False):
    """(unroll fallback) x[:, off:off+Kt] @ window, int8 sub-blocks
    scaled on the accumulator.  ``off`` is STATIC.  Chip-raced int8
    formulations at 7B na=4 (probe_phased): this form 117.7 ms/step,
    dequant-in-VMEM (quant_pallas style: window*scale then one dot)
    254.2, empty-body DMA floor 13.1 — per-body VPU work is charged per
    GRID STEP across all 48 unrolled bodies, hence the mono default."""
    if s_ref is None:
        xt = x_scr[:, off:off + Kt]
        win = w_ref[0]                      # (Kt, out)
        return jnp.dot(xt.astype(cd), win.astype(cd),
                       preferred_element_type=jnp.float32)
    nb = w_ref.shape[1]
    blk = w_ref.shape[2]
    acc = None
    for j in range(nb):
        if packed4:
            packed = w_ref[0, j].astype(jnp.int32)
            wlo = ((packed & 0x0F) - 8).astype(cd)
            whi = ((packed >> 4) - 8).astype(cd)
            base = off + j * 2 * blk
            part = jnp.dot(x_scr[:, base:base + blk].astype(cd), wlo,
                           preferred_element_type=jnp.float32)
            part = part + jnp.dot(
                x_scr[:, base + blk:base + 2 * blk].astype(cd), whi,
                preferred_element_type=jnp.float32)
        else:
            xj = x_scr[:, off + j * blk:off + (j + 1) * blk]
            part = jnp.dot(xj.astype(cd), w_ref[0, j].astype(cd),
                           preferred_element_type=jnp.float32)
        part = part * s_ref[0, j]
        acc = part if acc is None else acc + part
    return acc


def _ablate() -> frozenset:
    """Diagnostic: AI00_PHASED_ABLATE is a comma list for bisecting the
    kernel's cost on real hardware.  "dma" strips the compute body to a
    minimal window touch (same BlockSpecs, same DMA schedule); the
    remaining flags drop spec groups (only meaningful with dma, the
    result is numerically wrong): "nostate" removes the att/wkv/ffn
    state windows (inputs AND outputs), "nosmalls" removes the 13
    per-layer small inputs, "noalias" keeps the state windows but drops
    the wkv input_output_alias, "nobig" removes the weight windows."""
    import os

    v = os.environ.get("AI00_PHASED_ABLATE", "")
    return frozenset(p for p in v.split(",") if p)


def _only() -> frozenset | None:
    """AI00_PHASED_ONLY=dots+entry runs the full specs/DMA schedule but
    keeps only the named compute-phase groups (entry, dots, wkv, epi) —
    numerically wrong, for attributing compute cost on hardware."""
    import os

    v = os.environ.get("AI00_PHASED_ONLY", "")
    if not v:
        return None
    return frozenset(v.split("+"))


def _wkvg_variant() -> str:
    """AI00_PHASED_WKVG selects the WKV head-group body form (read at
    trace time, like the other phased A/B flags):

        bform (default)   math in the window's NATIVE (B, Hc, N, N)
                          layout — no state relayout at all; the seven
                          small per-group vectors take one extra
                          (Hc, B, N) -> (B, Hc, N) permute each
        tchain            math in (Hc, B, N, N) — the state window is
                          swapaxes(0,1)-relayouted in and out (~2 MB
                          each way at B=16 Hc=8 N=64)

    Raced standalone on hardware (tools/probe_wkvg.py, 2.86B geometry
    Hc=8 B=16 N=64): bform 11.4 us/group-step vs tchain 35.8 vs the
    8.4 us DMA/layout floor — bform is within 3 us of the floor, so it
    is the default.  The probe's "slab" form needs a different HBM
    state layout (and failed to compile on the current toolchain); not
    integrated."""
    import os

    return os.environ.get("AI00_PHASED_WKVG", "bform")


def _grid_mode() -> str:
    """AI00_PHASED_GRID=2d keeps the (L, W) grid; default is the flat
    (L*W,) grid — Mosaic's skip-copy-when-window-index-unchanged
    optimization only engages on a 1-D grid with these clamped index
    maps (measured 2.86B: 108.8 ms/step 2-D vs generic 14.2; the same
    window pattern on a 1-D grid streams at ~712 GB/s,
    tools/probe_pipeline.py)."""
    import os

    return os.environ.get("AI00_PHASED_GRID", "flat")


def _kernel(H, N, na, F, compute_dtype, qmode, Hc, flat=True, only=None,
            wkvg="tchain", dots="mono", stagev="t", ng=None, Bc=None):
    nf = 4 * na
    if ng is None:
        ng = H // Hc
    W = 12 * na + ng

    def keep(group):
        return only is None or group in only

    def kernel(*refs):
        (x0_ref, active_ref, att_x_ref, wkv_ref, ffn_x_ref) = refs[:5]
        idx = 5
        small = {}
        for k in _SMALL_KEYS:
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
        (x_scr, vf_scr, xr_scr, xk_scr, xv_scr, yg_scr, racc, kacc, vacc,
         oacc, hk_scr, kk_scr, aux_scr, vst_scr, yo_scr) = rest[:15]
        if dots == "mono":
            (xrT, xkT, xvT, ygT, fxkT, hkT) = rest[15:21]

        def stage_T(dst, src_scr, count, K):
            """(B, count*K) lane-layout scratch -> per-tile slabs the
            mono dot bodies index by traced tile (once per layer):
            (count, K, B) transposed slabs (stagev="t") or (count, B, K)
            static lane-slice copies (stagev="copy", no transpose)."""
            for t in range(count):
                sl = src_scr[:, t * K:(t + 1) * K]
                dst[t] = jnp.transpose(sl) if stagev == "t" else sl

        if flat:
            i = pl.program_id(0)
            l = i // W
            w = i % W
        else:
            l = pl.program_id(0)
            w = pl.program_id(1)
        cd = compute_dtype
        active = active_ref[:] > 0                    # (B, 1)
        B = x0_ref.shape[0]
        C = H * N
        Kt = C // na
        Ktf = C // nf
        Ktv = F // nf

        def vec(name):
            i = _VEC_IDX[name]
            return small["vecs"][0][i:i + 1]

        def sref(name):
            return (big.get(name + "_s")
                    if qmode in ("int8", "int4") else None)

        # ---- layer entry: ln1, token-shift mixes, lora branches ----
        # (split into two predicated bodies, "entry1"/"entry2", for the
        # ONLY-flag bisection of cross-body lowering interactions)
        @pl.when((w == 0) & (keep("entry") | keep("entry1")))
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
            mix = small["mix"][0]                     # (6, C)
            xr_scr[:] = (xa_in + dx * mix[0:1].astype(cd)).astype(jnp.float32)
            xk_scr[:] = (xa_in + dx * mix[2:3].astype(cd)).astype(jnp.float32)
            xv = xa_in + dx * mix[3:4].astype(cd)
            xv_scr[:] = xv.astype(jnp.float32)
            aux_scr[4] = ln1
            if dots == "mono":
                Kt_ = (H * N) // na
                stage_T(xrT, xr_scr, na, Kt_)
                stage_T(xkT, xk_scr, na, Kt_)
                stage_T(xvT, xv_scr, na, Kt_)

        @pl.when((w == 0) & (keep("entry") | keep("entry2")))
        def _():
            x = x_scr[:]
            ln1 = aux_scr[4]
            prev = att_x_ref[0].astype(jnp.float32)
            xa_in = ln1.astype(cd)
            dx = (prev - ln1).astype(cd)
            mix = small["mix"][0]
            xw = xa_in + dx * mix[1:2].astype(cd)
            xv = xv_scr[:].astype(cd)
            xaa = xa_in + dx * mix[4:5].astype(cd)
            xg = xa_in + dx * mix[5:6].astype(cd)

            def dot(a, b):
                return jnp.dot(a, b.astype(cd),
                               preferred_element_type=jnp.float32)

            # Small lora dots (C x 64-128): wdec, a, g, vmix.
            hw = jnp.tanh(dot(xw, small["w1"][0])).astype(cd)
            wdec = jnp.exp(-W_SCALE * jax.nn.sigmoid(
                vec("w0") + dot(hw, small["w2"][0])))
            ha = dot(xaa, small["a1"][0]).astype(cd)
            a = jax.nn.sigmoid(vec("a0") + dot(ha, small["a2"][0]))
            a = a.astype(cd).astype(jnp.float32)
            hg = jax.nn.sigmoid(dot(xg, small["g1"][0])).astype(cd)
            g = dot(hg, small["g2"][0])
            hv = dot(xv, small["v1"][0]).astype(cd)
            vmix = jax.nn.sigmoid(vec("v0") + dot(hv, small["v2"][0]))
            vmix = vmix.astype(cd).astype(jnp.float32)
            # aux rows: 0 wdec, 1 a, 2 g, 3 vmix, 4 ln1 (for att_x update)
            aux_scr[0] = wdec
            aux_scr[1] = a
            aux_scr[2] = g
            aux_scr[3] = vmix

        # ---- att projection tiles.  mono (default): ONE predicated
        # body per weight array, tile index TRACED, x tile read from the
        # (na, Kt, B) transposed staging slab — Mosaic charges every
        # pl.when body's vector code per grid step, so per-(array, tile)
        # unrolled bodies cost ~48 us/step in scale multiplies alone at
        # 7B int8 na=4 (see _dots_variant).  The weight WINDOW tracks w
        # via its clamped index map either way. ----
        packed4 = qmode == "int4"

        def dot_phase(lo, count, xT, xsrc, accr, name):
            if dots == "mono":
                @pl.when((w >= lo) & (w < lo + count) & keep("dots"))
                def _():
                    t = w - lo
                    part = _mono_dot(xT[t], big[name], sref(name), cd,
                                     packed4=packed4,
                                     transposed=stagev == "t")
                    accr[:] = jnp.where(t == 0, part, accr[:] + part)
                return
            K = xsrc.shape[1] // count
            for t in range(count):
                @pl.when((w == lo + t) & keep("dots"))
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

        # ---- WKV prologue (once, before the first head-group step) ----
        @pl.when((w == 3 * na) & (keep("wkv") | keep("wkvpro")))
        def _():
            k = kacc[:].astype(cd).astype(jnp.float32)
            v = vacc[:].astype(cd).astype(jnp.float32)
            a = aux_scr[1]
            vmix = aux_scr[3]
            kk_full = k * vec("k_k")
            k2 = k * (1.0 + (a - 1.0) * vec("k_a"))

            is_first = l == 0

            @pl.when(is_first)
            def _():
                vf_scr[:] = v

            v2 = jnp.where(is_first, v, v + (vf_scr[:] - v) * vmix)

            aux_scr[0] = jnp.where(active, aux_scr[0], 1.0)  # wdec masked
            kk_scr[:] = jnp.where(active, kk_full, 0.0)
            kacc[:] = jnp.where(active, k2, 0.0)  # k2 (masked) over k
            vacc[:] = v2
            # bonus r*k2*r_k (uses the UNMASKED k2, matching the generic
            # path's discarded inactive-row output).
            aux_scr[3] = racc[:].astype(cd).astype(jnp.float32) \
                * k2 * vec("r_k")
            natt_x_ref[0] = jnp.where(active, aux_scr[4],
                                      att_x_ref[0].astype(jnp.float32)
                                      ).astype(natt_x_ref.dtype)
            # Stage each head group's seven vector segments as one
            # (7B, GW) slab, leading-dim indexed by g: the group body
            # below is a SINGLE code instance (dynamic g) — unrolling it
            # per group makes Mosaic lower every instance's vector code
            # into each grid step's predicated body (~450 us/group-step
            # vs 18 standalone, tools/probe_wkvg.py PROBE_WIDE=4).
            if wkvg == "bbatch":
                # Batch-group staging: (7*Bc, C) sublane-slice slabs
                # (the state window slices B, so each group's vectors
                # are full-C rows of a Bc-row batch slab).
                for gi in range(ng):
                    bsl = slice(gi * Bc, (gi + 1) * Bc)
                    vst_scr[gi] = jnp.concatenate([
                        kk_scr[bsl],        # 0: kk   (j-indexed)
                        aux_scr[0][bsl],    # 1: wdec (j)
                        aux_scr[1][bsl],    # 2: a    (j)
                        kacc[bsl],          # 3: masked k2 (j)
                        racc[bsl],          # 4: r    (j)
                        aux_scr[3][bsl],    # 5: rk bonus (j)
                        vacc[bsl],          # 6: v2   (i-indexed)
                    ], axis=0)
            else:
                GWp = Hc * N
                for gi in range(ng):
                    sl = slice(gi * GWp, (gi + 1) * GWp)
                    vst_scr[gi] = jnp.concatenate([
                        kk_scr[:, sl],       # 0: kk   (j-indexed)
                        aux_scr[0][:, sl],   # 1: wdec (j)
                        aux_scr[1][:, sl],   # 2: a    (j)
                        kacc[:, sl],         # 3: masked k2 (j)
                        racc[:, sl],         # 4: r    (j)
                        aux_scr[3][:, sl],   # 5: rk bonus (j)
                        vacc[:, sl],         # 6: v2   (i-indexed)
                    ], axis=0)

        # ---- WKV + GroupNorm + bonus, one head GROUP per step: the
        # (B, Hc, N, N) state window streams per group, so whole-layer
        # state VMEM is never needed ----
        # ONE body instance with a TRACED group index (the staged
        # (ng, 7B, GW) slab is leading-dim indexed): per-group unrolled
        # pl.when bodies make Mosaic fold every instance's vector code
        # into each predicated step (~450 us/group-step vs 18 for the
        # identical single body, tools/probe_wkvg.py PROBE_WIDE=4).
        # The state math runs fully vectorized over the group's 8 heads
        # (a per-head loop is ~7x slower: half-lane (.., 64) ops plus
        # an unaligned lane shuffle per odd head).  The seven per-head
        # C-vector segments cross from lane-layout (B, GW) into
        # head-major (Hc, B, N) via ONE stacked MXU transpose chain —
        # Mosaic has no lane-splitting shape cast ((B, GW) ->
        # (B, Hc, 1, N) fails to lower), but 2-D transposes, row-group
        # reshapes, and minor-two-dim swaps all lower natively.
        GW = Hc * N
        in_wkv = (w >= 3 * na) & (w < 3 * na + ng)

        @pl.when(in_wkv & (keep("wkv") | keep("wkvg")))
        def _():
            g = w - 3 * na
            if wkvg == "bbatch":
                # Batch-group form: the state window is (Bc, H, N, N) —
                # CONTIGUOUS in HBM (the (1, B, Hc, ..) head-group
                # window is strided over B and measured 335 GB/s vs 765
                # for the weight windows; state streaming was 3.2 ms of
                # the r5 7B DMA wall).  Math is the bform rank-1 update
                # with (group, head) axes = (Bc, H).
                stacked = vst_scr[g]           # (7Bc, C)
                t = jnp.transpose(stacked)     # (C, 7Bc)   MXU
                t = t.reshape(H, N, 7 * Bc)    # row split
                t = jnp.swapaxes(t, -1, -2)    # (H, 7Bc, N)

                def vb(i):                     # (Bc, H, 1, N)
                    return jnp.swapaxes(
                        t[:, i * Bc:(i + 1) * Bc], 0, 1)[:, :, None, :]

                kk4 = vb(0)
                kk4 = kk4 / jnp.maximum(
                    jnp.sqrt(jnp.sum(kk4 * kk4, axis=-1,
                                     keepdims=True)), 1e-12)
                kk4 = kk4.astype(cd).astype(jnp.float32)
                r4 = vb(4).astype(cd).astype(jnp.float32)
                v24 = jnp.swapaxes(vb(6), -1, -2)  # (Bc, H, N, 1)
                s = wkv_ref[0]                     # (Bc, H, N, N)
                skk = jnp.sum(s * kk4, axis=-1, keepdims=True)
                s_new = (s * vb(1)
                         - skk * (kk4 * vb(2))
                         + v24 * vb(3))
                nwkv_ref[0] = s_new.astype(nwkv_ref.dtype)
                y = jnp.sum(s_new * r4, axis=-1)   # (Bc, H, N)
                mean = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.var(y, axis=-1, keepdims=True)
                yn = (y - mean) * jax.lax.rsqrt(var + GN_EPS)
                rksum = jnp.sum(vb(5), axis=-1)    # (Bc, H, 1)
                ob = rksum * v24[..., 0]           # (Bc, H, N)
                # (2Bc, H, N) -> (2Bc, C) lane layout (leading-merge
                # reshape after relayout, like bform's ending).
                o = jnp.concatenate([yn, ob], axis=0)   # (2Bc, H, N)
                o = jnp.swapaxes(o, 0, 1)               # (H, 2Bc, N)
                o = jnp.swapaxes(o, -1, -2)             # (H, N, 2Bc)
                o = jnp.transpose(o.reshape(C, 2 * Bc))
                yo_scr[g] = o                           # (2Bc, C)
                return

            stacked = vst_scr[g]               # (7B, GW)
            t = jnp.transpose(stacked)         # (GW, 7B)   MXU
            t = t.reshape(Hc, N, 7 * B)        # row split
            t = jnp.swapaxes(t, -1, -2)        # (Hc, 7B, N)

            if wkvg == "bform":
                # Window-NATIVE (B, Hc, N, N) math: the two big
                # state relayouts vanish; each small vector takes
                # one extra (Hc, B, N) -> (B, Hc, N) permute.
                def vb(i):                     # (B, Hc, 1, N)
                    return jnp.swapaxes(
                        t[:, i * B:(i + 1) * B], 0, 1)[:, :, None, :]

                kk4 = vb(0)
                kk4 = kk4 / jnp.maximum(
                    jnp.sqrt(jnp.sum(kk4 * kk4, axis=-1,
                                     keepdims=True)), 1e-12)
                kk4 = kk4.astype(cd).astype(jnp.float32)
                r4 = vb(4).astype(cd).astype(jnp.float32)
                v24 = jnp.swapaxes(vb(6), -1, -2)  # (B, Hc, N, 1)
                s = wkv_ref[0]                     # (B, Hc, N, N)
                skk = jnp.sum(s * kk4, axis=-1, keepdims=True)
                s_new = (s * vb(1)
                         - skk * (kk4 * vb(2))
                         + v24 * vb(3))
                nwkv_ref[0] = s_new.astype(nwkv_ref.dtype)
                y = jnp.sum(s_new * r4, axis=-1)   # (B, Hc, N)
                mean = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.var(y, axis=-1, keepdims=True)
                yn = (y - mean) * jax.lax.rsqrt(var + GN_EPS)
                rksum = jnp.sum(vb(5), axis=-1)    # (B, Hc, 1)
                ob = rksum * v24[..., 0]           # (B, Hc, N)
                # (B, Hc, N) -> (2B, GW) lane layout.
                o = jnp.swapaxes(jnp.concatenate([yn, ob], axis=0),
                                 0, 1)             # (Hc, 2B, N)
                o = jnp.swapaxes(o, -1, -2)        # (Hc, N, 2B)
                o = jnp.transpose(o.reshape(GW, 2 * B))
                yo_scr[g] = o
            else:
                def v4(i):                         # (Hc, B, 1, N)
                    return t[:, i * B:(i + 1) * B][:, :, None, :]

                kk4 = v4(0)
                kk4 = kk4 / jnp.maximum(
                    jnp.sqrt(jnp.sum(kk4 * kk4, axis=-1,
                                     keepdims=True)), 1e-12)
                kk4 = kk4.astype(cd).astype(jnp.float32)
                r4 = v4(4).astype(cd).astype(jnp.float32)
                v24 = jnp.swapaxes(v4(6), -1, -2)  # (Hc, B, N, 1): i
                s = jnp.swapaxes(wkv_ref[0], 0, 1)  # (Hc, B, N, N)
                skk = jnp.sum(s * kk4, axis=-1, keepdims=True)
                s_new = (s * v4(1)
                         - skk * (kk4 * v4(2))
                         + v24 * v4(3))
                nwkv_ref[0] = jnp.swapaxes(s_new, 0, 1
                                           ).astype(nwkv_ref.dtype)
                y = jnp.sum(s_new * r4, axis=-1)   # (Hc, B, N): i-lanes
                mean = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.var(y, axis=-1, keepdims=True)
                yn = (y - mean) * jax.lax.rsqrt(var + GN_EPS)
                rksum = jnp.sum(v4(5), axis=-1)    # (Hc, B, 1)
                ob = rksum * v24[..., 0]           # (Hc, B, N) bonus
                # Reverse relayout: (Hc, 2B, N) -> (2B, GW).
                o = jnp.swapaxes(jnp.concatenate([yn, ob], axis=1),
                                 -1, -2)           # (Hc, N, 2B)
                o = jnp.transpose(o.reshape(GW, 2 * B))   # (2B, GW)
                yo_scr[g] = o

        # ---- epilogue + output projection tiles ----
        @pl.when((w == 3 * na + ng) & keep("epi"))
        def _():
            # Reassemble the groups' outputs into (B, C) lane layout
            # (static slices, ONCE per layer).
            for gi in range(ng):
                o = yo_scr[gi]
                if wkvg == "bbatch":
                    bsl = slice(gi * Bc, (gi + 1) * Bc)
                    yg_scr[bsl] = o[:Bc]
                    oacc[bsl] = o[Bc:]
                else:
                    sl = slice(gi * GW, (gi + 1) * GW)
                    yg_scr[:, sl] = o[:B]
                    oacc[:, sl] = o[B:]
            g_gate = aux_scr[2]
            yf = (yg_scr[:] * vec("lnx_w") + vec("lnx_b")) + oacc[:]
            yg_scr[:] = yf * g_gate
            if dots == "mono":
                stage_T(ygT, yg_scr, na, Kt)

        dot_phase(3 * na + ng, na, ygT if dots == "mono" else None,
                  yg_scr, oacc, "Wo")

        # ---- ffn entry: residual add + ln2 ----
        @pl.when((w == 4 * na + ng) & keep("epi"))
        def _():
            x = x_scr[:] + oacc[:]
            x_scr[:] = x
            ln2w = small["ln2"][0]
            ln2 = _ln(x, ln2w[0:1], ln2w[1:2], LN_EPS)
            fprev = ffn_x_ref[0].astype(jnp.float32)
            fxk = (ln2.astype(cd) + (fprev - ln2).astype(cd)
                   * small["fmix"][0][0:1].astype(cd))
            xr_scr[:] = fxk.astype(jnp.float32)       # reuse as fxk
            nffn_x_ref[0] = jnp.where(active, ln2, fprev
                                      ).astype(nffn_x_ref.dtype)
            if dots == "mono":
                stage_T(fxkT, xr_scr, nf, Ktf)

        # ---- ffn key tiles (accumulate the (B, F) hidden) ----
        dot_phase(4 * na + ng, nf, fxkT if dots == "mono" else None,
                  xr_scr, hk_scr, "fkey")

        # ---- relu^2 ----
        @pl.when((w == 8 * na + ng) & keep("epi"))
        def _():
            hk = hk_scr[:]
            hk_scr[:] = jnp.square(jnp.maximum(hk, 0.0)
                                   ).astype(cd).astype(jnp.float32)
            if dots == "mono":
                stage_T(hkT, hk_scr, nf, Ktv)

        # ---- ffn value tiles ----
        dot_phase(8 * na + ng, nf, hkT if dots == "mono" else None,
                  hk_scr, racc, "fval")              # reuse racc

        @pl.when(w == 12 * na + ng - 1)
        def _():
            x = x_scr[:] + racc[:]
            x_scr[:] = x

            nl = (pl.num_programs(0) // W) if flat else pl.num_programs(0)

            @pl.when(l == nl - 1)
            def _():
                xout_ref[:] = x.astype(xout_ref.dtype)

    return kernel


def _big_entries(fused, name):
    """(weight array, scale array or None) for a big projection in the
    fused layout (plain ``name`` or quantized ``name_q``/``name_s``)."""
    if name in fused:
        return fused[name], None
    return fused[name + "_q"], fused[name + "_s"]


@functools.partial(jax.jit,
                   static_argnames=("na", "interpret", "wkvg", "dots"))
def forward_t1(params, state, tokens, lengths, na=None, interpret=False,
               wkvg=None, dots=None):
    """Phased single-token decode: drop-in for models/v7.forward at T=1
    on models too large for the fused whole-network kernel.  ``na``
    (tiles per CxC matrix) defaults to the smallest aligned count whose
    windows fit the VMEM budget (pick_na).  ``wkvg`` picks the WKV
    head-group body form (default: AI00_PHASED_WKVG, see
    :func:`_wkvg_variant`); ``dots`` the projection-tile body form
    (default: AI00_PHASED_DOTS, see :func:`_dots_variant`)."""
    if wkvg is None:
        wkvg = _wkvg_variant()
    if dots is None:
        dots = _dots_variant()
    fused = params[FUSED_KEY]
    L = fused["ln1"].shape[0]
    x0 = params["emb"][tokens[:, 0]]
    B, C = x0.shape
    layers = params["groups"][0]["layers"]
    H, N = layers["att"]["r_k"].shape[-2:]
    cd = x0.dtype
    active = (lengths > 0)[:, None].astype(jnp.float32)

    from . import fused_decode as fdc

    qmode = fdc.group_mode(layers, _BIG_SRC)
    wq, _ = _big_entries(fused, "fkey")
    F = wq.shape[-1]
    if na is None:
        na = pick_na(C, F, H, N, B, _ESIZE.get(qmode, 2))
    nf = 4 * na
    Kt, Ktf, Ktv = C // na, C // nf, F // nf
    Hc = min(HEAD_GROUP, H)
    if wkvg == "bbatch":
        # Batch-sliced state windows (contiguous in HBM): pick the
        # largest batch group whose window is <= ~2 MB (4 MB windows
        # measured VMEM-OOM at 7B na=4: 140.8M of 128M).  Measured r5:
        # contiguity does NOT speed the state stream (13.14 vs 13.07 ms
        # dma-only) — the cost is the in-place read-modify-write
        # turnaround, not the stride — so this stays a raceable
        # fallback, not the default.
        Hc = H
        per_row = H * N * N * jnp.dtype(state["wkv"].dtype).itemsize
        win = int(os.environ.get("AI00_PHASED_BBATCH_WIN", 2 << 20))
        Bc = max(1, min(B, win // max(per_row, 1)))
        while B % Bc:
            Bc -= 1
        ng = B // Bc
    else:
        Bc = B
        ng = H // Hc

    W = 12 * na + ng
    flat = _grid_mode() != "2d"

    def gwrap(f):
        """Index maps are written in (l, w); the flat 1-D grid (the
        default — see _grid_mode) derives them from the single id."""
        if not flat:
            return f

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
        """K-window spec over a stacked big array: plain (L, IN, OUT) ->
        block (1, rows, OUT); int8 (L, nb, blk, OUT) -> block
        (1, rows//blk, blk, OUT); packed int4 (L, nb, blk/2, OUT) -> the
        byte dim covers 2 input rows each.  The tile index CLAMPS to
        [lo, lo+count) so the window is fetched exactly once per layer
        and reused (same block index => no re-DMA) outside its phase
        range."""
        if arr.ndim == 3:
            blk_rows = rows

            def imap(l, w):
                t = jnp.clip(w - lo, 0, count - 1)
                return (l, t, 0)

            return pl.BlockSpec((1, blk_rows, arr.shape[2]), gwrap(imap),
                                memory_space=pltpu.VMEM)
        nbw = rows // (arr.shape[2] * (2 if qmode == "int4" else 1))

        def imap4(l, w):
            t = jnp.clip(w - lo, 0, count - 1)
            return (l, t, 0, 0)

        return pl.BlockSpec((1, nbw, arr.shape[2], arr.shape[3]),
                            gwrap(imap4), memory_space=pltpu.VMEM)

    def wkv_spec():
        """Per-group wkv window, group index clamped to the WKV phase
        range [3na, 3na+ng): head groups (1, B, Hc, N, N) for
        bform/tchain, contiguous batch groups (1, Bc, H, N, N) for
        bbatch."""

        def imap_h(l, w):
            g = jnp.clip(w - 3 * na, 0, ng - 1)
            return (l, 0, g, 0, 0)

        def imap_b(l, w):
            g = jnp.clip(w - 3 * na, 0, ng - 1)
            return (l, g, 0, 0, 0)

        if wkvg == "bbatch":
            return pl.BlockSpec((1, Bc, H, N, N), gwrap(imap_b),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, B, Hc, N, N), gwrap(imap_h),
                            memory_space=pltpu.VMEM)

    abl = _ablate()
    with_state = "nostate" not in abl
    with_smalls = "nosmalls" not in abl
    with_big = "nobig" not in abl

    in_arrays = [x0, active]
    in_specs = [const_spec(x0), const_spec(active)]
    if with_state:
        in_arrays += [state["att_x"], state["wkv"], state["ffn_x"]]
        in_specs += [lspec(state["att_x"]), wkv_spec(),
                     lspec(state["ffn_x"])]
    for k in (_SMALL_KEYS if with_smalls else ()):
        in_arrays.append(fused[k])
        in_specs.append(lspec(fused[k]))
    ranges = {"Wr": (0, na, Kt), "Wk": (na, na, Kt), "Wv": (2 * na, na, Kt),
              "Wo": (3 * na + ng, na, Kt), "fkey": (4 * na + ng, nf, Ktf),
              "fval": (8 * na + ng, nf, Ktv)}
    for k in (_ATT + _FFN if with_big else ()):
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
    out_shape = [jax.ShapeDtypeStruct((B, C), cd)]
    out_specs = [pl.BlockSpec((B, C), gwrap(lambda l, w: (0, 0)),
                              memory_space=pltpu.VMEM)]
    if with_state:
        out_shape += [
            jax.ShapeDtypeStruct(state["att_x"].shape, sd),
            jax.ShapeDtypeStruct(state["wkv"].shape, sd),
            jax.ShapeDtypeStruct(state["ffn_x"].shape, sd),
        ]
        out_specs += [lspec(state["att_x"]), wkv_spec(),
                      lspec(state["ffn_x"])]

    scratch = [pltpu.VMEM((B, C), jnp.float32)          # x_scr
               ] + [pltpu.VMEM((B, C), jnp.float32)] * 9 + [
               pltpu.VMEM((B, F), jnp.float32),          # hk_scr
               pltpu.VMEM((B, C), jnp.float32),          # kk_scr
               pltpu.VMEM((5, B, C), jnp.float32),       # aux (wdec,a,g,rk,ln1)
               ] + ([
               pltpu.VMEM((ng, 7 * Bc, C), jnp.float32),   # vst (staged)
               pltpu.VMEM((ng, 2 * Bc, C), jnp.float32),   # yo (per-group)
               ] if wkvg == "bbatch" else [
               pltpu.VMEM((ng, 7 * B, Hc * N), jnp.float32),  # vst (staged)
               pltpu.VMEM((ng, 2 * B, Hc * N), jnp.float32)])  # yo (per-group)
    stagev = _stage_variant()
    if dots == "mono":
        # x staging slabs the mono dot bodies index by traced tile:
        # xrT/xkT/xvT/ygT, fxkT, hkT — (count, K, B) transposed
        # (stagev="t") or (count, B, K) lane-slice copies ("copy").
        def slab(count, K):
            shape = (count, K, B) if stagev == "t" else (count, B, K)
            return pltpu.VMEM(shape, jnp.float32)

        scratch += [slab(na, Kt)] * 4 + [slab(nf, Ktf), slab(nf, Ktv)]

    if "dma" in abl:
        # Bisection mode: EMPTY body (same specs => same DMA schedule,
        # the auto-pipeline fetches blocks per spec regardless of body
        # reads) — isolates DMA-pattern cost from compute.
        n_in = len(in_arrays)

        def kernel(*refs):
            refs[n_in][0:1, 0:1] = refs[0][0:1, 0:1].astype(
                refs[n_in].dtype)
            if with_state:
                pass  # state outputs left unwritten on purpose
    else:
        kernel = _kernel(H, N, na, F, cd, qmode, Hc, flat=flat,
                         only=_only(), wkvg=wkvg, dots=dots,
                         stagev=stagev, ng=ng, Bc=Bc)

    # The WKV state window (the big one: B*C*N*4 bytes/layer) streams
    # in-place — the kernel reads each head's block before writing it.
    io_alias = {}
    if with_state and "noalias" not in abl:
        io_alias = {3: 2}
    outs = pl.pallas_call(
        kernel,
        grid=(L * W,) if flat else (L, W),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=io_alias,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=117 * 1024 * 1024),
        interpret=interpret,
    )(*in_arrays)
    if with_state:
        x_final, natt, nwkv, nffn = outs
    else:
        (x_final,) = outs
        natt, nwkv, nffn = state["att_x"], state["wkv"], state["ffn_x"]

    from ..models.common import layer_norm

    hidden = layer_norm(x_final, params["ln_out_w"], params["ln_out_b"])
    new_state = {"att_x": natt, "wkv": nwkv, "ffn_x": nffn}
    return hidden[:, None, :], new_state
