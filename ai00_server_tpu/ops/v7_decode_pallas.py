"""Fused whole-network single-token (T=1) decode kernel for RWKV v7.

Why: at decode the per-layer math is ~50 small XLA ops; on TPU each op
carries a fixed issue cost (~5-10 us even when its HBM traffic is tiny),
so a 24-layer step measures ~2.7 ms against a ~0.9 ms weight-bandwidth
floor (tools/probe_ops.py).  This kernel runs the ENTIRE layer stack as
ONE Pallas op: the grid is the layer loop (sequential on TPU), each grid
step's BlockSpecs slice layer ``l``'s weights out of the stacked (L, ...)
arrays — Pallas double-buffers the HBM->VMEM DMA, so layer l+1's weights
stream in while layer l computes.  The residual ``x`` and the layer-0
value residual ``v_first`` live in VMEM scratch across grid steps.

Structure: all projections are full-width (B, C) dots on the ORIGINAL
weight layout (no duplicate weight copies in HBM); the per-head WKV
state update, L2-normalization, and GroupNorm run on 64-wide lane
slices (Mosaic supports static sub-tile lane slicing).  Inactive rows
(length 0) fold the mask into the update (w=1, k=0, kk=0 -> identity),
the same trick as ops/wkv_pallas.py.

Precision: state math is f32; activations round through the compute
dtype (bf16 for Fp16 serving) at the same points as models/v7.py, so
the kernel tracks the generic path within bf16 noise (and matches the
f32 path to ~1e-7 — tests/test_fused_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import GN_EPS, LN_EPS

W_SCALE = 0.6065306597126334  # exp(-0.5), models/v7.py:41

FUSED_KEY = "_fused_t1"

# Call-order list of the fused-layout arrays.
_FUSED_KEYS = [
    "mix",                     # (L, 6, C)   x_r,x_w,x_k,x_v,x_a,x_g
    "Wr", "Wk", "Wv", "Wo",    # (L, C, C)   original layout (no copies)
    "w1", "a1", "v1", "g1",    # (L, C, D*)
    "w2", "a2", "v2", "g2",    # (L, D*, C)
    "vecs",                    # (L, 8, C)   w0,a0,v0,k_k,k_a,r_k,lnx_w,lnx_b
    "ln1", "ln2",              # (L, 2, C)   (w, b)
    "fmix",                    # (L, 1, C)   ffn x_k
    "fkey",                    # (L, C, F)
    "fval",                    # (L, F, C)
]
_VEC_IDX = {n: i for i, n in enumerate(
    ["w0", "a0", "v0", "k_k", "k_a", "r_k", "lnx_w", "lnx_b"])}


# The six big projections that may arrive quantized (ops.quant
# quantize_group targets); each contributes either ``name`` (plain) or
# ``name_q`` + ``name_s`` (codes + scales) to the fused layout.
_BIG = ("Wr", "Wk", "Wv", "Wo", "fkey", "fval")
_BIG_SRC = {"Wr": ("att", "receptance"), "Wk": ("att", "key"),
            "Wv": ("att", "value"), "Wo": ("att", "output"),
            "fkey": ("ffn", "key"), "fval": ("ffn", "value")}


def supports(params) -> bool:
    """True when the fused decode layout is installed on these params."""
    return FUSED_KEY in params


def can_fuse(params, max_vmem_bytes=55 * 1024 * 1024,
             batch=16) -> bool:
    """Whether a fused layout can be built: one layer group (plain, or
    with the big projections uniformly int8/nf4/sf4-quantized) whose
    per-layer stored bytes fit a double-buffered VMEM budget.  Quantized
    windows stream 2-4x fewer HBM bytes AND admit models whose bf16
    layers would not fit VMEM (1.6B int8, 3B nf4)."""
    from . import fused_decode as fdc

    if len(params["groups"]) != 1:
        return False
    layers = params["groups"][0]["layers"]
    if fdc.group_mode(layers, _BIG_SRC) is None:
        return False
    total = fdc.stored_bytes_per_layer(layers)
    att = layers["att"]
    H, N = att["r_k"].shape[-2:]
    # .shape[-2] is the in dim for both plain (L, C, C) arrays and
    # QuantizedLinear (logical (in, out)).
    C = att["receptance"].shape[-2]
    # VMEM feasibility: double-buffered weight windows PLUS the state
    # in/out windows (each ~2x-buffered, f32) must fit.  Empirically the
    # 1.6B-int8 case (25 MB weights, 8.4 MB wkv window at B=16, H=32)
    # compiled to a 187 MB vmem program — the state windows dominate, so
    # budget them at 8x their f32 size.
    state_window = batch * C * N * 4
    if 2 * total + 8 * state_window > 110 * 1024 * 1024:
        return False
    if C != H * N or N % 8 != 0:
        return False
    return 0 <= total <= max_vmem_bytes


def make_fused_layout(params):
    """Decode weight stacks: the big matmul weights are passed through in
    their original layout (no HBM duplication; quantized ones as
    codes + scales); only the per-channel vectors are re-packed into a
    few stacked arrays."""
    from . import fused_decode as fdc

    layers = params["groups"][0]["layers"]
    att, ffn = layers["att"], layers["ffn"]
    L = att["r_k"].shape[0]
    C = att["r_k"].shape[-2] * att["r_k"].shape[-1]

    vec_names = ["w0", "a0", "v0", "k_k", "k_a"]
    vecs = [att[n] for n in vec_names] + [
        att["r_k"].reshape(L, C), att["ln_x_w"], att["ln_x_b"]]
    out = {
        "mix": jnp.stack([att[k] for k in
                          ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")], 1),
        "w1": att["w1"], "a1": att["a1"], "v1": att["v1"], "g1": att["g1"],
        "w2": att["w2"], "a2": att["a2"], "v2": att["v2"], "g2": att["g2"],
        "vecs": jnp.stack([v.astype(jnp.float32) for v in vecs], 1),
        "ln1": jnp.stack([layers["ln1_w"], layers["ln1_b"]], 1),
        "ln2": jnp.stack([layers["ln2_w"], layers["ln2_b"]], 1),
        "fmix": ffn["x_k"][:, None],
    }
    out.update(fdc.big_layout_entries(layers, _BIG_SRC))
    return out


def _ln(x, w, b, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _kernel(H, N, compute_dtype, keys, qmode, packs):
    n_w = len(keys)

    def kernel(*refs):
        (x0_ref, active_ref, att_x_ref, wkv_ref, ffn_x_ref) = refs[:5]
        w = dict(zip(keys, refs[5:5 + n_w]))
        (xout_ref, natt_x_ref, nwkv_ref, nffn_x_ref) = refs[5 + n_w:9 + n_w]
        x_scr, vf_scr, y_scr, bn_scr = refs[9 + n_w:]

        l = pl.program_id(0)
        cd = compute_dtype

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[:].astype(jnp.float32)

        x = x_scr[:]                                  # (B, C) f32
        B, C = x.shape
        active = active_ref[:] > 0                    # (B, 1) bool

        def vec(name):                                # (1, C) f32
            i = _VEC_IDX[name]
            return w["vecs"][0][i:i + 1]

        from . import fused_decode as fdc

        # Big projections dequantize in VMEM when stored quantized
        # (codes stream from HBM at 1-0.5 bytes/element).
        W = fdc.make_W(w, qmode, packs, cd)

        def dot(a, b):
            return jnp.dot(a, b.astype(cd),
                           preferred_element_type=jnp.float32)

        # ---- time mix (full width) ----
        ln1w = w["ln1"][0]
        ln1 = _ln(x, ln1w[0:1], ln1w[1:2], LN_EPS)
        prev = att_x_ref[0].astype(jnp.float32)
        xa_in = ln1.astype(cd)
        dx = (prev - ln1).astype(cd)
        mix = w["mix"][0]                             # (6, C)
        xr = xa_in + dx * mix[0:1].astype(cd)
        xw = xa_in + dx * mix[1:2].astype(cd)
        xk = xa_in + dx * mix[2:3].astype(cd)
        xv = xa_in + dx * mix[3:4].astype(cd)
        xaa = xa_in + dx * mix[4:5].astype(cd)
        xg = xa_in + dx * mix[5:6].astype(cd)

        # Round through cd at the same points as the generic path.
        r = dot(xr, W("Wr")).astype(cd).astype(jnp.float32)
        k = dot(xk, W("Wk")).astype(cd).astype(jnp.float32)
        v = dot(xv, W("Wv")).astype(cd).astype(jnp.float32)

        hw = jnp.tanh(dot(xw, w["w1"][0])).astype(cd)
        wdec = jnp.exp(-W_SCALE * jax.nn.sigmoid(
            vec("w0") + dot(hw, w["w2"][0])))         # (B, C) f32

        ha = dot(xaa, w["a1"][0]).astype(cd)
        a = jax.nn.sigmoid(vec("a0") + dot(ha, w["a2"][0]))
        a = a.astype(cd).astype(jnp.float32)

        hg = jax.nn.sigmoid(dot(xg, w["g1"][0])).astype(cd)
        g = dot(hg, w["g2"][0])                       # (B, C) f32

        kk_full = k * vec("k_k")                      # (B, C) f32
        k2 = k * (1.0 + (a - 1.0) * vec("k_a"))

        hv = dot(xv, w["v1"][0]).astype(cd)
        vmix = jax.nn.sigmoid(vec("v0") + dot(hv, w["v2"][0]))
        vmix = vmix.astype(cd).astype(jnp.float32)

        is_first = l == 0

        @pl.when(is_first)
        def _():
            vf_scr[:] = v

        v2 = jnp.where(is_first, v, v + (vf_scr[:] - v) * vmix)

        rk = r * k2 * vec("r_k")                      # bonus pre-product
        # Inactive rows: identity state update (bonus above stays
        # unmasked to match the generic path's discarded output).
        wdec = jnp.where(active, wdec, 1.0)
        k2 = jnp.where(active, k2, 0.0)
        kk_full = jnp.where(active, kk_full, 0.0)

        # ---- per-head WKV + GroupNorm on 64-wide lane slices ----
        for h in range(H):
            sl = slice(h * N, (h + 1) * N)
            kk_h = kk_full[:, sl]
            kk_h = kk_h / jnp.maximum(
                jnp.sqrt(jnp.sum(kk_h * kk_h, axis=-1, keepdims=True)),
                1e-12)
            kk_h = kk_h.astype(cd).astype(jnp.float32)
            s = wkv_ref[0][:, h]                      # (B, N, N) f32
            skk = jnp.sum(s * kk_h[:, None, :], axis=-1)
            s_new = (s * wdec[:, sl][:, None, :]
                     - skk[:, :, None] * (kk_h * a[:, sl])[:, None, :]
                     + v2[:, sl][:, :, None] * k2[:, sl][:, None, :])
            nwkv_ref[0, :, h] = s_new.astype(nwkv_ref.dtype)
            y_h = jnp.sum(s_new * r[:, sl][:, None, :], axis=-1)  # (B, N)
            mean = jnp.mean(y_h, axis=-1, keepdims=True)
            var = jnp.var(y_h, axis=-1, keepdims=True)
            y_scr[:, sl] = (y_h - mean) * jax.lax.rsqrt(var + GN_EPS)
            bn_scr[:, sl] = jnp.sum(rk[:, sl], axis=-1,
                                    keepdims=True) * v2[:, sl]

        yf = (y_scr[:] * vec("lnx_w") + vec("lnx_b")) + bn_scr[:]
        att_out = dot((yf * g).astype(cd), W("Wo"))
        x = x + att_out

        natt_x_ref[0] = jnp.where(active, ln1, prev).astype(natt_x_ref.dtype)

        # ---- channel mix ----
        ln2w = w["ln2"][0]
        ln2 = _ln(x, ln2w[0:1], ln2w[1:2], LN_EPS)
        fprev = ffn_x_ref[0].astype(jnp.float32)
        fxk = ln2.astype(cd) + (fprev - ln2).astype(cd) \
            * w["fmix"][0][0:1].astype(cd)
        hk = dot(fxk, W("fkey"))
        hk = jnp.square(jnp.maximum(hk, 0.0)).astype(cd)
        x = x + dot(hk, W("fval"))

        nffn_x_ref[0] = jnp.where(active, ln2, fprev).astype(nffn_x_ref.dtype)
        x_scr[:] = x

        @pl.when(l == pl.num_programs(0) - 1)
        def _():
            xout_ref[:] = x.astype(xout_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def forward_t1(params, state, tokens, lengths, interpret=False):
    """Single-token decode forward: drop-in for models/v7.forward at T=1.

    Requires ``params[FUSED_KEY]`` (make_fused_layout).  tokens: (B, 1);
    lengths: (B,) in {0, 1}.  Returns (hidden (B, 1, C), new_state).
    """
    fused = params[FUSED_KEY]
    L = fused["ln1"].shape[0]
    x0 = params["emb"][tokens[:, 0]]                  # (B, C)
    B, C = x0.shape
    layers = params["groups"][0]["layers"]
    H, N = layers["att"]["r_k"].shape[-2:]
    compute_dtype = x0.dtype
    active = (lengths > 0)[:, None].astype(jnp.float32)

    # Expand the key list for quantized big projections (codes + scales)
    # and pick the dequant mode/packs.  Both derive from the params
    # STRUCTURE, so jit re-traces when the layout changes.
    from . import fused_decode as fdc

    keys = fdc.expand_keys(_FUSED_KEYS, _BIG, fused)
    qmode, packs = ("none", None) if len(keys) == len(_FUSED_KEYS) \
        else fdc.mode_packs(layers, _BIG_SRC)
    weight_arrays = [fused[k] for k in keys]

    def wspec(arr):
        blk = (1,) + arr.shape[1:]
        nd = len(blk) - 1
        return pl.BlockSpec(blk, lambda l, _nd=nd: (l,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda l, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_arrays = ([x0, active, state["att_x"], state["wkv"], state["ffn_x"]]
                 + weight_arrays)
    in_specs = ([const_spec(x0), const_spec(active),
                 wspec(state["att_x"]), wspec(state["wkv"]),
                 wspec(state["ffn_x"])]
                + [wspec(a) for a in weight_arrays])

    sd = state["wkv"].dtype
    out_shape = [
        jax.ShapeDtypeStruct((B, C), compute_dtype),
        jax.ShapeDtypeStruct(state["att_x"].shape, sd),
        jax.ShapeDtypeStruct(state["wkv"].shape, sd),
        jax.ShapeDtypeStruct(state["ffn_x"].shape, sd),
    ]
    out_specs = [
        pl.BlockSpec((B, C), lambda l: (0, 0), memory_space=pltpu.VMEM),
        wspec(state["att_x"]),
        wspec(state["wkv"]),
        wspec(state["ffn_x"]),
    ]

    x_final, natt, nwkv, nffn = pl.pallas_call(
        _kernel(H, N, compute_dtype, tuple(keys), qmode, packs),
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32),
                        pltpu.VMEM((B, C), jnp.float32),
                        pltpu.VMEM((B, C), jnp.float32),
                        pltpu.VMEM((B, C), jnp.float32)],
        # Weight windows + stack exceed Mosaic's default 16 MB scoped
        # budget; ~29 MB/layer double-buffered plus temporaries fits 100.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*in_arrays)

    from ..models.common import layer_norm

    hidden = layer_norm(x_final, params["ln_out_w"], params["ln_out_b"])
    new_state = {"att_x": natt, "wkv": nwkv, "ffn_x": nffn}
    return hidden[:, None, :], new_state
