"""Fused whole-network single-token (T=1) decode kernel for RWKV v6.

Same design as ops/v7_decode_pallas.py (see its docstring for the why):
the grid is the layer loop, per-layer weight windows stream HBM->VMEM
double-buffered, the residual lives in VMEM scratch, and all ~45 per-layer
XLA ops collapse into one Pallas op.  v6 ("Finch", reference engine path
``ModelBuilder::build_v6`` at crates/ai00-core/src/lib.rs:505-515) differs
from v7 in: 5-stage low-rank data-dependent token-shift offsets (maa),
low-rank data-dependent decay, a ``first`` (u) bonus inside the WKV read,
SiLU gating, and a receptance-gated square-ReLU channel mix.

The 5 maa stages and the decay lora are split into separate (C, D)/(D, C)
arrays at layout-build time so the kernel never lane-slices at non-tile
offsets.  Inactive rows (length 0) fold the mask into the update
(w=1, k=0 -> identity), as in the generic path's masked_select.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import GN_EPS, LN_EPS

FUSED_KEY = "_fused_t1_v6"

# Call-order list of the fused-layout arrays.
_BIG = ("Wr", "Wk", "Wv", "Wg", "Wo", "fkey", "frec", "fval")
_BIG_SRC = {"Wr": ("att", "receptance"), "Wk": ("att", "key"),
            "Wv": ("att", "value"), "Wg": ("att", "gate"),
            "Wo": ("att", "output"), "fkey": ("ffn", "key"),
            "frec": ("ffn", "receptance"), "fval": ("ffn", "value")}

_FUSED_KEYS = [
    "mix",                      # (L, 6, C)  mix_x, mix_w, mix_k, mix_v,
    #                                        mix_r, mix_g
    "Wr", "Wk", "Wv", "Wg", "Wo",   # (L, C, C)
    "mw1_0", "mw1_1", "mw1_2", "mw1_3", "mw1_4",   # (L, C, D) maa stages
    "mw2_0", "mw2_1", "mw2_2", "mw2_3", "mw2_4",   # (L, D, C) order w,k,v,r,g
    "dw1", "dw2",               # (L, C, Dw), (L, Dw, C) decay lora
    "vecs",                     # (L, 6, C)  decay, first, lnx_w, lnx_b,
    #                                        fmix_k, fmix_r
    "ln1", "ln2",               # (L, 2, C)  (w, b)
    "fkey",                     # (L, C, F)
    "frec",                     # (L, C, C)
    "fval",                     # (L, F, C)
]
_VEC_IDX = {n: i for i, n in enumerate(
    ["decay", "first", "lnx_w", "lnx_b", "fmix_k", "fmix_r"])}


def supports(params) -> bool:
    return FUSED_KEY in params


def can_fuse(params, max_vmem_bytes=55 * 1024 * 1024,
             batch=16) -> bool:
    """One layer group (plain or uniformly quantized big projections)
    whose per-layer stored bytes fit a double-buffered VMEM budget (same
    rule as the v7 kernel)."""
    from . import fused_decode as fdc

    if len(params["groups"]) != 1:
        return False
    layers = params["groups"][0]["layers"]
    if fdc.group_mode(layers, _BIG_SRC) is None:
        return False
    total = fdc.stored_bytes_per_layer(layers)
    att = layers["att"]
    H, N = att["first"].shape[-2:]
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
    """Decode weight stacks: big matmuls pass through in their original
    layout; maa/decay loras split per stage; vectors re-packed."""
    layers = params["groups"][0]["layers"]
    att, ffn = layers["att"], layers["ffn"]
    L = att["mix_w1"].shape[0]
    C = att["first"].shape[-2] * att["first"].shape[-1]
    D5 = att["mix_w1"].shape[-1]
    D = D5 // 5

    from . import fused_decode as fdc

    vecs = [att["decay"], att["first"].reshape(L, C),
            att["ln_x_w"], att["ln_x_b"], ffn["mix_k"], ffn["mix_r"]]
    out = {
        "mix": jnp.stack([att[k] for k in
                          ("mix_x", "mix_w", "mix_k", "mix_v",
                           "mix_r", "mix_g")], 1),
        "dw1": att["decay_w1"], "dw2": att["decay_w2"],
        "vecs": jnp.stack([v.astype(jnp.float32) for v in vecs], 1),
        "ln1": jnp.stack([layers["ln1_w"], layers["ln1_b"]], 1),
        "ln2": jnp.stack([layers["ln2_w"], layers["ln2_b"]], 1),
    }
    for f in range(5):
        out[f"mw1_{f}"] = att["mix_w1"][:, :, f * D:(f + 1) * D]
        out[f"mw2_{f}"] = att["mix_w2"][:, f]          # (L, D, C)
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
        x_scr, y_scr = refs[9 + n_w:]

        l = pl.program_id(0)
        cd = compute_dtype

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[:].astype(jnp.float32)

        x = x_scr[:]                                  # (B, C) f32
        active = active_ref[:] > 0                    # (B, 1) bool

        def vec(name):                                # (1, C) f32
            i = _VEC_IDX[name]
            return w["vecs"][0][i:i + 1]

        from . import fused_decode as fdc

        # Big projections dequantize in VMEM when stored quantized.
        W = fdc.make_W(w, qmode, packs, cd)

        def dot(a, b):
            return jnp.dot(a, b.astype(cd),
                           preferred_element_type=jnp.float32)

        # ---- time mix ----
        ln1w = w["ln1"][0]
        ln1 = _ln(x, ln1w[0:1], ln1w[1:2], LN_EPS)
        prev = att_x_ref[0].astype(jnp.float32)
        xa_in = ln1.astype(cd)
        dx = (prev - ln1).astype(cd)
        mix = w["mix"][0]                             # (6, C)

        xxx = xa_in + dx * mix[0:1].astype(cd)
        # 5 maa stages (w, k, v, r, g): m_f = tanh(xxx @ w1_f) @ w2_f.
        m = []
        for f in range(5):
            h = jnp.tanh(dot(xxx, w[f"mw1_{f}"][0])).astype(cd)
            m.append(dot(h, w[f"mw2_{f}"][0]).astype(cd))
        xw = xa_in + dx * (mix[1:2].astype(cd) + m[0])
        xk = xa_in + dx * (mix[2:3].astype(cd) + m[1])
        xv = xa_in + dx * (mix[3:4].astype(cd) + m[2])
        xr = xa_in + dx * (mix[4:5].astype(cd) + m[3])
        xg = xa_in + dx * (mix[5:6].astype(cd) + m[4])

        r = dot(xr, W("Wr")).astype(cd).astype(jnp.float32)
        k = dot(xk, W("Wk")).astype(cd).astype(jnp.float32)
        v = dot(xv, W("Wv")).astype(cd).astype(jnp.float32)
        g = dot(xg, W("Wg"))                       # (B, C) f32
        g = g * jax.nn.sigmoid(g)                     # SiLU

        hd = jnp.tanh(dot(xw, w["dw1"][0])).astype(cd)
        ww = vec("decay") + dot(hd, w["dw2"][0])
        wdec = jnp.exp(-jnp.exp(ww))                  # (B, C) f32
        u_full = vec("first")                         # (1, C) f32

        # ---- per-head WKV (k-dim, v-dim) + GroupNorm on lane slices ----
        # y is computed unmasked (matches the generic path's discarded
        # output for inactive rows); only the state update is gated.
        act3 = active[:, :, None]                     # (B, 1, 1)
        for h in range(H):
            sl = slice(h * N, (h + 1) * N)
            s = wkv_ref[0][:, h]                      # (B, N, N) f32
            a = k[:, sl][:, :, None] * v[:, sl][:, None, :]
            y_h = jnp.sum((s + u_full[:, sl][:, :, None] * a)
                          * r[:, sl][:, :, None], axis=1)     # (B, N)
            s_new = wdec[:, sl][:, :, None] * s + a
            nwkv_ref[0, :, h] = jnp.where(act3, s_new,
                                          s).astype(nwkv_ref.dtype)
            mean = jnp.mean(y_h, axis=-1, keepdims=True)
            var = jnp.var(y_h, axis=-1, keepdims=True)
            y_scr[:, sl] = (y_h - mean) * jax.lax.rsqrt(var + GN_EPS)

        yf = (y_scr[:] * vec("lnx_w") + vec("lnx_b")).astype(cd) \
            .astype(jnp.float32)
        att_out = dot((yf * g).astype(cd), W("Wo"))
        x = x + att_out

        natt_x_ref[0] = jnp.where(active, ln1, prev).astype(natt_x_ref.dtype)

        # ---- channel mix (receptance-gated) ----
        ln2w = w["ln2"][0]
        ln2 = _ln(x, ln2w[0:1], ln2w[1:2], LN_EPS)
        fprev = ffn_x_ref[0].astype(jnp.float32)
        fdx = (fprev - ln2).astype(cd)
        fxk = ln2.astype(cd) + fdx * vec("fmix_k").astype(cd)
        fxr = ln2.astype(cd) + fdx * vec("fmix_r").astype(cd)
        hk = dot(fxk, W("fkey"))
        hk = jnp.square(jnp.maximum(hk, 0.0)).astype(cd)
        rf = jax.nn.sigmoid(dot(fxr, W("frec")))
        x = x + rf * dot(hk, W("fval"))

        nffn_x_ref[0] = jnp.where(active, ln2, fprev).astype(nffn_x_ref.dtype)
        x_scr[:] = x

        @pl.when(l == pl.num_programs(0) - 1)
        def _():
            xout_ref[:] = x.astype(xout_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def forward_t1(params, state, tokens, lengths, interpret=False):
    """Single-token decode forward: drop-in for models/v6.forward at T=1.

    Requires ``params[FUSED_KEY]`` (make_fused_layout).  tokens: (B, 1);
    lengths: (B,) in {0, 1}.  Returns (hidden (B, 1, C), new_state).
    """
    fused = params[FUSED_KEY]
    L = fused["ln1"].shape[0]
    x0 = params["emb"][tokens[:, 0]]                  # (B, C)
    B, C = x0.shape
    layers = params["groups"][0]["layers"]
    H, N = layers["att"]["first"].shape[-2:]
    compute_dtype = x0.dtype
    active = (lengths > 0)[:, None].astype(jnp.float32)

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
                        pltpu.VMEM((B, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*in_arrays)

    from ..models.common import layer_norm

    hidden = layer_norm(x_final, params["ln_out_w"], params["ln_out_b"])
    new_state = {"att_x": natt, "wkv": nwkv, "ffn_x": nffn}
    return hidden[:, None, :], new_state
