"""Fused whole-network single-token (T=1) decode kernel for RWKV v5.

Same design as ops/v7_decode_pallas.py (see its docstring): the grid is
the layer loop, per-layer weight windows stream HBM->VMEM double-buffered,
the residual lives in VMEM scratch.  v5.2 ("Eagle", reference engine path
``ModelBuilder::build_v5`` at crates/ai00-core/src/lib.rs:494-504) is the
simplest of the headed versions: static per-channel decay
``exp(-exp(time_decay))`` and bonus ``time_first`` (both precomputed into
the vector stack at layout build), ``x + dx*(1-mix)`` token-shift
convention, SiLU gate, and the receptance-gated square-ReLU channel mix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import GN_EPS, LN_EPS

FUSED_KEY = "_fused_t1_v5"

_BIG = ("Wr", "Wk", "Wv", "Wg", "Wo", "fkey", "frec", "fval")
_BIG_SRC = {"Wr": ("att", "receptance"), "Wk": ("att", "key"),
            "Wv": ("att", "value"), "Wg": ("att", "gate"),
            "Wo": ("att", "output"), "fkey": ("ffn", "key"),
            "frec": ("ffn", "receptance"), "fval": ("ffn", "value")}

_FUSED_KEYS = [
    "mix",                      # (L, 4, C)  1-time_mix_{k,v,r,g}
    "Wr", "Wk", "Wv", "Wg", "Wo",   # (L, C, C)
    "vecs",                     # (L, 6, C)  wdec, first, lnx_w, lnx_b,
    #                                        1-fmix_k, 1-fmix_r
    "ln1", "ln2",               # (L, 2, C)  (w, b)
    "fkey",                     # (L, C, F)
    "frec",                     # (L, C, C)
    "fval",                     # (L, F, C)
]
_VEC_IDX = {n: i for i, n in enumerate(
    ["wdec", "first", "lnx_w", "lnx_b", "fmix_k", "fmix_r"])}


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
    H, N = att["time_first"].shape[-2:]
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
    """Decode weight stacks; the static decay/bonus and the (1 - mix)
    complements are precomputed so the kernel is pure muls/dots."""
    from . import fused_decode as fdc

    layers = params["groups"][0]["layers"]
    att, ffn = layers["att"], layers["ffn"]
    L = att["time_first"].shape[0]
    C = att["time_first"].shape[-2] * att["time_first"].shape[-1]

    wdec = jnp.exp(-jnp.exp(att["time_decay"].astype(jnp.float32)))
    vecs = [wdec.reshape(L, C), att["time_first"].reshape(L, C),
            att["ln_x_w"], att["ln_x_b"],
            1.0 - ffn["time_mix_k"], 1.0 - ffn["time_mix_r"]]
    out = {
        "mix": jnp.stack([1.0 - att[k].astype(jnp.float32) for k in
                          ("time_mix_k", "time_mix_v", "time_mix_r",
                           "time_mix_g")], 1),
        "vecs": jnp.stack([v.astype(jnp.float32) for v in vecs], 1),
        "ln1": jnp.stack([layers["ln1_w"], layers["ln1_b"]], 1),
        "ln2": jnp.stack([layers["ln2_w"], layers["ln2_b"]], 1),
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
        mix = w["mix"][0]                             # (4, C) = 1 - mix_*

        xk = xa_in + dx * mix[0:1].astype(cd)
        xv = xa_in + dx * mix[1:2].astype(cd)
        xr = xa_in + dx * mix[2:3].astype(cd)
        xg = xa_in + dx * mix[3:4].astype(cd)

        r = dot(xr, W("Wr")).astype(cd).astype(jnp.float32)
        k = dot(xk, W("Wk")).astype(cd).astype(jnp.float32)
        v = dot(xv, W("Wv")).astype(cd).astype(jnp.float32)
        g = dot(xg, W("Wg"))                       # (B, C) f32
        g = g * jax.nn.sigmoid(g)                     # SiLU

        wdec = vec("wdec")                            # (1, C) static decay
        u_full = vec("first")

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

        # ---- channel mix (receptance-gated, 1-mix convention) ----
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
    """Single-token decode forward: drop-in for models/v5.forward at T=1.

    Requires ``params[FUSED_KEY]`` (make_fused_layout).  tokens: (B, 1);
    lengths: (B,) in {0, 1}.  Returns (hidden (B, 1, C), new_state).
    """
    fused = params[FUSED_KEY]
    x0 = params["emb"][tokens[:, 0]]                  # (B, C)
    B, C = x0.shape
    L = fused["ln1"].shape[0]
    layers = params["groups"][0]["layers"]
    H, N = layers["att"]["time_first"].shape[-2:]
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
