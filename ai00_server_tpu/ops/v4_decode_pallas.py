"""Fused whole-network single-token (T=1) decode kernel for RWKV v4.

Same design as ops/v7_decode_pallas.py (see its docstring): the grid is
the layer loop, per-layer weight windows stream HBM->VMEM double-buffered,
the residual lives in VMEM scratch.  v4 (reference engine path
``ModelBuilder::build_v4`` at crates/ai00-core/src/lib.rs:505-515) has a
scalar per-channel WKV with the numerically-stable ``(aa, bb, pp)``
exponential accumulator (models/v4.py docstring) — all elementwise, no
heads, always f32 (``pp`` is a running log-scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.common import LN_EPS

FUSED_KEY = "_fused_t1_v4"

_BIG = ("Wr", "Wk", "Wv", "Wo", "fkey", "frec", "fval")
_BIG_SRC = {"Wr": ("att", "receptance"), "Wk": ("att", "key"),
            "Wv": ("att", "value"), "Wo": ("att", "output"),
            "fkey": ("ffn", "key"), "frec": ("ffn", "receptance"),
            "fval": ("ffn", "value")}

_FUSED_KEYS = [
    "Wr", "Wk", "Wv", "Wo",     # (L, C, C)
    "vecs",                     # (L, 7, C)  w, u, 1-mix_k, 1-mix_v,
    #                                        1-mix_r, 1-fmix_k, 1-fmix_r
    "ln1", "ln2",               # (L, 2, C)  (w, b)
    "fkey",                     # (L, C, F)
    "frec",                     # (L, C, C)
    "fval",                     # (L, F, C)
]
_VEC_IDX = {n: i for i, n in enumerate(
    ["w", "u", "mix_k", "mix_v", "mix_r", "fmix_k", "fmix_r"])}


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
    return 0 <= total <= max_vmem_bytes


def make_fused_layout(params):
    """Decode weight stacks; ``w = -exp(time_decay)`` and the ``1 - mix``
    complements are precomputed."""
    layers = params["groups"][0]["layers"]
    att, ffn = layers["att"], layers["ffn"]

    vecs = [-jnp.exp(att["time_decay"].astype(jnp.float32)),
            att["time_first"],
            1.0 - att["time_mix_k"], 1.0 - att["time_mix_v"],
            1.0 - att["time_mix_r"],
            1.0 - ffn["time_mix_k"], 1.0 - ffn["time_mix_r"]]
    from . import fused_decode as fdc

    out = {
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


def _kernel(compute_dtype, keys, qmode, packs):
    n_w = len(keys)

    def kernel(*refs):
        (x0_ref, active_ref, att_x_ref, aa_ref, bb_ref, pp_ref,
         ffn_x_ref) = refs[:7]
        w = dict(zip(keys, refs[7:7 + n_w]))
        (xout_ref, natt_x_ref, naa_ref, nbb_ref, npp_ref,
         nffn_x_ref) = refs[7 + n_w:13 + n_w]
        (x_scr,) = refs[13 + n_w:]

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

        xk = xa_in + dx * vec("mix_k").astype(cd)
        xv = xa_in + dx * vec("mix_v").astype(cd)
        xr = xa_in + dx * vec("mix_r").astype(cd)

        r = jax.nn.sigmoid(dot(xr, W("Wr")))      # (B, C) f32
        k = dot(xk, W("Wk")).astype(cd).astype(jnp.float32)
        v = dot(xv, W("Wv")).astype(cd).astype(jnp.float32)

        wv, u = vec("w"), vec("u")
        aa, bb, pp = aa_ref[0], bb_ref[0], pp_ref[0]  # (B, C) f32

        ww = u + k
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        wkv = (e1 * aa + e2 * v) / (e1 * bb + e2)

        ww2 = pp + wv
        q2 = jnp.maximum(ww2, k)
        e1u = jnp.exp(ww2 - q2)
        e2u = jnp.exp(k - q2)
        naa_ref[0] = jnp.where(active, e1u * aa + e2u * v,
                               aa).astype(naa_ref.dtype)
        nbb_ref[0] = jnp.where(active, e1u * bb + e2u,
                               bb).astype(nbb_ref.dtype)
        npp_ref[0] = jnp.where(active, q2, pp).astype(npp_ref.dtype)

        rv = (r * wkv).astype(cd)
        att_out = dot(rv, W("Wo"))
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
    """Single-token decode forward: drop-in for models/v4.forward at T=1.

    Requires ``params[FUSED_KEY]`` (make_fused_layout).  tokens: (B, 1);
    lengths: (B,) in {0, 1}.  Returns (hidden (B, 1, C), new_state).
    """
    fused = params[FUSED_KEY]
    x0 = params["emb"][tokens[:, 0]]                  # (B, C)
    B, C = x0.shape
    L = fused["ln1"].shape[0]
    compute_dtype = x0.dtype
    active = (lengths > 0)[:, None].astype(jnp.float32)

    from . import fused_decode as fdc

    layers = params["groups"][0]["layers"]
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

    state_keys = ["att_x", "aa", "bb", "pp", "ffn_x"]
    in_arrays = ([x0, active] + [state[k] for k in state_keys]
                 + weight_arrays)
    in_specs = ([const_spec(x0), const_spec(active)]
                + [wspec(state[k]) for k in state_keys]
                + [wspec(a) for a in weight_arrays])

    out_shape = ([jax.ShapeDtypeStruct((B, C), compute_dtype)]
                 + [jax.ShapeDtypeStruct(state[k].shape, state[k].dtype)
                    for k in state_keys])
    out_specs = ([pl.BlockSpec((B, C), lambda l: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(state[k]) for k in state_keys])

    outs = pl.pallas_call(
        _kernel(compute_dtype, tuple(keys), qmode, packs),
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*in_arrays)

    from ..models.common import layer_norm

    x_final = outs[0]
    new_state = dict(zip(state_keys, outs[1:]))
    hidden = layer_norm(x_final, params["ln_out_w"], params["ln_out_b"])
    return hidden[:, None, :], new_state
