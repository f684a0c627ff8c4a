"""RWKV v6 ("Finch") — pure-JAX TPU-first implementation.

Covers the reference engine's v6 path (consumed via ``ModelBuilder::build_v6``
at crates/ai00-core/src/lib.rs:505-515).  v6 upgrades v5 with data-dependent
token shift (the low-rank "maa" offsets) and a data-dependent per-token decay:

    dx   = x_prev - x
    xxx  = x + dx * mix_x
    m*   = tanh(xxx @ w1).view(5, D) stages @ w2[5]          (5 offsets)
    x*   = x + dx * (mix_* + m*)
    w_t  = exp(-exp(decay + tanh(xw @ dw1) @ dw2))

The WKV recurrence and head layout are shared with v5 (``v5.wkv_scan``,
state ``(k-dim, v-dim)``); the channel mix uses the v6 convention
``x + dx * mix`` (converted checkpoints rename ``time_maa_*`` to
``time_mix_*``, see crates/converter/src/main.rs:8-13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (
    GN_EPS,
    acc_dtype,
    group_norm,
    layer_norm,
    length_mask,
    linear,
    token_shift,
    update_shift_state,
)
from .v5 import dispatch_wkv56


def init_state(info, batch: int, dtype=jnp.float32):
    L, C = info.num_layer, info.num_emb
    H, N = info.num_head, info.head_size
    return {
        "att_x": jnp.zeros((L, batch, C), dtype),
        "wkv": jnp.zeros((L, batch, H, N, N), dtype),  # (k-dim, v-dim)
        "ffn_x": jnp.zeros((L, batch, C), dtype),
    }


def _att(p, att_x, wkv, x, lengths):
    """v6 time mix over one chunk.  x: (B, T, C)."""
    B, T, C = x.shape
    H, N = p["first"].shape
    acc = acc_dtype(x.dtype)

    xp = token_shift(att_x, x)
    dx = xp - x

    # Low-rank data-dependent shift offsets: 5 heads packed in w1/w2.
    xxx = x + dx * p["mix_x"]
    D = p["mix_w1"].shape[1] // 5
    h = jnp.tanh(
        jnp.dot(xxx, p["mix_w1"].astype(x.dtype), preferred_element_type=acc)
    ).astype(x.dtype)
    h = h.reshape(B, T, 5, D)
    # (B,T,5,D) @ (5,D,C) -> (B,T,5,C).  f32 operands: the CPU backend
    # cannot execute this general-dot shape as bf16 x bf16 -> f32, and the
    # rank is tiny so the upcast is free.
    m = jnp.einsum("btfd,fdc->btfc", h.astype(acc),
                   p["mix_w2"].astype(acc),
                   preferred_element_type=acc).astype(x.dtype)
    mw, mk, mv, mr, mg = [m[:, :, i] for i in range(5)]

    xw = x + dx * (p["mix_w"] + mw)
    xk = x + dx * (p["mix_k"] + mk)
    xv = x + dx * (p["mix_v"] + mv)
    xr = x + dx * (p["mix_r"] + mr)
    xg = x + dx * (p["mix_g"] + mg)

    r = linear(xr, p["receptance"]).reshape(B, T, H, N)
    k = linear(xk, p["key"]).reshape(B, T, H, N)
    v = linear(xv, p["value"]).reshape(B, T, H, N)
    g = linear(xg, p["gate"])
    g = g * jax.nn.sigmoid(g.astype(acc)).astype(x.dtype)  # SiLU

    dw = jnp.tanh(
        jnp.dot(xw, p["decay_w1"].astype(x.dtype), preferred_element_type=acc)
    ).astype(x.dtype)
    ww = p["decay"].astype(acc) + jnp.dot(
        dw, p["decay_w2"].astype(x.dtype), preferred_element_type=acc
    )
    w = jnp.exp(-jnp.exp(ww)).reshape(B, T, H, N)
    u = p["first"]

    mask = length_mask(lengths, T)
    new_wkv, y = dispatch_wkv56(wkv, r, k, v, w, u, mask)

    y = y.reshape(B, T, C).astype(x.dtype)
    y = group_norm(y, H, p["ln_x_w"], p["ln_x_b"], GN_EPS)
    out = linear(y * g, p["output"])
    return out, update_shift_state(att_x, x, lengths), new_wkv


def _channel_mix(p, shift, x, lengths):
    """v6 channel mix: ``x + dx*mix`` convention, receptance-gated."""
    xp = token_shift(shift, x)
    dx = xp - x
    xk = x + dx * p["mix_k"]
    xr = x + dx * p["mix_r"]
    k = jnp.square(jax.nn.relu(linear(xk, p["key"])))
    r = jax.nn.sigmoid(linear(xr, p["receptance"]))
    out = r * linear(k, p["value"])
    return out, update_shift_state(shift, x, lengths)


def _layer(p, state, x, lengths):
    att_x, wkv, ffn_x = state
    xa = layer_norm(x, p["ln1_w"], p["ln1_b"])
    att_out, new_att_x, new_wkv = _att(p["att"], att_x, wkv, xa, lengths)
    x = x + att_out
    xf = layer_norm(x, p["ln2_w"], p["ln2_b"])
    ffn_out, new_ffn_x = _channel_mix(p["ffn"], ffn_x, xf, lengths)
    x = x + ffn_out
    return x, (new_att_x, new_wkv, new_ffn_x)


def forward(params, state, tokens, lengths):
    """Forward a chunk.  tokens: (B, T); lengths: (B,).  Returns
    (hidden (B, T, C) post-ln_out, new_state)."""
    if tokens.shape[1] == 1:
        # T=1 decode: fused whole-network Pallas kernel (one op per step
        # instead of ~45/layer) — see ops/v6_decode_pallas.py.  The
        # engine installs the fused weight layout at load when eligible.
        # Models too large for whole-layer VMEM windows (7B-class) take
        # the phased whole-layer kernel (ops/v56_phased_pallas.py).
        from ..ops import wkv as wkv_dispatch
        from ..ops import v6_decode_pallas as fd

        if fd.supports(params):
            B = tokens.shape[0]
            mode = wkv_dispatch.fused_decode_mode()
            if mode != "off" and fd.can_fuse(params, batch=B):
                return fd.forward_t1(params, state, tokens, lengths,
                                     interpret=(mode == "interpret"))
            from ..ops import v56_phased_pallas as pd

            pmode = wkv_dispatch.phased_decode_mode()
            if pmode != "off" and pd.can_phase(params, B, "V6"):
                return pd.forward_t1(params, state, tokens, lengths, "V6",
                                     interpret=(pmode == "interpret"))
    x = params["emb"][tokens]  # ln0 folded into emb at load
    new_att_x, new_wkv, new_ffn_x = [], [], []
    offset = 0
    for group in params["groups"]:
        K = group["layer_index"].shape[0]
        sl = slice(offset, offset + K)

        # Quantized leaves stay scan-INVARIANT (slicing their codes
        # per iteration would copy the whole model through HBM every
        # step); the body reinserts layer views (ops.quant).
        from ..ops.quant import hoist_quantized

        xs_layers, reinsert = hoist_quantized(group["layers"])

        def scan_fn(x, xs, _reinsert=reinsert):
            p, att_x, wkv, ffn_x, gidx = xs
            p = _reinsert(p, gidx)
            x, new_s = _layer(p, (att_x, wkv, ffn_x), x, lengths)
            return x, new_s

        x, (g_att_x, g_wkv, g_ffn_x) = jax.lax.scan(
            scan_fn,
            x,
            (xs_layers, state["att_x"][sl], state["wkv"][sl],
             state["ffn_x"][sl],
             jnp.arange(group["layer_index"].shape[0], dtype=jnp.int32)),
        )
        new_att_x.append(g_att_x)
        new_wkv.append(g_wkv)
        new_ffn_x.append(g_ffn_x)
        offset += K

    new_state = {
        "att_x": jnp.concatenate(new_att_x, axis=0),
        "wkv": jnp.concatenate(new_wkv, axis=0),
        "ffn_x": jnp.concatenate(new_ffn_x, axis=0),
    }
    hidden = layer_norm(x, params["ln_out_w"], params["ln_out_b"])
    return hidden, new_state
