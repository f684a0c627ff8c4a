"""RWKV v4 — pure-JAX TPU-first implementation.

Covers the reference engine's v4 path (consumed via ``ModelBuilder::build_v4``
at crates/ai00-core/src/lib.rs:505-515).  v4 has a scalar per-channel WKV
with the numerically-stable exponential accumulator state ``(aa, bb, pp)``:

    output_t:  ww = u + k_t;  q = max(pp, ww)
               wkv = (e^{pp-q} aa + e^{ww-q} v_t) / (e^{pp-q} bb + e^{ww-q})
    update:    ww = pp + w  (w = -exp(time_decay));  q = max(ww, k_t)
               aa = e^{ww-q} aa + e^{k_t-q} v_t
               bb = e^{ww-q} bb + e^{k_t-q};  pp = q

``r`` is a sigmoid gate; token shift uses the v4 convention
``x*mix + x_prev*(1-mix)``.  The recurrence is always computed in f32 —
``pp`` is a running log-scale and must not be squashed to bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (
    acc_dtype,
    channel_mix_v4,
    layer_norm,
    length_mask,
    linear,
    masked_select,
    token_shift,
    update_shift_state,
)

PP_INIT = -1e30


def init_state(info, batch: int, dtype=jnp.float32):
    L, C = info.num_layer, info.num_emb
    acc = jnp.promote_types(dtype, jnp.float32)
    return {
        "att_x": jnp.zeros((L, batch, C), dtype),
        "aa": jnp.zeros((L, batch, C), acc),
        "bb": jnp.zeros((L, batch, C), acc),
        "pp": jnp.full((L, batch, C), PP_INIT, acc),
        "ffn_x": jnp.zeros((L, batch, C), dtype),
    }


def _wkv_scan(aa, bb, pp, k, v, w, u, mask):
    """Sequential v4 WKV over a chunk.

    aa, bb, pp: (B, C) f32; k, v: (B, T, C); w, u: (C,); mask: (B, T).
    Returns ((aa, bb, pp), wkv) with wkv: (B, T, C).
    """
    acc = aa.dtype

    def step(carry, xs):
        aa, bb, pp = carry
        k_t, v_t, m_t = xs
        ww = u + k_t
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        wkv_t = (e1 * aa + e2 * v_t) / (e1 * bb + e2)

        ww = pp + w
        q = jnp.maximum(ww, k_t)
        e1 = jnp.exp(ww - q)
        e2 = jnp.exp(k_t - q)
        aa_n = e1 * aa + e2 * v_t
        bb_n = e1 * bb + e2
        pp_n = q
        aa = masked_select(m_t, aa_n, aa)
        bb = masked_select(m_t, bb_n, bb)
        pp = masked_select(m_t, pp_n, pp)
        return (aa, bb, pp), wkv_t

    xs = (
        jnp.moveaxis(k, 1, 0).astype(acc),
        jnp.moveaxis(v, 1, 0).astype(acc),
        jnp.moveaxis(mask, 1, 0),
    )
    (aa, bb, pp), wkv = jax.lax.scan(step, (aa, bb, pp), xs)
    return (aa, bb, pp), jnp.moveaxis(wkv, 0, 1)


def _att(p, att_x, aa, bb, pp, x, lengths):
    B, T, C = x.shape
    acc = acc_dtype(x.dtype)

    xp = token_shift(att_x, x)
    dx = xp - x
    xk = x + dx * (1.0 - p["time_mix_k"])
    xv = x + dx * (1.0 - p["time_mix_v"])
    xr = x + dx * (1.0 - p["time_mix_r"])

    r = jax.nn.sigmoid(linear(xr, p["receptance"]).astype(acc)).astype(x.dtype)
    k = linear(xk, p["key"])
    v = linear(xv, p["value"])

    w = -jnp.exp(p["time_decay"].astype(aa.dtype))
    u = p["time_first"].astype(aa.dtype)

    mask = length_mask(lengths, T)
    (aa, bb, pp), wkv = _wkv_scan(aa, bb, pp, k, v, w, u, mask)

    out = linear(r * wkv.astype(x.dtype), p["output"])
    return out, update_shift_state(att_x, x, lengths), aa, bb, pp


def _layer(p, state, x, lengths):
    att_x, aa, bb, pp, ffn_x = state
    xa = layer_norm(x, p["ln1_w"], p["ln1_b"])
    att_out, new_att_x, aa, bb, pp = _att(
        p["att"], att_x, aa, bb, pp, xa, lengths
    )
    x = x + att_out
    xf = layer_norm(x, p["ln2_w"], p["ln2_b"])
    ffn_out, new_ffn_x = channel_mix_v4(p["ffn"], ffn_x, xf, lengths)
    x = x + ffn_out
    return x, (new_att_x, aa, bb, pp, new_ffn_x)


def forward(params, state, tokens, lengths):
    """Forward a chunk.  tokens: (B, T); lengths: (B,).  Returns
    (hidden (B, T, C) post-ln_out, new_state)."""
    if tokens.shape[1] == 1:
        # T=1 decode: fused whole-network Pallas kernel — see
        # ops/v4_decode_pallas.py.  Installed by the engine at load.
        from ..ops import wkv as wkv_dispatch
        from ..ops import v4_decode_pallas as fd

        mode = wkv_dispatch.fused_decode_mode()
        if mode != "off" and fd.supports(params):
            return fd.forward_t1(params, state, tokens, lengths,
                                 interpret=(mode == "interpret"))
    x = params["emb"][tokens]  # ln0 folded into emb at load
    news = {k: [] for k in ("att_x", "aa", "bb", "pp", "ffn_x")}
    offset = 0
    for group in params["groups"]:
        K = group["layer_index"].shape[0]
        sl = slice(offset, offset + K)

        # Quantized leaves stay scan-INVARIANT (see ops.quant
        # hoist_quantized).
        from ..ops.quant import hoist_quantized

        xs_layers, reinsert = hoist_quantized(group["layers"])

        def scan_fn(x, xs, _reinsert=reinsert):
            p, att_x, aa, bb, pp, ffn_x, gidx = xs
            p = _reinsert(p, gidx)
            x, new_s = _layer(p, (att_x, aa, bb, pp, ffn_x), x, lengths)
            return x, new_s

        x, (g_att_x, g_aa, g_bb, g_pp, g_ffn_x) = jax.lax.scan(
            scan_fn,
            x,
            (xs_layers, state["att_x"][sl], state["aa"][sl],
             state["bb"][sl], state["pp"][sl], state["ffn_x"][sl],
             jnp.arange(group["layer_index"].shape[0], dtype=jnp.int32)),
        )
        for k, g in zip(
            ("att_x", "aa", "bb", "pp", "ffn_x"),
            (g_att_x, g_aa, g_bb, g_pp, g_ffn_x),
        ):
            news[k].append(g)
        offset += K

    new_state = {k: jnp.concatenate(v, axis=0) for k, v in news.items()}
    hidden = layer_norm(x, params["ln_out_w"], params["ln_out_b"])
    return hidden, new_state
