"""RWKV v7 ("Goose") — pure-JAX TPU-first implementation.

Implements the capability of the reference engine's v7 path (consumed via
``ModelBuilder::build_v7`` at crates/ai00-core/src/lib.rs:505-515); math
follows the published RWKV-7 formulation:

time-mix (per head, state ``S`` of shape ``(N_v, N_k)``):

    S_t = S_{t-1} * diag(w_t) + S_{t-1} (-kk_t)(kk_t * a_t)^T + v_t k_t^T
    y_t = S_t r_t

with data-dependent decay ``w = exp(-exp(-0.5) * sigmoid(w0 + lora_w(x)))``,
the in-context learning-rate ``a``, L2-normalized removal key ``kk``, the
layer-0 value residual ``v_first``, GroupNorm(eps=64e-5) and the bonus term
``(r.k * r_k) v``.

Projections for a whole chunk are batched matmuls (MXU); only the O(N^2)
state recurrence scans over time.  Layers run under ``lax.scan`` per layer
group (see models/__init__.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (
    GN_EPS,
    acc_dtype,
    channel_mix_v7,
    group_norm,
    layer_norm,
    length_mask,
    linear,
    lora_mix,
    masked_select,
    token_shift,
    update_shift_state,
)

W_SCALE = 0.6065306597126334  # exp(-0.5)


def init_state(info, batch: int, dtype=jnp.float32):
    L, C = info.num_layer, info.num_emb
    H, N = info.num_head, info.head_size
    return {
        "att_x": jnp.zeros((L, batch, C), dtype),
        "wkv": jnp.zeros((L, batch, H, N, N), dtype),
        "ffn_x": jnp.zeros((L, batch, C), dtype),
    }


def _wkv_scan(S, r, w, k, v, kk, a, mask):
    """Sequential WKV recurrence over a chunk.

    S: (B, H, N, N) f32, laid out (v-dim, k-dim).
    r, w, k, v, kk, a: (B, T, H, N); mask: (B, T) bool.
    Returns (new_S, y) with y: (B, T, H, N) — the per-token outputs.
    """

    def step(S, xs):
        r_t, w_t, k_t, v_t, kk_t, a_t, m_t = xs  # (B, H, N) / (B,)
        # S' = S*diag(w) - (S kk) (kk*a)^T + v k^T     -- all O(N^2)
        skk = jnp.einsum("bhvk,bhk->bhv", S, kk_t)
        S_new = (
            S * w_t[:, :, None, :]
            - skk[..., None] * (kk_t * a_t)[:, :, None, :]
            + v_t[..., None] * k_t[:, :, None, :]
        )
        S_new = masked_select(m_t, S_new, S)
        y_t = jnp.einsum("bhvk,bhk->bhv", S_new, r_t)
        return S_new, y_t

    xs = tuple(
        jnp.moveaxis(t, 1, 0).astype(S.dtype) for t in (r, w, k, v, kk, a)
    ) + (jnp.moveaxis(mask, 1, 0),)
    S, ys = jax.lax.scan(step, S, xs)
    return S, jnp.moveaxis(ys, 0, 1)  # (B, T, H, N)


def _att(p, att_x, wkv, x, v_first, layer_idx, lengths):
    """v7 time mix over one chunk.

    x: (B, T, C).  Returns (out, new_att_x, new_wkv, v_first).
    """
    B, T, C = x.shape
    H = p["r_k"].shape[0]
    N = C // H

    xp = token_shift(att_x, x)
    dx = xp - x
    xr = x + dx * p["x_r"]
    xw = x + dx * p["x_w"]
    xk = x + dx * p["x_k"]
    xv = x + dx * p["x_v"]
    xa = x + dx * p["x_a"]
    xg = x + dx * p["x_g"]

    r = linear(xr, p["receptance"])
    k = linear(xk, p["key"])
    v = linear(xv, p["value"])

    w_lora = lora_mix(xw, p["w1"], p["w2"], jnp.tanh)
    w = jnp.exp(
        -W_SCALE * jax.nn.sigmoid((p["w0"] + w_lora).astype(acc_dtype(x.dtype)))
    )

    a = jax.nn.sigmoid(
        (p["a0"] + lora_mix(xa, p["a1"], p["a2"], lambda h: h)).astype(
            acc_dtype(x.dtype)
        )
    ).astype(x.dtype)
    g = lora_mix(xg, p["g1"], p["g2"], jax.nn.sigmoid)

    # Removal key: per-head L2-normalized k * k_k.
    kk = (k * p["k_k"]).reshape(B, T, H, N).astype(acc_dtype(x.dtype))
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    kk = kk.astype(x.dtype)

    k = k * (1.0 + (a - 1.0) * p["k_a"])

    # Value residual from layer 0.
    v_mix = jax.nn.sigmoid(
        (p["v0"] + lora_mix(xv, p["v1"], p["v2"], lambda h: h)).astype(
            acc_dtype(x.dtype)
        )
    ).astype(x.dtype)
    v_blend = v + (v_first - v) * v_mix
    v = jnp.where(layer_idx == 0, v, v_blend)
    v_first = jnp.where(layer_idx == 0, v, v_first)

    rh = r.reshape(B, T, H, N)
    wh = w.reshape(B, T, H, N)
    kh = k.reshape(B, T, H, N)
    vh = v.reshape(B, T, H, N)
    ah = a.reshape(B, T, H, N)

    mask = length_mask(lengths, T)
    from ..ops import wkv as wkv_dispatch

    impl = wkv_dispatch.select_impl(T, wkv.dtype, family="v7")
    if impl == "chunked":
        from ..ops.wkv_chunked import wkv7_chunk_mm

        new_wkv, y = wkv7_chunk_mm(
            wkv, rh, wh, kh, vh, kk.reshape(B, T, H, N), ah, mask)
        y = y.astype(x.dtype)
    elif impl == "pallas":
        from ..ops.wkv_pallas import wkv7_chunk

        new_wkv, y = wkv7_chunk(
            wkv, rh, wh, kh, vh, kk.reshape(B, T, H, N), ah, mask,
            interpret=wkv_dispatch.interpret_mode())
        y = y.astype(x.dtype)
    elif T == 1 and wkv_dispatch.use_t1_kernel(C):
        # Single-pass per-token update: one state read + one write in
        # VMEM instead of 3-4 XLA passes over the (B, H, N, N) tensor.
        from ..ops.wkv_t1 import wkv7_t1

        new_wkv, yt = wkv7_t1(
            wkv, rh[:, 0], wh[:, 0], kh[:, 0], vh[:, 0],
            kk.reshape(B, T, H, N)[:, 0], ah[:, 0], mask[:, 0],
            interpret=wkv_dispatch.interpret_mode())
        y = yt[:, None]
    else:
        new_wkv, y = _wkv_scan(
            wkv, rh, wh, kh, vh, kk.reshape(B, T, H, N), ah, mask)

    y = y.reshape(B, T, C).astype(x.dtype)
    y = group_norm(y, H, p["ln_x_w"], p["ln_x_b"], GN_EPS)
    bonus = jnp.sum(
        rh * kh * p["r_k"][None, None], axis=-1, keepdims=True
    ) * vh
    y = y + bonus.reshape(B, T, C).astype(x.dtype)

    out = linear(y * g.astype(x.dtype), p["output"])
    new_att_x = update_shift_state(att_x, x, lengths)
    return out, new_att_x, new_wkv, v_first


def _layer(p, state, x, v_first, layer_idx, lengths):
    att_x, wkv, ffn_x = state
    xa = layer_norm(x, p["ln1_w"], p["ln1_b"])
    att_out, new_att_x, new_wkv, v_first = _att(
        p["att"], att_x, wkv, xa, v_first, layer_idx, lengths
    )
    x = x + att_out
    xf = layer_norm(x, p["ln2_w"], p["ln2_b"])
    ffn_out, new_ffn_x = channel_mix_v7(p["ffn"], ffn_x, xf, lengths)
    x = x + ffn_out
    return x, v_first, (new_att_x, new_wkv, new_ffn_x)


def forward(params, state, tokens, lengths):
    """Forward a chunk of tokens.

    tokens: (B, T) int32; lengths: (B,) — number of valid tokens per row
    (suffix padding).  Returns (hidden (B, T, C) post-ln_out, new_state).
    """
    if tokens.shape[1] == 1:
        # T=1 decode: the fused whole-network Pallas kernel collapses
        # ~50 XLA ops/layer into one op with double-buffered weight DMA
        # (ops/v7_decode_pallas.py).  The engine installs the fused
        # weight layout at load when eligible.  Models too large for
        # whole-layer VMEM windows (7B-class) take the phased whole-layer
        # kernel instead (K-tiled windows, ops/v7_phased_pallas.py).
        from ..ops import wkv as wkv_dispatch
        from ..ops import v7_decode_pallas as fd

        # The two kernels gate INDEPENDENTLY (AI00_FUSED_DECODE only
        # disables the whole-network kernel; AI00_PHASED_DECODE only the
        # whole-layer one) — mirroring the engine's install conditions,
        # so an installed FUSED_KEY layout is never left unreachable.
        if fd.supports(params):
            B = tokens.shape[0]
            mode = wkv_dispatch.fused_decode_mode()
            if mode != "off" and fd.can_fuse(params, batch=B):
                return fd.forward_t1(params, state, tokens, lengths,
                                     interpret=(mode == "interpret"))
            from ..ops import v7_phased_pallas as pd

            pmode = wkv_dispatch.phased_decode_mode()
            if pmode != "off" and pd.can_phase(params, batch=B):
                return pd.forward_t1(
                    params, state, tokens, lengths,
                    interpret=(pmode == "interpret"))
    x = params["emb"][tokens]  # ln0 folded into emb at load
    B, T, C = x.shape
    v_first = jnp.zeros_like(x)

    new_att_x, new_wkv, new_ffn_x = [], [], []
    offset = 0
    from ..ops.quant import hoist_quantized

    for group in params["groups"]:
        K = group["layer_index"].shape[0]
        sl = slice(offset, offset + K)
        # Quantized leaves stay scan-INVARIANT (slicing their codes per
        # iteration would copy the whole model through HBM every step);
        # the scan body reinserts layer views indexed by scalar prefetch.
        xs_layers, reinsert = hoist_quantized(group["layers"])

        def scan_fn(carry, xs, _reinsert=reinsert):
            x, v_first = carry
            p, att_x, wkv, ffn_x, gidx, idx = xs
            p = _reinsert(p, gidx)
            x, v_first, new_s = _layer(
                p, (att_x, wkv, ffn_x), x, v_first, idx, lengths
            )
            return (x, v_first), new_s

        (x, v_first), (g_att_x, g_wkv, g_ffn_x) = jax.lax.scan(
            scan_fn,
            (x, v_first),
            (
                xs_layers,
                state["att_x"][sl],
                state["wkv"][sl],
                state["ffn_x"][sl],
                jnp.arange(K, dtype=jnp.int32),
                group["layer_index"],
            ),
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
