"""RWKV v5 ("Eagle") — pure-JAX TPU-first implementation.

Covers the reference engine's v5 path (consumed via ``ModelBuilder::build_v5``
at crates/ai00-core/src/lib.rs:505-515).  Math follows the published RWKV-5.2
formulation: per-head matrix state ``S`` of shape ``(N_k, N_v)`` with
static per-channel decay ``w = exp(-exp(time_decay))`` and bonus ``u``:

    y_t = r_t @ (S_{t-1} + diag(u) k_t v_t^T)
    S_t = diag(w) S_{t-1} + k_t v_t^T

followed by GroupNorm(eps=64e-5), a SiLU gate, and the output projection.
Token shift uses the v4 convention ``x*mix + x_prev*(1-mix)``.

Projections for a whole chunk are batched matmuls (MXU); only the O(N^2)
state recurrence scans over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (
    GN_EPS,
    acc_dtype,
    channel_mix_v4,
    group_norm,
    layer_norm,
    length_mask,
    linear,
    masked_select,
    token_shift,
    update_shift_state,
)


def init_state(info, batch: int, dtype=jnp.float32):
    L, C = info.num_layer, info.num_emb
    H, N = info.num_head, info.head_size
    return {
        "att_x": jnp.zeros((L, batch, C), dtype),
        "wkv": jnp.zeros((L, batch, H, N, N), dtype),  # (k-dim, v-dim)
        "ffn_x": jnp.zeros((L, batch, C), dtype),
    }


def wkv_scan(S, r, k, v, w, u, mask):
    """Sequential v5/v6 WKV recurrence over a chunk.

    S: (B, H, N, N) f32, laid out (k-dim, v-dim).
    r, k, v: (B, T, H, N); w: per-token decay (B, T, H, N) (v6) or static
    (H, N) broadcast by the caller to (B, T, H, N) (v5); u: (H, N) bonus.
    mask: (B, T) bool.  Returns (new_S, y) with y: (B, T, H, N).
    """

    def step(S, xs):
        r_t, k_t, v_t, w_t, m_t = xs  # (B, H, N) / (B,)
        a_t = k_t[..., None] * v_t[..., None, :]  # outer: (B, H, N_k, N_v)
        y_t = jnp.einsum(
            "bhk,bhkv->bhv", r_t, S + u[None, :, :, None] * a_t
        )
        S_new = w_t[..., None] * S + a_t
        S_new = masked_select(m_t, S_new, S)
        return S_new, y_t

    xs = tuple(
        jnp.moveaxis(t, 1, 0).astype(S.dtype) for t in (r, k, v, w)
    ) + (jnp.moveaxis(mask, 1, 0),)
    u = u.astype(S.dtype)
    S, ys = jax.lax.scan(step, S, xs)
    return S, jnp.moveaxis(ys, 0, 1)  # (B, T, H, N)


def _att(p, att_x, wkv, x, lengths):
    """v5.2 time mix over one chunk.  x: (B, T, C)."""
    B, T, C = x.shape
    H, N = p["time_first"].shape
    acc = acc_dtype(x.dtype)

    xp = token_shift(att_x, x)
    dx = xp - x
    xk = x + dx * (1.0 - p["time_mix_k"])
    xv = x + dx * (1.0 - p["time_mix_v"])
    xr = x + dx * (1.0 - p["time_mix_r"])
    xg = x + dx * (1.0 - p["time_mix_g"])

    r = linear(xr, p["receptance"]).reshape(B, T, H, N)
    k = linear(xk, p["key"]).reshape(B, T, H, N)
    v = linear(xv, p["value"]).reshape(B, T, H, N)
    g = linear(xg, p["gate"])
    g = (g * jax.nn.sigmoid(g.astype(acc)).astype(x.dtype))  # SiLU

    w = jnp.exp(-jnp.exp(p["time_decay"].astype(acc)))  # (H, N), static
    w = jnp.broadcast_to(w[None, None], (B, T, H, N))
    u = p["time_first"]

    mask = length_mask(lengths, T)
    new_wkv, y = dispatch_wkv56(wkv, r, k, v, w, u, mask)

    y = y.reshape(B, T, C).astype(x.dtype)
    y = group_norm(y, H, p["ln_x_w"], p["ln_x_b"], GN_EPS)
    out = linear(y * g, p["output"])
    return out, update_shift_state(att_x, x, lengths), new_wkv


def dispatch_wkv56(wkv, r, k, v, w, u, mask):
    """Chunked-matmul (MXU) form on TPU chunks, lax.scan otherwise
    (shared with v6).  AI00_WKV_IMPL selects scan/pallas/chunked."""
    from ..ops import wkv as wkv_dispatch

    T = r.shape[1]
    impl = wkv_dispatch.select_impl(T, wkv.dtype)
    if impl == "pallas":
        from ..ops.wkv_pallas import wkv56_chunk

        return wkv56_chunk(wkv, r, k, v, w, u, mask,
                           interpret=wkv_dispatch.interpret_mode())
    if impl == "chunked":
        from ..ops.wkv_chunked import wkv56_chunk_mm

        return wkv56_chunk_mm(wkv, r, k, v, w, u, mask)
    if T == 1 and wkv_dispatch.use_t1_kernel(r.shape[-2] * r.shape[-1]):
        # Single-pass per-token update (see ops/wkv_t1.py).
        from ..ops.wkv_t1 import wkv56_t1

        new_wkv, yt = wkv56_t1(
            wkv, r[:, 0], k[:, 0], v[:, 0], w[:, 0], u, mask[:, 0],
            interpret=wkv_dispatch.interpret_mode())
        return new_wkv, yt[:, None]
    return wkv_scan(wkv, r, k, v, w, u, mask)


def _layer(p, state, x, lengths):
    att_x, wkv, ffn_x = state
    xa = layer_norm(x, p["ln1_w"], p["ln1_b"])
    att_out, new_att_x, new_wkv = _att(p["att"], att_x, wkv, xa, lengths)
    x = x + att_out
    xf = layer_norm(x, p["ln2_w"], p["ln2_b"])
    ffn_out, new_ffn_x = channel_mix_v4(p["ffn"], ffn_x, xf, lengths)
    x = x + ffn_out
    return x, (new_att_x, new_wkv, new_ffn_x)


def forward(params, state, tokens, lengths):
    """Forward a chunk of tokens.

    tokens: (B, T) int32; lengths: (B,).  Returns (hidden (B, T, C)
    post-ln_out, new_state).
    """
    if tokens.shape[1] == 1:
        # T=1 decode: fused whole-network Pallas kernel — see
        # ops/v5_decode_pallas.py.  Installed by the engine at load.
        # Models too large for whole-layer VMEM windows (7B-class) take
        # the phased whole-layer kernel (ops/v56_phased_pallas.py).
        from ..ops import wkv as wkv_dispatch
        from ..ops import v5_decode_pallas as fd

        if fd.supports(params):
            B = tokens.shape[0]
            mode = wkv_dispatch.fused_decode_mode()
            if mode != "off" and fd.can_fuse(params, batch=B):
                return fd.forward_t1(params, state, tokens, lengths,
                                     interpret=(mode == "interpret"))
            from ..ops import v56_phased_pallas as pd

            pmode = wkv_dispatch.phased_decode_mode()
            if pmode != "off" and pd.can_phase(params, B, "V5"):
                return pd.forward_t1(params, state, tokens, lengths, "V5",
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
