"""Shared pure-JAX building blocks for all RWKV versions."""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5
# v5/v6/v7 use GroupNorm with eps scaled by head_size_divisor**2 = 64.
GN_EPS = 64e-5


def acc_dtype(dtype):
    """Accumulation dtype: at least f32, but respect f64 inputs (tests)."""
    return jnp.promote_types(dtype, jnp.float32)


def layer_norm(x, w, b, eps=LN_EPS):
    """LayerNorm over the last axis, computed in (at least) f32, cast back."""
    dtype = x.dtype
    x = x.astype(acc_dtype(dtype))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(dtype)


def group_norm(x, num_groups, w, b, eps=GN_EPS):
    """GroupNorm over the last axis of ``x`` (..., C), C split into groups."""
    dtype = x.dtype
    shape = x.shape
    x = x.astype(acc_dtype(dtype)).reshape(*shape[:-1], num_groups, shape[-1] // num_groups)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = ((x - mean) * jax.lax.rsqrt(var + eps)).reshape(shape)
    return (y * w + b).astype(dtype)


def linear(x, w):
    """``x @ w`` with quantization-aware dispatch.

    ``w`` is either a plain ``(in, out)`` array or a quantized pytree from
    ``ai00_server_tpu.ops.quant`` (which exposes ``matmul(x)``).
    """
    if hasattr(w, "matmul"):
        return w.matmul(x)
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=acc_dtype(x.dtype)
    ).astype(x.dtype)


def token_shift(shift_state, x):
    """Previous-token features: ``x_prev[:, t] = x[:, t-1]``, seeded by state.

    shift_state: (B, C) — the last token's features from the previous chunk.
    x: (B, T, C).
    """
    return jnp.concatenate([shift_state[:, None, :].astype(x.dtype), x[:, :-1]], axis=1)


def length_mask(lengths, T):
    """(B,) lengths -> (B, T) bool validity mask (suffix padding)."""
    return jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]


def take_last_valid(x, lengths):
    """Gather ``x[b, lengths[b]-1]`` per batch row; rows with length 0 get x[b, 0].

    x: (B, T, ...) -> (B, ...)
    """
    idx = jnp.maximum(lengths - 1, 0).astype(jnp.int32)
    return jnp.take_along_axis(
        x, idx[(...,) + (None,) * (x.ndim - 1)], axis=1
    ).squeeze(1)


def update_shift_state(old_shift, x, lengths):
    """New token-shift state: features of the last *valid* position.

    Rows that consumed no tokens keep their old shift state.
    """
    last = take_last_valid(x, lengths).astype(old_shift.dtype)
    keep = (lengths > 0)[:, None]
    return jnp.where(keep, last, old_shift)


def masked_select(mask_t, new, old):
    """Gate a state update by per-batch validity at one timestep.

    mask_t: (B,) bool; new/old: (B, ...) — broadcasts the mask.
    """
    m = mask_t.reshape(mask_t.shape + (1,) * (new.ndim - 1))
    return jnp.where(m, new, old)


def lora_mix(x, w1, w2, activation=jnp.tanh):
    """Low-rank data-dependent modulation: ``act(x @ w1) @ w2``.

    Used by v6 token-shift/decay and all the v7 w/a/v/g branches.  Weights
    are stored in math orientation ``(in, rank)`` / ``(rank, out)``.
    """
    acc = acc_dtype(x.dtype)
    h = activation(jnp.dot(x, w1.astype(x.dtype), preferred_element_type=acc))
    return jnp.dot(h.astype(x.dtype), w2.astype(x.dtype), preferred_element_type=acc)


def channel_mix_v4(p, shift, x, lengths):
    """v4/v5/v6 channel mix (FFN): square-ReLU with receptance gate.

    p: dict with time_mix_k (C,), time_mix_r (C,), key (C,F), receptance
    (C,C), value (F,C).  Returns (out, new_shift).
    """
    xp = token_shift(shift, x)
    xk = x + (xp - x) * (1.0 - p["time_mix_k"])
    xr = x + (xp - x) * (1.0 - p["time_mix_r"])
    # NOTE: official formula is x*mix + xprev*(1-mix) == x + (xprev-x)*(1-mix)
    k = linear(xk, p["key"])
    k = jnp.square(jax.nn.relu(k))
    r = jax.nn.sigmoid(linear(xr, p["receptance"]))
    out = r * linear(k, p["value"])
    return out, update_shift_state(shift, x, lengths)


def channel_mix_v7(p, shift, x, lengths):
    """v7 channel mix: no receptance gate (x_k interpolation convention)."""
    B, T, C = x.shape
    key, val = p["key"], p["value"]
    if T == 1 and hasattr(key, "qlin") and hasattr(val, "qlin"):
        from ..ops import wkv as wkv_dispatch

        if wkv_dispatch.use_t1_kernel(C):
            # Whole channel mix as ONE Pallas op on the stacked codes
            # (2/3 of a layer's weight bytes) — see ops/ffn_pallas.py.
            from ..ops.ffn_pallas import ffn7_t1_l

            out, nshift = ffn7_t1_l(
                x[:, 0], shift, p["x_k"], lengths > 0,
                key.qlin.q, key.qlin.scale, val.qlin.q, val.qlin.scale,
                key.idx, qmode=key.qlin.mode,
                interpret=wkv_dispatch.interpret_mode())
            return out[:, None].astype(x.dtype), nshift
    xp = token_shift(shift, x)
    xk = x + (xp - x) * p["x_k"]
    k = linear(xk, p["key"])
    k = jnp.square(jax.nn.relu(k))
    out = linear(k, p["value"])
    return out, update_shift_state(shift, x, lengths)
