"""Single-pass T=1 WKV Pallas kernels.

At decode the generic recurrences cost several XLA passes over the
per-layer state tensor (read for the removal/readout contraction, read
again for the update, write, plus masked_select) — at 7B that is
~3-4 x 16.8 MB per layer per token on a tensor that only NEEDS one read
and one write.  These kernels do the whole per-token update in one VMEM
pass: grid over head groups, state window in VMEM, unrolled head loop on
64-wide lane slices (same structure as the fused whole-network kernels,
ops/v7_decode_pallas.py).

Masking matches the generic paths exactly: the state update is gated per
row; the output y is computed from the SELECTED state (inactive rows
read their old state), as models/v7._wkv_scan / models/v5.wkv_scan do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_GROUP = 8  # heads per grid step (window = (B, HEAD_GROUP, N, N))


def _v7_kernel(Hc, N):
    def kernel(r_ref, w_ref, k_ref, v_ref, kk_ref, a_ref, act_ref,
               s_ref, ns_ref, y_ref):
        active = act_ref[:] > 0                       # (B, 1) bool
        act3 = active[:, :, None]
        for h in range(Hc):
            sl = slice(h * N, (h + 1) * N)
            s = s_ref[:, h]                           # (B, N, N) f32 (v, k)
            kk = kk_ref[:, sl]
            skk = jnp.sum(s * kk[:, None, :], axis=-1)          # (B, N_v)
            s_new = (s * w_ref[:, sl][:, None, :]
                     - skk[:, :, None] * (kk * a_ref[:, sl])[:, None, :]
                     + v_ref[:, sl][:, :, None]
                     * k_ref[:, sl][:, None, :])
            s_new = jnp.where(act3, s_new, s)
            ns_ref[:, h] = s_new
            y_ref[:, sl] = jnp.sum(s_new * r_ref[:, sl][:, None, :],
                                   axis=-1)

    return kernel


def _v56_kernel(Hc, N):
    def kernel(r_ref, w_ref, k_ref, v_ref, u_ref, act_ref,
               s_ref, ns_ref, y_ref):
        active = act_ref[:] > 0
        act3 = active[:, :, None]
        for h in range(Hc):
            sl = slice(h * N, (h + 1) * N)
            s = s_ref[:, h]                           # (B, N, N) f32 (k, v)
            a = (k_ref[:, sl][:, :, None]
                 * v_ref[:, sl][:, None, :])          # (B, N_k, N_v)
            y_ref[:, sl] = jnp.sum(
                (s + u_ref[0:1, sl][:, :, None] * a)
                * r_ref[:, sl][:, :, None], axis=1)
            s_new = w_ref[:, sl][:, :, None] * s + a
            ns_ref[:, h] = jnp.where(act3, s_new, s)

    return kernel


def _call(kernel_fn, flats, state, B, H, N, interpret):
    Hc = min(HEAD_GROUP, H)
    assert H % Hc == 0, (H, Hc)
    C = H * N

    def cspec():  # (B, C) vectors, head-group window
        return pl.BlockSpec((B, Hc * N), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    def aspec(arr):
        return pl.BlockSpec(arr.shape, lambda g: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((B, Hc, N, N), lambda g: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)

    n_vec = len(flats) - 1  # last flat is the active mask
    in_specs = [cspec() for _ in range(n_vec)] + [aspec(flats[-1]), sspec()]
    out_shape = [jax.ShapeDtypeStruct(state.shape, state.dtype),
                 jax.ShapeDtypeStruct((B, C), jnp.float32)]
    out_specs = [sspec(), cspec()]
    ns, y = pl.pallas_call(
        kernel_fn(Hc, N),
        grid=(H // Hc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # Double-buffered state windows + vectors exceed the default
        # 16 MB scoped budget at B=16, Hc=8.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*flats, state)
    return ns, y


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv7_t1(S, r, w, k, v, kk, a, mask, interpret=False):
    """One v7 delta-rule step.  S: (B, H, N, N) f32 (v-dim, k-dim);
    r/w/k/v/kk/a: (B, H, N); mask: (B,) bool.
    Returns (S_new, y (B, H, N)) — drop-in for models/v7._wkv_scan at
    T=1 (cites its recurrence)."""
    B, H, N, _ = S.shape
    flats = [t.astype(jnp.float32).reshape(B, H * N)
             for t in (r, w, k, v, kk, a)]
    flats.append(mask.reshape(B, 1).astype(jnp.float32))
    ns, y = _call(_v7_kernel, flats, S.astype(jnp.float32), B, H, N,
                  interpret)
    return ns.astype(S.dtype), y.reshape(B, H, N)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wkv56_t1(S, r, k, v, w, u, mask, interpret=False):
    """One v5/v6 step.  S: (B, H, N, N) f32 (k-dim, v-dim); r/k/v/w:
    (B, H, N); u: (H, N); mask: (B,) bool.  Returns (S_new, y) —
    drop-in for models/v5.wkv_scan at T=1."""
    B, H, N, _ = S.shape
    flats = [t.astype(jnp.float32).reshape(B, H * N) for t in (r, w, k, v)]
    flats.append(jnp.broadcast_to(u.astype(jnp.float32).reshape(1, H * N),
                                  (B, H * N)))
    flats.append(mask.reshape(B, 1).astype(jnp.float32))
    ns, y = _call(_v56_kernel, flats, S.astype(jnp.float32), B, H, N,
                  interpret)
    return ns.astype(S.dtype), y.reshape(B, H, N)
