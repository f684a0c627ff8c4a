"""Pallas TPU kernels for the WKV recurrences (v5/v6 and v7).

Why a kernel: the ``lax.scan`` form round-trips the ``(B, H, N, N)`` f32
state through HBM on EVERY token — ~134 MB/token at (B=16, H=16, N=64),
i.e. ~17 GB of state traffic per 128-token prefill chunk.  These kernels
hold the state in a VMEM scratch across the whole chunk and stream each
sequence tensor through VMEM exactly once: state traffic drops to one
read + one write per chunk.

Shape/layout decisions:

* Sequence tensors arrive time-major ``(T, B*H, N)`` (cheap XLA transpose
  outside); grid is ``(T/t_block, BH/bh_block)`` with the T axis outer —
  each grid cell only depends on the same bh-slice at the previous tb, so
  row-major iteration is dependency-safe.
* The full state lives in ONE VMEM scratch ``(BH, N, N)`` persisting
  across grid steps; each cell updates its ``bh_block`` slice.  Blocking
  BH keeps per-step vector temporaries at ``bh_block*N*N`` so Mosaic's
  scoped-VMEM stack stays well under the 16 MB budget (an unblocked
  version allocates several full-state temporaries and OOMs).
* State in/out stay in HBM (``ANY``) and are DMA'd once — a windowed VMEM
  BlockSpec would double-buffer two full state copies.
* All math is f32 on the VPU.  Suffix masking is folded into the inputs
  by the wrapper (masked steps get ``w=1, k=0, kk=0`` making the update
  the identity), so the kernel itself is mask-free.

Semantics match the pure-JAX scans in models/v5.py (``wkv_scan``) and
models/v7.py (``_wkv_scan``); equality is tested in
tests/test_wkv_pallas.py (interpreter path on CPU + compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_T_BLOCK = 8
MAX_BH_BLOCK = 64


def _bh_block(BH: int) -> int:
    for cand in range(min(MAX_BH_BLOCK, BH), 0, -1):
        if BH % cand == 0:
            return cand
    return BH


def _grid_call(kernel, T, BH, N, t_block, bh_block, n_seq_inputs,
               interpret):
    grid = (T // t_block, BH // bh_block)
    seq_spec = pl.BlockSpec(
        (t_block, bh_block, N), lambda tb, bh: (tb, bh, 0),
        memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[state_spec] + [seq_spec] * n_seq_inputs,
        out_specs=(state_spec, seq_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
            jax.ShapeDtypeStruct((T, BH, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BH, N, N), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )


def _wkv7_kernel(t_block, bh_block):
    def kernel(s0_ref, r_ref, w_ref, k_ref, v_ref, kk_ref, a_ref,
               s_out_ref, y_ref, S, sem):
        tb = pl.program_id(0)
        bh = pl.program_id(1)

        @pl.when((tb == 0) & (bh == 0))
        def _():
            copy = pltpu.make_async_copy(s0_ref, S, sem)
            copy.start()
            copy.wait()

        off = pl.multiple_of(bh * bh_block, bh_block)

        def step(t, _):
            r = r_ref[t]
            w = w_ref[t]
            k = k_ref[t]
            v = v_ref[t]
            kk = kk_ref[t]
            a = a_ref[t]
            s = S[pl.ds(off, bh_block)]
            # S (bh, N_v, N_k); skk_v = sum_k S[v,k] kk[k]
            skk = jnp.sum(s * kk[:, None, :], axis=2)
            s = (s * w[:, None, :]
                 - skk[:, :, None] * (kk * a)[:, None, :]
                 + v[:, :, None] * k[:, None, :])
            S[pl.ds(off, bh_block)] = s
            y_ref[t] = jnp.sum(s * r[:, None, :], axis=2)
            return 0

        jax.lax.fori_loop(0, t_block, step, 0)

        @pl.when((tb == pl.num_programs(0) - 1)
                 & (bh == pl.num_programs(1) - 1))
        def _():
            copy = pltpu.make_async_copy(S, s_out_ref, sem)
            copy.start()
            copy.wait()

    return kernel


def _wkv56_kernel(t_block, bh_block):
    def kernel(s0_ref, r_ref, w_ref, k_ref, v_ref, u_ref, s_out_ref, y_ref,
               S, sem):
        tb = pl.program_id(0)
        bh = pl.program_id(1)

        @pl.when((tb == 0) & (bh == 0))
        def _():
            copy = pltpu.make_async_copy(s0_ref, S, sem)
            copy.start()
            copy.wait()

        off = pl.multiple_of(bh * bh_block, bh_block)

        def step(t, _):
            r = r_ref[t]
            w = w_ref[t]
            k = k_ref[t]
            v = v_ref[t]
            u = u_ref[t]
            s = S[pl.ds(off, bh_block)]
            # S (bh, N_k, N_v): y_v = sum_k r_k (S[k,v] + u_k k_k v_v)
            skr = jnp.sum(s * r[:, :, None], axis=1)          # (bh, N_v)
            bonus = jnp.sum(r * k * u, axis=1)                # (bh,)
            y_ref[t] = skr + bonus[:, None] * v
            S[pl.ds(off, bh_block)] = (
                s * w[:, :, None] + k[:, :, None] * v[:, None, :])
            return 0

        jax.lax.fori_loop(0, t_block, step, 0)

        @pl.when((tb == pl.num_programs(0) - 1)
                 & (bh == pl.num_programs(1) - 1))
        def _():
            copy = pltpu.make_async_copy(S, s_out_ref, sem)
            copy.start()
            copy.wait()

    return kernel


def _pad_T(arrs, T, t_block):
    """Suffix-pad time-major arrays so T divides the block (padding forms
    identity steps thanks to the caller's w=1/k=0 mask folding)."""
    Tp = -(-T // t_block) * t_block
    if Tp == T:
        return [a for a, _fill in arrs], T
    out = []
    for a, fill in arrs:
        pad = jnp.full((Tp - T,) + a.shape[1:], fill, a.dtype)
        out.append(jnp.concatenate([a, pad], axis=0))
    return out, Tp


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def wkv7_chunk(S, r, w, k, v, kk, a, mask, t_block=DEFAULT_T_BLOCK,
               interpret=False):
    """Drop-in replacement for models.v7._wkv_scan.

    S: (B, H, N, N) f32 (v-major); r..a: (B, T, H, N); mask: (B, T) bool.
    Returns (new_S, y (B, T, H, N) f32).
    """
    B, T, H, N = r.shape
    BH = B * H

    def tm(x):  # (B, T, H, N) -> (T, BH, N) f32
        return jnp.moveaxis(x, 1, 0).reshape(T, BH, N).astype(jnp.float32)

    m = jnp.moveaxis(mask, 1, 0).reshape(T, B, 1, 1)
    m = jnp.broadcast_to(m, (T, B, H, N)).reshape(T, BH, N)
    rt, wt, kt, vt, kkt, at = (tm(x) for x in (r, w, k, v, kk, a))
    # Fold the suffix mask: masked steps must leave S unchanged.
    wt = jnp.where(m, wt, 1.0)
    kt = jnp.where(m, kt, 0.0)
    kkt = jnp.where(m, kkt, 0.0)

    (rt, wt, kt, vt, kkt, at), Tp = _pad_T(
        [(rt, 0.0), (wt, 1.0), (kt, 0.0), (vt, 0.0), (kkt, 0.0), (at, 0.0)],
        T, t_block)

    bh_block = _bh_block(BH)
    call = _grid_call(_wkv7_kernel(t_block, bh_block), Tp, BH, N, t_block,
                      bh_block, 6, interpret)
    s_new, y = call(S.reshape(BH, N, N).astype(jnp.float32),
                    rt, wt, kt, vt, kkt, at)
    y = jnp.moveaxis(y[:T].reshape(T, B, H, N), 0, 1)
    return s_new.reshape(B, H, N, N), y


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def wkv56_chunk(S, r, k, v, w, u, mask, t_block=DEFAULT_T_BLOCK,
                interpret=False):
    """Drop-in replacement for models.v5.wkv_scan (shared by v6).

    S: (B, H, N, N) f32 (k-major); r,k,v,w: (B, T, H, N); u: (H, N);
    mask: (B, T) bool.  Returns (new_S, y (B, T, H, N) f32).
    """
    B, T, H, N = r.shape
    BH = B * H

    def tm(x):
        return jnp.moveaxis(x, 1, 0).reshape(T, BH, N).astype(jnp.float32)

    m = jnp.moveaxis(mask, 1, 0).reshape(T, B, 1, 1)
    m = jnp.broadcast_to(m, (T, B, H, N)).reshape(T, BH, N)
    rt, kt, vt, wt = (tm(x) for x in (r, k, v, w))
    ut = jnp.broadcast_to(
        u.astype(jnp.float32)[None, None], (T, B, H, N)).reshape(T, BH, N)
    wt = jnp.where(m, wt, 1.0)
    kt = jnp.where(m, kt, 0.0)

    (rt, wt, kt, vt, ut), Tp = _pad_T(
        [(rt, 0.0), (wt, 1.0), (kt, 0.0), (vt, 0.0), (ut, 0.0)], T, t_block)

    bh_block = _bh_block(BH)
    call = _grid_call(_wkv56_kernel(t_block, bh_block), Tp, BH, N, t_block,
                      bh_block, 5, interpret)
    s_new, y = call(S.reshape(BH, N, N).astype(jnp.float32),
                    rt, wt, kt, vt, ut)
    y = jnp.moveaxis(y[:T].reshape(T, B, H, N), 0, 1)
    return s_new.reshape(B, H, N, N), y
