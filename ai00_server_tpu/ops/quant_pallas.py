"""Pallas NF4/SF4 dequant-in-matmul kernel (SURVEY.md hard part (c)).

Decode is weight-bandwidth bound; 4-bit weights must stream from HBM as
PACKED bytes, with the table lookup happening in VMEM inside the matmul's
K loop — dequantizing in XLA materializes a full-precision copy first.

Kernel shape: ``y (R, out) = x (R, in) @ W``, W stored as
``codes (nb, BLOCK/2, out) uint8`` (two codes per byte along the in axis,
``2i`` -> low nibble) + ``scale (nb, 1, out) f32`` — the in-major layout
produced by ops.quant._quantize_4bit.  Grid over out tiles; per cell a
``fori`` over the nb in-blocks: unpack nibbles, decode via a 16-way
select-sum (TPU Pallas has no gather), one (R, BLOCK) @ (BLOCK, ot)
matmul, scale the partial sum.

Used for ALL row counts on TPU (grid tiles rows too) — XLA's gather-
based dequant is orders of magnitude slower there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import NF4_BLOCK, NF4_TABLE, SF4_TABLE

DEFAULT_OUT_TILE = 512
ROW_TILE = 128
K_TILE_BLOCKS = 32  # in-blocks (of NF4_BLOCK rows) per grid step


def _kernel(nb_tile, half, out_tile, table_vals, rt):
    def kernel(x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        def block(n, acc):
            # Widen BEFORE the bit ops: Mosaic has no uint8 shift.
            packed = q_ref[n].astype(jnp.int32)  # (half, ot)
            lo = packed & 0x0F
            hi = (packed >> 4) & 0x0F

            def decode(c):
                w = jnp.zeros(c.shape, jnp.float32)
                for k, v in enumerate(table_vals):
                    w = jnp.where(c == k, jnp.float32(v), w)
                return w

            wlo = decode(lo)                     # in rows 0,2,4,... of block
            whi = decode(hi)                     # in rows 1,3,5,...
            # Interleave to (BLOCK, ot): row 2i = lo_i, row 2i+1 = hi_i.
            w = jnp.stack([wlo, whi], axis=1).reshape(2 * half, wlo.shape[-1])
            xb = x_ref[n]                        # (rt, BLOCK), leading index
            part = jnp.dot(xb.astype(jnp.float32), w,
                           preferred_element_type=jnp.float32)
            return acc + part * s_ref[n]         # scale (1, ot) broadcasts

        acc = jax.lax.fori_loop(
            0, nb_tile, block, jnp.zeros((rt, out_tile), jnp.float32))
        y_ref[:] += acc

    return kernel


def _int8_kernel(nb_tile, out_tile, rt):
    def kernel(x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        def block(n, acc):
            # int8 -> bf16 happens HERE in VMEM: the codes stream from HBM
            # at 1 byte/element.  (XLA's einsum path materializes a bf16
            # copy of the whole weight in HBM every step: 3x the traffic.)
            w = q_ref[n].astype(jnp.bfloat16)        # (BLOCK, ot)
            xb = x_ref[n]                            # (rt, BLOCK)
            part = jnp.dot(xb.astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)
            return acc + part * s_ref[n]             # scale (1, ot)

        acc = jax.lax.fori_loop(
            0, nb_tile, block, jnp.zeros((rt, out_tile), jnp.float32))
        y_ref[:] += acc

    return kernel


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def matmul_int8(x, q, scale, out_tile=DEFAULT_OUT_TILE, interpret=False):
    """Fused int8 dequant-matmul: ``y = x @ (q * scale)``.

    x: (..., in) f32/bf16; q: (nb, BLOCK, out) int8 (in-major blocks,
    ops.quant.quantize_int8 layout); scale: (nb, 1, out) f32.  The weight
    crosses HBM exactly once, as int8 — decode throughput is then
    int8-weight-bandwidth bound instead of bf16-copy bound.
    """
    *lead, in_dim = x.shape
    nb, blk, out = q.shape
    assert nb * blk == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    xr = jnp.moveaxis(x.reshape(R, nb, blk), 1, 0)  # (nb, R, BLOCK)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((nb, Rp - R, blk), xr.dtype)], axis=1)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)

    y = pl.pallas_call(
        _int8_kernel(kt, ot, rt),
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((kt, rt, blk), lambda r, o, k: (k, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, blk, ot), lambda r, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 1, ot), lambda r, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, ot), lambda r, o, k: (r, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, out), jnp.float32),
        interpret=interpret,
    )(xr, q, scale)
    return y[:R].reshape(*lead, out).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mode", "out_tile", "interpret"))
def matmul_4bit(x, q, scale, mode="nf4", out_tile=DEFAULT_OUT_TILE,
                interpret=False):
    """x: (..., in) f32/bf16; q: (nb, BLOCK/2, out) uint8;
    scale: (nb, 1, out) f32.  Returns (..., out) in x.dtype.

    Grid = (row tiles, out tiles); the kernel re-decodes the weight tile
    once per row tile — acceptable because decode happens in VMEM and the
    packed bytes stream from HBM at 4 bits/element.
    """
    *lead, in_dim = x.shape
    nb, half, out = q.shape
    assert nb * 2 * half == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    # K-blocked layout (nb, R, BLOCK): the kernel indexes blocks on the
    # LEADING dim (lane/sublane dims must stay statically aligned).
    xr = jnp.moveaxis(x.reshape(R, nb, 2 * half), 1, 0)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((nb, Rp - R, 2 * half), xr.dtype)], axis=1)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)
    table_vals = [float(v) for v in
                  (NF4_TABLE if mode == "nf4" else SF4_TABLE)]

    # Grid (rows, out, K): K innermost so the revisited output block stays
    # resident in VMEM while the kernel accumulates across K tiles.
    y = pl.pallas_call(
        _kernel(kt, half, ot, tuple(table_vals), rt),
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((kt, rt, 2 * half), lambda r, o, k: (k, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, half, ot), lambda r, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 1, ot), lambda r, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, ot), lambda r, o, k: (r, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, out), jnp.float32),
        interpret=interpret,
    )(xr, q, scale)  # kernel upcasts per block; bf16 x halves VMEM
    return y[:R].reshape(*lead, out).astype(x.dtype)
