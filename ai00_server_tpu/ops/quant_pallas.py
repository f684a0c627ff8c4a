"""Pallas NF4/SF4 dequant-in-matmul kernel (SURVEY.md hard part (c)).

Decode is weight-bandwidth bound; 4-bit weights must stream from HBM as
PACKED bytes, with the table lookup happening in VMEM inside the matmul's
K loop — dequantizing in XLA materializes a full-precision copy first.

Kernel shape: ``y (R, out) = x (R, in) @ W``, W stored as
``codes (nb, BLOCK/2, out) uint8`` (split-half packing: byte ``i`` holds
block rows ``i`` / ``half+i``) + ``scale (nb, 1, out) f32`` — the
in-major layout produced by ops.quant._quantize_4bit.  Per in-block the
kernel unpacks nibbles, decodes each via a 2-level select tree over four
packed-int32 table constants + a variable byte shift (TPU Pallas has no
gather; this is ~3x fewer VPU ops than a 16-way compare/select chain and
needs no sublane interleave), then feeds the two halves to two
(R, BLOCK/2) @ (BLOCK/2, ot) matmuls and scales the partial sum.

Used for ALL row counts on TPU (grid tiles rows too) — XLA's gather-
based dequant is orders of magnitude slower there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import NF4_BLOCK, NF4_TABLE8, SF4_TABLE8, pack_table8

DEFAULT_OUT_TILE = 512
ROW_TILE = 128
K_TILE_BLOCKS = 32  # in-blocks (of NF4_BLOCK rows) per grid step


def _kernel(nb_tile, half, out_tile, packs, rt):
    p0, p1, p2, p3 = (int(p) for p in packs)  # python ints: inline consts

    def kernel(x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        wdt = x_ref.dtype  # int8 levels are exact in bf16 and f32 alike

        def decode(c):
            # Table lookup without gather: the 16 decode levels live as
            # int8 (+128 bias) bytes in four int32 constants; bits 3:2 of
            # the code pick the constant (2-level select tree), bits 1:0
            # pick the byte (variable shift).  Arithmetic >> then & 0xFF
            # makes the sign-extended top byte extraction correct.
            j1 = (c & 4) != 0
            word = jnp.where((c & 8) != 0,
                             jnp.where(j1, p3, p2),
                             jnp.where(j1, p1, p0))
            val = (word >> ((c & 3) << 3)) & 0xFF
            return (val - 128).astype(wdt)

        def block(n, acc):
            # Widen BEFORE the bit ops: Mosaic has no uint8 shift.
            packed = q_ref[n].astype(jnp.int32)      # (half, ot)
            wlo = decode(packed & 0x0F)              # block rows [0, half)
            whi = decode((packed >> 4) & 0x0F)       # rows [half, BLOCK)
            xb = x_ref[n]                            # (rt, BLOCK)
            part = jnp.dot(xb[:, :half], wlo,
                           preferred_element_type=jnp.float32)
            part = part + jnp.dot(xb[:, half:], whi,
                                  preferred_element_type=jnp.float32)
            return acc + part * s_ref[n]             # scale (1, ot)

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
    packs = pack_table8(NF4_TABLE8 if mode == "nf4" else SF4_TABLE8)

    # Grid (rows, out, K): K innermost so the revisited output block stays
    # resident in VMEM while the kernel accumulates across K tiles.
    y = pl.pallas_call(
        _kernel(kt, half, ot, packs, rt),
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
