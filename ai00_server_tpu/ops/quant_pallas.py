"""Pallas int8/NF4/SF4 dequant-in-matmul kernels (SURVEY.md hard part (c)).

Decode is weight-bandwidth bound; quantized weights must stream from HBM
packed, with dequantization happening in VMEM inside the matmul —
dequantizing in XLA materializes a full-precision copy in HBM first.

Kernel shape: ``y (R, out) = x (R, in) @ W``; grid (row tiles, out tiles,
K tiles) with K innermost so the revisited output block stays VMEM-
resident.  Per grid cell the kernel dequantizes its whole (K-tile, ot)
weight window in VMEM — a short elementwise pass — and issues ONE
pipelined (rt, K) @ (K, ot) MXU dot.  (An earlier form accumulated
per-64-row-block dots in a ``fori`` to keep scales on the accumulator;
the 32 tiny dependent dots serialized the MXU and ran 5-10x under the
HBM streaming floor.)

* int8: codes (nb, BLOCK, out) int8 + scale (nb, 1, out) f32; dequant is
  convert + broadcast multiply.
* nf4/sf4: codes (nb, BLOCK/2, out) uint8, split-half packing (byte ``i``
  holds block rows ``i`` / ``half+i``; ops.quant._quantize_4bit) +
  scale = absmax/127.  Each nibble decodes via a 2-level select tree over
  four packed-int32 table constants + a variable byte shift (TPU Pallas
  has no gather; ~3x fewer VPU ops than a 16-way compare/select chain),
  and the (kt, 2, half, ot) stack reshapes contiguously to (K, ot).

Used for ALL row counts on TPU (the grid tiles rows too) — XLA's
gather-based 4-bit dequant is orders of magnitude slower there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import NF4_TABLE8, SF4_TABLE8, pack_table8

DEFAULT_OUT_TILE = 512
ROW_TILE = 128
K_TILE_BLOCKS = 32  # in-blocks (of NF4_BLOCK rows) per grid step


def decode_nibble(c, packs, wdt):
    """4-bit table lookup without gather, on int32 codes ``c`` in [0, 16).

    The 16 decode levels live as int8 (+128 bias) bytes in four int32
    constants (ops.quant.pack_table8); bits 3:2 of the code pick the
    constant (2-level select tree), bits 1:0 pick the byte (variable
    shift).  Arithmetic >> then & 0xFF makes the sign-extended top byte
    extraction correct.  Levels are exact in bf16 and f32 alike.

    ``packs=None`` selects the UNIFORM int4 grid ``code - 8`` — one
    subtract instead of the ~10-op tree, which is what lets packed int4
    streaming actually realize its halved HBM bytes (ops.quant INT4
    comment).
    """
    if packs is None:
        return (c - 8).astype(wdt)
    p0, p1, p2, p3 = (int(p) for p in packs)  # python ints: inline consts
    j1 = (c & 4) != 0
    word = jnp.where((c & 8) != 0,
                     jnp.where(j1, p3, p2),
                     jnp.where(j1, p1, p0))
    val = (word >> ((c & 3) << 3)) & 0xFF
    return (val - 128).astype(wdt)


def dequant4_tile(q, scale, packs, wdt):
    """Dequantize a (kt, BLOCK/2, ot) packed 4-bit tile to (kt*BLOCK, ot).

    Split-half pack order makes the final reshape contiguous (free).
    """
    kt, half, ot = q.shape
    packed = q.astype(jnp.int32)  # widen first: Mosaic has no uint8 shift
    wlo = decode_nibble(packed & 0x0F, packs, wdt)   # block rows [0, half)
    whi = decode_nibble((packed >> 4) & 0x0F, packs, wdt)
    s = scale.astype(wdt)                            # (kt, 1, ot)
    w = jnp.stack([wlo * s, whi * s], axis=1)        # (kt, 2, half, ot)
    return w.reshape(kt * 2 * half, ot)


def _kernel(nb_tile, half, out_tile, packs, rt):
    def kernel(x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        w = dequant4_tile(q_ref[...], s_ref[...], packs, x_ref.dtype)
        y_ref[:] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    return kernel


def _int8_kernel(nb_tile, blk, out_tile, rt):
    def kernel(x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        # int8 -> bf16 + per-block scale happen HERE in VMEM: the codes
        # stream from HBM at 1 byte/element.  (XLA's paths either
        # materialize a bf16 copy of the weight in HBM or serialize into
        # per-block dots.)
        wdt = x_ref.dtype
        w = q_ref[...].astype(wdt) * s_ref[...].astype(wdt)  # (kt, blk, ot)
        w = w.reshape(nb_tile * blk, w.shape[-1])
        y_ref[:] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("out_tile", "interpret", "out_dtype"))
def matmul_int8(x, q, scale, out_tile=DEFAULT_OUT_TILE, interpret=False,
                out_dtype=None):
    """Fused int8 dequant-matmul: ``y = x @ (q * scale)``.

    x: (..., in) f32/bf16; q: (nb, BLOCK, out) int8 (in-major blocks,
    ops.quant.quantize_int8 layout); scale: (nb, 1, out) f32.  The weight
    crosses HBM exactly once, as int8 — decode throughput is then
    int8-weight-bandwidth bound instead of bf16-copy bound.
    ``out_dtype`` overrides the x.dtype result (the LM head wants the
    kernel's f32 accumulators un-rounded).
    """
    *lead, in_dim = x.shape
    nb, blk, out = q.shape
    assert nb * blk == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    xr = x.reshape(R, in_dim)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((Rp - R, in_dim), xr.dtype)], axis=0)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)

    y = pl.pallas_call(
        _int8_kernel(kt, blk, ot, rt),
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((rt, kt * blk), lambda r, o, k: (r, k),
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
    return y[:R].reshape(*lead, out).astype(out_dtype or x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mode", "out_tile", "interpret"))
def matmul_4bit(x, q, scale, mode="nf4", out_tile=DEFAULT_OUT_TILE,
                interpret=False):
    """x: (..., in) f32/bf16; q: (nb, BLOCK/2, out) uint8;
    scale: (nb, 1, out) f32 (= absmax/127).  Returns (..., out) in
    x.dtype.  The packed bytes stream from HBM at 4 bits/element and
    decode in VMEM (module docstring)."""
    *lead, in_dim = x.shape
    nb, half, out = q.shape
    assert nb * 2 * half == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    xr = x.reshape(R, in_dim)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((Rp - R, in_dim), xr.dtype)], axis=0)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)
    packs = (None if mode == "int4" else
             pack_table8(NF4_TABLE8 if mode == "nf4" else SF4_TABLE8))

    # Grid (rows, out, K): K innermost so the revisited output block stays
    # resident in VMEM while the kernel accumulates across K tiles.
    y = pl.pallas_call(
        _kernel(kt, half, ot, packs, rt),
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((rt, kt * 2 * half), lambda r, o, k: (r, k),
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
    )(xr, q, scale)
    return y[:R].reshape(*lead, out).astype(x.dtype)


def _int8_kernel_l(nb_tile, blk, out_tile, rt):
    def kernel(l_ref, x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        wdt = x_ref.dtype
        w = q_ref[0].astype(wdt) * s_ref[0].astype(wdt)  # (kt, blk, ot)
        w = w.reshape(nb_tile * blk, w.shape[-1])
        y_ref[:] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    return kernel


def _kernel_l(nb_tile, half, out_tile, packs, rt):
    def kernel(l_ref, x_ref, q_ref, s_ref, y_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        w = dequant4_tile(q_ref[0], s_ref[0], packs, x_ref.dtype)
        y_ref[:] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def matmul_int8_l(x, q, scale, l, out_tile=DEFAULT_OUT_TILE,
                  interpret=False):
    """``y = x @ (q[l] * scale[l])`` with STACKED codes: q is
    (L, nb, BLOCK, out), l a traced int32 layer index.

    The layer window is selected by the kernel's index_map via scalar
    prefetch — a ``lax.scan`` over layers that passed sliced codes as xs
    would materialize a copy of every layer's weights in HBM each step
    (3x the decode traffic at 7B: measured 32 ms/step vs ~10 ms op-sum).
    """
    *lead, in_dim = x.shape
    L, nb, blk, out = q.shape
    assert nb * blk == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    xr = x.reshape(R, in_dim)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((Rp - R, in_dim), xr.dtype)], axis=0)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((rt, kt * blk), lambda r, o, k, l_ref: (r, k)),
            pl.BlockSpec((1, kt, blk, ot),
                         lambda r, o, k, l_ref: (l_ref[0], k, 0, o)),
            pl.BlockSpec((1, kt, 1, ot),
                         lambda r, o, k, l_ref: (l_ref[0], k, 0, o)),
        ],
        out_specs=pl.BlockSpec((rt, ot), lambda r, o, k, l_ref: (r, o)),
    )
    y = pl.pallas_call(
        _int8_kernel_l(kt, blk, ot, rt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), xr, q, scale)
    return y[:R].reshape(*lead, out).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mode", "out_tile", "interpret"))
def matmul_4bit_l(x, q, scale, l, mode="nf4", out_tile=DEFAULT_OUT_TILE,
                  interpret=False):
    """``y = x @ dequant(q[l], scale[l])`` with STACKED packed codes:
    q is (L, nb, BLOCK/2, out), l a traced int32 layer index (see
    matmul_int8_l for why)."""
    *lead, in_dim = x.shape
    L, nb, half, out = q.shape
    assert nb * 2 * half == in_dim, (q.shape, in_dim)
    R = 1
    for d in lead:
        R *= d
    rt = min(ROW_TILE, R)
    Rp = -(-R // rt) * rt
    xr = x.reshape(R, in_dim)
    if Rp != R:
        xr = jnp.concatenate(
            [xr, jnp.zeros((Rp - R, in_dim), xr.dtype)], axis=0)
    ot = min(out_tile, out)
    assert out % ot == 0, (out, ot)
    kt = min(K_TILE_BLOCKS, nb)
    assert nb % kt == 0, (nb, kt)
    packs = (None if mode == "int4" else
             pack_table8(NF4_TABLE8 if mode == "nf4" else SF4_TABLE8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // rt, out // ot, nb // kt),
        in_specs=[
            pl.BlockSpec((rt, kt * 2 * half),
                         lambda r, o, k, l_ref: (r, k)),
            pl.BlockSpec((1, kt, half, ot),
                         lambda r, o, k, l_ref: (l_ref[0], k, 0, o)),
            pl.BlockSpec((1, kt, 1, ot),
                         lambda r, o, k, l_ref: (l_ref[0], k, 0, o)),
        ],
        out_specs=pl.BlockSpec((rt, ot), lambda r, o, k, l_ref: (r, o)),
    )
    y = pl.pallas_call(
        _kernel_l(kt, half, ot, packs, rt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), xr, q, scale)
    return y[:R].reshape(*lead, out).astype(x.dtype)
