"""Fused T=1 channel-mix kernel for quantized-stacked weights.

The FFN is 2/3 of a v7 layer's weight bytes (key (C, 4C) + value
(4C, C)); on the generic decode path it costs two Pallas matmuls plus a
dozen small XLA ops per layer, each with a fixed issue cost.  This
kernel runs the whole channel mix as ONE op: grid over hidden tiles,
per phase it dequantizes a (C, Ft) key tile and an (Ft, C) value tile
in VMEM (scalar-prefetch layer indexing into the stacked codes — no
per-layer slicing copies), computes ``relu(fxk @ K_t)^2 @ V_t`` and
accumulates the output in VMEM scratch.

Covers the v7 convention (``x + dx*mix_k``, no receptance gate,
models/common.channel_mix_v7); the receptance-gated v4/v5/v6 mixes keep
the generic path (their big models usually fit the whole-network fused
kernels once quantized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import NF4_TABLE8, SF4_TABLE8, pack_table8
from .quant_pallas import dequant4_tile

# Target stored bytes per phase.  The effective scoped-vmem budget XLA
# grants a pallas op nested in the decode scan is ~20 MB (measured), so
# keep double-buffered key+value windows under it.
PHASE_BYTES = 6 * 1024 * 1024


def _dequant(q, s, qmode, packs, wdt):
    """(kt, BLK, out) codes + (kt, 1, out) scales -> (kt*BLK, out)."""
    if qmode == "int8":
        kt, blk, out = q.shape
        return (q.astype(wdt) * s.astype(wdt)).reshape(kt * blk, out)
    return dequant4_tile(q, s, packs, wdt)


def _kernel(qmode, packs, cd):
    def kernel(l_ref, xf_ref, shift_ref, mixk_ref, act_ref,
               qk_ref, sk_ref, qv_ref, sv_ref,
               out_ref, nshift_ref, acc_scr, fxk_scr):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            xf = xf_ref[...].astype(jnp.float32)
            prev = shift_ref[...].astype(jnp.float32)
            fxk_scr[...] = (xf + (prev - xf) * mixk_ref[...]).astype(cd) \
                .astype(jnp.float32)
            acc_scr[...] = jnp.zeros_like(acc_scr)
            active = act_ref[...] > 0
            nshift_ref[...] = jnp.where(
                active, xf, prev).astype(nshift_ref.dtype)

        wk = _dequant(qk_ref[0], sk_ref[0], qmode, packs, cd)  # (C, Ft)
        hk = jnp.dot(fxk_scr[...].astype(cd), wk,
                     preferred_element_type=jnp.float32)
        hk = jnp.square(jnp.maximum(hk, 0.0)).astype(cd)
        wv = _dequant(qv_ref[0], sv_ref[0], qmode, packs, cd)  # (Ft, C)
        acc_scr[...] += jnp.dot(hk, wv, preferred_element_type=jnp.float32)

        @pl.when(p == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_scr[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("qmode", "interpret"))
def ffn7_t1_l(xf, shift, mix_k, active, key_q, key_s, val_q, val_s, l,
              qmode, interpret=False):
    """One fused v7 channel-mix step on layer ``l`` of stacked codes.

    xf: (B, C) post-ln2 activations; shift: (B, C) ffn token-shift state;
    mix_k: (C,); active: (B,) bool; key_q: (L, nbK, BLK, F) codes;
    val_q: (L, nbV, BLK, C); l: traced int32.
    Returns (out (B, C) f32, new_shift (B, C)).
    """
    B, C = xf.shape
    L, nbK, blk, F = key_q.shape
    _, nbV, blkV, _ = val_q.shape
    total_bytes = (nbK * blk * F + nbV * blkV * C) * key_q.dtype.itemsize
    FP = max(1, -(-total_bytes // PHASE_BYTES))
    # The phase count must divide the tile structure; search UPWARD
    # (more phases = smaller windows) so the budget still holds.
    while FP < nbV and (F % FP or (F // FP) % blkV or nbV % FP):
        FP += 1
    if F % FP or (F // FP) % blkV or nbV % FP:
        FP = 1  # tiny models: single phase always fits
    Ft = F // FP
    packs = None
    if qmode in ("nf4", "sf4"):
        packs = pack_table8(NF4_TABLE8 if qmode == "nf4" else SF4_TABLE8)
    cd = xf.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(FP,),
        in_specs=[
            pl.BlockSpec((B, C), lambda p, l_ref: (0, 0)),
            pl.BlockSpec((B, C), lambda p, l_ref: (0, 0)),
            pl.BlockSpec((1, C), lambda p, l_ref: (0, 0)),
            pl.BlockSpec((B, 1), lambda p, l_ref: (0, 0)),
            pl.BlockSpec((1, nbK, blk, Ft),
                         lambda p, l_ref: (l_ref[0], 0, 0, p)),
            pl.BlockSpec((1, nbK, 1, Ft),
                         lambda p, l_ref: (l_ref[0], 0, 0, p)),
            pl.BlockSpec((1, nbV // FP, blkV, C),
                         lambda p, l_ref: (l_ref[0], p, 0, 0)),
            pl.BlockSpec((1, nbV // FP, 1, C),
                         lambda p, l_ref: (l_ref[0], p, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((B, C), lambda p, l_ref: (0, 0)),
                   pl.BlockSpec((B, C), lambda p, l_ref: (0, 0))],
        scratch_shapes=[pltpu.VMEM((B, C), jnp.float32),
                        pltpu.VMEM((B, C), jnp.float32)],
    )
    out, nshift = pl.pallas_call(
        _kernel(qmode, packs, cd),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, C), shift.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1),
      xf, shift, mix_k.reshape(1, C).astype(jnp.float32),
      active.reshape(B, 1).astype(jnp.float32),
      key_q, key_s, val_q, val_s)
    return out, nshift
