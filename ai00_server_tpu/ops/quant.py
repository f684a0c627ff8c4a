"""Weight quantization: Int8 / NF4 / SF4 (reference surface: web-rwkv
``Quant::{None,Int8,NF4,SF4}`` selected per layer count via
``ReloadRequest.quant``/``quant_type``, crates/ai00-core/src/lib.rs:465,
crates/ai00-core/src/reload.rs:23-27).

TPU-first design: weights are *stored* quantized in HBM (the decode
bottleneck is weight bandwidth) and dequantized on the fly inside the
matmul.  Decode dispatch (measured, see docs/decode-paths.md): int8
goes through a per-block XLA einsum (the convert and the layer
dynamic-slice fuse into the dot's operand load), 4-bit through the
Pallas packed-table kernel (XLA has no efficient gather on TPU);
AI00_QUANT_MATMUL overrides.

* Int8: symmetric per-(128-row block, output column) scaling,
  ``q = round(w / s)``, ``s = absmax / 127``.
* NF4: 4-bit NormalFloat table (QLoRA), per-(64-input-row block, output
  column) absmax — in-major blocking so the dequant sits inside the
  matmul's K loop (the Pallas kernel in quant_pallas.py).
* SF4: 4-bit with an exponent-biased table emphasizing small magnitudes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INT8_BLOCK = 128
NF4_BLOCK = 64

# QLoRA NormalFloat-4 quantiles.
NF4_TABLE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], np.float32)

# SF4: sign+exponent-ish levels (denser near zero than NF4's quantiles).
SF4_TABLE = np.array([
    -1.0, -0.5, -0.25, -0.125, -0.0625, -0.03125, -0.015625, 0.0,
    0.015625, 0.03125, 0.0625, 0.125, 0.25, 0.5, 0.75, 1.0,
], np.float32)

# Integer decode tables: 4-bit weights reconstruct as round(table * 127)
# int8 values (exact in bf16) with the /127 folded into the stored block
# scale.  TPU Pallas has no gather, so the kernel materializes the lookup
# from four packed-int32 constants with a 2-level select tree + variable
# byte shift (quant_pallas._kernel) — ~3x fewer VPU ops than a 16-way
# compare/select chain.  dequant() uses the SAME effective table so the
# XLA and Pallas paths agree exactly; the level shift vs the real table
# is <= 0.4% of blockmax (far below the 4-bit quantization step).
NF4_TABLE8 = np.round(NF4_TABLE * 127.0).astype(np.int32)
SF4_TABLE8 = np.round(SF4_TABLE * 127.0).astype(np.int32)

# INT4 (TPU-native extension beyond the reference's Quant enum): UNIFORM
# 4-bit levels ``w = (code - 8) * scale``, scale = absmax/8 per
# (64-input-row block, out column).  Designed to test whether a minimal
# (~6 VPU ops/element: mask/shift/subtract/convert x2 nibbles) unpack
# could let packed 4-bit streaming beat int8: measured on v5e it CANNOT
# — 7B phased decode ran 46.6 ms/step packed vs 14.8 int8 (and the
# NF4 table's ~13-op decode ran 27).  Per-element VPU work costs ~2 ms
# per op-per-element at 7B, far above the ~4.4 ms the halved DMA saves,
# so true 4-bit-at-its-bytes decode is STRUCTURALLY VPU-bound on this
# hardware.  All 4-bit modes therefore decode through int8 SURROGATE
# codes by default (exact for int4: the levels ARE int8), keeping the
# packed form for storage/prefab and for memory-constrained loading
# (AI00_NF4_DECODE=packed).


def pack_table8(table8: np.ndarray) -> tuple:
    """Pack 16 int8 decode levels into 4 int32s (biased +128, little-endian
    bytes), wrapped to signed int32 range for jnp constants."""
    packs = []
    for j in range(4):
        p = 0
        for m in range(4):
            p |= (int(table8[4 * j + m]) + 128) << (8 * m)
        if p >= 1 << 31:
            p -= 1 << 32
        packs.append(p)
    return tuple(packs)


@jax.tree_util.register_pytree_node_class
class QuantizedLinear:
    """A quantized ``(..., in, out)`` weight with a fused-dequant matmul.

    Pytree-compatible (stacks under ``lax.scan`` layer groups; serializes
    through the prefab path).  ``mode`` is static aux data.
    """

    def __init__(self, mode: str, q, scale, shape):
        self.mode = mode
        self.q = q            # int8 codes (int8) or packed nf4 (uint8)
        self.scale = scale    # per-block scales, f32
        self.shape = shape    # logical (in, out) of the last two dims

    def tree_flatten(self):
        return (self.q, self.scale), (self.mode, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        mode, shape = aux
        return cls(mode, q, scale, shape)

    # -- dequant ---------------------------------------------------------

    def dequant(self, dtype=jnp.float32):
        if self.mode == "int8":
            # q: (..., nb, B, out), scale: (..., nb, 1, out)
            w = self.q.astype(jnp.float32) * self.scale
            return w.reshape(self.q.shape[:-3] + self.shape).astype(dtype)
        # nf4/sf4/int4: q (..., nb, NF4_BLOCK/2, out) packed SPLIT-HALF
        # along the in axis (byte i: low nibble -> block row i, high
        # nibble -> block row half+i); scale (..., nb, 1, out) =
        # absmax/127 (table modes) or absmax/8 (int4).
        lo = (self.q & 0x0F).astype(jnp.int32)
        hi = (self.q >> 4).astype(jnp.int32)
        codes = jnp.concatenate([lo, hi], axis=-2)  # (..., nb, BLOCK, out)
        if self.mode == "int4":
            w = (codes - 8).astype(jnp.float32) * self.scale
        else:
            table = jnp.asarray(
                NF4_TABLE8 if self.mode == "nf4" else SF4_TABLE8,
                jnp.float32)
            w = table[codes] * self.scale
        return w.reshape(self.q.shape[:-3] + self.shape).astype(dtype)

    def matmul(self, x):
        """``x @ W`` with on-the-fly dequant.

        int8: contract each 128-row block against the int8 codes (the
        int8->bf16 convert fuses into the dot's operand load) and apply
        the per-(block, out) scales to the SMALL accumulator — never
        materializing a dequantized copy of the weight.
        """
        import os

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        use_pallas = os.environ.get("AI00_QUANT_MATMUL", "pallas") != "xla"
        if self.mode == "int8" and rows < 512 and use_pallas and \
                jax.default_backend() in ("tpu", "axon") and \
                self.q.ndim == 3:
            # Decode shapes, UNSTACKED codes (rollback re-feed, tests):
            # the Pallas kernel streams the int8 codes from HBM and
            # converts in VMEM.  (The serving path uses STACKED codes via
            # QuantizedLayerView, where the per-block einsum wins.)
            from .quant_pallas import matmul_int8

            return matmul_int8(x, self.q, self.scale)
        if self.mode in ("nf4", "sf4", "int4") and use_pallas and \
                jax.default_backend() in ("tpu", "axon") and \
                self.q.ndim == 3:
            # Pallas kernel streams PACKED bytes from HBM and decodes in
            # VMEM inside the matmul's K loop (XLA's table-gather dequant
            # is orders of magnitude slower on TPU).
            from .quant_pallas import matmul_4bit

            return matmul_4bit(x, self.q, self.scale, mode=self.mode)
        # Prefill shapes: one dequant pass + a single large matmul wins
        # (splitting K into per-block matmuls starves the MXU at large M).
        w = self.dequant(x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def quantize_int8(w: np.ndarray) -> QuantizedLinear:
    """Symmetric int8 over (in, out) with per-(block-of-in, out) scale."""
    *lead, in_dim, out = w.shape
    assert in_dim % INT8_BLOCK == 0, f"in dim {in_dim} % {INT8_BLOCK}"
    nb = in_dim // INT8_BLOCK
    wb = np.asarray(w, np.float32).reshape(*lead, nb, INT8_BLOCK, out)
    s = np.abs(wb).max(axis=-2, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(wb / s), -127, 127).astype(np.int8)
    return QuantizedLinear("int8", jnp.asarray(q),
                           jnp.asarray(s.astype(np.float32)), (in_dim, out))


def _quantize_4bit(w: np.ndarray, table8: np.ndarray,
                   mode: str) -> QuantizedLinear:
    """In-major blocking: absmax per (NF4_BLOCK input rows, out column);
    two codes per byte packed SPLIT-HALF along the in axis (byte i: low
    nibble -> block row i, high nibble -> block row half+i) so the kernel
    needs no sublane interleave — the two decoded halves feed two K=32
    matmuls directly.  Stored scale = absmax/127 (decode levels are the
    integer table)."""
    *lead, in_dim, out = w.shape
    assert in_dim % NF4_BLOCK == 0
    nb = in_dim // NF4_BLOCK
    half = NF4_BLOCK // 2
    blocks = np.asarray(w, np.float32).reshape(*lead, nb, NF4_BLOCK, out)
    absmax = np.abs(blocks).max(axis=-2, keepdims=True)  # (..., nb, 1, out)
    absmax = np.maximum(absmax, 1e-12)
    norm = blocks / absmax
    # Nearest table value via searchsorted on midpoints (tables are
    # sorted) — the |x - table| argmin creates a 16x intermediate, which
    # is prohibitive for multi-billion-parameter groups.
    eff = table8.astype(np.float32) / 127.0
    mids = ((eff[1:] + eff[:-1]) / 2).astype(np.float32)
    codes = np.searchsorted(mids, norm).astype(np.uint8)
    lo = codes[..., :half, :]
    hi = codes[..., half:, :]
    packed = (lo | (hi << 4)).astype(np.uint8)  # (..., nb, BLOCK/2, out)
    return QuantizedLinear(
        mode, jnp.asarray(packed),
        jnp.asarray((absmax / 127.0).astype(np.float32)), (in_dim, out))


def quantize_nf4(w: np.ndarray) -> QuantizedLinear:
    return _quantize_4bit(w, NF4_TABLE8, "nf4")


def quantize_sf4(w: np.ndarray) -> QuantizedLinear:
    return _quantize_4bit(w, SF4_TABLE8, "sf4")


def quantize_int4(w: np.ndarray) -> QuantizedLinear:
    """Uniform int4: ``w = (code - 8) * scale``, scale = absmax/8 per
    (NF4_BLOCK input rows, out column); same split-half packing as
    nf4/sf4 (module constants comment)."""
    *lead, in_dim, out = w.shape
    assert in_dim % NF4_BLOCK == 0
    nb = in_dim // NF4_BLOCK
    half = NF4_BLOCK // 2
    blocks = np.asarray(w, np.float32).reshape(*lead, nb, NF4_BLOCK, out)
    absmax = np.maximum(np.abs(blocks).max(axis=-2, keepdims=True), 1e-12)
    s = absmax / 8.0
    codes = (np.clip(np.round(blocks / s), -8, 7) + 8).astype(np.uint8)
    lo = codes[..., :half, :]
    hi = codes[..., half:, :]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return QuantizedLinear("int4", jnp.asarray(packed),
                           jnp.asarray(s.astype(np.float32)),
                           (in_dim, out))


QUANTIZERS = {"int8": quantize_int8, "nf4": quantize_nf4,
              "sf4": quantize_sf4, "int4": quantize_int4}


# -- device-side quantizers ----------------------------------------------
# Same blocking/packing as the numpy quantizers above, but running on the
# accelerator: the bench host is single-core and memory-starved (~1.5M
# numpy RNG samples/s measured), so multi-billion-parameter quantization
# must never touch host RAM.  A leading layer axis is processed via
# ``lax.map`` so the f32 intermediates never exceed one layer's footprint.

def _quantize_int8_jax_2d(w):
    in_dim, out = w.shape
    nb = in_dim // INT8_BLOCK
    wb = w.reshape(nb, INT8_BLOCK, out).astype(jnp.float32)
    s = jnp.maximum(jnp.abs(wb).max(axis=-2, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wb / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_int8_jax(w) -> QuantizedLinear:
    """Device-side :func:`quantize_int8` (same codes/scales)."""
    *lead, in_dim, out = w.shape
    assert in_dim % INT8_BLOCK == 0, f"in dim {in_dim} % {INT8_BLOCK}"
    if w.ndim == 2:
        q, s = jax.jit(_quantize_int8_jax_2d)(w)
    else:
        assert w.ndim == 3
        q, s = jax.jit(lambda x: jax.lax.map(_quantize_int8_jax_2d, x))(w)
    return QuantizedLinear("int8", q, s, (in_dim, out))


def _quantize_4bit_jax_2d(w, mids, table_size=16):
    """``mids`` must be a HOST numpy array (static 15-entry boundary
    list), not a traced value — see the compare loop below."""
    in_dim, out = w.shape
    nb = in_dim // NF4_BLOCK
    half = NF4_BLOCK // 2
    blocks = w.reshape(nb, NF4_BLOCK, out).astype(jnp.float32)
    absmax = jnp.maximum(jnp.abs(blocks).max(axis=-2, keepdims=True), 1e-12)
    norm = blocks / absmax
    # Equivalent of jnp.searchsorted(mids, norm) (side='left': the code
    # is the count of mids strictly below the value) as 15 fused
    # elementwise compares.  searchsorted itself is AVOIDED on purpose:
    # its TPU lowering left the worker in a state where the NEXT
    # device->host transfer crashed it ("TPU worker process crashed"),
    # reproducibly killing the 7b_nf4 bench group (r4+r5) — int4's
    # quantizer, identical but for this op, never did.
    codes = jnp.zeros(norm.shape, jnp.uint8)
    for m in mids:
        codes += (norm > float(m)).astype(jnp.uint8)
    lo = codes[:, :half, :]
    hi = codes[:, half:, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, (absmax / 127.0).astype(jnp.float32)


def quantize_4bit_jax(w, mode: str) -> QuantizedLinear:
    """Device-side :func:`quantize_nf4`/``sf4`` (same codes/scales)."""
    import functools

    table8 = NF4_TABLE8 if mode == "nf4" else SF4_TABLE8
    eff = table8.astype(np.float32) / 127.0
    mids = ((eff[1:] + eff[:-1]) / 2).astype(np.float32)  # host constant
    fn = functools.partial(_quantize_4bit_jax_2d, mids=mids)
    *lead, in_dim, out = w.shape
    assert in_dim % NF4_BLOCK == 0
    if w.ndim == 2:
        q, s = jax.jit(fn)(w)
    else:
        assert w.ndim == 3
        q, s = jax.jit(lambda x: jax.lax.map(fn, x))(w)
    return QuantizedLinear(mode, q, s, (in_dim, out))


def _quantize_int4_jax_2d(w):
    in_dim, out = w.shape
    nb = in_dim // NF4_BLOCK
    half = NF4_BLOCK // 2
    blocks = w.reshape(nb, NF4_BLOCK, out).astype(jnp.float32)
    absmax = jnp.maximum(jnp.abs(blocks).max(axis=-2, keepdims=True), 1e-12)
    s = absmax / 8.0
    codes = (jnp.clip(jnp.round(blocks / s), -8, 7) + 8).astype(jnp.uint8)
    lo = codes[:, :half, :]
    hi = codes[:, half:, :]
    return (lo | (hi << 4)).astype(jnp.uint8), s


def quantize_int4_jax(w) -> QuantizedLinear:
    """Device-side :func:`quantize_int4` (same codes/scales)."""
    *lead, in_dim, out = w.shape
    assert in_dim % NF4_BLOCK == 0
    if w.ndim == 2:
        q, s = jax.jit(_quantize_int4_jax_2d)(w)
    else:
        assert w.ndim == 3
        q, s = jax.jit(lambda x: jax.lax.map(_quantize_int4_jax_2d, x))(w)
    return QuantizedLinear("int4", q, s, (in_dim, out))


QUANTIZERS_JAX = {
    "int8": quantize_int8_jax,
    "nf4": lambda w: quantize_4bit_jax(w, "nf4"),
    "sf4": lambda w: quantize_4bit_jax(w, "sf4"),
    "int4": quantize_int4_jax,
}

# Large projection weights eligible for quantization (the reference
# quantizes the matmul weights, not norms/mixers).
_QUANT_KEYS_ATT = ("receptance", "key", "value", "gate", "output")
_QUANT_KEYS_FFN = ("receptance", "key", "value")


def quantize_group(stacked: dict, mode: str) -> dict:
    """Replace the big linear weights in a stacked layer-group pytree with
    QuantizedLinear leaves.  ``stacked`` arrays have a leading layer axis."""
    qfn = QUANTIZERS[mode]

    def maybe(d: dict, keys):
        for k in keys:
            if k in d and getattr(d[k], "ndim", 0) >= 2:
                d[k] = qfn(np.asarray(d[k], np.float32))

    out = jax.tree.map(lambda x: x, stacked)  # shallow-ish copy
    maybe(out["att"], _QUANT_KEYS_ATT)
    maybe(out["ffn"], _QUANT_KEYS_FFN)
    return out


class QuantizedLayerView:
    """Layer ``idx`` of a STACKED QuantizedLinear (q leading dim = layer),
    selected without slicing the stacked codes.

    A ``lax.scan`` over layers that passes sliced codes as xs materializes
    a copy of every layer's weights in HBM each step — 3x the decode
    traffic at 7B (measured 32 ms/step against a ~10 ms op-sum).  The
    decode-shape path instead hands the stacked arrays plus the layer
    index to Pallas kernels whose index_map picks the layer window via
    scalar prefetch (quant_pallas.matmul_int8_l / matmul_4bit_l); prefill
    shapes fall back to slice + dequant + one big dot, where the one-time
    copy amortizes over the chunk's tokens.
    """

    def __init__(self, qlin: "QuantizedLinear", idx):
        self.qlin = qlin
        self.idx = idx

    def matmul(self, x):
        import os

        qlin = self.qlin
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # Decode-path dispatch, measured A/B through the full bench at
        # batch 16 (AI00_QUANT_MATMUL overrides): for int8 the XLA
        # per-block einsum wins at every size tested (7B: 22.5 vs 26.8
        # ms/step; 1.48B: 7.35 vs 7.58 — the convert AND the layer
        # dynamic-slice fuse into the dot's operand load with no
        # custom-call boundaries).  4-bit always takes the Pallas kernel
        # (XLA's table gather is orders slower).
        pref = os.environ.get("AI00_QUANT_MATMUL", "auto")
        use_pallas = pref == "pallas" or (
            pref == "auto" and qlin.mode != "int8")
        if rows < 512 and qlin.q.ndim == 4 and use_pallas and on_tpu:
            from .quant_pallas import matmul_4bit_l, matmul_int8_l

            if qlin.mode == "int8":
                return matmul_int8_l(x, qlin.q, qlin.scale, self.idx)
            return matmul_4bit_l(x, qlin.q, qlin.scale, self.idx,
                                 mode=qlin.mode)
        q_l = jax.lax.dynamic_index_in_dim(qlin.q, self.idx, 0,
                                           keepdims=False)
        s_l = jax.lax.dynamic_index_in_dim(qlin.scale, self.idx, 0,
                                           keepdims=False)
        if qlin.mode == "int8" and rows < 512 and on_tpu:
            # Per-block einsum with the int8->bf16 convert fused into the
            # dot's operand load and scales on the small accumulator —
            # XLA also folds the layer dynamic-slice into the operand
            # load, so the codes cross HBM once with no custom-call
            # boundaries (the round-1 decode path).
            *lead, in_dim = x.shape
            nb, blk, out = q_l.shape
            xb = x.reshape(-1, nb, blk)
            part = jnp.einsum(
                "bnk,nko->bno", xb.astype(jnp.bfloat16),
                q_l.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            y = (part * s_l[None, :, 0]).sum(1)
            return y.reshape(*lead, out).astype(x.dtype)
        return QuantizedLinear(qlin.mode, q_l, s_l, qlin.shape).matmul(x)


def use_int8_surrogate() -> bool:
    """Whether 4-bit models (nf4/sf4/int4) decode through int8 SURROGATE
    codes.

    Packed 4-bit Pallas decode is VPU-bound on TPU v5e, measured at TWO
    op counts: the NF4 table's ~13 ops/element ran 27 ms/step at 7B and
    the uniform int4 grid's ~6 ops ran 46.6 ms/step through the phased
    kernel (mono-body accounting differs), both FAR above int8's
    14.8 ms — per-element unpack work costs more than the halved DMA
    saves, structurally.  The surrogate stores the integer decode
    levels as int8 codes with the same per-64-row-block scales:
    dequantized values are BIT-IDENTICAL to the packed path, but the
    decode becomes a plain int8 convert that fuses into the matmul —
    int8-class speed at 2x the 4-bit HBM bytes.  Default on TPU;
    AI00_NF4_DECODE=packed keeps the true 4-bit streaming path (halves
    weight memory, for models that would not otherwise fit).
    """
    import os

    mode = os.environ.get("AI00_NF4_DECODE", "auto")
    if mode in ("surrogate", "packed"):
        return mode == "surrogate"
    return jax.default_backend() in ("tpu", "axon")


def to_int8_surrogate(qlin: QuantizedLinear) -> QuantizedLinear:
    """4-bit -> int8 surrogate: codes become the integer decode levels
    as int8 (``table8[nibble]`` for nf4/sf4; ``nibble - 8`` for int4 —
    EXACT, the uniform levels are int8 already), scales unchanged
    (per-64-row block).  Runs on device, layer by layer, so the
    temporary unpack never exceeds one layer's footprint."""
    assert qlin.mode in ("nf4", "sf4", "int4"), qlin.mode
    table = (None if qlin.mode == "int4"
             else NF4_TABLE8 if qlin.mode == "nf4" else SF4_TABLE8)

    def conv(q):
        lo = (q & 0x0F).astype(jnp.int32)
        hi = (q >> 4).astype(jnp.int32)
        codes = jnp.concatenate([lo, hi], axis=-2)  # (nb, BLOCK, out)
        if table is None:
            return (codes - 8).astype(jnp.int8)
        # 16-entry lookup without gather: 4-level select tree on the
        # nibble bits (XLA fuses this into one elementwise pass).
        v = jnp.zeros(codes.shape, jnp.int32)
        for i in range(16):
            v = jnp.where(codes == i, int(table[i]), v)
        return v.astype(jnp.int8)

    if qlin.q.ndim == 4:  # stacked (L, nb, BLOCK/2, out)
        q8 = jax.lax.map(conv, qlin.q)
    else:
        q8 = conv(qlin.q)
    return QuantizedLinear("int8", q8, qlin.scale, qlin.shape)


def repack_surrogate(q8: np.ndarray, scale: np.ndarray, mode: str,
                     shape) -> QuantizedLinear:
    """Invert :func:`to_int8_surrogate` exactly (host-side, for prefab
    export): surrogate int8 values are distinct decode levels, so the
    nibbles recover losslessly."""
    if mode == "int4":
        codes = (q8.astype(np.int32) + 8).astype(np.uint8)
    else:
        table8 = NF4_TABLE8 if mode == "nf4" else SF4_TABLE8
        order = np.argsort(table8)
        codes = order[np.searchsorted(table8[order],
                                      q8.astype(np.int32))].astype(np.uint8)
    half = codes.shape[-2] // 2
    lo = codes[..., :half, :]
    hi = codes[..., half:, :]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return QuantizedLinear(mode, packed, scale, shape)


def surrogate_group(layers: dict) -> dict:
    """Replace every nf4/sf4 leaf in a stacked layer-group pytree with its
    int8 surrogate.  Returns {dotted-path: original mode} for the leaves
    converted (prefab export repacks them, prefab.py)."""
    converted = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                r = walk(v, path + (k,))
                if r is not None:
                    node[k] = r
            return None
        if isinstance(node, list):
            for i, v in enumerate(node):
                r = walk(v, path + (i,))
                if r is not None:
                    node[i] = r
            return None
        if isinstance(node, QuantizedLinear) and node.mode in (
                "nf4", "sf4", "int4"):
            converted[".".join(map(str, path))] = node.mode
            return to_int8_surrogate(node)
        return None

    walk(layers, ())
    return converted


def hoist_quantized(layers: dict):
    """Split a stacked layer-group pytree for a layer ``scan``.

    Returns ``(xs_tree, reinsert)``: ``xs_tree`` has every
    QuantizedLinear replaced by None (pytrees drop None, so the scan does
    NOT slice the codes per iteration); ``reinsert(sliced, idx)`` puts
    QuantizedLayerView(stacked, idx) back at each hole in the sliced
    per-layer tree the scan body receives.
    """
    found = []

    def strip(node, path):
        if isinstance(node, dict):
            return {k: strip(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, QuantizedLinear):
            found.append((path, node))
            return None
        return node

    xs = strip(layers, ())

    def reinsert(sliced: dict, idx):
        for path, qlin in found:
            d = sliced
            for k in path[:-1]:
                d = d[k]
            d[path[-1]] = QuantizedLayerView(qlin, idx)
        return sliced

    return xs, reinsert
