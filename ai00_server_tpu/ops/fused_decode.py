"""Dispatch table + shared plumbing for the fused whole-network T=1
decode kernels.

One kernel module per RWKV version (ops/v{4,5,6,7}_decode_pallas.py), all
with the same surface: ``FUSED_KEY``, ``can_fuse(params)``,
``make_fused_layout(params)``, ``supports(params)``, ``forward_t1(...)``.

The big projections may arrive quantized (ops.quant quantize_group); the
helpers here let every kernel stream them as codes+scales windows and
dequantize in VMEM (see v7_decode_pallas for the design notes).
"""

from __future__ import annotations

import jax


def module_for(version: str):
    """The fused-decode kernel module for a ModelVersion value string,
    or None if the version has no fused kernel."""
    if version == "V4":
        from . import v4_decode_pallas as fd
    elif version == "V5":
        from . import v5_decode_pallas as fd
    elif version == "V6":
        from . import v6_decode_pallas as fd
    elif version == "V7":
        from . import v7_decode_pallas as fd
    else:
        return None
    return fd


def group_mode(layers, big_src):
    """'none'/'int8'/'nf4'/'sf4' when the big projections are uniformly
    plain or uniformly quantized in one mode; None otherwise."""
    from . import quant

    modes = set()
    for name, (part, key) in big_src.items():
        leaf = layers[part][key]
        modes.add(leaf.mode if isinstance(leaf, quant.QuantizedLinear)
                  else "none")
    return modes.pop() if len(modes) == 1 else None


def stored_bytes_per_layer(layers) -> int:
    """Per-layer stored bytes across all leaves (quantized leaves count
    their codes + scales); -1 when a non-array, non-quantized leaf is
    found."""
    from . import quant

    total = 0
    leaves = jax.tree.leaves(
        layers, is_leaf=lambda x: isinstance(x, quant.QuantizedLinear))
    for leaf in leaves:
        if isinstance(leaf, quant.QuantizedLinear):
            total += (leaf.q.size // leaf.q.shape[0]) * leaf.q.dtype.itemsize
            total += (leaf.scale.size // leaf.scale.shape[0]) * 4
        elif not hasattr(leaf, "ndim"):
            return -1
        else:
            total += (leaf.size // leaf.shape[0]) * leaf.dtype.itemsize
    return total


def big_layout_entries(layers, big_src) -> dict:
    """The fused-layout entries for the big projections: ``name`` for
    plain weights, ``name_q`` + ``name_s`` for quantized ones."""
    from . import quant

    out = {}
    for name, (part, key) in big_src.items():
        leaf = layers[part][key]
        if isinstance(leaf, quant.QuantizedLinear):
            out[f"{name}_q"] = leaf.q
            out[f"{name}_s"] = leaf.scale
        else:
            out[name] = leaf
    return out


def expand_keys(all_keys, big, fused):
    """Expand the static key list for quantized big projections."""
    keys = []
    for k in all_keys:
        if k in big and k not in fused:
            keys += [f"{k}_q", f"{k}_s"]
        else:
            keys.append(k)
    return keys


def mode_packs(layers, big_src):
    """(qmode, packs) for the kernel: packs is the 4-bit decode table for
    nf4/sf4, None otherwise."""
    from .quant import NF4_TABLE8, SF4_TABLE8, pack_table8

    qmode = group_mode(layers, big_src)
    packs = None
    if qmode in ("nf4", "sf4"):
        packs = pack_table8(NF4_TABLE8 if qmode == "nf4" else SF4_TABLE8)
    return qmode, packs


def make_W(w, qmode, packs, cd):
    """Big-projection accessor for kernels: returns the (in, out) weight,
    dequantized in VMEM when stored quantized."""
    import jax.numpy as jnp

    def W(name):
        if name in w:
            return w[name][0]
        q, s = w[name + "_q"][0], w[name + "_s"][0]
        if qmode == "int8":
            nb, blk, out = q.shape
            return (q.astype(cd) * s.astype(cd)).reshape(nb * blk, out)
        from .quant_pallas import dequant4_tile

        # int4 passes packs=None (uniform-grid arithmetic decode).
        return dequant4_tile(q, s, None if qmode == "int4" else packs, cd)

    return W
