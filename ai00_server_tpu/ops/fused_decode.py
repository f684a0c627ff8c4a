"""Dispatch table for the fused whole-network T=1 decode kernels.

One kernel module per RWKV version (ops/v{4,5,6,7}_decode_pallas.py), all
with the same surface: ``FUSED_KEY``, ``can_fuse(params)``,
``make_fused_layout(params)``, ``supports(params)``, ``forward_t1(...)``.
"""

from __future__ import annotations


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
