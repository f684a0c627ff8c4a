"""WKV implementation dispatch.

Selected at trace time (static); override with
``AI00_WKV_IMPL=scan|pallas|pallas_interpret|chunked``.

Defaults on TPU chunks of >= PALLAS_MIN_T tokens:
* v5/v6 (diagonal decay): the chunked-matmul (MXU) form — 3.2x over the
  Pallas VMEM-scan kernel at production shapes.
* v7 (delta rule): the chunked WY (MXU) form with a nilpotent Neumann
  inverse — 2.3x over the Pallas kernel.

Single-token decode always uses the lax.scan (one step).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

PALLAS_MIN_T = 8


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def select_impl(T: int, dtype, family: str = "v56") -> str:
    """-> 'scan' | 'pallas' | 'chunked' for this chunk."""
    impl = os.environ.get("AI00_WKV_IMPL", "auto")
    if impl == "scan":
        return "scan"
    if impl in ("pallas", "pallas_interpret"):
        return "pallas"
    if impl == "chunked":
        return "chunked"
    if T < PALLAS_MIN_T or dtype != jnp.float32 or not _on_tpu():
        return "scan"
    return "chunked"


def use_pallas(T: int) -> bool:
    """v7 path: pallas kernel or scan."""
    impl = os.environ.get("AI00_WKV_IMPL", "auto")
    if impl == "scan" or impl == "chunked":
        return False
    if impl in ("pallas", "pallas_interpret"):
        return True
    return T >= PALLAS_MIN_T and _on_tpu()


def interpret_mode() -> bool:
    return os.environ.get("AI00_WKV_IMPL") == "pallas_interpret"


def use_t1_kernel(num_emb: int = 0) -> bool:
    """Single-pass T=1 WKV / fused channel-mix kernels (ops/wkv_t1.py,
    ops/ffn_pallas.py) for the generic decode path.  Measured A/B at
    batch 16: +10% at 1.48B int8, -6.5% at 7B int8 (the extra pallas ops
    shrink the nested scoped-vmem budget every kernel in the scan gets),
    so the default is size-gated: on below C=4096.  AI00_WKV_IMPL=scan
    forces the XLA scan; pallas_interpret runs the kernels in interpret
    mode (tests); AI00_WKV_IMPL=pallas forces them on at any size."""
    impl = os.environ.get("AI00_WKV_IMPL", "auto")
    if impl == "scan":
        return False
    if impl in ("pallas", "pallas_interpret"):
        return True
    return _on_tpu() and 0 < num_emb < 4096


def fused_decode_mode() -> str:
    """'on' | 'off' | 'interpret' for the fused whole-network T=1 kernel
    (ops/v7_decode_pallas.py).  Default: on for TPU (measured 1.7x the
    unfused T=1 step at 438M bf16), off elsewhere.  Override with
    AI00_FUSED_DECODE=on|off|interpret."""
    mode = os.environ.get("AI00_FUSED_DECODE", "auto")
    if mode in ("on", "off", "interpret"):
        return mode
    return "on" if _on_tpu() else "off"


def phased_decode_mode() -> str:
    """'on' | 'off' | 'interpret' for the phased whole-LAYER T=1 kernel
    (ops/v7_phased_pallas.py) — the 7B-class follow-on to the fused
    whole-network kernel (K-tiled weight windows instead of whole-layer
    windows).  Default: on for TPU, off elsewhere.  Override with
    AI00_PHASED_DECODE=on|off|interpret."""
    mode = os.environ.get("AI00_PHASED_DECODE", "auto")
    if mode in ("on", "off", "interpret"):
        return mode
    return "on" if _on_tpu() else "off"
