"""WKV implementation dispatch: Pallas kernel on TPU, lax.scan elsewhere.

Selected at trace time (static); override with AI00_WKV_IMPL=scan|pallas.
The Pallas path engages for chunks of >= PALLAS_MIN_T tokens — single-
token decode keeps the scan (one step; the kernel's grid setup would
cost more than it saves).
"""

from __future__ import annotations

import os

import jax

PALLAS_MIN_T = 8


def use_pallas(T: int) -> bool:
    impl = os.environ.get("AI00_WKV_IMPL", "auto")
    if impl == "scan":
        return False
    if impl == "pallas":
        return True
    if impl == "pallas_interpret":
        return True
    if T < PALLAS_MIN_T:
        return False
    return jax.default_backend() in ("tpu", "axon")


def interpret_mode() -> bool:
    return os.environ.get("AI00_WKV_IMPL") == "pallas_interpret"
