"""Root conftest: force tests onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session so that
sharding/pjit tests exercise real multi-device code paths without TPU
hardware.  Benchmarks (`bench.py`) do NOT import this and run on the real
chip.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
