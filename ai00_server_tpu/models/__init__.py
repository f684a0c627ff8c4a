"""RWKV model families, TPU-first.

Each version module (v4/v5/v6/v7) implements the same functional surface:

* ``init_state(info, batch) -> state pytree``  (layer-major ``(L, B, ...)``)
* ``forward(params, state, tokens, lengths) -> (hidden, new_state)``
  where ``hidden`` is the post-``ln_out`` representation ``(B, T, C)``.
* ``state_to_packed`` / ``state_from_packed`` — conversion to the canonical
  flat layout used for the state cache, the `/api/oai/states` endpoint and
  ``.state`` files (web-rwkv-compatible row layout, see ``packing.py``).

Model code is pure JAX: projections are batched matmuls over the chunk
dimension (MXU), only the WKV recurrence is a ``lax.scan`` over time (or a
Pallas kernel, see ``ai00_server_tpu.ops``).  Layers are stacked into
"layer groups" (contiguous runs with the same quantization mode) and each
group is folded with ``lax.scan`` over the layer axis — one trace for N
layers.
"""

from . import info as info  # noqa: F401
from .info import ModelInfo, ModelVersion  # noqa: F401


def get_version_module(version):
    from .info import ModelVersion

    if version == ModelVersion.V4:
        from . import v4 as m
    elif version == ModelVersion.V5:
        from . import v5 as m
    elif version == ModelVersion.V6:
        from . import v6 as m
    elif version == ModelVersion.V7:
        from . import v7 as m
    else:
        raise ValueError(f"unknown model version {version}")
    return m
