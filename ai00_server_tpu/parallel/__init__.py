"""Multi-chip scaling: device meshes and sharding layouts.

The reference is single-GPU by design (SURVEY.md §2.9); this package is
the TPU-native addition: DP over the continuous-batching slot axis, TP
over heads/channels for 7B+, laid out so collectives ride ICI.
"""

from .sharding import (  # noqa: F401
    make_mesh, shard_params, shard_state, shard_sampler_state, data_specs,
)
