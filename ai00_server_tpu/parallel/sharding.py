"""Sharding layouts for multi-chip serving.

Mesh axes:

* ``dp`` — data parallel over the continuous-batching slot axis (the
  state pool's batch dim).  Embarrassingly parallel: each chip owns a
  subset of request slots; no cross-chip traffic on the decode path.
* ``tp`` — tensor parallel over heads / hidden channels for models that
  do not fit (or do not saturate) one chip.  Projections are sharded on
  the output feature dim, the WKV state on the head dim; XLA inserts the
  (ICI) collectives for the norm/residual resharding points.

Only *input* placements are constrained (params, state pool, token
batch); intermediate shardings are left to the XLA SPMD partitioner,
which propagates them and fuses the collectives it needs — the
"How to Scale Your Model" recipe: pick a mesh, annotate the edges,
let the compiler place the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None, devices=None) -> Mesh:
    """A (dp, tp) mesh.  Defaults: tp=1, dp=all devices."""
    if devices is None:
        devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# Weight leaves sharded on their output feature dim under TP. The stacked
# layer-group arrays have a leading layer axis, so specs get a leading None.
_TP_OUT_KEYS = {"receptance", "key", "value", "gate", "w2", "a2", "g2", "v2"}
# Output projection contracts the TP-sharded feature dim -> shard on input.
_TP_IN_KEYS = {"output"}


def _leaf_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one stacked param leaf (leading layer axis)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    name = keys[-1] if keys else None
    ndim = getattr(leaf, "ndim", 0)
    # Megatron-style pairing in the FFN: key (C,F) splits the hidden on
    # "tp", value (F,C) contracts it (input-sharded, psum on the output).
    if "ffn" in keys and name == "value" and ndim >= 3:
        return P(*([None] * (ndim - 2) + ["tp", None]))
    if name in _TP_OUT_KEYS and ndim >= 3:
        return P(*([None] * (ndim - 1) + ["tp"]))
    if name in _TP_IN_KEYS and ndim >= 3:
        return P(*([None] * (ndim - 2) + ["tp", None]))
    return P()


def param_specs(params) -> dict:
    """Pytree of PartitionSpec for a stacked params pytree."""

    def group_specs(group):
        return {
            "layer_index": P(),
            "layers": jax.tree_util.tree_map_with_path(
                _leaf_spec, group["layers"]),
        }

    if "head" not in params:
        raise ValueError(
            "params have no 'head' (a prefab exported by a pre-r5 build "
            "baked the int8 'head_q' in place of it); re-export the "
            "prefab from the source checkpoint, or load with "
            "AI00_QUANT_HEAD=off from the original file, to serve on a "
            "mesh")
    specs = {
        "emb": P(),
        "groups": [group_specs(g) for g in params["groups"]],
        "ln_out_w": P(),
        "ln_out_b": P(),
        # Head sharded on vocab: each tp chip scores a vocab shard.
        "head": P(None, "tp"),
    }
    # Derived decode-layout caches ("_"-prefixed, e.g. the fused T=1
    # weight stacks) replicate: they serve the dp-sharded whole-network
    # kernels (engine._mesh_forward), which need full weights per chip.
    for k, v in params.items():
        if k.startswith("_"):
            specs[k] = jax.tree.map(lambda _: P(), v)
    return specs


def state_specs(state) -> dict:
    """State pool: batch axis (axis 1, after the layer axis) -> dp; the
    5-D WKV matrix state additionally shards its head axis on tp."""
    def spec(x):
        if x.ndim == 5:  # (L, B, H, N, N)
            return P(None, "dp", "tp", None, None)
        return P(*([None, "dp"] + [None] * (x.ndim - 2)))

    return jax.tree.map(spec, state)


def sampler_state_specs(ss) -> dict:
    return jax.tree.map(
        lambda x: P(*(["dp"] + [None] * (x.ndim - 1))), ss)


def data_specs():
    """(tokens, lengths, sample_mask) specs."""
    return P("dp", None), P("dp"), P("dp")


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: hasattr(x, "ndim"))


def shard_state(state, mesh: Mesh):
    specs = state_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def shard_sampler_state(ss, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(["dp"] + [None] * (x.ndim - 1))))),
        ss)
