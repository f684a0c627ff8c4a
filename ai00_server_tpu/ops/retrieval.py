"""Vector retrieval on TPU: exact MIPS and IVF top-k over an HBM index.

Beyond the reference (its ONNX fastembed sidecar only embeds — C17 in
SURVEY.md §2); this provides the BASELINE.md north-star retrieval engine:

* Exact search: one ``(Q, D) @ (D, N)`` MXU matmul + ``lax.top_k`` —
  HBM-bandwidth bound at ~2 bytes/vector-dim per query batch.
* IVF: on-device k-means (Lloyd) builds ``nlist`` centroids; vectors are
  stored cluster-contiguous and padded to a fixed per-cluster capacity so
  probing is a static-shape gather: query -> top-``nprobe`` centroids ->
  gather ``(nprobe, cap, D)`` -> score -> top-k.  Everything under jit.

Scores are inner products; normalize vectors for cosine.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def exact_search(index, queries, k=10):
    """index: (N, D); queries: (Q, D).  Returns (scores, ids) (Q, k)."""
    scores = jnp.dot(queries, index.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def kmeans(key, data, nlist, iters=10):
    """Lloyd k-means on device.  data: (N, D) -> centroids (nlist, D)."""
    N, D = data.shape
    data = data.astype(jnp.float32)
    idx = jax.random.choice(key, N, (nlist,), replace=False)
    cent = data[idx]

    def step(cent, _):
        # Assign by max inner product of normalized distance: use L2.
        d2 = (jnp.sum(data * data, -1, keepdims=True)
              - 2.0 * data @ cent.T
              + jnp.sum(cent * cent, -1)[None, :])
        assign = jnp.argmin(d2, -1)
        one_hot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
        sums = one_hot.T @ data
        counts = one_hot.sum(0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@dataclass
class IVFIndex:
    centroids: jax.Array        # (nlist, D) f32
    packed: jax.Array           # (nlist, cap, D) cluster-contiguous, padded
    packed_ids: jax.Array       # (nlist, cap) int32 original ids (-1 = pad)
    nlist: int
    cap: int


def build_ivf(data: np.ndarray, nlist: int = 64, iters: int = 10,
              seed: int = 0, dtype=jnp.bfloat16) -> IVFIndex:
    """Cluster and pack an (N, D) matrix for static-shape probing."""
    N, D = data.shape
    cent = kmeans(jax.random.PRNGKey(seed), jnp.asarray(data, jnp.float32),
                  nlist, iters)
    cent_np = np.asarray(cent)
    d2 = (np.sum(data.astype(np.float32) ** 2, -1, keepdims=True)
          - 2.0 * data.astype(np.float32) @ cent_np.T
          + np.sum(cent_np ** 2, -1)[None, :])
    assign = np.argmin(d2, -1)
    counts = np.bincount(assign, minlength=nlist)
    cap = int(max(1, counts.max()))
    packed = np.zeros((nlist, cap, D), np.float32)
    packed_ids = np.full((nlist, cap), -1, np.int32)
    fill = np.zeros(nlist, np.int64)
    for i, c in enumerate(assign):
        packed[c, fill[c]] = data[i]
        packed_ids[c, fill[c]] = i
        fill[c] += 1
    return IVFIndex(
        centroids=cent,
        packed=jnp.asarray(packed, dtype),
        packed_ids=jnp.asarray(packed_ids),
        nlist=nlist,
        cap=cap,
    )


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(centroids, packed, packed_ids, queries, k=10, nprobe=8):
    """queries: (Q, D).  Returns (scores, ids) (Q, k); ids -1 = no hit."""
    q = queries.astype(jnp.float32)
    cscore = q @ centroids.T                       # (Q, nlist)
    _, probe = jax.lax.top_k(cscore, nprobe)       # (Q, nprobe)

    cand = packed[probe]                           # (Q, nprobe, cap, D)
    cand_ids = packed_ids[probe]                   # (Q, nprobe, cap)
    scores = jnp.einsum("qd,qpcd->qpc", q, cand.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = jnp.where(cand_ids >= 0, scores, -jnp.inf)
    Q = q.shape[0]
    flat = scores.reshape(Q, -1)
    flat_ids = cand_ids.reshape(Q, -1)
    top, pos = jax.lax.top_k(flat, k)
    ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    return top, ids
