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


@functools.partial(jax.jit,
                   static_argnames=("nlist", "iters", "blk", "balance",
                                    "balance_eta"))
def kmeans_blocked(key, data, nlist, iters=8, blk=65536, balance=False,
                   balance_eta=0.2):
    """Memory-lean Lloyd k-means: assignment + accumulation stream over
    ``blk``-row blocks under one jit, so the (N, nlist) distance matrix
    never materializes beyond one block (~1 GB at blk=64Ki, nlist=4096).
    One-hot accumulation rides the MXU: ``one_hot.T @ block``.
    N must be a multiple of blk.

    ``balance=True`` returns ``(centroids, bias)``: after plain Lloyd
    converges the centroids, a second phase fits a per-cluster additive
    bias on the FROZEN centroids (a power diagram): assignment
    minimizes ``d2(x, c) + bias[c]``, and ``iters`` decaying-gain
    integral steps (``bias += eta/sqrt(t+1) * scale * (count/mean -
    1)``, scale = mean assignment distance so penalties are
    commensurate with the geometry) equalize populations.  Fitting bias
    jointly WITH the centroid updates was measured to oscillate (the
    two dynamics fight); frozen-centroid fitting converges.
    Populations equalize in the geometry the bias defines, so
    downstream users (StreamedIVFBuilder placement, ivf_search probe
    selection) must apply the same bias.  Why not plain Lloyd: a fixed
    per-list cap must hold the LARGEST cluster, but HBM only affords
    ~1.2x the mean — the r5 10M probe measured 9.7% of vectors dropped,
    with spill candidates 2-8 also saturated (dense regions overflow
    collectively; only moving the assignment borders fixes that).
    Re-seeding tricks (split heaviest into lightest) measured no better
    than plain Lloyd: there are no near-empty clusters to give up.
    """
    N, D = data.shape
    assert N % blk == 0, (N, blk)
    idx = jax.random.choice(key, N, (nlist,), replace=False)
    cent0 = data[idx].astype(jnp.float32)
    blocks = data.reshape(N // blk, blk, D)

    def sweep(cent, bias):
        """One streamed assignment pass: cluster sums/counts + mean d2."""
        c2 = jnp.sum(cent * cent, -1) + bias

        def blk_step(carry2, xb):
            sums, counts, dsum = carry2
            xf = xb.astype(jnp.float32)
            d2 = c2[None, :] - 2.0 * (xf @ cent.T)
            a = jnp.argmin(d2, -1)
            oh = jax.nn.one_hot(a, cent.shape[0], dtype=jnp.bfloat16)
            sums = sums + jnp.dot(oh.T, xf.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            counts = counts + oh.sum(0).astype(jnp.float32)
            dsum = dsum + (jnp.min(d2, -1).sum()
                           + jnp.sum(xf * xf) - bias[a].sum())
            return (sums, counts, dsum), None

        (sums, counts, dsum), _ = jax.lax.scan(
            blk_step,
            (jnp.zeros((cent.shape[0], D), jnp.float32),
             jnp.zeros(cent.shape[0], jnp.float32),
             jnp.zeros((), jnp.float32)),
            blocks)
        return sums, counts, dsum

    zero_bias = jnp.zeros(nlist, jnp.float32)

    def lloyd_iter(cent, _):
        sums, counts, _ = sweep(cent, zero_bias)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), cent)
        return new, None

    cent, _ = jax.lax.scan(lloyd_iter, cent0, None, length=iters)
    if not balance:
        return cent

    def bias_iter(bias, t):
        _, counts, dsum = sweep(cent, bias)
        scale = jnp.maximum(dsum / N, 1e-12)      # mean true min-d2
        eta = balance_eta * jax.lax.rsqrt(1.0 + t.astype(jnp.float32))
        bias = bias + eta * scale * (counts / (N / nlist) - 1.0)
        return bias - bias.mean(), None           # argmin-invariant

    bias, _ = jax.lax.scan(bias_iter, zero_bias, jnp.arange(iters))
    return cent, bias


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
    pscale: jax.Array | None = None  # (nlist, cap) f32 per-vector scales
    #                                  when ``packed`` stores int8 codes
    cbias: jax.Array | None = None   # (nlist,) f32 capacity-penalty bias
    #                                  (balanced kmeans); vectors were
    #                                  PLACED by argmin(d2 + cbias), so
    #                                  probe selection must rank by the
    #                                  same biased score


def _assign_chunked(data: np.ndarray, cent_np: np.ndarray,
                    chunk: int = 1 << 20) -> np.ndarray:
    """argmin-L2 cluster assignment, chunked through the device (a 10M x
    1024 f32 distance matrix never materializes anywhere)."""
    N = data.shape[0]
    cent = jnp.asarray(cent_np, jnp.float32)
    c2 = jnp.sum(cent * cent, -1)

    @jax.jit
    def assign_fn(x):
        x = x.astype(jnp.float32)
        d2 = -2.0 * x @ cent.T + c2[None, :]
        return jnp.argmin(d2, -1).astype(jnp.int32)

    out = np.empty(N, np.int32)
    for i in range(0, N, chunk):
        out[i:i + chunk] = np.asarray(assign_fn(
            jnp.asarray(data[i:i + chunk])))
    return out


def build_ivf(data: np.ndarray, nlist: int = 64, iters: int = 10,
              seed: int = 0, dtype=jnp.bfloat16, quant: str | None = None,
              train_sample: int = 1 << 20) -> IVFIndex:
    """Cluster and pack an (N, D) matrix for static-shape probing.

    Scales to 10M x 1024 on one chip: k-means trains on a subsample,
    assignment streams in chunks, packing is vectorized, and
    ``quant='int8'`` stores per-vector-scaled int8 codes (the 10M x 1024
    index is ~10.5 GB on device instead of 20.5 GB bf16)."""
    N, D = data.shape
    train = data
    if N > train_sample:
        rs = np.random.default_rng(seed)
        train = data[rs.choice(N, train_sample, replace=False)]
    cent = kmeans(jax.random.PRNGKey(seed), jnp.asarray(train, jnp.float32),
                  nlist, iters)
    cent_np = np.asarray(cent)
    assign = _assign_chunked(data, cent_np)
    counts = np.bincount(assign, minlength=nlist)
    cap = int(max(1, counts.max()))
    # Vectorized packing: stable sort by cluster, then position-in-cluster.
    order = np.argsort(assign, kind="stable")
    pos = np.arange(N, dtype=np.int64) - np.repeat(
        np.cumsum(np.concatenate([[0], counts[:-1]])), counts)
    cl = assign[order]
    packed_ids = np.full((nlist, cap), -1, np.int32)
    packed_ids[cl, pos] = order.astype(np.int32)
    if quant == "int8":
        scale = np.maximum(
            np.abs(data).max(axis=-1, keepdims=True), 1e-12) / 127.0
        codes = np.clip(np.round(data / scale), -127, 127).astype(np.int8)
        packed = np.zeros((nlist, cap, D), np.int8)
        packed[cl, pos] = codes[order]
        pscale = np.zeros((nlist, cap), np.float32)
        pscale[cl, pos] = scale[order, 0]
        return IVFIndex(centroids=cent, packed=jnp.asarray(packed),
                        packed_ids=jnp.asarray(packed_ids),
                        nlist=nlist, cap=cap,
                        pscale=jnp.asarray(pscale))
    packed = np.zeros((nlist, cap, D), np.float32)
    packed[cl, pos] = data[order]
    return IVFIndex(
        centroids=cent,
        packed=jnp.asarray(packed, dtype),
        packed_ids=jnp.asarray(packed_ids),
        nlist=nlist,
        cap=cap,
    )


def _ivf_probe(centroids, queries, nprobe, cbias=None):
    q = queries.astype(jnp.float32)
    cscore = q @ centroids.T                       # (Q, nlist)
    if cbias is not None:
        # Balanced index: vectors were placed by argmin(|x-c|^2 + bias),
        # i.e. argmax(x.c - (|c|^2 + bias)/2).  Rank probes by the same
        # biased score or queries probe the wrong side of moved borders.
        cscore = cscore - 0.5 * (
            jnp.sum(centroids * centroids, -1) + cbias)[None, :]
    _, probe = jax.lax.top_k(cscore, nprobe)       # (Q, nprobe)
    return q, probe


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_xla(centroids, packed, packed_ids, queries, k=10, nprobe=8,
                    pscale=None, cbias=None):
    """Portable IVF probe: scan over probe ranks, candidates fetched as a
    ROW gather from the (nlist*cap, D)-flattened index.

    The round-4 version gathered (1, cap, D)-sized slices from the 3-D
    index inside the scan; XLA's TPU lowering of that materialized a full
    11 GB ``copy(packed)`` plus seven 1 GB window temps and OOM'd at the
    10M north star (BENCH_r04.json).  Flat row gathers (slice = one
    D-row, the embedding-lookup pattern) compile to 1.6 GB of temps —
    but execute latency-bound on TPU (~1.1k QPS); the Pallas kernel
    below is the production TPU path, this is the CPU/odd-shape
    fallback."""
    q, probe = _ivf_probe(centroids, queries, nprobe, cbias)
    dt = jnp.bfloat16 if packed.dtype == jnp.int8 else jnp.float32
    qd = q.astype(dt)
    Q = q.shape[0]
    nlist, cap, D = packed.shape
    kk = min(k, cap)
    flat = packed.reshape(nlist * cap, D)          # bitcast, no copy
    col = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def body(carry, pcol):                         # pcol: (Q,) clusters
        best_s, best_i = carry
        rows = pcol[:, None] * cap + col           # (Q, cap)
        cand = jnp.take(flat, rows.reshape(-1),
                        axis=0).reshape(Q, cap, D)
        ids = packed_ids[pcol]                     # (Q, cap)
        s = jnp.einsum("qd,qcd->qc", qd, cand.astype(dt),
                       preferred_element_type=jnp.float32)
        if pscale is not None:
            s = s * pscale[pcol]
        s = jnp.where(ids >= 0, s, -jnp.inf)
        st, pos = jax.lax.top_k(s, kk)
        sids = jnp.take_along_axis(ids, pos, axis=1)
        cat_s = jnp.concatenate([best_s, st], axis=1)
        cat_i = jnp.concatenate([best_i, sids], axis=1)
        top, mpos = jax.lax.top_k(cat_s, k)
        return (top, jnp.take_along_axis(cat_i, mpos, axis=1)), None

    init = (jnp.full((Q, k), -jnp.inf, jnp.float32),
            jnp.full((Q, k), -1, jnp.int32))
    (scores, ids), _ = jax.lax.scan(body, init, probe.T)
    return scores, ids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "interpret"))
def _ivf_search_pallas(centroids, packed, packed_ids, queries, k=10,
                       nprobe=8, pscale=None, cbias=None,
                       interpret=False):
    """TPU IVF probe as a Pallas scalar-prefetch kernel.

    Grid = (Q, nprobe); the prefetched probe table steers each step's
    BlockSpec at the cluster picked for (query, rank), so the only data
    movement is ``Q*nprobe`` contiguous (cap, D) cluster blocks DMA'd
    HBM->VMEM (double-buffered by the pipeline) and scored on the MXU —
    the gather never exists as an HLO op, which is what made the XLA
    lowering blow up (11 GB copy + 1 GB window temps, BENCH_r04).
    Scores land in a dense (Q, nprobe, cap) table; top-k runs in XLA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, probe = _ivf_probe(centroids, queries, nprobe, cbias)
    Q, D = q.shape
    nlist, cap, _ = packed.shape
    if pscale is None:
        pscale = jnp.ones((nlist, cap), jnp.float32)
    # Mosaic requires each of the last two block dims to be divisible by
    # (8, 128) OR equal to the array dim; a unit middle axis makes every
    # per-(query, probe) row block exactly array-sized in the sublane dim.
    qd = q.astype(jnp.bfloat16).reshape(Q, 1, D)
    ids3 = packed_ids.reshape(nlist, 1, cap)
    ps3 = pscale.reshape(nlist, 1, cap)

    def kernel(probe_ref, q_ref, blk_ref, ids_ref, ps_ref, s_out, i_out):
        qv = q_ref[0]                              # (1, D) bf16
        blk = blk_ref[0]                           # (cap, D)
        s = jax.lax.dot_general(
            qv, blk.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (1, cap)
        ids = ids_ref[0]                           # (1, cap)
        s = s * ps_ref[0]
        s = jnp.where(ids >= 0, s, jnp.float32(-jnp.inf))
        s_out[0, 0] = s
        i_out[0, 0] = ids

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda qi, r, pr: (qi, 0, 0)),
            pl.BlockSpec((1, cap, D), lambda qi, r, pr: (pr[qi, r], 0, 0)),
            pl.BlockSpec((1, 1, cap), lambda qi, r, pr: (pr[qi, r], 0, 0)),
            pl.BlockSpec((1, 1, cap), lambda qi, r, pr: (pr[qi, r], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, cap), lambda qi, r, pr: (qi, r, 0, 0)),
            pl.BlockSpec((1, 1, 1, cap), lambda qi, r, pr: (qi, r, 0, 0)),
        ],
    )
    scores, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Q, nprobe, 1, cap), jnp.float32),
                   jax.ShapeDtypeStruct((Q, nprobe, 1, cap), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(probe.astype(jnp.int32), qd, packed, ids3, ps3)
    top, pos = jax.lax.top_k(scores.reshape(Q, nprobe * cap), k)
    out_i = jnp.take_along_axis(ids.reshape(Q, nprobe * cap), pos, axis=1)
    return top, jnp.where(jnp.isfinite(top), out_i, -1)


def ivf_search(centroids, packed, packed_ids, queries, k=10, nprobe=8,
               pscale=None, cbias=None):
    """queries: (Q, D).  Returns (scores, ids) (Q, k); ids -1 = no hit.
    ``pscale`` dequantizes int8-coded clusters on the score accumulator
    (one multiply per candidate, not per element).

    Dispatch: the Pallas scalar-prefetch kernel on TPU when the packed
    layout is tile-aligned (cap % 128 == 0 for int8 blocks and the id
    lane dim, D % 128 == 0); the XLA row-gather scan otherwise (CPU
    tests, toy shapes)."""
    nlist, cap, D = packed.shape
    if (jax.default_backend() == "tpu" and cap % 128 == 0
            and D % 128 == 0):
        return _ivf_search_pallas(centroids, packed, packed_ids, queries,
                                  k=k, nprobe=nprobe, pscale=pscale,
                                  cbias=cbias)
    return _ivf_search_xla(centroids, packed, packed_ids, queries,
                           k=k, nprobe=nprobe, pscale=pscale, cbias=cbias)


class StreamedIVFBuilder:
    """Builds an int8 IVFIndex entirely on device from data arriving in
    fixed-size chunks — nothing N-sized ever touches the host.  Feed
    chunks with :meth:`add`; every state update runs under one donated
    jit so ``packed`` (the ~12 GB index at the 10M north star) is
    updated in place.

    ``cap`` is fixed up front (static shapes); a row landing in a full
    cluster SPILLS to its next-nearest centroid with space (``spill``
    candidate clusters per row, default 3) — clustered data overflows
    fixed caps on exactly the dense clusters that hold everyone's
    neighbors, and a dropped vector is unfindable forever, while a
    spilled one is found whenever its spill cluster is probed.  Rows
    exhausting every candidate are dropped and counted (``dropped``)."""

    def __init__(self, centroids, cap: int, dim: int, spill: int = 3,
                 cbias=None):
        self.centroids = centroids.astype(jnp.float32)
        nlist = centroids.shape[0]
        self.nlist, self.cap, self.dim = nlist, cap, dim
        self.spill = max(1, min(spill, nlist))
        self.cbias = None if cbias is None else jnp.asarray(
            cbias, jnp.float32)
        self.packed = jnp.zeros((nlist, cap, dim), jnp.int8)
        self.packed_ids = jnp.full((nlist, cap), -1, jnp.int32)
        self.pscale = jnp.zeros((nlist, cap), jnp.float32)
        self.fill = jnp.zeros(nlist, jnp.int32)
        self.dropped = jnp.zeros((), jnp.int32)
        # Placement metric: d2 + cbias (the balanced-kmeans power
        # diagram) — fold the bias into the |c|^2 term once.
        self._c2 = jnp.sum(self.centroids * self.centroids, -1)
        if self.cbias is not None:
            self._c2 = self._c2 + self.cbias
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1, 2, 3, 4))

    def _step_impl(self, packed, pids, pscale, fill, dropped, x, base):
        cap, nlist = self.cap, self.nlist
        xf = x.astype(jnp.float32)
        d2 = self._c2[None, :] - 2.0 * (xf @ self.centroids.T)
        _, cand = jax.lax.top_k(-d2, self.spill)   # (n, spill) nearest
        cand = cand.astype(jnp.int32)
        n = cand.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        scale = jnp.maximum(jnp.abs(xf).max(-1), 1e-12) / 127.0
        codes = jnp.clip(jnp.round(xf / scale[:, None]),
                         -127, 127).astype(jnp.int8)
        placed = jnp.zeros(n, bool)
        for p in range(self.spill):
            # Cluster for this pass; already-placed rows get an OOB
            # sentinel so every scatter drops them (mode="drop").
            a = jnp.where(placed, nlist, cand[:, p])
            # Rank of each still-unplaced row within its cluster inside
            # this chunk: sort by cluster, then position-since-run-start
            # via a running max over run-start indices.
            order = jnp.argsort(a)
            sa = a[order]
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), sa[1:] != sa[:-1]])
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, idx, 0))
            rank = jnp.zeros_like(a).at[order].set(idx - run_start)
            pos = fill[jnp.minimum(a, nlist - 1)] + rank
            ok = (pos < cap) & ~placed
            pos_w = jnp.where(ok, pos, cap)    # cap = OOB -> mode="drop"
            packed = packed.at[a, pos_w].set(codes, mode="drop")
            pids = pids.at[a, pos_w].set(base + idx, mode="drop")
            pscale = pscale.at[a, pos_w].set(scale, mode="drop")
            fill = fill + jnp.zeros_like(fill).at[a].add(
                ok.astype(jnp.int32), mode="drop")
            placed = placed | ok
        dropped = dropped + (~placed).sum().astype(jnp.int32)
        return packed, pids, pscale, fill, dropped

    def add(self, x, base_id: int):
        """x: (chunk, D) device array; base_id: global id of row 0."""
        (self.packed, self.packed_ids, self.pscale, self.fill,
         self.dropped) = self._step(
            self.packed, self.packed_ids, self.pscale, self.fill,
            self.dropped, x, jnp.int32(base_id))

    def finish(self) -> IVFIndex:
        return IVFIndex(centroids=self.centroids, packed=self.packed,
                        packed_ids=self.packed_ids, nlist=self.nlist,
                        cap=self.cap, pscale=self.pscale,
                        cbias=self.cbias)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0, 1))
def topk_merge_chunk(best_s, best_i, x, base, queries, k=10):
    """Running exact top-k over streamed index chunks, all on device:
    merge (Q, k) running bests with this chunk's top-k.  Ground-truth
    companion to :class:`StreamedIVFBuilder` (host never sees N-sized
    data)."""
    s = jnp.dot(queries.astype(x.dtype), x.T,
                preferred_element_type=jnp.float32)
    kk = min(k, x.shape[0])
    st, pos = jax.lax.top_k(s, kk)
    ids = pos.astype(jnp.int32) + base
    cat_s = jnp.concatenate([best_s, st], axis=1)
    cat_i = jnp.concatenate([best_i, ids], axis=1)
    top, mpos = jax.lax.top_k(cat_s, k)
    return top, jnp.take_along_axis(cat_i, mpos, axis=1)


def exact_search_chunked(data: np.ndarray, queries, k=10,
                         chunk: int = 1 << 20):
    """Exact MIPS over a HOST-resident (N, D) matrix, streamed through
    the device in chunks and merged on host — ground truth (and a
    memory-capped exact path) for indices larger than HBM."""
    Q = queries.shape[0]
    qd = jnp.asarray(queries, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def score_chunk(x, kk):
        s = jnp.dot(qd, x.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, kk)

    best_s = np.full((Q, k), -np.inf, np.float32)
    best_i = np.full((Q, k), -1, np.int64)
    N = data.shape[0]
    for i in range(0, N, chunk):
        x = jnp.asarray(data[i:i + chunk], jnp.bfloat16)
        kk = min(k, x.shape[0])
        s, idx = score_chunk(x, kk)
        s = np.asarray(s)
        idx = np.asarray(idx, np.int64) + i
        cat_s = np.concatenate([best_s, s], axis=1)
        cat_i = np.concatenate([best_i, idx], axis=1)
        sel = np.argsort(-cat_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(cat_s, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    return best_s, best_i
