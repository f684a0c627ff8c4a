"""Retrieval ops: exact vs IVF recall, store, HTTP API, RAG chat."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu.ops import retrieval as R
from ai00_server_tpu.retrieval_store import RetrievalStore


def make_data(n=2000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_exact_search_correct():
    x = make_data(500, 32)
    q = x[:7] + 0.01  # queries near known vectors
    scores, ids = R.exact_search(jnp.asarray(x), jnp.asarray(q), k=5)
    want = np.argmax(x @ q.T, axis=0)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], want)
    # top-1 should be the perturbed source vector itself
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(7))


def make_clustered(n=2000, d=64, n_clusters=32, seed=0, spread=0.15):
    """Mixture-of-gaussians data — the regime IVF is designed for."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + spread * rng.standard_normal((n, d)).astype(
        np.float32)
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


def test_ivf_recall():
    x = make_clustered(2000, 64)
    idx = R.build_ivf(x, nlist=32, iters=8)
    q = make_clustered(50, 64, seed=9)
    s_exact, ids_exact = R.exact_search(jnp.asarray(x), jnp.asarray(q), k=10)
    s_ivf, ids_ivf = R.ivf_search(
        idx.centroids, idx.packed, idx.packed_ids, jnp.asarray(q),
        k=10, nprobe=8)
    ids_exact = np.asarray(ids_exact)
    ids_ivf = np.asarray(ids_ivf)
    recall = np.mean([
        len(set(ids_exact[i]) & set(ids_ivf[i])) / 10
        for i in range(len(q))])
    assert recall >= 0.8, f"recall@10 = {recall}"
    # Full probe = exact.
    _, ids_full = R.ivf_search(
        idx.centroids, idx.packed, idx.packed_ids, jnp.asarray(q),
        k=10, nprobe=32)
    # bf16 scoring ties at the k boundary keep this just below 1.0.
    assert np.mean([
        len(set(ids_exact[i]) & set(np.asarray(ids_full)[i])) / 10
        for i in range(len(q))]) >= 0.95


def test_ivf_pallas_matches_xla_interpret():
    """The TPU probe path is the Pallas scalar-prefetch kernel
    (retrieval._ivf_search_pallas); CPU tests never take that dispatch
    branch, so pin its parity against the XLA scan here via interpret
    mode, at a tile-aligned (cap % 128 == 0) int8 layout like the one
    bench_ivf builds."""
    rng = np.random.default_rng(3)
    N, D, nlist = 8192, 128, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = R.build_ivf(data, nlist=nlist, iters=5, quant="int8")
    cap = -(-idx.cap // 128) * 128
    packed = jnp.zeros((nlist, cap, D), jnp.int8).at[:, :idx.cap].set(
        idx.packed)
    pids = jnp.full((nlist, cap), -1, jnp.int32).at[:, :idx.cap].set(
        idx.packed_ids)
    ps = jnp.zeros((nlist, cap), jnp.float32).at[:, :idx.cap].set(idx.pscale)
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    s1, i1 = R._ivf_search_xla(idx.centroids, packed, pids, q,
                               k=10, nprobe=4, pscale=ps)
    s2, i2 = R._ivf_search_pallas(idx.centroids, packed, pids, q,
                                  k=10, nprobe=4, pscale=ps, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)


def test_store_roundtrip():
    store = RetrievalStore()
    store.create("docs", 16)
    x = make_data(100, 16)
    texts = [f"doc{i}" for i in range(100)]
    assert store.add("docs", x, texts) == 100
    scores, ids, hit_texts = store.search("docs", x[:3], top_k=1)
    assert [t[0] for t in hit_texts] == ["doc0", "doc1", "doc2"]
    store.build_ivf("docs", nlist=8)
    scores, ids, hit_texts = store.search("docs", x[:3], top_k=1, nprobe=8)
    assert [t[0] for t in hit_texts] == ["doc0", "doc1", "doc2"]
    assert store.list()[0]["ivf"] is True
    store.drop("docs")
    assert store.list() == []


def test_retrieval_http_and_rag(tmp_path_factory):
    from aiohttp.test_utils import TestClient, TestServer

    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_http import site as _site_fixture  # reuse builder logic
    from ai00_server_tpu.server.app import Server
    from ai00_server_tpu.server.config import Config
    import json
    from ai00_server_tpu import loader
    from ai00_server_tpu.models import ModelVersion
    from ai00_server_tpu.testing import make_tiny_model
    from test_loader import to_converted_layout

    root = tmp_path_factory.mktemp("ragsite")
    models = root / "assets" / "models"
    tok_dir = root / "assets" / "tokenizer"
    models.mkdir(parents=True)
    tok_dir.mkdir(parents=True)
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=40,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))

    async def main():
        config = Config.from_dict({
            "model": {"name": "tiny.st", "path": str(models),
                      "max_batch": 4, "token_chunk_size": 8},
            "tokenizer": {"path": str(tok_dir / "vocab.json")},
        })
        server = Server(config)
        await server.middleware.reload(
            config.to_reload_request(sandbox=False))
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/api/retrieval/index", json={
                "name": "kb", "texts": ["ABBA", "BAAB", "CAB"]})
            assert r.status == 200, await r.text()
            assert (await r.json())["size"] == 3

            r = await client.post("/api/retrieval/add", json={
                "name": "kb", "texts": ["DAD"]})
            assert (await r.json())["size"] == 4

            r = await client.post("/api/retrieval/search", json={
                "name": "kb", "query": "ABBA", "top_k": 2})
            body = await r.json()
            hits = body["data"][0]["hits"]
            assert len(hits) == 2
            assert hits[0]["text"] == "ABBA"  # self-match ranks first

            r = await client.get("/api/retrieval/list")
            assert (await r.json())[0]["name"] == "kb"

            # RAG chat: retrieved docs injected into the prompt.
            r = await client.post("/api/oai/chat/completions", json={
                "messages": [{"role": "user", "content": "ABBA"}],
                "retrieval": {"index": "kb", "top_k": 2},
                "max_tokens": 3,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert body["choices"][0]["message"]["content"] is not None
        finally:
            await client.close()
            await server.middleware.unload()

    asyncio.run(main())


def test_int8_ivf_matches_bf16_recall():
    """int8-coded IVF (the 10M-scale storage mode) retrieves like the
    bf16 IVF: both find the true nearest neighbor (self-recall on
    perturbed queries) at >= 90%."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = x[:32] + 0.01 * rng.standard_normal((32, 64)).astype(np.float32)

    bf = R.build_ivf(x, nlist=16, iters=8)
    q8 = R.build_ivf(x, nlist=16, iters=8, quant="int8")
    assert q8.packed.dtype == jnp.int8 and q8.pscale is not None
    want = np.arange(32)
    for ivf, ps in ((bf, None), (q8, q8.pscale)):
        _, ids = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                              jnp.asarray(q), k=5, nprobe=4, pscale=ps)
        recall1 = np.mean(np.asarray(ids)[:, 0] == want)
        assert recall1 >= 0.9, recall1


def test_streamed_builder_matches_host_build():
    """StreamedIVFBuilder (the device-side 10M-scale path) packs the
    same clusters/codes as the host build_ivf given the same centroids,
    and the streamed ground truth matches chunked-exact."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1024, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = x[:16] + 0.01 * rng.standard_normal((16, 64)).astype(np.float32)

    cent = R.kmeans_blocked(jax.random.PRNGKey(0),
                            jnp.asarray(x), nlist=8, iters=6, blk=256)
    builder = R.StreamedIVFBuilder(cent, cap=512, dim=64)
    best_s = jnp.full((16, 10), -np.inf, jnp.float32)
    best_i = jnp.full((16, 10), -1, jnp.int32)
    for i in range(0, 1024, 256):
        xc = jnp.asarray(x[i:i + 256])
        builder.add(xc, i)
        best_s, best_i = R.topk_merge_chunk(
            best_s, best_i, xc, jnp.int32(i), jnp.asarray(q), k=10)
    ivf = builder.finish()
    assert int(builder.dropped) == 0

    # Every vector is packed exactly once, ids form a permutation.
    ids = np.asarray(ivf.packed_ids)
    got = np.sort(ids[ids >= 0])
    np.testing.assert_array_equal(got, np.arange(1024))

    # Streamed GT == chunked-exact GT (sets, bf16 ties may reorder).
    _, gt = R.exact_search_chunked(x, q, k=10, chunk=300)
    bi = np.asarray(best_i)
    for r in range(16):
        assert len(set(bi[r]) & set(gt[r])) >= 9

    # Search through the streamed index finds the perturbed sources.
    _, hits = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                           jnp.asarray(q), k=5, nprobe=4,
                           pscale=ivf.pscale)
    recall1 = np.mean(np.asarray(hits)[:, 0] == np.arange(16))
    assert recall1 >= 0.9, recall1


def test_streamed_builder_spills_instead_of_dropping():
    """When a cluster overflows its fixed cap, rows spill to the
    next-nearest centroid with space instead of being dropped (dropped
    vectors are unfindable forever; spilled ones are found whenever the
    spill cluster is probed)."""
    rng = np.random.default_rng(5)
    # All 256 rows near ONE mode -> one cluster wants everything.
    mode = rng.standard_normal(64).astype(np.float32)
    x = mode + 0.05 * rng.standard_normal((256, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    cent = R.kmeans_blocked(jax.random.PRNGKey(1),
                            jnp.asarray(x), nlist=8, iters=4, blk=256)
    builder = R.StreamedIVFBuilder(cent, cap=64, dim=64, spill=8)
    for i in range(0, 256, 128):
        builder.add(jnp.asarray(x[i:i + 128]), i)
    ivf = builder.finish()
    # 8 clusters x cap 64 = 512 slots >= 256 rows: zero drops required.
    assert int(builder.dropped) == 0
    ids = np.asarray(ivf.packed_ids)
    np.testing.assert_array_equal(np.sort(ids[ids >= 0]), np.arange(256))
    # Full-probe search still finds every vector (spilled rows score
    # identically; they just live in a different list).
    q = x[:16]
    _, hits = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                           jnp.asarray(q), k=5, nprobe=8,
                           pscale=ivf.pscale)
    hits = np.asarray(hits)
    # Top-5 membership (not strict top-1): this corpus is one tight mode
    # (sibling cosine ~0.999), where int8 coding error can reorder ranks.
    assert all(r in hits[r] for r in range(16))


def test_exact_search_chunked_matches_whole():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = x[:8] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
    s_all, i_all = R.exact_search(jnp.asarray(x, jnp.bfloat16),
                                  jnp.asarray(q, jnp.bfloat16), k=10)
    s_chk, i_chk = R.exact_search_chunked(x, q, k=10, chunk=1234)
    # bf16 score ties can reorder; compare the ID SETS per row.
    for r in range(8):
        assert len(set(np.asarray(i_all)[r]) & set(i_chk[r])) >= 9


def test_kmeans_balance_equalizes_populations():
    """Capacity-penalized Lloyd (balance=True) must pull the max
    cluster population toward the mean IN ITS OWN biased geometry, and
    a builder+search pair using the same cbias must keep retrieval
    working (the bias moves assignment borders; probe selection must
    move with them)."""
    rng = np.random.default_rng(11)
    n_modes, per, D, nlist = 256, 16, 64, 32
    modes = rng.standard_normal((n_modes, D)).astype(np.float32)
    modes /= np.linalg.norm(modes, axis=-1, keepdims=True)
    cid = rng.integers(0, n_modes, n_modes * per)
    x = modes[cid] + (0.35 / np.sqrt(D)) * rng.standard_normal(
        (n_modes * per, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    x = jnp.asarray(x)
    N = x.shape[0]

    def max_pop(cent, bias):
        c2 = jnp.sum(cent * cent, -1) + (0 if bias is None else bias)
        d2 = c2[None, :] - 2.0 * x @ cent.T
        return int(jnp.bincount(jnp.argmin(d2, -1), length=nlist).max())

    plain = max_pop(R.kmeans_blocked(jax.random.PRNGKey(2), x,
                                     nlist=nlist, iters=8, blk=N), None)
    cent, bias = R.kmeans_blocked(jax.random.PRNGKey(2), x, nlist=nlist,
                                  iters=16, blk=N, balance=True)
    balanced = max_pop(cent, bias)
    mean = N / nlist
    assert balanced < plain, (plain, balanced)
    assert balanced <= 1.3 * mean, (plain, balanced, mean)

    # End-to-end with the bias threaded through builder + search.
    builder = R.StreamedIVFBuilder(cent, cap=int(mean * 1.3) + 1, dim=D,
                                   spill=4, cbias=bias)
    for i in range(0, N, N // 4):
        builder.add(x[i:i + N // 4], i)
    assert int(builder.dropped) == 0
    ivf = builder.finish()
    q = x[:32]
    _, hits = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids, q,
                           k=5, nprobe=4, pscale=ivf.pscale,
                           cbias=ivf.cbias)
    hits = np.asarray(hits)
    found = sum(r in hits[r] for r in range(32))
    assert found >= 30, found
