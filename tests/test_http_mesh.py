"""Multi-chip serving e2e: the full HTTP stack on an (dp=4, tp=2) mesh.

Runs on the 8-device virtual CPU mesh (conftest.py).  Validates SURVEY
§2.9's TPU-native mapping end to end: `[model] mesh = [dp, tp]` in the
TOML reaches Middleware.reload, the Engine shards params/state/sampler
pools over the mesh, and generation + row ops (load/read/set_row_*) +
the prefix cache behave identically to single-chip serving.
"""

import asyncio
import json

import numpy as np
import pytest

from aiohttp.test_utils import TestClient, TestServer

from ai00_server_tpu import loader
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.testing import make_tiny_model
from ai00_server_tpu.server.app import Server
from ai00_server_tpu.server.config import Config

from test_loader import to_converted_layout


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    root = tmp_path_factory.mktemp("mesh_site")
    models = root / "assets" / "models"
    tok_dir = root / "assets" / "tokenizer"
    cfg_dir = root / "assets" / "configs"
    for d in (models, tok_dir, cfg_dir):
        d.mkdir(parents=True)

    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=21,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))

    (cfg_dir / "Config.toml").write_text(f"""
[model]
name = "tiny.st"
path = "{models}"
max_batch = 4
token_chunk_size = 16
precision = "Fp32"
mesh = [4, 2]

[tokenizer]
path = "{tok_dir / 'vocab.json'}"

[listen]
port = 0
""")
    return root


async def make_client(site, mesh=True):
    config = Config.from_toml(str(site / "assets/configs/Config.toml"))
    req = config.to_reload_request(sandbox=False)
    if not mesh:
        req.mesh = None
    server = Server(config)
    await server.middleware.reload(req)
    client = TestClient(TestServer(server.app))
    await client.start_server()
    return client, server


def run(coro):
    return asyncio.run(coro)


async def _greedy_completion(client, prompt, n=6):
    r = await client.post("/api/oai/completions", json={
        "prompt": prompt, "max_tokens": n,
        "sampler": {"type": "Nucleus", "top_k": 1},
    })
    assert r.status == 200
    return (await r.json())["choices"][0]["text"]


def test_mesh_reported_and_generation_matches_single_chip(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.get("/api/models/info")
            info = await r.json()
            assert info["mesh"] == {"dp": 4, "tp": 2, "devices": 8}
            assert info["reload"]["mesh"] == [4, 2]
            sharded = await _greedy_completion(client, "ABCAB")
        finally:
            await client.close()
            await server.middleware.unload()

        client, server = await make_client(site, mesh=False)
        try:
            r = await client.get("/api/models/info")
            assert (await r.json())["mesh"] is None
            single = await _greedy_completion(client, "ABCAB")
        finally:
            await client.close()
            await server.middleware.unload()
        return sharded, single

    sharded, single = run(main())
    assert sharded == single


def test_mesh_concurrent_and_prefix_cache(site):
    """Concurrent requests land in different dp shards of the slot pool;
    the prefix cache round-trips states through sharded row reads/writes."""
    prompt = "ABCABCABCABCABCABCABCABCABCABCABCABC"  # 36 tokens >= 32

    async def main():
        client, server = await make_client(site)
        try:
            texts = await asyncio.gather(*[
                _greedy_completion(client, p, n=4)
                for p in ("ABCAB", "BCABC", "CABCA", "ABCAB")
            ])
            assert texts[0] == texts[3]  # same prompt, greedy

            t1 = await _greedy_completion(client, prompt, n=4)
            cache = server.middleware.env.runtime.cache_for("default")
            assert cache.count >= 1  # prompt state cached (sharded read)
            t2 = await _greedy_completion(client, prompt, n=4)
            assert t1 == t2  # exact-hit fast path equals cold run

            # State extraction reads a sharded row.
            r = await client.post("/api/oai/states", json={"input": "AB"})
            assert r.status == 200
            data = (await r.json())["data"][0]["data"]
            assert len(data) > 0
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_mesh_validation_errors(site):
    async def main():
        config = Config.from_toml(str(site / "assets/configs/Config.toml"))
        req = config.to_reload_request(sandbox=False)
        server = Server(config)
        req.mesh = [16, 1]  # more than 8 devices
        with pytest.raises(ValueError, match="devices"):
            await server.middleware.reload(req)
        req.mesh = [3, 1]   # dp does not divide max_batch=4
        with pytest.raises(ValueError, match="divisible"):
            await server.middleware.reload(req)

    run(main())
