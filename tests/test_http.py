"""HTTP API integration tests: full stack from aiohttp routes down to the
TPU engine, using a tiny random model written as a converted .st file."""

import asyncio
import json
import os

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
    """Build an assets tree with a tiny model + char tokenizer."""
    root = tmp_path_factory.mktemp("site")
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

[tokenizer]
path = "{tok_dir / 'vocab.json'}"

[listen]
port = 0
force_pass = false
slot = "testsecret"

[[listen.app_keys]]
app_id = "admin"
secret_key = "testkey"
""")
    return root


async def make_client(site):
    config = Config.from_toml(str(site / "assets/configs/Config.toml"))
    server = Server(config)
    await server.middleware.reload(config.to_reload_request(sandbox=False))
    client = TestClient(TestServer(server.app))
    await client.start_server()
    return client, server


def run(coro):
    return asyncio.run(coro)


def test_completions_and_models(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post("/api/oai/completions", json={
                "prompt": "ABCAB", "max_tokens": 5,
                "sampler": {"type": "Nucleus", "top_k": 1},
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "text_completion"
            assert body["choices"][0]["finish_reason"] in ("length", "stop")
            assert body["usage"]["prompt"] == 5
            text1 = body["choices"][0]["text"]

            # v1 alias + greedy determinism via top_k=1.
            r = await client.post("/api/oai/v1/completions", json={
                "prompt": "ABCAB", "max_tokens": 5,
                "sampler": {"type": "Nucleus", "top_k": 1},
            })
            text2 = (await r.json())["choices"][0]["text"]
            assert text1 == text2

            r = await client.get("/api/oai/models")
            assert (await r.json())["data"][0]["id"] == "tiny"

            r = await client.get("/api/models/info")
            info = await r.json()
            assert info["state"] == "loaded"
            assert info["model"]["version"] == "V7"

            r = await client.get("/api/adapters")
            assert isinstance(await r.json(), list)

            r = await client.get("/api/models/list")
            models = await r.json()
            assert any(m["name"] == "tiny.st" for m in models)
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_streaming_sse(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post("/api/oai/completions", json={
                "prompt": "ABC", "max_tokens": 4, "stream": True,
                "sampler": {"type": "Nucleus", "top_k": 1},
            })
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = (await r.read()).decode()
            events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            assert events[-1] == "[DONE]"
            text = ""
            for e in events[:-1]:
                obj = json.loads(e)
                for c in obj["choices"]:
                    text += c.get("text", "")
            assert len(text) > 0
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_chat_template_expansion(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post("/api/oai/chat/completions", json={
                "messages": [
                    {"role": "user", "content": "ABC"},
                    {"role": "assistant", "content": "CBA"},
                    {"role": "user", "content": "BAC"},
                ],
                "max_tokens": 4,
                "sampler": {"type": "Nucleus", "top_k": 1},
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "chat.completion"
            msg = body["choices"][0]["message"]
            assert msg["role"] == "Assistant"

            # Streaming chat: first chunk carries the role delta.
            r = await client.post("/api/oai/chat/completions", json={
                "messages": [{"role": "user", "content": "AB"}],
                "max_tokens": 3, "stream": True,
            })
            raw = (await r.read()).decode()
            events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            first = json.loads(events[0])
            assert first["choices"][0]["delta"] == {"role": "Assistant"}
            assert events[-1] == "[DONE]"
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_states_chooses_embeddings(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post("/api/oai/states", json={"input": "ABC"})
            body = await r.json()
            d = body["data"][0]
            assert d["shape"][0] == 3  # num_layer
            assert len(d["data"]) == int(np.prod(d["shape"]))

            r = await client.post("/api/oai/chooses", json={
                "input": "ABCAB", "choices": [" A", " B", " C"],
            })
            body = await r.json()
            assert len(body["data"]) == 3
            ranks = [d["rank"] for d in body["data"]]
            assert sorted(ranks) == [0, 1, 2]
            ppls = [d["perplexity"] for d in body["data"]]
            assert ppls == sorted(ppls)

            r = await client.post("/api/oai/embeddings", json={
                "input": ["ABC", "CBA"]})
            body = await r.json()
            assert len(body["data"]) == 2
            v = np.asarray(body["data"][0]["embedding"])
            assert abs(np.linalg.norm(v) - 1.0) < 1e-4
            # The served vector comes from the prefill-accumulated
            # hidden sums (one forward); it must match the dedicated
            # mean-hidden forward recipe.
            env = server.middleware.env
            ref = env.engine.mean_hidden_embed(
                env.tokenizer.encode("ABC"))
            np.testing.assert_allclose(v, ref, atol=2e-3)
            # And identical repeat requests stay consistent (no prefix
            # cache interference with the accumulator).
            r = await client.post("/api/oai/embeddings", json={
                "input": ["ABC"]})
            v2 = np.asarray((await r.json())["data"][0]["embedding"])
            np.testing.assert_allclose(v2, v, atol=1e-5)
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_auth_and_admin(site):
    async def main():
        client, server = await make_client(site)
        try:
            # Admin requires JWT (force_pass=false in config).
            r = await client.get("/admin/models/unload")
            assert r.status == 401

            r = await client.post("/api/auth/exchange", json={
                "app_id": "admin", "app_secret": "wrong"})
            assert r.status == 403

            r = await client.post("/api/auth/exchange", json={
                "app_id": "admin", "app_secret": "testkey"})
            token = (await r.json())["token"]
            assert token

            hdrs = {"Authorization": f"Bearer {token}"}
            r = await client.get("/admin/models/unload", headers=hdrs)
            assert r.status == 200
            assert server.middleware.env is None

            # Reload via admin API.
            r = await client.post("/admin/models/load", headers=hdrs, json={
                "model_path": "tiny.st",
                "tokenizer_path": str(site / "assets/tokenizer/vocab.json"),
                "max_batch": 2, "token_chunk_size": 8,
            })
            assert r.status == 200, await r.text()
            assert server.middleware.env is not None

            # Generation works after reload.
            r = await client.post("/api/oai/completions", json={
                "prompt": "AB", "max_tokens": 2})
            assert r.status == 200

            # Partial reload body (the WebUI model manager sends only
            # model_path + options): the configured tokenizer must be
            # kept, not the global dataclass default.
            r = await client.post("/admin/models/load", headers=hdrs, json={
                "model_path": "tiny.st",
                "max_batch": 2, "token_chunk_size": 8,
            })
            assert r.status == 200, await r.text()
            r = await client.post("/api/oai/completions", json={
                "prompt": "AB", "max_tokens": 2})
            assert r.status == 200
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_openapi_docs(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.get("/api-docs/openapi.json")
            spec = await r.json()
            assert "/api/oai/chat/completions" in spec["paths"]
            # EVERY registered route is documented, and nothing more
            # (reference auto-derivation parity, main.rs:307-311).
            registered = set()
            for route in server.app.router.routes():
                if route.method.lower() == "head":
                    continue
                registered.add(
                    (route.resource.canonical, route.method.lower()))
            documented = {(p, m) for p, ops in spec["paths"].items()
                          for m in ops}
            assert registered == documented, (
                registered.symmetric_difference(documented))
            # Spot-check merged hand-written detail and docstring
            # fallbacks both survive derivation.
            emb = spec["paths"]["/api/oai/embeddings"]["post"]
            assert "pooling" in json.dumps(emb)
            assert spec["paths"]["/api/metrics"]["get"]["summary"]
            r = await client.get("/api-docs")
            assert "swagger" in (await r.text()).lower()
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_bnf_over_http(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post("/api/oai/completions", json={
                "prompt": "ABC", "max_tokens": 8,
                "bnf_schema": "start ::= 'HI' | 'BYE';",
            })
            body = await r.json()
            assert body["choices"][0]["text"] in ("HI", "BYE")
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())
