"""Metrics endpoint + runtime counters."""

import asyncio
import json

import numpy as np

from aiohttp.test_utils import TestClient, TestServer


def test_metrics_endpoint(tmp_path):
    from ai00_server_tpu import loader
    from ai00_server_tpu.models import ModelVersion
    from ai00_server_tpu.testing import make_tiny_model
    from ai00_server_tpu.server.app import Server
    from ai00_server_tpu.server.config import Config

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_loader import to_converted_layout

    models = tmp_path / "m"
    models.mkdir()
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=50,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))

    async def main():
        config = Config.from_dict({
            "model": {"name": "tiny.st", "path": str(models),
                      "max_batch": 2, "token_chunk_size": 8},
            "tokenizer": {"path": str(tmp_path / "vocab.json")},
        })
        server = Server(config)
        await server.middleware.reload(
            config.to_reload_request(sandbox=False))
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.get("/api/metrics")
            text = await r.text()
            assert "ai00_model_loaded 1" in text

            await (await client.post("/api/oai/completions", json={
                "prompt": "ABC", "max_tokens": 4})).json()

            r = await client.get("/api/metrics")
            text = await r.text()
            assert "ai00_runtime_requests_finished 1" in text
            metrics = dict(
                line.split(" ", 1) for line in text.strip().splitlines())
            assert int(metrics["ai00_runtime_steps"]) >= 1
            assert float(metrics["ai00_step_seconds_avg"]) > 0
        finally:
            await client.close()
            await server.middleware.unload()

    asyncio.run(main())
