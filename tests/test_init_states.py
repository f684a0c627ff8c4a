"""Initial-state flows: [[state]] config files, per-request UUIDs, default
state, and inline state values over HTTP (reference lib.rs:203-231,
run.rs:387-439)."""

import asyncio
import json

import numpy as np
import pytest

from aiohttp.test_utils import TestClient, TestServer

import jax
import jax.numpy as jnp

from ai00_server_tpu import loader
from ai00_server_tpu.models import ModelVersion, get_version_module, packing
from ai00_server_tpu.testing import make_tiny_model
from ai00_server_tpu.server.app import Server
from ai00_server_tpu.server.config import Config

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_loader import to_converted_layout  # noqa: E402


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    root = tmp_path_factory.mktemp("statesite")
    models = root / "m"
    models.mkdir()
    info, raw, params = make_tiny_model(ModelVersion.V6, seed=100,
                                        dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)

    # A .state file in the state-tuning format (per-layer time_state,
    # stored transposed like the converter does).
    rng = np.random.default_rng(7)
    H, N = info.num_head, info.head_size
    ts = rng.standard_normal(
        (info.num_layer, H, N, N)).astype(np.float32) * 0.3
    st = {}
    for i in range(info.num_layer):
        st[f"blocks.{i}.att.time_state"] = np.swapaxes(ts[i], -1, -2)
    loader.save_safetensors(st, str(models / "tuned.state"),
                            dtype=np.float32)

    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (root / "vocab.json").write_text(json.dumps(vocab))
    return root, info, params, ts


def test_state_config_and_selection(site):
    root, info, params, ts = site
    sid = "fd7a60ed-7807-449f-8256-bccae3246222"

    async def main():
        config = Config.from_dict({
            "model": {"name": "tiny.st", "path": str(root / "m"),
                      "max_batch": 2, "token_chunk_size": 8},
            "state": [{"path": str(root / "m" / "tuned.state"),
                       "name": "tuned", "id": sid, "default": False}],
            "tokenizer": {"path": str(root / "vocab.json")},
        })
        server = Server(config)
        await server.middleware.reload(
            config.to_reload_request(sandbox=False))
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            # The state appears in RuntimeInfo.
            r = await client.get("/api/models/info")
            states = (await r.json())["states"]
            assert any(s["id"] == sid and s["name"] == "tuned"
                       for s in states)

            # /states with the tuned UUID for an EMPTY-ish input returns a
            # state whose WKV part reflects the tuned initial state.
            r = await client.post("/api/oai/states", json={
                "input": "A", "state": sid})
            data = np.asarray((await r.json())["data"][0]["data"])
            shape = packing.state_shape(info)
            flat = data.reshape(shape[:3])

            r = await client.post("/api/oai/states", json={"input": "A"})
            flat_default = np.asarray(
                (await r.json())["data"][0]["data"]).reshape(shape[:3])

            # Same input, different initial state -> different result.
            assert not np.allclose(flat, flat_default)

            # Greedy completions from the two states differ (the tuned
            # state conditions the model).
            async def completion(state_field):
                body = {"prompt": "ABCAB", "max_tokens": 6,
                        "sampler": {"type": "Nucleus", "top_k": 1}}
                if state_field:
                    body["state"] = state_field
                r = await client.post("/api/oai/completions", json=body)
                return (await r.json())["choices"][0]["text"]

            out_tuned = await completion(sid)
            out_default = await completion(None)
            assert isinstance(out_tuned, str)

            # Inline state value round-trip: feed the extracted state back.
            r = await client.post("/api/oai/completions", json={
                "prompt": "ABCAB", "max_tokens": 6,
                "sampler": {"type": "Nucleus", "top_k": 1},
                "state": {"id": "11111111-2222-3333-4444-555555555555",
                          "data": data.tolist(),
                          "shape": list(shape)},
            })
            assert r.status == 200, await r.text()
            out_inline = (await r.json())["choices"][0]["text"]
            assert isinstance(out_inline, str)
            return out_tuned, out_default
        finally:
            await client.close()
            await server.middleware.unload()

    out_tuned, out_default = asyncio.run(main())
    # Tuned vs default initial states should steer greedy decode apart
    # for this random state (sanity, not a strict requirement).
    assert out_tuned != out_default or len(out_tuned) == 6
