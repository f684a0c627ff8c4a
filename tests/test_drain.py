"""Graceful drain: unload/reload under live traffic must end every
in-flight and queued request stream (VERDICT r2 weak #6; reference ends
streams when the old runtime's senders drop, run.rs:1139-1141)."""

import asyncio
import json

import numpy as np
import pytest

import jax.numpy as jnp

from ai00_server_tpu import loader
from ai00_server_tpu.engine import Engine
from ai00_server_tpu.loader import LoadedModel
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.ops import sampling
from ai00_server_tpu.runtime import (
    FinishReason, GenerateRequest, Runtime, SamplerSpec,
)
from ai00_server_tpu.testing import make_tiny_model
from ai00_server_tpu.tokenizer import Tokenizer

from test_loader import to_converted_layout


def greedy_spec():
    return SamplerSpec(kind=sampling.KIND_GREEDY, presence_penalty=0.0,
                       frequency_penalty=0.0)


@pytest.fixture(scope="module")
def stack():
    info, raw, params = make_tiny_model(
        ModelVersion.V7, seed=11, dtype=np.float32, num_vocab=64)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    vocab = {i: bytes([64 + i]) for i in range(1, 60)}
    return info, model, Tokenizer(vocab)


def test_stop_drains_inflight_and_pending(stack):
    """Runtime.stop() finalizes busy slots with ABORT and fails queued
    requests, so no handle is left awaiting forever."""
    info, model, tok = stack

    async def main():
        eng = Engine(model, max_batch=2, token_chunk_size=8,
                     state_dtype=jnp.float32)
        rt = Runtime(eng, tok, decode_chunk_size=4)
        rt.start()
        # Two long generations fill both slots; a third queues as pending.
        handles = [await rt.submit(GenerateRequest(
            prompt="ABCD", max_tokens=10_000, sampler=greedy_spec()))
            for _ in range(3)]
        # Let the runtime actually start decoding.
        first = handles[0]
        got = 0
        async for msg in first:
            if msg[0] == "content":
                got += 1
                if got >= 2:
                    break
        # Unload mid-stream.
        stop = asyncio.create_task(rt.stop())
        results = [await asyncio.wait_for(_final_reason(h), timeout=30)
                   for h in handles]
        await stop
        return results

    results = asyncio.run(main())
    assert all(r == FinishReason.ABORT for r in results), results


async def _final_reason(handle):
    reason = None
    async for msg in handle:
        if msg[0] == "stop":
            reason = msg[1]
    return reason


def test_prewarm_preserves_chunk_snapshots(stack):
    """A concurrent prewarm must not evict the runtime's pre-chunk
    rollback snapshots (ADVICE r2 high): after a real decode chunk,
    prewarm runs, and restore_last_chunk still restores the REAL
    pre-chunk state."""
    info, model, tok = stack
    eng = Engine(model, max_batch=2, token_chunk_size=8,
                 state_dtype=jnp.float32)
    # Put some real content into row 0's state.
    toks = np.zeros((2, 4), np.int32)
    toks[0] = [1, 2, 3, 4]
    eng.step(toks, np.array([4, 0], np.int32),
             np.zeros(2, np.bool_), False)
    pre = eng.read_row_state(0)
    # One real decode chunk (pushes a snapshot).
    active = np.array([True, False])
    eng.decode_chunk(np.array([5, 0], np.int32), active, steps=4)
    assert len(eng._chunk_snaps) == 1
    # Prewarm (the background-compile path) must not touch the ring.
    eng.prewarm(decode_chunk_size=4)
    assert len(eng._chunk_snaps) == 1
    eng.restore_last_chunk()
    post = eng.read_row_state(0)
    for k in pre:
        np.testing.assert_array_equal(np.asarray(pre[k]),
                                      np.asarray(post[k]))


def test_reload_mid_stream_terminates_first_stream(tmp_path):
    """HTTP-level: a reload during a live generation ends the first
    stream with a finish_reason, and the new model serves."""
    from ai00_server_tpu.server.app import Server
    from ai00_server_tpu.server.config import Config

    models = tmp_path / "assets" / "models"
    tok_dir = tmp_path / "assets" / "tokenizer"
    cfg_dir = tmp_path / "assets" / "configs"
    for d in (models, tok_dir, cfg_dir):
        d.mkdir(parents=True)
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=3,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(models / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    (cfg_dir / "Config.toml").write_text(f"""
[model]
name = "tiny.st"
path = "{models}"
max_batch = 2
token_chunk_size = 16

[tokenizer]
path = "{tok_dir / 'vocab.json'}"

[listen]
port = 0
force_pass = true
slot = "testsecret"
""")

    async def main():
        from aiohttp.test_utils import TestClient, TestServer

        config = Config.from_toml(str(cfg_dir / "Config.toml"))
        server = Server(config)
        reload_req = config.to_reload_request(sandbox=False)
        reload_req.prewarm = False
        await server.middleware.reload(reload_req)
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            long_task = asyncio.create_task(client.post(
                "/api/oai/completions",
                json={"prompt": "ABCAB", "max_tokens": 100_000,
                      "sampler": {"type": "Nucleus", "top_k": 1}}))
            await asyncio.sleep(1.0)  # let it start decoding
            await server.middleware.reload(reload_req)
            r1 = await asyncio.wait_for(long_task, timeout=60)
            body1 = await r1.json()
            r2 = await client.post(
                "/api/oai/completions",
                json={"prompt": "AB", "max_tokens": 4,
                      "sampler": {"type": "Nucleus", "top_k": 1}})
            body2 = await r2.json()
            return body1, body2
        finally:
            await client.close()
            await server.middleware.unload()

    body1, body2 = asyncio.run(main())
    assert body1["choices"][0]["finish_reason"] == "abort"
    assert body2["choices"][0]["finish_reason"] in ("length", "stop")
