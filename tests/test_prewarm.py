"""Load-time prewarm: after Middleware.reload the serving-step buckets are
compiled in the background, so the first request compiles nothing
(VERDICT r1 weak #3)."""

import asyncio
import json

import numpy as np
import pytest

from ai00_server_tpu import loader
from ai00_server_tpu.middleware import Middleware, ReloadRequest
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.runtime import GenerateRequest
from ai00_server_tpu.testing import make_tiny_model

from test_loader import to_converted_layout
from test_runtime import collect


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    root = tmp_path_factory.mktemp("prewarm_site")
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=11,
                                   dtype=np.float32, num_vocab=64)
    loader.save_safetensors(to_converted_layout(raw),
                            str(root / "tiny.st"), dtype=np.float32)
    vocab = {str(i): chr(64 + i) for i in range(1, 60)}
    (root / "vocab.json").write_text(json.dumps(vocab))
    return root


def test_prewarm_covers_first_request(site):
    async def main():
        mw = Middleware()
        await mw.reload(ReloadRequest(
            model_path=str(site / "tiny.st"),
            tokenizer_path=str(site / "vocab.json"),
            precision="Fp32", max_batch=4, token_chunk_size=8,
            prewarm=True))
        env = mw.env
        assert env.prewarm_future is not None
        await env.prewarm_future
        eng = env.engine
        steps_before = set(eng._steps)
        scans_before = set(eng._decode_scans)
        assert steps_before and scans_before

        # A default-sampler request (nucleus) through the runtime must not
        # compile any new bucket.
        text, *_ = await collect(await env.runtime.submit(GenerateRequest(
            prompt="ABCAB", max_tokens=12)))
        assert text
        assert set(eng._steps) == steps_before
        assert set(eng._decode_scans) == scans_before
        await mw.unload()

    asyncio.run(main())


def test_prewarm_parallel_aot(site, tmp_path):
    """With the persistent compile cache enabled, prewarm AOT-compiles
    the buckets concurrently first (engine.prewarm phase 1); the engine
    must still serve identical steps afterward."""
    import jax

    from ai00_server_tpu.engine import Engine

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
    try:
        model = loader.load_model(str(site / "tiny.st"))
        eng = Engine(model, max_batch=4, token_chunk_size=8)
        eng.prewarm(decode_chunk_size=4)
        assert eng._steps and eng._decode_scans
        toks = np.zeros((4, 8), np.int32)
        toks[0, :3] = [1, 2, 3]
        lengths = np.array([3, 0, 0, 0], np.int32)
        res = eng.step(toks, lengths, np.array([True, False, False, False]))
        assert res.tokens.shape == (4,)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_prewarm_off(site):
    async def main():
        mw = Middleware()
        await mw.reload(ReloadRequest(
            model_path=str(site / "tiny.st"),
            tokenizer_path=str(site / "vocab.json"),
            precision="Fp32", max_batch=4, token_chunk_size=8,
            prewarm=False))
        assert mw.env.prewarm_future is None
        assert not mw.env.engine._steps
        await mw.unload()

    asyncio.run(main())
