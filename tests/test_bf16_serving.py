"""Every model family must serve under the default Fp16 (bf16) precision
through the full middleware path — on CPU too (the virtual-mesh backend),
where some bf16 dot shapes are unsupported and need explicit upcasts."""

import asyncio
import json

import numpy as np
import pytest

from ai00_server_tpu import loader
from ai00_server_tpu.middleware import Middleware, ReloadRequest
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.runtime import GenerateRequest, SamplerSpec
from ai00_server_tpu.ops import sampling
from ai00_server_tpu.testing import make_tiny_model

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_loader import to_converted_layout  # noqa: E402


@pytest.mark.parametrize(
    "version,quant,quant_type",
    [(ModelVersion.V4, 0, "Int8"), (ModelVersion.V5, 0, "Int8"),
     (ModelVersion.V6, 0, "Int8"), (ModelVersion.V7, 0, "Int8"),
     (ModelVersion.V7, 3, "Int8"), (ModelVersion.V7, 3, "NF4")],
    ids=["V4", "V5", "V6", "V7", "V7-int8", "V7-nf4"])
def test_bf16_generation(tmp_path, version, quant, quant_type):
    kw = ({"num_emb": 128, "head_size": 64} if quant else {})
    info, raw, _ = make_tiny_model(version, seed=110, dtype=np.float32,
                                   num_vocab=64, **kw)
    path = str(tmp_path / "m.st")
    loader.save_safetensors(to_converted_layout(raw), path,
                            dtype=np.float32)
    vocab_path = str(tmp_path / "v.json")
    with open(vocab_path, "w") as f:
        json.dump({str(i): chr(64 + i) for i in range(1, 60)}, f)

    async def main():
        mw = Middleware()
        await mw.reload(ReloadRequest(
            model_path=path, tokenizer_path=vocab_path,
            precision="Fp16", max_batch=2, token_chunk_size=8,
            quant=quant, quant_type=quant_type))
        handle = await mw.env.runtime.submit(GenerateRequest(
            prompt="ABCAB", max_tokens=4,
            sampler=SamplerSpec(kind=sampling.KIND_GREEDY)))
        reason = None
        async for msg in handle:
            if msg[0] == "stop":
                reason = msg[1]
        await mw.unload()
        return reason

    reason = asyncio.run(main())
    assert reason is not None and reason.value in ("stop", "length")
