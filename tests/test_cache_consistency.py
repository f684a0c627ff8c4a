"""Regression: cache/resident keys must reflect CONSUMED tokens only.

Every decode path leaves the freshly sampled token unfed; keying the
prefix cache or the slot-resident record with it makes a later Continue
reuse a state that is one token short — silently wrong continuations.
"""

import asyncio

import numpy as np
import jax.numpy as jnp

from ai00_server_tpu.engine import Engine
from ai00_server_tpu.loader import LoadedModel
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.ops import sampling
from ai00_server_tpu.runtime import GenerateRequest, Runtime, SamplerSpec
from ai00_server_tpu.testing import make_tiny_model
from ai00_server_tpu.tokenizer import Tokenizer


def full_char_tokenizer():
    # Cover every sampleable id 1..63 so decoded text maps 1:1 to tokens.
    return Tokenizer({i: bytes([59 + i]) for i in range(1, 64)})


def greedy():
    return SamplerSpec(kind=sampling.KIND_GREEDY, presence_penalty=0.0,
                       frequency_penalty=0.0)


async def generate(rt, prompt, n):
    handle = await rt.submit(GenerateRequest(
        prompt=prompt, max_tokens=n, sampler=greedy()))
    parts = []
    async for msg in handle:
        if msg[0] == "content":
            parts.append(msg[1])
    return "".join(parts)


def make_rt(model, tok, decode_chunk_size):
    eng = Engine(model, max_batch=1, token_chunk_size=8,
                 state_dtype=jnp.float32)
    return Runtime(eng, tok, decode_chunk_size=decode_chunk_size)


def run_case(decode_chunk_size):
    info, raw, params = make_tiny_model(ModelVersion.V7, seed=90,
                                        dtype=np.float32, num_vocab=64)
    model = LoadedModel(info=info, params=params, init_wkv=None)
    tok = full_char_tokenizer()
    prompt = "<ABCABCABCABCABCABCABCABCABCABCABCA"  # 36 chars >= 32 tokens
    assert len(tok.encode(prompt)) >= 32

    async def main():
        # Warm runtime: generate, then continue from the resident state.
        rt = make_rt(model, tok, decode_chunk_size)
        rt.start()
        t1 = await generate(rt, prompt, 4)

        # White-box invariant: the resident record and every cache entry
        # must describe exactly the tokens the engine state consumed —
        # the final sampled token was never fed, so it must NOT appear.
        resident = rt.slots[0].resident_tokens
        state_now = rt.engine.read_row_state(0)
        import jax
        import jax.numpy as jnp_
        from ai00_server_tpu.models import get_version_module
        m = get_version_module(info.version)
        replay = m.init_state(info, 1, jnp_.float32)
        fwd = jax.jit(m.forward)
        toks = jnp_.asarray(np.asarray(resident, np.int32)[None])
        _, replay = fwd(model.params, replay, toks,
                        jnp_.asarray([len(resident)], np.int32))
        for k in replay:
            np.testing.assert_allclose(
                np.asarray(state_now[k]), np.asarray(replay[k]),
                atol=1e-4, rtol=1e-3,
                err_msg=f"resident tokens do not match engine state ({k})")

        cont_prompt = prompt + t1 + "AB"
        out_warm = await generate(rt, cont_prompt, 4)
        await rt.stop()

        # Fresh runtime: same continuation with no cache/resident reuse.
        model2 = LoadedModel(info=info, params=params, init_wkv=None)
        rt2 = make_rt(model2, tok, decode_chunk_size)
        rt2.start()
        out_fresh = await generate(rt2, cont_prompt, 4)
        await rt2.stop()
        return t1, out_warm, out_fresh

    return asyncio.run(main())


def test_continue_after_generation_single_step():
    t1, warm, fresh = run_case(decode_chunk_size=1)
    assert len(t1) == 4  # all sampled ids decode to chars
    assert warm == fresh


def test_continue_after_generation_chunked():
    t1, warm, fresh = run_case(decode_chunk_size=8)
    assert warm == fresh
