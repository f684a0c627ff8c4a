"""int8-surrogate decode for 4-bit models (ops/quant.to_int8_surrogate).

NF4/SF4 packed decode is VPU-bound on TPU; the surrogate stores the
integer decode levels as int8 codes with the same per-block scales, so
dequantized values are IDENTICAL while decode runs at int8 speed.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ai00_server_tpu.engine import Engine
from ai00_server_tpu.loader import LoadedModel
from ai00_server_tpu.models import ModelVersion
from ai00_server_tpu.ops import quant
from ai00_server_tpu.testing import make_params, make_raw_weights, tiny_info


@pytest.mark.parametrize("mode", ["nf4", "sf4", "int4"])
def test_surrogate_dequant_identical(mode):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 96)).astype(np.float32)
    qlin = quant.QUANTIZERS[mode](w)
    surr = quant.to_int8_surrogate(qlin)
    assert surr.mode == "int8"
    np.testing.assert_array_equal(np.asarray(surr.dequant(jnp.float32)),
                                  np.asarray(qlin.dequant(jnp.float32)))


@pytest.mark.parametrize("mode", ["nf4", "sf4", "int4"])
def test_surrogate_repack_lossless(mode):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((1, 192, 64)).astype(np.float32)  # stacked L=1
    qlin = quant.QUANTIZERS[mode](w)
    surr = quant.to_int8_surrogate(qlin)
    back = quant.repack_surrogate(np.asarray(surr.q), np.asarray(surr.scale),
                                  mode, qlin.shape)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(qlin.q))
    np.testing.assert_array_equal(np.asarray(back.scale),
                                  np.asarray(qlin.scale))
    assert back.mode == mode and back.shape == qlin.shape


def _nf4_model():
    info = tiny_info(ModelVersion.V7, num_layer=2, num_emb=128,
                     head_size=64, num_vocab=64)
    raw = make_raw_weights(info, seed=4, dtype=np.float32)
    params = make_params(info, raw, dtype=np.float32,
                         quant={i: "nf4" for i in range(info.num_layer)})
    return info, params


def test_engine_surrogate_matches_packed_decode():
    """Greedy decode through the engine is token-identical between the
    packed 4-bit path and the int8 surrogate (the dequantized weights are
    the same numbers; only the matmul kernel differs)."""
    from ai00_server_tpu.ops import sampling

    def run(surrogate):
        os.environ["AI00_NF4_DECODE"] = (
            "surrogate" if surrogate else "packed")
        os.environ["AI00_FUSED_DECODE"] = "off"
        try:
            info, params = _nf4_model()
            model = LoadedModel(info=info, params=params, init_wkv=None)
            eng = Engine(model, max_batch=2, token_chunk_size=8,
                         state_dtype=jnp.float32)
            if surrogate:
                assert model.surrogate_modes, "surrogate not applied"
                modes = {l.mode for l in __import__("jax").tree.leaves(
                    model.params,
                    is_leaf=lambda x: isinstance(x, quant.QuantizedLinear))
                    if isinstance(l, quant.QuantizedLinear)}
                assert modes == {"int8"}
            else:
                assert not model.surrogate_modes
            eng.set_row_sampler(0, {"kind": sampling.KIND_GREEDY,
                                    "presence": 0.0, "frequency": 0.0})
            toks = np.zeros((2, 5), np.int32)
            toks[0] = [1, 2, 3, 4, 5]
            lengths = np.array([5, 0], np.int32)
            mask = np.array([True, False])
            out = [int(eng.step(toks, lengths, mask).tokens[0])]
            for _ in range(6):
                t1 = np.zeros((2, 1), np.int32)
                t1[0, 0] = out[-1]
                out.append(int(eng.step(
                    t1, np.array([1, 0], np.int32), mask).tokens[0]))
            return out
        finally:
            os.environ.pop("AI00_NF4_DECODE", None)
            os.environ.pop("AI00_FUSED_DECODE", None)

    assert run(True) == run(False)


def test_prefab_roundtrip_repacks_surrogate(tmp_path):
    """Prefab export of a surrogate-converted model stores the ORIGINAL
    packed 4-bit leaves; reload restores them exactly."""
    from ai00_server_tpu import prefab

    info, params = _nf4_model()
    orig_q = {}
    layers = params["groups"][0]["layers"]
    for part in ("att", "ffn"):
        for k, v in layers[part].items():
            if isinstance(v, quant.QuantizedLinear):
                orig_q[(part, k)] = (np.asarray(v.q).copy(),
                                     np.asarray(v.scale).copy())
    model = LoadedModel(info=info, params=params, init_wkv=None)
    os.environ["AI00_NF4_DECODE"] = "surrogate"
    try:
        Engine(model, max_batch=2, token_chunk_size=8,
               state_dtype=jnp.float32)
    finally:
        os.environ.pop("AI00_NF4_DECODE", None)
    assert model.surrogate_modes
    path = str(tmp_path / "m.prefab")
    prefab.save_prefab(path, model)
    # The live model keeps its surrogate leaves (device copy untouched).
    live = model.params["groups"][0]["layers"]["att"]["receptance"]
    assert live.mode == "int8"
    back = prefab.load_prefab(path)
    bl = back.params["groups"][0]["layers"]
    for (part, k), (q, s) in orig_q.items():
        leaf = bl[part][k]
        assert leaf.mode == "nf4"
        np.testing.assert_array_equal(np.asarray(leaf.q), q)
        np.testing.assert_array_equal(np.asarray(leaf.scale), s)
