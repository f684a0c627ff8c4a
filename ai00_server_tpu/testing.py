"""Test fixtures: tiny random models in the internal parameter layout.

Produces both (a) the stacked JAX param pytree consumed by
``models.vN.forward`` and (b) the raw per-layer numpy dict used by the
independent float64 reference implementations in ``tests/``.
"""

from __future__ import annotations

import numpy as np

from .models.info import ModelInfo, ModelVersion

LORA_DIMS = {"w": 8, "a": 8, "v": 8, "g": 8, "tm": 8, "td": 8}


def tiny_info(version: ModelVersion, num_layer=3, num_emb=32, head_size=16,
              num_vocab=64, hidden_mult=4) -> ModelInfo:
    if version == ModelVersion.V4:
        num_head, hs = num_emb, 1
    else:
        num_head, hs = num_emb // head_size, head_size
    return ModelInfo(
        version=version,
        num_layer=num_layer,
        num_emb=num_emb,
        num_hidden=num_emb * hidden_mult,
        num_vocab=num_vocab,
        num_head=num_head,
        head_size=hs,
    )


_RAW_DTYPE = np.float64  # tests need f64; big benches override to f32


def _rand(rng, *shape, scale=0.4):
    return (rng.standard_normal(shape, dtype=np.float32) * scale
            if _RAW_DTYPE == np.float32
            else rng.standard_normal(shape).astype(np.float64) * scale)


def make_raw_weights(info: ModelInfo, seed=0,
                     dtype=np.float64) -> dict[str, np.ndarray]:
    global _RAW_DTYPE
    _RAW_DTYPE = dtype
    try:
        return _make_raw_weights(info, seed)
    finally:
        _RAW_DTYPE = np.float64


def _make_raw_weights(info: ModelInfo, seed=0) -> dict[str, np.ndarray]:
    """Random weights keyed/oriented like the *math* layout (x @ W).

    Keys follow the converted-safetensors naming so the same dict can be fed
    through the loader (after orientation fixup) and the numpy references.
    All linear weights here are (in, out).
    """
    rng = np.random.default_rng(seed)
    C, V, F, L = info.num_emb, info.num_vocab, info.num_hidden, info.num_layer
    H, N = info.num_head, info.head_size
    ver = info.version
    D = LORA_DIMS

    w = {
        "emb.weight": _rand(rng, V, C),
        "blocks.0.ln0.weight": 1.0 + _rand(rng, C, scale=0.1),
        "blocks.0.ln0.bias": _rand(rng, C, scale=0.1),
        "ln_out.weight": 1.0 + _rand(rng, C, scale=0.1),
        "ln_out.bias": _rand(rng, C, scale=0.1),
        "head.weight": _rand(rng, C, V),
    }
    for i in range(L):
        b = f"blocks.{i}."
        w[b + "ln1.weight"] = 1.0 + _rand(rng, C, scale=0.1)
        w[b + "ln1.bias"] = _rand(rng, C, scale=0.1)
        w[b + "ln2.weight"] = 1.0 + _rand(rng, C, scale=0.1)
        w[b + "ln2.bias"] = _rand(rng, C, scale=0.1)

        a = b + "att."
        w[a + "receptance.weight"] = _rand(rng, C, C)
        w[a + "key.weight"] = _rand(rng, C, C)
        w[a + "value.weight"] = _rand(rng, C, C)
        w[a + "output.weight"] = _rand(rng, C, C)

        if ver == ModelVersion.V7:
            for nm in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"):
                w[a + nm] = _rand(rng, C, scale=0.3)
            w[a + "w0"] = _rand(rng, C, scale=0.5)
            w[a + "w1"] = _rand(rng, C, D["w"])
            w[a + "w2"] = _rand(rng, D["w"], C)
            w[a + "a0"] = _rand(rng, C, scale=0.3)
            w[a + "a1"] = _rand(rng, C, D["a"])
            w[a + "a2"] = _rand(rng, D["a"], C)
            if i > 0:
                w[a + "v0"] = _rand(rng, C, scale=0.3)
                w[a + "v1"] = _rand(rng, C, D["v"])
                w[a + "v2"] = _rand(rng, D["v"], C)
            w[a + "g1"] = _rand(rng, C, D["g"])
            w[a + "g2"] = _rand(rng, D["g"], C)
            w[a + "k_k"] = 0.5 + _rand(rng, C, scale=0.2)
            w[a + "k_a"] = 0.5 + _rand(rng, C, scale=0.2)
            w[a + "r_k"] = _rand(rng, H, N, scale=0.3)
            w[a + "ln_x.weight"] = 1.0 + _rand(rng, C, scale=0.1)
            w[a + "ln_x.bias"] = _rand(rng, C, scale=0.1)
        elif ver == ModelVersion.V6:
            w[a + "time_mix_x"] = _rand(rng, C, scale=0.3)
            for nm in ("time_mix_w", "time_mix_k", "time_mix_v",
                       "time_mix_r", "time_mix_g"):
                w[a + nm] = _rand(rng, C, scale=0.3)
            w[a + "time_mix_w1"] = _rand(rng, C, 5 * D["tm"])
            w[a + "time_mix_w2"] = _rand(rng, 5, D["tm"], C)
            w[a + "time_decay"] = _rand(rng, C, scale=0.5)
            w[a + "time_decay_w1"] = _rand(rng, C, D["td"])
            w[a + "time_decay_w2"] = _rand(rng, D["td"], C)
            w[a + "time_first"] = _rand(rng, H, N, scale=0.5)
            w[a + "gate.weight"] = _rand(rng, C, C)
            w[a + "ln_x.weight"] = 1.0 + _rand(rng, C, scale=0.1)
            w[a + "ln_x.bias"] = _rand(rng, C, scale=0.1)
        elif ver == ModelVersion.V5:
            for nm in ("time_mix_k", "time_mix_v", "time_mix_r", "time_mix_g"):
                w[a + nm] = 0.5 + _rand(rng, C, scale=0.2)
            w[a + "time_decay"] = _rand(rng, H, N, scale=0.5)
            w[a + "time_first"] = _rand(rng, H, N, scale=0.5)
            w[a + "gate.weight"] = _rand(rng, C, C)
            w[a + "ln_x.weight"] = 1.0 + _rand(rng, C, scale=0.1)
            w[a + "ln_x.bias"] = _rand(rng, C, scale=0.1)
        else:  # V4
            for nm in ("time_mix_k", "time_mix_v", "time_mix_r"):
                w[a + nm] = 0.5 + _rand(rng, C, scale=0.2)
            w[a + "time_decay"] = _rand(rng, C, scale=0.5)
            w[a + "time_first"] = _rand(rng, C, scale=0.5)

        f = b + "ffn."
        w[f + "key.weight"] = _rand(rng, C, F)
        w[f + "value.weight"] = _rand(rng, F, C)
        if ver == ModelVersion.V7:
            w[f + "x_k"] = _rand(rng, C, scale=0.3)
        elif ver == ModelVersion.V6:
            w[f + "time_mix_k"] = _rand(rng, C, scale=0.3)
            w[f + "time_mix_r"] = _rand(rng, C, scale=0.3)
            w[f + "receptance.weight"] = _rand(rng, C, C)
        else:
            w[f + "time_mix_k"] = 0.5 + _rand(rng, C, scale=0.2)
            w[f + "time_mix_r"] = 0.5 + _rand(rng, C, scale=0.2)
            w[f + "receptance.weight"] = _rand(rng, C, C)
    return w


def make_params(info: ModelInfo, raw: dict[str, np.ndarray], dtype=np.float32,
                group_sizes: list[int] | None = None, quant: dict | None = None):
    """Stack raw math-oriented weights into the forward pytree.

    Thin wrapper over :func:`ai00_server_tpu.loader.stack_params` — the test
    fixtures and the production loader share one stacking path.
    """
    from .loader import stack_params

    return stack_params(info, raw, dtype=dtype, group_sizes=group_sizes,
                        quant=quant)


def make_tiny_model(version=ModelVersion.V7, seed=0, dtype=np.float32, **kw):
    info = tiny_info(version, **kw)
    raw = make_raw_weights(info, seed=seed)
    params = make_params(info, raw, dtype=dtype)
    return info, raw, params
