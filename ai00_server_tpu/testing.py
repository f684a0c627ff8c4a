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


def make_stacked_random_device(info: ModelInfo, seed=0, dtype=None,
                               quant: str | None = None):
    """Random stacked forward pytree generated ON THE ACCELERATOR.

    Produces the same structure/dtypes as ``loader.stack_params`` over
    :func:`make_raw_weights` (one layer group; ``quant`` applies one mode
    to every layer), but never materializes weights on the host: the
    bench host is single-core and memory-starved (~1.5M numpy RNG
    samples/s measured), so a 7B host-side build takes over an hour
    while the device build takes seconds.  Values are NOT bit-identical
    to the host path (different RNG); distributions and scales match.
    """
    import jax
    import jax.numpy as jnp

    from .ops.quant import QUANTIZERS_JAX

    if dtype is None:
        dtype = jnp.bfloat16
    C, V, F, L = info.num_emb, info.num_vocab, info.num_hidden, \
        info.num_layer
    H, N = info.num_head, info.head_size
    ver = info.version
    D = LORA_DIMS

    root = jax.random.PRNGKey(seed)
    counter = [0]

    def rand(*shape, scale=0.4, base=0.0, gen_dtype=None):
        counter[0] += 1
        k = jax.random.fold_in(root, counter[0])

        @jax.jit
        def gen(k):
            x = jax.random.normal(
                k, shape, gen_dtype or jnp.float32) * scale + base
            return x.astype(dtype)

        return gen(k)

    def big(*shape, scale=0.4):
        """A large linear weight: quantized on device when requested."""
        if not quant:
            return rand(*shape, scale=scale, gen_dtype=jnp.bfloat16)
        w = rand(*shape, scale=scale, gen_dtype=jnp.bfloat16)
        return QUANTIZERS_JAX[quant](w)

    def ln_pair():
        return (rand(L, C, scale=0.1, base=1.0), rand(L, C, scale=0.1))

    # Embedding with ln0 folded (per-row layernorm, matching stack_params).
    counter[0] += 1
    k_emb = jax.random.fold_in(root, counter[0])

    @jax.jit
    def gen_emb(k):
        ke, kw, kb = jax.random.split(k, 3)
        e = jax.random.normal(ke, (V, C), jnp.float32) * 0.4
        w0 = 1.0 + jax.random.normal(kw, (C,), jnp.float32) * 0.1
        b0 = jax.random.normal(kb, (C,), jnp.float32) * 0.1
        mean = e.mean(-1, keepdims=True)
        var = e.var(-1, keepdims=True)
        e = (e - mean) / jnp.sqrt(var + 1e-5) * w0 + b0
        return e.astype(dtype)

    emb = gen_emb(k_emb)

    d = {}
    d["ln1_w"], d["ln1_b"] = ln_pair()
    d["ln2_w"], d["ln2_b"] = ln_pair()

    if ver == ModelVersion.V7:
        att = {k: rand(L, C, scale=0.3)
               for k in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")}
        att["w0"] = rand(L, C, scale=0.5)
        att["w1"] = rand(L, C, D["w"])
        att["w2"] = rand(L, D["w"], C)
        att["a0"] = rand(L, C, scale=0.3)
        att["a1"] = rand(L, C, D["a"])
        att["a2"] = rand(L, D["a"], C)
        # v0/v1/v2 are zero for layer 0 (the first layer has no value
        # residual), matching stack_params' zeros for missing keys.
        mask = (jnp.arange(L) > 0).astype(jnp.float32)[:, None]
        att["v0"] = (rand(L, C, scale=0.3).astype(jnp.float32)
                     * mask).astype(dtype)
        att["v1"] = (rand(L, C, D["v"]).astype(jnp.float32)
                     * mask[..., None]).astype(dtype)
        att["v2"] = (rand(L, D["v"], C).astype(jnp.float32)
                     * mask[..., None]).astype(dtype)
        att["g1"] = rand(L, C, D["g"])
        att["g2"] = rand(L, D["g"], C)
        att["k_k"] = rand(L, C, scale=0.2, base=0.5)
        att["k_a"] = rand(L, C, scale=0.2, base=0.5)
        att["r_k"] = rand(L, H, N, scale=0.3)
        att["ln_x_w"], att["ln_x_b"] = ln_pair()
        for k in ("receptance", "key", "value", "output"):
            att[k] = big(L, C, C)
        ffn = {"x_k": rand(L, C, scale=0.3),
               "key": big(L, C, F), "value": big(L, F, C)}
    elif ver == ModelVersion.V6:
        att = {("mix_" + k): rand(L, C, scale=0.3)
               for k in ("x", "w", "k", "v", "r", "g")}
        att["mix_w1"] = rand(L, C, 5 * D["tm"])
        att["mix_w2"] = rand(L, 5, D["tm"], C)
        att["decay"] = rand(L, C, scale=0.5)
        att["decay_w1"] = rand(L, C, D["td"])
        att["decay_w2"] = rand(L, D["td"], C)
        att["first"] = rand(L, H, N, scale=0.5)
        att["ln_x_w"], att["ln_x_b"] = ln_pair()
        for k in ("receptance", "key", "value", "gate", "output"):
            att[k] = big(L, C, C)
        ffn = {"mix_k": rand(L, C, scale=0.3),
               "mix_r": rand(L, C, scale=0.3),
               "key": big(L, C, F), "receptance": big(L, C, C),
               "value": big(L, F, C)}
    elif ver == ModelVersion.V5:
        att = {("time_mix_" + k): rand(L, C, scale=0.2, base=0.5)
               for k in ("k", "v", "r", "g")}
        att["time_decay"] = rand(L, H, N, scale=0.5)
        att["time_first"] = rand(L, H, N, scale=0.5)
        att["ln_x_w"], att["ln_x_b"] = ln_pair()
        for k in ("receptance", "key", "value", "gate", "output"):
            att[k] = big(L, C, C)
        ffn = {"time_mix_k": rand(L, C, scale=0.2, base=0.5),
               "time_mix_r": rand(L, C, scale=0.2, base=0.5),
               "key": big(L, C, F), "receptance": big(L, C, C),
               "value": big(L, F, C)}
    else:  # V4
        att = {("time_mix_" + k): rand(L, C, scale=0.2, base=0.5)
               for k in ("k", "v", "r")}
        att["time_decay"] = rand(L, C, scale=0.5)
        att["time_first"] = rand(L, C, scale=0.5)
        for k in ("receptance", "key", "value", "output"):
            att[k] = big(L, C, C)
        ffn = {"time_mix_k": rand(L, C, scale=0.2, base=0.5),
               "time_mix_r": rand(L, C, scale=0.2, base=0.5),
               "key": big(L, C, F), "receptance": big(L, C, C),
               "value": big(L, F, C)}

    d["att"] = att
    d["ffn"] = ffn
    return {
        "emb": emb,
        "groups": [{
            "layer_index": jnp.arange(L, dtype=jnp.int32),
            "layers": d,
        }],
        "ln_out_w": rand(C, scale=0.1, base=1.0),
        "ln_out_b": rand(C, scale=0.1),
        "head": rand(C, V, gen_dtype=jnp.bfloat16),
    }
