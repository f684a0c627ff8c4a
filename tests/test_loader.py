"""Loader round-trip: math weights -> converted-file layout -> load_model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai00_server_tpu import loader
from ai00_server_tpu.models import ModelVersion, get_version_module
from ai00_server_tpu.testing import make_tiny_model


def to_converted_layout(math: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of loader.to_math_layout: store like the reference converter
    (torch ``(out, in)`` linears, transposed low-rank tables)."""
    out = {}
    for k, v in math.items():
        if loader._is_convert_transposed(k) and v.ndim >= 2:
            v = np.swapaxes(v, -1, -2)
        elif k.endswith(".weight") and v.ndim == 2 and k != "emb.weight":
            v = v.T
        out[k] = np.ascontiguousarray(v)
    return out


@pytest.mark.parametrize(
    "version", [ModelVersion.V4, ModelVersion.V5, ModelVersion.V6,
                ModelVersion.V7], ids=lambda v: v.value)
def test_roundtrip_matches_direct(tmp_path, version):
    info, raw, params_direct = make_tiny_model(version, seed=7,
                                               dtype=np.float32)
    conv = to_converted_layout(raw)
    path = str(tmp_path / "model.st")
    loader.save_safetensors(conv, path, dtype=np.float32)

    lm = loader.load_model(path, dtype=jnp.float32)
    assert lm.info.version == version
    assert lm.info.num_layer == info.num_layer
    assert lm.info.num_emb == info.num_emb
    assert lm.info.num_head == info.num_head
    assert lm.info.head_size == info.head_size

    m = get_version_module(version)
    tokens = jnp.asarray(np.arange(8, dtype=np.int32)[None] % info.num_vocab)
    lengths = jnp.array([8], jnp.int32)
    state = m.init_state(info, 1)
    h1, _ = jax.jit(m.forward)(params_direct, state, tokens, lengths)
    h2, _ = jax.jit(m.forward)(lm.params, state, tokens, lengths)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               atol=1e-5, rtol=1e-4)


def test_lora_blend(tmp_path):
    info, raw, _ = make_tiny_model(ModelVersion.V7, seed=8, dtype=np.float32)
    conv = to_converted_layout(raw)
    path = str(tmp_path / "model.st")
    loader.save_safetensors(conv, path, dtype=np.float32)

    # Torch-convention LoRA: lora_A (rank, in), lora_B (out, rank);
    # torch delta = B @ A; math-layout delta = A^T @ B^T.
    C = info.num_emb
    rank, alpha = 4, 16.0
    rng = np.random.default_rng(0)
    A = rng.standard_normal((rank, C)).astype(np.float32) * 0.1
    B = rng.standard_normal((C, rank)).astype(np.float32) * 0.1
    lora_path = str(tmp_path / "lora.st")
    # Converted layout: lora.0 stored transposed; lora.1 stored as-is.
    loader.save_safetensors({
        "blocks.0.att.receptance.weight.lora.0": A.T,
        "blocks.0.att.receptance.weight.lora.1": B,
    }, lora_path, dtype=np.float32)

    lm_base = loader.load_model(path, dtype=jnp.float32)
    lm_lora = loader.load_model(path, dtype=jnp.float32,
                                loras=[(lora_path, alpha)])

    w_base = np.asarray(
        lm_base.params["groups"][0]["layers"]["att"]["receptance"][0])
    w_lora = np.asarray(
        lm_lora.params["groups"][0]["layers"]["att"]["receptance"][0])
    want = w_base + (alpha / rank) * (A.T @ B.T)
    np.testing.assert_allclose(w_lora, want, atol=1e-4, rtol=1e-3)


def test_embedded_time_state(tmp_path):
    info, raw, _ = make_tiny_model(ModelVersion.V6, seed=9, dtype=np.float32)
    conv = to_converted_layout(raw)
    H, N = info.num_head, info.head_size
    rng = np.random.default_rng(1)
    ts = rng.standard_normal(
        (info.num_layer, H, N, N)).astype(np.float32)
    for i in range(info.num_layer):
        # Converter stores time_state transposed in the last two dims.
        conv[f"blocks.{i}.att.time_state"] = np.swapaxes(ts[i], -1, -2)
    path = str(tmp_path / "model.st")
    loader.save_safetensors(conv, path, dtype=np.float32)

    lm = loader.load_model(path, dtype=jnp.float32)
    assert lm.init_wkv is not None
    np.testing.assert_allclose(lm.init_wkv, ts, atol=1e-6)


def test_pth_conversion(tmp_path):
    torch = pytest.importorskip("torch")
    info, raw, params_direct = make_tiny_model(ModelVersion.V5, seed=10,
                                               dtype=np.float32)
    conv = to_converted_layout(raw)
    # Reconstruct a .pth in original torch naming (reverse renames; v5 has
    # time_faaaa for time_first).
    sd = {}
    for k, v in conv.items():
        orig = k.replace("time_first", "time_faaaa")
        # Undo the converter transpose for the keys it transposes.
        if loader._is_convert_transposed(k) and v.ndim >= 2:
            v = np.swapaxes(v, -1, -2)
        sd[orig] = torch.tensor(v)
    path = str(tmp_path / "model.pth")
    torch.save(sd, path)

    lm = loader.load_model(path, dtype=jnp.float32)
    assert lm.info.version == ModelVersion.V5
    m = get_version_module(ModelVersion.V5)
    tokens = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    state = m.init_state(info, 1)
    h1, _ = jax.jit(m.forward)(params_direct, state, tokens,
                               jnp.array([6], jnp.int32))
    h2, _ = jax.jit(m.forward)(lm.params, state, tokens,
                               jnp.array([6], jnp.int32))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               atol=1e-5, rtol=1e-4)


def test_to_host_chunked_matches_monolithic():
    """Chunked device->host transfer is bit-identical to np.asarray for
    multi-chunk, exactly-one-chunk, host-array, and 0-d inputs (the
    slicing exists because >0.5 GB single DMAs crash the tunnel worker,
    loader.to_host_chunked docstring)."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(37, 50)),
                    jnp.float32)
    whole = np.asarray(x)
    # rows-per-chunk = 37*200//7400 = 1 -> 37 slices.
    np.testing.assert_array_equal(
        loader.to_host_chunked(x, max_bytes=200), whole)
    # Forces the mid-size path: nbytes > max_bytes, several rows/chunk.
    np.testing.assert_array_equal(
        loader.to_host_chunked(x, max_bytes=2000), whole)
    # Fits one chunk / plain numpy / scalar pass through.
    np.testing.assert_array_equal(loader.to_host_chunked(x), whole)
    np.testing.assert_array_equal(loader.to_host_chunked(whole), whole)
    assert loader.to_host_chunked(jnp.float32(4.0), max_bytes=1) == 4.0
