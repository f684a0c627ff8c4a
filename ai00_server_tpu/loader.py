"""Checkpoint loading: safetensors / .pth -> math-layout weights -> params.

Replaces the reference's loading stack natively:

* ``.pth`` -> ``.st`` conversion semantics of crates/converter/src/main.rs
  (RENAME/TRANSPOSE tables) and assets/scripts/convert_safetensors.py
  (version sniffing, v5.1 ``time_decay``/``time_faaaa`` repeat, fp16 cast,
  lowercased keys) — implemented in :func:`convert_pth`.
* web-rwkv's ``Loader`` (model build path consumed at
  crates/ai00-core/src/lib.rs:449-515): reading a converted ``.st``,
  deriving ``ModelInfo``, blending LoRA deltas, extracting an embedded
  ``time_state`` initial state.

Internal canonical form is the **math layout**: every linear weight is
``(in, out)`` so the forward pass is ``x @ W``; converted files store the
torch convention ``(out, in)`` plus a table of already-transposed low-rank
weights, and :func:`to_math_layout` undoes both.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .models.info import ModelInfo, ModelVersion, detect_info

# Keys (substring match, per the reference converter) that the converter
# stores transposed relative to the torch parameter. assets/scripts/
# convert_safetensors.py:104-108.
CONVERT_TRANSPOSED = (
    "time_mix_w1", "time_mix_w2", "time_decay_w1", "time_decay_w2",
    ".att.w1", ".att.w2", ".att.a1", ".att.a2", ".att.g1", ".att.g2",
    ".att.v1", ".att.v2", "time_state", "lora.0",
)

RENAME = (
    ("time_faaaa", "time_first"),
    ("time_maa", "time_mix"),
    ("lora_A", "lora.0"),
    ("lora_B", "lora.1"),
)


def _is_convert_transposed(key: str) -> bool:
    return any(t in key for t in CONVERT_TRANSPOSED)


def to_host_chunked(x, max_bytes: int = 128 << 20) -> np.ndarray:
    """Device array -> host numpy in <=``max_bytes`` slices over the
    leading axis.

    A single >~0.5 GB device->host transfer through the axon tunnel is
    both slow (537 MB bf16 head: 84 s monolithic vs 26 s in 128 MB
    slices, measured r5) and can CRASH the remote TPU worker outright —
    the r4/r5 `7b_nf4` bench group died inside ``np.asarray(head)``
    with "TPU worker process crashed".  Smaller per-request DMAs are the
    tunnel's robust path; going too small (16 MB) triples the time on
    per-request overhead, so 128 MB is the default.  Host arrays and
    arrays that fit one chunk pass straight through.
    """
    nbytes = getattr(x, "nbytes", 0)
    if isinstance(x, np.ndarray) or x is None or nbytes <= max_bytes \
            or getattr(x, "ndim", 0) == 0:
        return np.asarray(x)
    n = x.shape[0]
    rows = max(1, int(n * max_bytes // nbytes))
    parts = [np.asarray(x[i:i + rows]) for i in range(0, n, rows)]
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Raw readers
# ---------------------------------------------------------------------------


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors file into float32 numpy arrays (bf16/f16 upcast)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            t = f.get_tensor(key)
            if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                t = t.astype(np.float32)
            out[key] = t
    return out


def save_safetensors(tensors: dict[str, np.ndarray], path: str,
                     dtype=np.float16) -> None:
    from safetensors.numpy import save_file

    # NB: save_file serializes the raw buffer; non-C-contiguous views (e.g.
    # transposes) must be materialized in C order first.
    cast = {
        k: np.ascontiguousarray(
            v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
        )
        for k, v in tensors.items()
    }
    save_file(cast, path, metadata={"format": "pt"})


def convert_pth(path: str) -> dict[str, np.ndarray]:
    """Convert a raw RWKV ``.pth`` to the converted-key layout in memory.

    Mirrors assets/scripts/convert_safetensors.py: rename tables, lowercase,
    transpose list, and the v5.1 repeat of ``time_decay``/``time_first``.
    """
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in loaded:
        loaded = loaded["state_dict"]

    keys = list(loaded.keys())
    version = 4.0
    for x in keys:
        if "ln_x" in x:
            version = max(5.0, version)
        if "gate.weight" in x:
            version = max(5.1, version)
        if int(version) == 5 and "att.time_decay" in x:
            if loaded[x].dim() > 1 and loaded[x].shape[1] > 1:
                version = max(5.2, version)
        if "time_maa" in x:
            version = max(6.0, version)
        if ".att.w0" in x or "att.r_k" in x:
            version = max(7.0, version)

    if version == 5.1:
        _, n_emb = loaded["emb.weight"].shape
        for k in keys:
            if "time_decay" in k or "time_faaaa" in k:
                loaded[k] = (
                    loaded[k].unsqueeze(1).repeat(1, n_emb // loaded[k].shape[0])
                )

    out = {}
    for k in keys:
        new_k = k
        for a, b in RENAME:
            new_k = new_k.replace(a, b)
        new_k = new_k.lower()
        v = loaded[k].float()
        if _is_convert_transposed(new_k) and v.dim() >= 2:
            v = v.transpose(v.dim() - 2, v.dim() - 1)
        out[new_k] = np.ascontiguousarray(v.numpy())
    return out


def read_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read either a converted ``.st`` or a raw ``.pth`` checkpoint."""
    if path.endswith(".pth") or path.endswith(".pt"):
        return convert_pth(path)
    return load_safetensors(path)


# ---------------------------------------------------------------------------
# Math-layout orientation
# ---------------------------------------------------------------------------


def to_math_layout(raw: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Converted-file layout -> math layout.

    * ``*.weight`` 2-D tensors (torch ``(out, in)``) -> ``(in, out)``.
    * Converter-transposed low-rank weights -> back to the torch parameter
      orientation, which for these is already the math orientation
      (``x @ w1``, ``h @ w2``); ``time_mix_w2`` becomes ``(5, D, C)``.
    * ``(1, 1, C)``-shaped modulation vectors -> ``(C,)``.
    * v7 ``a0/w0/v0/...`` scalars kept as vectors.
    """
    out = {}
    for k, v in raw.items():
        if _is_convert_transposed(k) and v.ndim >= 2:
            v = np.swapaxes(v, -1, -2)
        elif k.endswith(".weight") and v.ndim == 2 and k != "emb.weight":
            v = v.T
        v = np.ascontiguousarray(np.squeeze(v)) if v.ndim == 3 and v.shape[0] == 1 else v
        if v.ndim == 2 and 1 in v.shape and not k.endswith(".weight") \
                and "w1" not in k and "w2" not in k and "time_first" not in k \
                and "time_decay" not in k and "r_k" not in k and "time_state" not in k:
            v = v.reshape(-1)
        out[k] = np.ascontiguousarray(v)
    # time_mix_w2 arrives as (5, D, C) after the swap above when stored
    # (5, C, D); nothing else to do.
    return out


def apply_lora(math: dict[str, np.ndarray], lora_raw: dict[str, np.ndarray],
               alpha: float) -> None:
    """Blend LoRA deltas into math-layout weights in place.

    Converted LoRA files carry ``<name>.weight.lora.0`` (torch ``lora_A``
    ``(rank, in)``, stored transposed by the converter) and
    ``<name>.weight.lora.1`` (torch ``lora_B`` ``(out, rank)``, stored
    as-is).  The torch-layout delta is ``B @ A`` ``(out, in)``; in math
    layout that is ``A^T @ B^T``.  Blend: ``W += alpha/rank * A^T @ B^T``
    (the reference's ``LoraBlend::full(alpha)``,
    crates/ai00-core/src/lib.rs:466-485).
    """
    lora = to_math_layout(lora_raw)  # lora.0 back to torch (rank, in)
    pairs = {}
    for k in lora:
        if k.endswith(".lora.0"):
            base = k[: -len(".lora.0")]
            if base + ".lora.1" in lora:
                pairs[base] = (lora[k], lora[base + ".lora.1"])
    for base, (a, b) in pairs.items():
        if base not in math:
            continue
        rank = a.shape[0]
        delta = (a.T @ b.T) * (alpha / rank)
        math[base] = (math[base].astype(np.float32) + delta).astype(
            math[base].dtype
        )


def extract_time_state(raw: dict[str, np.ndarray], info: ModelInfo):
    """Embedded initial state from a state-tuned checkpoint.

    ``blocks.N.att.time_state`` is stored transposed by the converter; in
    math layout it is ``(H, N, N)`` per layer.  Returns ``(L, H, N, N)``
    (k-major for v5/v6, matching the in-model ``(k, v)`` layout; v7 uses
    ``(v, k)`` and the caller transposes) or None.
    """
    states = []
    for i in range(info.num_layer):
        k = f"blocks.{i}.att.time_state"
        if k not in raw:
            return None
        v = raw[k]
        if _is_convert_transposed(k):
            v = np.swapaxes(v, -1, -2)
        states.append(v.reshape(info.num_head, info.head_size, info.head_size))
    return np.stack(states)


# ---------------------------------------------------------------------------
# Param stacking (shared with testing.make_params)
# ---------------------------------------------------------------------------


@dataclass
class LoadedModel:
    info: ModelInfo
    params: dict                       # forward pytree
    init_wkv: np.ndarray | None = None  # embedded time_state, or None
    # {dotted path under params: original 4-bit mode} for leaves the
    # engine converted to int8 SURROGATE codes for decode speed
    # (ops/quant.use_int8_surrogate); prefab export repacks them.
    surrogate_modes: dict | None = None
    # Host-RAM originals of top-level params the engine replaced with a
    # derived ("_"-prefixed) device form — e.g. the lossless bf16 LM
    # head when decode runs through "_head_q".  Prefab export merges
    # these back so nothing lossy is ever baked into a saved prefab.
    host_params: dict | None = None


def load_model(
    path: str,
    dtype=None,
    loras: list[tuple[str, float]] | None = None,
    group_sizes: list[int] | None = None,
    quant: dict | None = None,
) -> LoadedModel:
    """Full load path: read -> orient -> LoRA -> stack.

    ``quant``: {layer_index: "int8"|"nf4"|"sf4"} per-layer quantization map
    (reference semantics: Quant enum per layer count, lib.rs:465).
    """
    import jax.numpy as jnp

    raw = read_checkpoint(path)
    info = detect_info({k: v.shape for k, v in raw.items()})
    math = to_math_layout(raw)
    for lora_path, alpha in loras or []:
        apply_lora(math, read_checkpoint(lora_path), alpha)
    if dtype is None:
        dtype = jnp.bfloat16
    params = stack_params(info, math, dtype=dtype, group_sizes=group_sizes,
                          quant=quant)
    init_wkv = extract_time_state(raw, info)
    return LoadedModel(info=info, params=params, init_wkv=init_wkv)


def stack_params(info: ModelInfo, math: dict[str, np.ndarray], dtype=None,
                 group_sizes: list[int] | None = None,
                 quant: dict | None = None):
    """Stack math-layout weights into the layer-grouped forward pytree.

    Layers are grouped into contiguous runs (each folded with ``lax.scan``
    over the layer axis).  When ``quant`` is given, group boundaries are
    chosen so every layer in a group shares a quantization mode; quantized
    linear weights are replaced by ``ops.quant`` pytrees.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    C = info.num_emb
    L = info.num_layer
    ver = info.version

    quant = quant or {}
    modes = [quant.get(i, "none") for i in range(L)]
    if group_sizes is None:
        group_sizes = []
        run = 1
        for i in range(1, L):
            if modes[i] == modes[i - 1]:
                run += 1
            else:
                group_sizes.append(run)
                run = 1
        group_sizes.append(run)
    assert sum(group_sizes) == L

    # Fold ln0 into the embedding table (per-row layernorm, done once).
    emb = math["emb.weight"].astype(np.float64)
    mean = emb.mean(-1, keepdims=True)
    var = emb.var(-1, keepdims=True)
    emb = (emb - mean) / np.sqrt(var + 1e-5)
    emb = emb * math["blocks.0.ln0.weight"] + math["blocks.0.ln0.bias"]

    def get(key):
        return math[key]

    def layer_dict(i):
        b = f"blocks.{i}."
        a = b + "att."
        f = b + "ffn."
        d = {
            "ln1_w": get(b + "ln1.weight"), "ln1_b": get(b + "ln1.bias"),
            "ln2_w": get(b + "ln2.weight"), "ln2_b": get(b + "ln2.bias"),
        }
        if ver == ModelVersion.V7:
            att = {k: get(a + k) for k in (
                "x_r", "x_w", "x_k", "x_v", "x_a", "x_g",
                "w0", "w1", "w2", "a0", "a1", "a2", "g1", "g2",
                "k_k", "k_a", "r_k")}
            if a + "v0" in math:
                att.update({k: get(a + k) for k in ("v0", "v1", "v2")})
            else:
                D = att["a1"].shape[-1]
                att.update({"v0": np.zeros(C, np.float32),
                            "v1": np.zeros((C, D), np.float32),
                            "v2": np.zeros((D, C), np.float32)})
            att.update({
                "receptance": get(a + "receptance.weight"),
                "key": get(a + "key.weight"),
                "value": get(a + "value.weight"),
                "output": get(a + "output.weight"),
                "ln_x_w": get(a + "ln_x.weight"),
                "ln_x_b": get(a + "ln_x.bias"),
            })
            ffn = {
                "x_k": get(f + "x_k"),
                "key": get(f + "key.weight"),
                "value": get(f + "value.weight"),
            }
        elif ver == ModelVersion.V6:
            att = {
                "mix_x": get(a + "time_mix_x"),
                "mix_w": get(a + "time_mix_w"),
                "mix_k": get(a + "time_mix_k"),
                "mix_v": get(a + "time_mix_v"),
                "mix_r": get(a + "time_mix_r"),
                "mix_g": get(a + "time_mix_g"),
                "mix_w1": get(a + "time_mix_w1"),
                "mix_w2": get(a + "time_mix_w2"),
                "decay": get(a + "time_decay").reshape(-1),
                "decay_w1": get(a + "time_decay_w1"),
                "decay_w2": get(a + "time_decay_w2"),
                "first": get(a + "time_first").reshape(
                    info.num_head, info.head_size),
                "receptance": get(a + "receptance.weight"),
                "key": get(a + "key.weight"),
                "value": get(a + "value.weight"),
                "gate": get(a + "gate.weight"),
                "output": get(a + "output.weight"),
                "ln_x_w": get(a + "ln_x.weight"),
                "ln_x_b": get(a + "ln_x.bias"),
            }
            ffn = {
                "mix_k": get(f + "time_mix_k"),
                "mix_r": get(f + "time_mix_r"),
                "key": get(f + "key.weight"),
                "receptance": get(f + "receptance.weight"),
                "value": get(f + "value.weight"),
            }
        elif ver == ModelVersion.V5:
            att = {
                "time_mix_k": get(a + "time_mix_k"),
                "time_mix_v": get(a + "time_mix_v"),
                "time_mix_r": get(a + "time_mix_r"),
                "time_mix_g": get(a + "time_mix_g"),
                "time_decay": get(a + "time_decay").reshape(
                    info.num_head, info.head_size),
                "time_first": get(a + "time_first").reshape(
                    info.num_head, info.head_size),
                "receptance": get(a + "receptance.weight"),
                "key": get(a + "key.weight"),
                "value": get(a + "value.weight"),
                "gate": get(a + "gate.weight"),
                "output": get(a + "output.weight"),
                "ln_x_w": get(a + "ln_x.weight"),
                "ln_x_b": get(a + "ln_x.bias"),
            }
            ffn = {
                "time_mix_k": get(f + "time_mix_k"),
                "time_mix_r": get(f + "time_mix_r"),
                "key": get(f + "key.weight"),
                "receptance": get(f + "receptance.weight"),
                "value": get(f + "value.weight"),
            }
        else:  # V4
            att = {
                "time_mix_k": get(a + "time_mix_k"),
                "time_mix_v": get(a + "time_mix_v"),
                "time_mix_r": get(a + "time_mix_r"),
                "time_decay": get(a + "time_decay").reshape(-1),
                "time_first": get(a + "time_first").reshape(-1),
                "receptance": get(a + "receptance.weight"),
                "key": get(a + "key.weight"),
                "value": get(a + "value.weight"),
                "output": get(a + "output.weight"),
            }
            ffn = {
                "time_mix_k": get(f + "time_mix_k"),
                "time_mix_r": get(f + "time_mix_r"),
                "key": get(f + "key.weight"),
                "receptance": get(f + "receptance.weight"),
                "value": get(f + "value.weight"),
            }
        d["att"] = att
        d["ffn"] = ffn
        return d

    layers = [layer_dict(i) for i in range(L)]

    groups = []
    offset = 0
    for size in group_sizes:
        chunk = layers[offset: offset + size]
        # Stack on the HOST; quantize before anything reaches the device —
        # staging full-precision weights in HBM first OOMs large models.
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *chunk)
        mode = modes[offset]
        if mode != "none":
            from .ops import quant as quant_ops

            stacked = quant_ops.quantize_group(stacked, mode)
        stacked = jax.tree.map(
            lambda x: (jnp.asarray(x).astype(dtype)
                       if isinstance(x, np.ndarray) else x),
            stacked,
            is_leaf=lambda x: not isinstance(x, dict),
        )
        groups.append({
            "layer_index": jnp.arange(offset, offset + size, dtype=jnp.int32),
            "layers": stacked,
        })
        offset += size

    params = {
        "emb": jnp.asarray(emb).astype(dtype),
        "groups": groups,
        "ln_out_w": jnp.asarray(math["ln_out.weight"]).astype(dtype),
        "ln_out_b": jnp.asarray(math["ln_out.bias"]).astype(dtype),
        "head": jnp.asarray(math["head.weight"]).astype(dtype),
    }
    return params
