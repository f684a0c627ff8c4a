"""Prefab export/import: serialized (possibly quantized) model pytrees.

Reference semantics (crates/ai00-core/src/lib.rs:131-154 ``ModelSerialize``
via cbor4ii, reload path lib.rs:517-553): a prefab bundles the quantized
weights + model info so a reload skips conversion and re-quantization.

Format here: a safetensors file whose keys are pytree paths, with a JSON
header in the metadata describing the tree skeleton, ModelInfo, the
original reload config, and dtype tags (bf16 stored as uint16 views —
safetensors' numpy framework has no bf16).
"""

from __future__ import annotations

import json

import numpy as np

from .loader import LoadedModel, to_host_chunked
from .models.info import ModelInfo, ModelVersion
from .ops.quant import QuantizedLinear

# v2: 4-bit weights use the split-half pack layout + integer decode table
# with the /127 folded into the stored scale (ops/quant.py) — v1 prefabs
# would dequantize wrong, so the magic rejects them.
PREFAB_MAGIC = "ai00-tpu-prefab-v2"


def _to_skeleton(obj, tensors: dict, path: str):
    import jax

    if isinstance(obj, dict):
        return {k: _to_skeleton(v, tensors, f"{path}/{k}")
                for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_skeleton(v, tensors, f"{path}/{i}")
                for i, v in enumerate(obj)]
    if isinstance(obj, QuantizedLinear):
        return {
            "__quant__": obj.mode,
            "shape": list(obj.shape),
            "q": _to_skeleton(to_host_chunked(obj.q), tensors,
                              f"{path}/q"),
            "scale": _to_skeleton(to_host_chunked(obj.scale), tensors,
                                  f"{path}/scale"),
        }
    arr = to_host_chunked(obj)
    key = f"t{len(tensors)}"
    if arr.dtype == np.dtype("bfloat16") or str(arr.dtype) == "bfloat16":
        tensors[key] = (arr.view(np.uint16), "bfloat16")
    else:
        tensors[key] = (arr, str(arr.dtype))
    return {"__tensor__": key}


def _from_skeleton(sk, tensors: dict):
    import jax.numpy as jnp
    import ml_dtypes

    if isinstance(sk, list):
        return [_from_skeleton(v, tensors) for v in sk]
    if isinstance(sk, dict):
        if "__tensor__" in sk:
            arr, dtype = tensors[sk["__tensor__"]]
            if dtype == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            return jnp.asarray(arr)
        if "__quant__" in sk:
            return QuantizedLinear(
                sk["__quant__"],
                _from_skeleton(sk["q"], tensors),
                _from_skeleton(sk["scale"], tensors),
                tuple(sk["shape"]),
            )
        return {k: _from_skeleton(v, tensors) for k, v in sk.items()}
    raise ValueError(f"bad skeleton node {sk!r}")


def save_prefab(path: str, model: LoadedModel, config: dict | None = None
                ) -> None:
    from safetensors.numpy import save_file

    tensors: dict = {}
    # Derived decode-layout caches (keys starting with "_") are rebuilt at
    # load; never serialize them.
    params = {k: v for k, v in model.params.items()
              if not k.startswith("_")}
    # Lossless host-side originals of params the engine moved to derived
    # device forms (e.g. bf16 "head" for "_head_q") go back in the
    # export, so a re-exported prefab is as good as the source file.
    for k, v in (model.host_params or {}).items():
        if k not in params:
            params[k] = v
    if model.surrogate_modes:
        # Leaves the engine converted to int8 SURROGATE codes for decode
        # (ops/quant.use_int8_surrogate) repack LOSSLESSLY to their
        # original 4-bit form: the prefab stays the compact format.
        from .ops.quant import repack_surrogate

        params = dict(params)
        for dotted, mode in model.surrogate_modes.items():
            keys = [int(k) if k.isdigit() else k for k in dotted.split(".")]
            node = params
            for k in keys[:-1]:
                nxt = node[k]
                # Copy containers along the path so the live pytree (and
                # its device arrays) stays untouched.
                nxt = list(nxt) if isinstance(nxt, list) else dict(nxt)
                node[k] = nxt
                node = nxt
            leaf = node[keys[-1]]
            node[keys[-1]] = repack_surrogate(
                to_host_chunked(leaf.q), to_host_chunked(leaf.scale),
                mode, leaf.shape)
    skeleton = _to_skeleton(params, tensors, "")
    if model.init_wkv is not None:
        skeleton_init = _to_skeleton(model.init_wkv, tensors, "/init")
    else:
        skeleton_init = None
    info = model.info
    meta = {
        "magic": PREFAB_MAGIC,
        "skeleton": skeleton,
        "init_wkv": skeleton_init,
        "info": {
            "version": info.version.value,
            "num_layer": info.num_layer,
            "num_emb": info.num_emb,
            "num_hidden": info.num_hidden,
            "num_vocab": info.num_vocab,
            "num_head": info.num_head,
            "head_size": info.head_size,
        },
        "dtypes": {k: d for k, (a, d) in tensors.items()},
        "config": config or {},
    }
    save_file({k: np.ascontiguousarray(a) for k, (a, d) in tensors.items()},
              path, metadata={"prefab": json.dumps(meta)})


def load_prefab(path: str) -> LoadedModel:
    from safetensors import safe_open

    # Reference prefabs (cbor4ii ModelSerialize, lib.rs:131-154) are a
    # different on-disk format tied to web-rwkv's GPU tensor layout; the
    # capability (skip re-quantization on reload) is equivalent but the
    # files don't interchange.  Detect one and say so instead of
    # surfacing a safetensors header error.
    with open(path, "rb") as fh:
        head = fh.read(9)
    if head[:1] in (b"\xa2", b"\xa3", b"\xa4", b"\xbf", b"\xd9"):
        raise ValueError(
            f"{path}: looks like a reference (web-rwkv cbor) prefab; "
            "those are not interchangeable with ai00-tpu prefabs. "
            "Re-export from the original .st/.pth with "
            "/admin/models/save.")

    with safe_open(path, framework="numpy") as f:
        meta = json.loads(f.metadata()["prefab"])
        if meta.get("magic") != PREFAB_MAGIC:
            raise ValueError(f"{path}: not an ai00-tpu prefab")
        dtypes = meta["dtypes"]
        tensors = {k: (f.get_tensor(k), dtypes[k]) for k in f.keys()}

    params = _from_skeleton(meta["skeleton"], tensors)
    init_wkv = None
    if meta.get("init_wkv") is not None:
        init_wkv = np.asarray(_from_skeleton(meta["init_wkv"], tensors))
    mi = meta["info"]
    info = ModelInfo(
        version=ModelVersion(mi["version"]),
        num_layer=mi["num_layer"],
        num_emb=mi["num_emb"],
        num_hidden=mi["num_hidden"],
        num_vocab=mi["num_vocab"],
        num_head=mi["num_head"],
        head_size=mi["head_size"],
    )
    return LoadedModel(info=info, params=params, init_wkv=init_wkv)
