"""Canonical flat state layout: pack/unpack between model state pytrees and
the row-matrix form used by the `/api/oai/states` endpoint, `.state` files
and the state registry.

Layout (mirrors the web-rwkv state tensor consumed by the reference at
crates/ai00-core/src/run.rs:984-989 via ``State::back``):

* v5/v6/v7: per layer ``head_size + 2`` rows of width ``num_emb``:
  row 0 = att token-shift, rows ``1..N+1`` = the WKV matrix (row ``r``,
  column ``h*N + c`` = ``S[h, r, c]`` with ``S`` in ``(k, v)`` orientation;
  v7's in-model ``(v, k)`` layout is transposed at the boundary), last row
  = ffn token-shift.
* v4: 5 rows per layer: att shift, aa, bb, pp, ffn shift.

Shape reported over the API: ``[num_layer, rows_per_layer, num_emb, 1]``.
"""

from __future__ import annotations

import numpy as np

from .info import ModelInfo, ModelVersion


def state_shape(info: ModelInfo) -> tuple[int, int, int, int]:
    return (info.num_layer, info.state_rows_per_layer, info.num_emb, 1)


def pack_state(info: ModelInfo, state, batch_index: int = 0) -> np.ndarray:
    """Model state pytree (host or device, leading (L, B, ...)) ->
    ``(L, rows, C)`` float32 array for one batch row."""
    L, rows, C, _ = state_shape(info)
    H, N = info.num_head, info.head_size
    out = np.zeros((L, rows, C), np.float32)
    b = batch_index
    att_x = np.asarray(state["att_x"], np.float32)
    ffn_x = np.asarray(state["ffn_x"], np.float32)
    if info.version == ModelVersion.V4:
        out[:, 0] = att_x[:, b]
        out[:, 1] = np.asarray(state["aa"], np.float32)[:, b]
        out[:, 2] = np.asarray(state["bb"], np.float32)[:, b]
        out[:, 3] = np.asarray(state["pp"], np.float32)[:, b]
        out[:, 4] = ffn_x[:, b]
        return out
    wkv = np.asarray(state["wkv"], np.float32)[:, b]  # (L, H, N, N)
    if info.version == ModelVersion.V7:
        wkv = np.swapaxes(wkv, -1, -2)  # (v,k) -> (k,v)
    # (L, H, N_k, N_v) -> rows r=k-dim, cols h*N + v-dim... NB: row r is the
    # first matrix axis; transpose heads beside each other on columns.
    out[:, 0] = att_x[:, b]
    out[:, 1: N + 1] = np.moveaxis(wkv, 2, 1).reshape(L, N, H * N)
    out[:, N + 1] = ffn_x[:, b]
    return out


def unpack_state(info: ModelInfo, flat: np.ndarray, dtype=np.float32):
    """``(L, rows, C)`` (or flat data + shape) -> batch-1 state pytree."""
    L, rows, C, _ = state_shape(info)
    flat = np.asarray(flat, np.float32).reshape(L, rows, C)
    H, N = info.num_head, info.head_size
    if info.version == ModelVersion.V4:
        return {
            "att_x": flat[:, 0][:, None].astype(dtype),
            "aa": flat[:, 1][:, None].astype(np.float32),
            "bb": flat[:, 2][:, None].astype(np.float32),
            "pp": flat[:, 3][:, None].astype(np.float32),
            "ffn_x": flat[:, 4][:, None].astype(dtype),
        }
    wkv = np.moveaxis(flat[:, 1: N + 1].reshape(L, N, H, N), 1, 2)  # (L,H,k,v)
    if info.version == ModelVersion.V7:
        wkv = np.swapaxes(wkv, -1, -2)  # (k,v) -> (v,k)
    return {
        "att_x": flat[:, 0][:, None].astype(dtype),
        "wkv": wkv[:, None].astype(dtype),
        "ffn_x": flat[:, N + 1][:, None].astype(dtype),
    }


def load_state_file(info: ModelInfo, path: str, dtype=np.float32):
    """Read a ``.state`` safetensors/pth file into a batch-1 state pytree.

    Accepts either per-layer ``blocks.N.att.time_state`` tensors (state-
    tuning checkpoints; only the WKV part, shifts zero) or a single packed
    ``state`` tensor in the canonical layout above.
    """
    from ..loader import read_checkpoint, _is_convert_transposed

    raw = read_checkpoint(path)
    if "state" in raw:
        return unpack_state(info, raw["state"], dtype)
    H, N = info.num_head, info.head_size
    wkvs = []
    for i in range(info.num_layer):
        for key in (f"blocks.{i}.att.time_state", f"blocks.{i}.time_state"):
            if key in raw:
                v = raw[key]
                if _is_convert_transposed(key):
                    v = np.swapaxes(v, -1, -2)
                wkvs.append(v.reshape(H, N, N))
                break
        else:
            raise ValueError(f"{path}: missing time_state for layer {i}")
    wkv = np.stack(wkvs)  # (L, H, N_k, N_v)
    if info.version == ModelVersion.V7:
        wkv = np.swapaxes(wkv, -1, -2)
    state = {
        "att_x": np.zeros((info.num_layer, 1, info.num_emb), dtype),
        "wkv": wkv[:, None].astype(dtype),
        "ffn_x": np.zeros((info.num_layer, 1, info.num_emb), dtype),
    }
    return state
