"""File management endpoints' logic (reference: crates/ai00-server/src/api/
file.rs): directory listing with safetensors header introspection and
sampled SHA-256, model listing, zip extraction, config round-trip."""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zipfile

# Permitted path roots (file.rs:19-24).
PERMITTED = ["assets", "assets/www", "assets/models", "assets/configs"]


def sampled_sha(path: str) -> str:
    """SHA-256 of the file; for files >10MB, hash the first MB of each
    decile instead of the whole file (file.rs:30-53)."""
    size = os.path.getsize(path)
    h = hashlib.sha256()
    meg = 1 << 20
    with open(path, "rb") as f:
        if size <= 10 * meg:
            while chunk := f.read(meg):
                h.update(chunk)
        else:
            stride = size // 10
            for i in range(10):
                f.seek(i * stride)
                h.update(f.read(meg))
    return h.hexdigest()


def safetensors_header(path: str) -> dict | None:
    """Read the safetensors JSON header without loading tensors
    (file.rs:91-135 introspection)."""
    try:
        with open(path, "rb") as f:
            (n,) = struct.unpack("<Q", f.read(8))
            if n > 100 * (1 << 20):
                return None
            return json.loads(f.read(n))
    except Exception:
        return None


def list_dir(path: str, with_hash: bool = False) -> list[dict]:
    """Directory entries with size/sha/safetensors info."""
    out = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        entry = {
            "name": name,
            "is_dir": os.path.isdir(full),
            "size": 0 if os.path.isdir(full) else os.path.getsize(full),
        }
        if not entry["is_dir"]:
            if with_hash:
                entry["sha"] = sampled_sha(full)
            if name.endswith((".st", ".safetensors", ".state")):
                header = safetensors_header(full)
                if header is not None:
                    meta = header.pop("__metadata__", None)
                    entry["info"] = {
                        "num_tensors": len(header),
                        "metadata": meta,
                    }
        out.append(entry)
    return out


def list_models(model_dir: str) -> list[dict]:
    """Model files under the model dir (file.rs:167-183)."""
    out = []
    if not os.path.isdir(model_dir):
        return out
    for root, _dirs, names in os.walk(model_dir):
        for name in sorted(names):
            if not name.endswith((".st", ".safetensors", ".prefab", ".pth")):
                continue
            full = os.path.join(root, name)
            out.append({
                "name": os.path.relpath(full, model_dir),
                "size": os.path.getsize(full),
                "sha": sampled_sha(full),
            })
    return out


def unzip(source: str, target_dir: str) -> None:
    """Extract a zip under a target dir (file.rs:186-218), preventing
    path traversal."""
    os.makedirs(target_dir, exist_ok=True)
    with zipfile.ZipFile(source) as z:
        for member in z.namelist():
            dest = os.path.realpath(os.path.join(target_dir, member))
            if not dest.startswith(os.path.realpath(target_dir)):
                raise PermissionError(f"zip member escapes target: {member}")
        z.extractall(target_dir)
