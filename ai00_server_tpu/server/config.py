"""Server config schema + TOML round-trip (reference: crates/ai00-server/
src/config.rs; canonical file assets/configs/Config.toml).

``Config`` mirrors the reference sections {model, lora, state, tokenizer,
bnf, adapter, listen, web, embed} and converts to a ``ReloadRequest`` with
the same path sandboxing (config.rs:30-77: model/LoRA/state paths must
live under the configured model directory; tokenizer under ``assets``).
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Any

from ..middleware import ReloadRequest


class PathNotPermitted(PermissionError):
    pass


def check_path_permitted(path: str, permitted: list[str]) -> None:
    """Reference main.rs:36-62: the canonical path must live under one of
    the permitted roots (relative to cwd)."""
    real = os.path.realpath(path)
    for root in permitted:
        if real.startswith(os.path.realpath(root) + os.sep) \
                or real == os.path.realpath(root):
            return
    raise PathNotPermitted(f"path {path!r} not in permitted dirs {permitted}")


@dataclass
class AppKey:
    app_id: str = "admin"
    secret_key: str = "ai00_is_good"


@dataclass
class ListenerOption:
    domain: str = "local"
    ip: str = "0.0.0.0"
    port: int = 65530
    acme: bool = False
    tls: bool = False
    force_pass: bool = True
    slot: str = "permisionkey"
    expire_sec: int = 86400
    app_keys: list[AppKey] = field(default_factory=lambda: [AppKey()])
    tls_cert: str = "assets/certs/cert.pem"
    tls_key: str = "assets/certs/key.pem"
    # ACME (RFC 8555 http-01, server/acme.py).  Empty directory selects
    # Let's Encrypt production; point at a staging/mock directory for
    # testing.  The reference's rustls-acme equivalent: main.rs:320-423.
    acme_directory: str = ""
    acme_contact: str = ""
    # HTTP/3 (QUIC) is NOT implemented (the reference serves it via
    # quinn, main.rs:343-358).  The key is accepted so migrated configs
    # parse; true draws an explicit startup warning and the server
    # serves HTTP/1.1 over TCP(+TLS) only.  docs/http3.md.
    quic: bool = False


@dataclass
class Config:
    model: dict = field(default_factory=dict)
    lora: list[dict] = field(default_factory=list)
    state: list[dict] = field(default_factory=list)
    tokenizer: dict = field(default_factory=dict)
    bnf: dict = field(default_factory=dict)
    adapter: Any = field(default_factory=dict)
    listen: ListenerOption = field(default_factory=ListenerOption)
    web: dict | None = None
    embed: dict | None = None

    @classmethod
    def from_toml(cls, path: str) -> "Config":
        with open(path, "rb") as f:
            raw = tomllib.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        c = cls()
        c.model = raw.get("model", {})
        c.lora = raw.get("lora", [])
        c.state = raw.get("state", [])
        c.tokenizer = raw.get("tokenizer", {})
        c.bnf = raw.get("bnf", {})
        c.adapter = raw.get("adapter", {"Auto": {}})
        c.web = raw.get("web")
        c.embed = raw.get("embed")
        lst = raw.get("listen", {})
        lo = ListenerOption()
        for k in ("domain", "ip", "port", "acme", "tls", "force_pass",
                  "slot", "expire_sec", "tls_cert", "tls_key",
                  "acme_directory", "acme_contact", "quic"):
            if k in lst:
                setattr(lo, k, lst[k])
        if "app_keys" in lst:
            lo.app_keys = [AppKey(k.get("app_id", ""), k.get("secret_key", ""))
                           for k in lst["app_keys"]]
        c.listen = lo
        return c

    def to_dict(self) -> dict:
        out: dict = {
            "model": self.model,
            "tokenizer": self.tokenizer,
            "bnf": self.bnf,
            "adapter": self.adapter,
            "listen": {
                "domain": self.listen.domain,
                "ip": self.listen.ip,
                "port": self.listen.port,
                "acme": self.listen.acme,
                "tls": self.listen.tls,
                "force_pass": self.listen.force_pass,
                "slot": self.listen.slot,
                "expire_sec": self.listen.expire_sec,
                "app_keys": [
                    {"app_id": k.app_id, "secret_key": k.secret_key}
                    for k in self.listen.app_keys
                ],
                "tls_cert": self.listen.tls_cert,
                "tls_key": self.listen.tls_key,
                "acme_directory": self.listen.acme_directory,
                "acme_contact": self.listen.acme_contact,
                "quic": self.listen.quic,
            },
        }
        if self.lora:
            out["lora"] = self.lora
        if self.state:
            out["state"] = self.state
        if self.web is not None:
            out["web"] = self.web
        if self.embed is not None:
            out["embed"] = self.embed
        return out

    def to_reload_request(self, sandbox: bool = True) -> ReloadRequest:
        """Config -> ReloadRequest with path sandboxing (config.rs:30-77)."""
        m = self.model
        model_dir = m.get("path", "assets/models")
        model_path = os.path.join(model_dir, m.get("name", ""))
        tokenizer_path = self.tokenizer.get(
            "path", "assets/tokenizer/rwkv_vocab_v20230424.json")
        if sandbox:
            check_path_permitted(model_path, [model_dir])
            for l in self.lora:
                check_path_permitted(
                    os.path.join(model_dir, l["path"])
                    if not os.path.isabs(l["path"]) else l["path"],
                    [model_dir])
            for s in self.state:
                check_path_permitted(
                    os.path.join(model_dir, s["path"])
                    if not os.path.isabs(s["path"]) else s["path"],
                    [model_dir])

        def in_dir(p):
            return p if os.path.isabs(p) or os.path.exists(p) \
                else os.path.join(model_dir, p)

        return ReloadRequest(
            model_path=model_path,
            lora=[{"path": in_dir(l["path"]),
                   "alpha": l.get("alpha", 1.0)} for l in self.lora],
            state=[{**s, "path": in_dir(s["path"])} for s in self.state],
            quant=int(m.get("quant", 0)),
            quant_type=m.get("quant_type", "Int8"),
            precision=m.get("precision", "Fp16"),
            token_chunk_size=int(m.get("token_chunk_size", 128)),
            max_batch=int(m.get("max_batch", 8)),
            tokenizer_path=tokenizer_path,
            bnf=self.bnf,
            adapter=self.adapter,
            decode_chunk_size=int(m.get("decode_chunk_size", 16)),
            # [model] mesh = [dp, tp]: multi-chip serving (TPU-native).
            mesh=[int(x) for x in m["mesh"]] if m.get("mesh") else None,
            prewarm=bool(m.get("prewarm", True)),
        )


# ---------------------------------------------------------------------------
# Minimal TOML writer (stdlib has no dumper); covers the config's shapes.
# ---------------------------------------------------------------------------


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') \
            .replace("\n", "\\n") + '"'
    if isinstance(v, list):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"cannot TOML-encode {type(v)}")


def dump_toml(data: dict) -> str:
    lines: list[str] = []

    def emit_table(name: str, tbl: dict, array: bool = False):
        header = f"[[{name}]]" if array else f"[{name}]"
        lines.append(header)
        subtables = []
        for k, v in tbl.items():
            if isinstance(v, dict):
                subtables.append((f"{name}.{k}", v, False))
            elif isinstance(v, list) and v and isinstance(v[0], dict):
                for item in v:
                    subtables.append((f"{name}.{k}", item, True))
            else:
                lines.append(f"{k} = {_toml_value(v)}")
        lines.append("")
        for sub_name, sub, arr in subtables:
            emit_table(sub_name, sub, arr)

    top_scalars = {k: v for k, v in data.items()
                   if not isinstance(v, (dict, list))}
    for k, v in top_scalars.items():
        lines.append(f"{k} = {_toml_value(v)}")
    if top_scalars:
        lines.append("")
    for k, v in data.items():
        if isinstance(v, dict):
            emit_table(k, v)
        elif isinstance(v, list) and v and isinstance(v[0], dict):
            for item in v:
                emit_table(k, item, array=True)
        elif isinstance(v, list) and not v:
            pass
    return "\n".join(lines)
