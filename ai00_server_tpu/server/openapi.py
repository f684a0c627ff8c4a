"""OpenAPI document + Swagger UI page (reference: OpenAPI/SwaggerUI at
/api-docs, crates/ai00-server/src/main.rs:307-311)."""

from __future__ import annotations


def _op(summary, body=None, tags=None):
    op = {"summary": summary, "responses": {"200": {"description": "OK"}}}
    if body:
        op["requestBody"] = {"content": {"application/json": {
            "schema": body}}}
    if tags:
        op["tags"] = tags
    return op


_SAMPLER_SCHEMA = {
    "type": "object",
    "properties": {
        "type": {"type": "string", "enum": ["Nucleus", "Typical", "Mirostat"]},
        "top_p": {"type": "number", "default": 0.5},
        "top_k": {"type": "integer", "default": 128},
        "temperature": {"type": "number", "default": 1.0},
        "presence_penalty": {"type": "number", "default": 0.3},
        "frequency_penalty": {"type": "number", "default": 0.3},
        "penalty_decay": {"type": "number", "default": 0.99654026},
        "tau": {"type": "number"},
        "rate": {"type": "number"},
    },
}

_CHAT_BODY = {
    "type": "object",
    "properties": {
        "messages": {"type": "array", "items": {"type": "object",
                     "properties": {"role": {"type": "string"},
                                    "content": {"type": "string"}}}},
        "names": {"type": "object"},
        "template": {"type": "object", "properties": {
            "record": {"type": "string"}, "prefix": {"type": "string"},
            "sep": {"type": "string"}}},
        "state": {}, "max_tokens": {"type": "integer", "default": 256},
        "stop": {}, "stream": {"type": "boolean"},
        "bias": {"type": "object"}, "bnf_schema": {"type": "string"},
        "sampler": _SAMPLER_SCHEMA,
        "top_p": {"type": "number"}, "top_k": {"type": "integer"},
        "temperature": {"type": "number"},
    },
}

_COMPLETION_BODY = dict(_CHAT_BODY)
_COMPLETION_BODY = {
    "type": "object",
    "properties": {
        **{k: v for k, v in _CHAT_BODY["properties"].items()
           if k not in ("messages", "names", "template")},
        "prompt": {},
    },
}

OPENAPI_SPEC = {
    "openapi": "3.0.3",
    "info": {
        "title": "ai00_server_tpu",
        "description": "TPU-native OpenAI-compatible RWKV inference server",
        "version": "0.1.0",
    },
    "paths": {
        "/api/oai/chat/completions": {"post": _op(
            "Generate chat completions with context", _CHAT_BODY, ["oai"])},
        "/api/oai/completions": {"post": _op(
            "Generate text completions", _COMPLETION_BODY, ["oai"])},
        "/api/oai/chooses": {"post": _op(
            "Rank choices by perplexity", {
                "type": "object", "properties": {
                    "input": {}, "choices": {"type": "array",
                                             "items": {"type": "string"}},
                    "calibrate": {"type": "boolean"}, "state": {}}}, ["oai"])},
        "/api/oai/states": {"post": _op(
            "Extract the RWKV state for a text", {
                "type": "object",
                "properties": {"input": {}, "state": {}}}, ["oai"])},
        "/api/oai/embeddings": {"post": _op(
            "Model-derived sentence embeddings", {
                "type": "object",
                "properties": {"input": {}}}, ["oai"])},
        "/api/oai/models": {"get": _op("Current model id", tags=["oai"])},
        "/api/adapters": {"get": _op("List compute devices", tags=["api"])},
        "/api/models/info": {"get": _op("Runtime info", tags=["api"])},
        "/api/models/state": {"get": _op("SSE runtime info stream",
                                         tags=["api"])},
        "/api/models/list": {"get": _op("List model files", tags=["api"])},
        "/api/auth/exchange": {"post": _op(
            "Exchange app key for a JWT", {
                "type": "object", "properties": {
                    "app_id": {"type": "string"},
                    "app_secret": {"type": "string"}}}, ["api"])},
        "/admin/models/load": {"post": _op(
            "Load/reload a model (admin)", {
                "type": "object", "properties": {
                    "model_path": {"type": "string"},
                    "lora": {"type": "array"}, "state": {"type": "array"},
                    "quant": {"type": "integer"},
                    "quant_type": {"type": "string"},
                    "precision": {"type": "string"},
                    "token_chunk_size": {"type": "integer"},
                    "max_batch": {"type": "integer"},
                    "tokenizer_path": {"type": "string"}}}, ["admin"])},
        "/admin/models/unload": {"get": _op("Unload the model (admin)",
                                            tags=["admin"])},
        "/admin/models/save": {"post": _op(
            "Save a prefab (admin)", {"type": "object", "properties": {
                "path": {"type": "string"}}}, ["admin"])},
        "/admin/files/unzip": {"post": _op("Unzip an archive (admin)",
                                           tags=["admin"])},
        "/admin/files/dir": {"post": _op("List a directory (admin)",
                                         tags=["admin"])},
        "/admin/files/config/load": {"post": _op("Load a config (admin)",
                                                 tags=["admin"])},
        "/admin/files/config/save": {"post": _op("Save a config (admin)",
                                                 tags=["admin"])},
    },
}

SWAGGER_HTML = """<!DOCTYPE html>
<html>
<head><title>ai00_server_tpu API docs</title>
<meta charset="utf-8"/>
<link rel="stylesheet"
 href="https://unpkg.com/swagger-ui-dist@5/swagger-ui.css"/>
</head>
<body>
<div id="swagger-ui"></div>
<script src="https://unpkg.com/swagger-ui-dist@5/swagger-ui-bundle.js">
</script>
<script>
window.onload = () => SwaggerUIBundle({
  url: "/api-docs/openapi.json", dom_id: "#swagger-ui"});
</script>
</body>
</html>
"""
