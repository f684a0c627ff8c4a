"""aiohttp application: the full HTTP API surface.

Route table mirrors the reference (crates/ai00-server/src/main.rs:245-320):

  POST /api/oai/[v1/]chat/completions   chat, stream + non-stream
  POST /api/oai/[v1/]completions        completions, stream + non-stream
  POST /api/oai/[v1/]chooses            perplexity ranking
  POST /api/oai/[v1/]states             raw state extraction
  POST /api/oai/[v1/]embeddings         model-derived embeddings (native)
  GET  /api/oai/[v1/]models             current model id
  GET  /api/adapters                    device list
  GET  /api/models/info                 RuntimeInfo
  GET  /api/models/state                SSE info stream
  GET  /api/models/list                 model files w/ sha + headers
  POST /api/auth/exchange               app key -> JWT
  POST /admin/models/load|save, GET /admin/models/unload   (JWT)
  POST /admin/files/unzip|dir|ls|config/load|config/save   (JWT)
  GET  /api-docs/openapi.json, /api-docs                    OpenAPI
"""

from __future__ import annotations

import asyncio
import functools
import json
import os
import re
import uuid as uuid_mod

import numpy as np
from aiohttp import web

from ..middleware import Middleware, ReloadRequest, MAX_TOKENS
from ..models import packing
from ..ops import sampling
from ..runtime import (FinishReason, GenerateKind, GenerateRequest,
                       SamplerSpec)
from . import auth as auth_mod
from . import files as files_mod
from .config import Config, check_path_permitted, dump_toml
from .openapi import SWAGGER_HTML, build_spec

_WS_RE = re.compile(r"\n(\s*\n)+")

ROLE_NAMES = {
    "system": "System", "user": "User", "assistant": "Assistant",
    "observation": "Observation", "tool": "Observation",
}


def _array(value) -> list:
    """Reference Array<T>: none | item | vec (types.rs:8-24)."""
    if value is None:
        return []
    if isinstance(value, list):
        return value
    return [value]


def _sampler_from_json(obj: dict | None, top_p=0.5, top_k=128,
                       temperature=1.0) -> SamplerSpec:
    """SamplerParams tagged union (oai/mod.rs:32-52) or the flat fields."""
    if obj is None:
        return SamplerSpec(kind=sampling.KIND_NUCLEUS, top_p=top_p,
                           top_k=top_k, temperature=temperature)
    typ = str(obj.get("type", "Nucleus")).lower()
    if typ == "mirostat":
        # Reference MirostatSampler::transform is a no-op (mirostat.rs):
        # no presence/frequency penalties for this sampler kind.
        return SamplerSpec(
            kind=sampling.KIND_MIROSTAT,
            miro_tau=float(obj.get("tau", 3.0)),
            miro_rate=float(obj.get("rate", obj.get("learning_rate", 0.1))),
            presence_penalty=0.0,
            frequency_penalty=0.0,
        )
    common = dict(
        top_k=int(obj.get("top_k", 128)),
        temperature=float(obj.get("temperature", 1.0)),
        presence_penalty=float(obj.get("presence_penalty", 0.3)),
        frequency_penalty=float(obj.get("frequency_penalty", 0.3)),
        penalty_decay=float(obj.get("penalty_decay", 0.99654026)),
    )
    if typ == "typical":
        return SamplerSpec(kind=sampling.KIND_TYPICAL,
                           top_p=float(obj.get("tau", 0.5)), **common)
    return SamplerSpec(kind=sampling.KIND_NUCLEUS,
                       top_p=float(obj.get("top_p", 0.5)), **common)


@web.middleware
async def cors_middleware(request: web.Request, handler):
    """Permissive CORS (reference: main.rs:245-249 allows any origin,
    GET/POST/DELETE, any headers)."""
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, DELETE"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    return resp


@web.middleware
async def bad_request_middleware(request: web.Request, handler):
    """Reject malformed request bodies with 400, like salvo's extractors
    (the reference returns 400 on schema/JSON parse failures; an aiohttp
    handler would otherwise surface them as a 500 traceback).

    Handlers set ``request["parsed"] = True`` once body extraction and
    request construction are done; parse-class exceptions after that
    point are genuine server bugs and propagate as 500s with a traceback
    instead of masquerading as client errors."""
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except (json.JSONDecodeError, UnicodeDecodeError, KeyError, TypeError,
            ValueError) as e:
        if request.get("parsed"):
            raise
        return web.json_response(
            {"error": f"bad request: {type(e).__name__}: {e}"}, status=400)


class Server:
    def __init__(self, config: Config):
        self.config = config
        self.middleware = Middleware()
        from ..retrieval_store import RetrievalStore

        self.retrieval = RetrievalStore()
        self.embedder = None  # optional [embed] sidecar (server/embed.py)
        self.app = web.Application(client_max_size=1 << 30,
                                   middlewares=[cors_middleware,
                                                bad_request_middleware])
        self._openapi_cache = None  # built from the route table on demand
        self._routes()

    # -- helpers -----------------------------------------------------------

    async def _env(self):
        """Poll until a model is loaded (reference request_info,
        api/mod.rs:17-45)."""
        for _ in range(6000):
            if self.middleware.env is not None:
                return self.middleware.env
            await asyncio.sleep(0.05)
        raise web.HTTPServiceUnavailable(text="no model loaded")

    def _model_name(self) -> str:
        env = self.middleware.env
        return env.reload.model_path if env else ""

    async def _resolve_state(self, env, state_field) -> str | None:
        """InputState: Key(uuid) | Value{data,shape} | File{path}
        (lib.rs:283-305)."""
        if state_field is None:
            return None
        rt = env.runtime
        if isinstance(state_field, str):
            sid = state_field
            if sid == str(uuid_mod.UUID(int=0)):
                return "default"
            return sid
        if isinstance(state_field, dict):
            sid = str(state_field.get("id") or uuid_mod.uuid4())
            if sid in rt.states:
                return sid
            if "data" in state_field:
                data = np.asarray(state_field["data"], np.float32)
                state = packing.unpack_state(env.model.info, data)
                rt.register_state(sid, state)
                return sid
            if "path" in state_field:
                model_dir = self.config.model.get("path", "assets/models")
                path = state_field["path"]
                if not os.path.isabs(path):
                    path = os.path.join(model_dir, path)
                check_path_permitted(path, [model_dir])
                loop = asyncio.get_event_loop()
                state = await loop.run_in_executor(
                    None, packing.load_state_file, env.model.info, path)
                rt.register_state(sid, state)
                return sid
        return None

    # -- routes ------------------------------------------------------------

    def _routes(self):
        r = self.app.router
        for p in ("/api/oai/chat/completions", "/api/oai/v1/chat/completions"):
            r.add_post(p, self.chat_completions)
        for p in ("/api/oai/completions", "/api/oai/v1/completions"):
            r.add_post(p, self.completions)
        for p in ("/api/oai/chooses", "/api/oai/v1/chooses"):
            r.add_post(p, self.chooses)
        for p in ("/api/oai/states", "/api/oai/v1/states"):
            r.add_post(p, self.states)
        for p in ("/api/oai/embeddings", "/api/oai/v1/embeddings"):
            r.add_post(p, self.embeddings)
        for p in ("/api/oai/embeds", "/api/oai/v1/embeds"):
            r.add_post(p, self.embeds)
        for p in ("/api/oai/models", "/api/oai/v1/models"):
            r.add_get(p, self.oai_models)
        r.add_get("/api/adapters", self.adapters)
        r.add_get("/api/models/info", self.models_info)
        r.add_get("/api/models/state", self.models_state_sse)
        r.add_get("/api/models/list", self.models_list)
        r.add_post("/api/auth/exchange", self.auth_exchange)
        r.add_post("/admin/models/load", self._admin(self.admin_load))
        r.add_get("/admin/models/unload", self._admin(self.admin_unload))
        r.add_post("/admin/models/save", self._admin(self.admin_save))
        r.add_post("/admin/files/unzip", self._admin(self.admin_unzip))
        r.add_post("/admin/files/dir", self._admin(self.admin_dir))
        r.add_post("/admin/files/ls", self._admin(self.admin_dir))
        r.add_post("/admin/files/config/load",
                   self._admin(self.admin_config_load))
        r.add_post("/admin/files/config/save",
                   self._admin(self.admin_config_save))
        r.add_get("/api/metrics", self.metrics)
        r.add_post("/admin/profile/start", self._admin(self.profile_start))
        r.add_post("/admin/profile/stop", self._admin(self.profile_stop))
        r.add_post("/api/retrieval/index", self.retrieval_index)
        r.add_post("/api/retrieval/add", self.retrieval_add)
        r.add_post("/api/retrieval/search", self.retrieval_search)
        r.add_post("/api/retrieval/build", self.retrieval_build)
        r.add_get("/api/retrieval/list", self.retrieval_list)
        r.add_post("/api/retrieval/drop", self.retrieval_drop)
        r.add_get("/api-docs/openapi.json", self.openapi_json)
        r.add_get("/api-docs", self.swagger)
        r.add_get("/api-docs/", self.swagger)
        r.add_get("/", self.webui)

    # -- auth ---------------------------------------------------------------

    def _admin(self, handler):
        @functools.wraps(handler)  # keep the docstring for the OpenAPI spec
        async def wrapped(request: web.Request):
            if not self.config.listen.force_pass:
                token = None
                h = request.headers.get("Authorization", "")
                if h.startswith("Bearer "):
                    token = h[7:]
                token = token or request.query.get("admin_token")
                claims = token and auth_mod.decode_jwt(
                    token, self.config.listen.slot)
                if not claims:
                    raise web.HTTPUnauthorized(text="invalid admin token")
            return await handler(request)
        return wrapped

    async def auth_exchange(self, request: web.Request):
        body = await request.json()
        app_id = body.get("app_id", "")
        app_secret = body.get("app_secret", "")
        for key in self.config.listen.app_keys:
            if key.app_id == app_id and key.secret_key == app_secret:
                token = auth_mod.make_token(
                    app_id, self.config.listen.slot,
                    self.config.listen.expire_sec)
                return web.json_response(
                    {"token": token, "code": 200, "message": "SUCCESS"})
        return web.json_response(
            {"token": None, "code": 403,
             "message": "NO-Match AppId and SecretKey"}, status=403)

    # -- OpenAI endpoints ----------------------------------------------------

    async def chat_completions(self, request: web.Request):
        body = await request.json()
        env = await self._env()

        messages = _array(body.get("messages"))
        names = body.get("names", {})
        template = body.get("template", {})
        record_tpl = template.get("record", "{role}: {content}")
        prefix_tpl = template.get("prefix", "{assistant}:")
        sep = template.get("sep", "\n\n")

        parts = []
        model_parts = []
        for m in messages:
            role_key = str(m.get("role", "user")).lower()
            role = names.get(role_key, ROLE_NAMES.get(role_key, "User"))
            content = _WS_RE.sub("\n", str(m.get("content", ""))).strip()
            parts.append(record_tpl.replace("{role}", role)
                         .replace("{content}", content))
            if role_key == "assistant":
                model_parts.append(str(m.get("content", "")))
        assistant = names.get("assistant", "Assistant")
        user = names.get("user", "User")
        prefix = prefix_tpl.replace("{assistant}", assistant) \
            .replace("{user}", user)

        # Retrieval-augmented chat (beyond the reference): embed the last
        # user turn, search a named index, prepend the hits as context.
        rag = body.get("retrieval")
        if rag and messages:
            last_user = next(
                (str(m.get("content", "")) for m in reversed(messages)
                 if str(m.get("role", "")).lower() == "user"), None)
            if last_user:
                q = await self._embed_texts(env, [last_user])
                _, _, texts = self.retrieval.search(
                    rag["index"], q, top_k=int(rag.get("top_k", 4)),
                    nprobe=int(rag.get("nprobe", 8)))
                docs = [t for t in texts[0] if t]
                if docs:
                    tpl = rag.get("template",
                                  "Relevant information:\n{documents}")
                    block = tpl.replace("{documents}", "\n".join(docs))
                    parts.insert(0, record_tpl
                                 .replace("{role}", names.get(
                                     "system", "System"))
                                 .replace("{content}", block))

        prompt = sep.join(parts) + sep + prefix

        req = GenerateRequest(
            prompt=prompt,
            model_text=sep.join(model_parts),
            max_tokens=min(int(body.get("max_tokens", 256)), MAX_TOKENS),
            stop=_array(body.get("stop", "\n\n")),
            bias={int(k): float(v) for k, v in
                  (body.get("bias") or body.get("logit_bias") or {}).items()},
            sampler=_sampler_from_json(
                body.get("sampler") or body.get("sampler_override"),
                top_p=float(body.get("top_p", 0.5)),
                top_k=int(body.get("top_k", 128)),
                temperature=float(body.get("temperature", 1.0))),
            bnf_schema=body.get("bnf_schema"),
            state_id=await self._resolve_state(env, body.get("state")),
        )
        request["parsed"] = True
        if body.get("stream", False):
            return await self._stream_response(
                request, env, req, "chat.completion.chunk",
                lambda first, text: {"delta": (
                    {"role": "Assistant"} if first == "role"
                    else {"content": text})})
        handle = await env.runtime.submit(req)
        text, reason, counter = await _collect_text(handle)
        return web.json_response({
            "object": "chat.completion",
            "model": self._model_name(),
            "choices": [{
                "message": {"role": "Assistant", "content": text.strip()},
                "index": 0,
                "finish_reason": reason.value,
            }],
            "usage": _usage(counter),
        })

    async def completions(self, request: web.Request):
        body = await request.json()
        env = await self._env()
        req = GenerateRequest(
            prompt="".join(_array(body.get("prompt"))),
            max_tokens=min(int(body.get("max_tokens", 256)), MAX_TOKENS),
            stop=_array(body.get("stop", "\n\n")),
            bias={int(k): float(v) for k, v in
                  (body.get("bias") or body.get("logit_bias") or {}).items()},
            sampler=_sampler_from_json(
                body.get("sampler") or body.get("sampler_override"),
                top_p=float(body.get("top_p", 0.5)),
                top_k=int(body.get("top_k", 128)),
                temperature=float(body.get("temperature", 1.0))),
            bnf_schema=body.get("bnf_schema"),
            state_id=await self._resolve_state(env, body.get("state")),
        )
        request["parsed"] = True
        if body.get("stream", False):
            return await self._stream_response(
                request, env, req, "text_completion",
                lambda first, text: {"text": text})
        handle = await env.runtime.submit(req)
        text, reason, counter = await _collect_text(handle)
        return web.json_response({
            "object": "text_completion",
            "model": self._model_name(),
            "choices": [{
                "text": text, "index": 0, "finish_reason": reason.value,
            }],
            "usage": _usage(counter),
        })

    async def _stream_response(self, request, env, req, object_name,
                               delta_fn):
        handle = await env.runtime.submit(req)
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        })
        await resp.prepare(request)

        def sse(payload: str) -> bytes:
            return f"data: {payload}\n\n".encode()

        model_name = self._model_name()
        first = True
        try:
            async for msg in handle:
                if msg[0] == "start" and object_name.startswith("chat"):
                    chunk = {"object": object_name, "model": model_name,
                             "choices": [{**delta_fn("role", ""),
                                          "index": 0,
                                          "finish_reason": None}]}
                    await resp.write(sse(json.dumps(chunk)))
                elif msg[0] == "content":
                    text = msg[1]
                    if first:
                        text = text.lstrip() if object_name.startswith(
                            "chat") else text
                        if not text:
                            continue
                        first = False
                    chunk = {"object": object_name, "model": model_name,
                             "choices": [{**delta_fn("content", text),
                                          "index": 0,
                                          "finish_reason": None}]}
                    await resp.write(sse(json.dumps(chunk)))
                elif msg[0] == "stop":
                    chunk = {"object": object_name, "model": model_name,
                             "choices": [{"index": 0,
                                          "finish_reason": msg[1].value}],
                             "usage": _usage(msg[2])}
                    await resp.write(sse(json.dumps(chunk)))
                elif msg[0] == "done":
                    await resp.write(sse("[DONE]"))
        except (ConnectionResetError, asyncio.CancelledError):
            handle.cancel()
            raise
        await resp.write_eof()
        return resp

    async def chooses(self, request: web.Request):
        body = await request.json()
        env = await self._env()
        choices = body.get("choices", [])
        req = GenerateRequest(
            prompt="".join(_array(body.get("input"))),
            max_tokens=1,
            kind=GenerateKind.CHOOSE,
            choices=choices,
            calibrate=bool(body.get("calibrate", False)),
            state_id=await self._resolve_state(env, body.get("state")),
        )
        request["parsed"] = True
        handle = await env.runtime.submit(req)
        ppls = None
        async for msg in handle:
            if msg[0] == "choose":
                ppls = msg[1]
        order = sorted(range(len(choices)), key=lambda i: ppls[i])
        data = [{
            "object": "choice",
            "index": i,
            "rank": rank,
            "choice": choices[i],
            "perplexity": ppls[i],
        } for rank, i in enumerate(order)]
        return web.json_response({
            "object": "list", "model": self._model_name(), "data": data,
        })

    async def states(self, request: web.Request):
        body = await request.json()
        env = await self._env()
        req = GenerateRequest(
            prompt="".join(_array(body.get("input"))),
            max_tokens=1,
            kind=GenerateKind.STATE,
            state_id=await self._resolve_state(env, body.get("state")),
        )
        request["parsed"] = True
        handle = await env.runtime.submit(req)
        state, counter = None, None
        async for msg in handle:
            if msg[0] == "embed":
                state = msg[1]
            elif msg[0] == "stop":
                counter = msg[2]
        if state is None:
            # Aborted before the state read (e.g. unload/drain race).
            return web.json_response(
                {"error": "state extraction aborted"}, status=500)
        flat = packing.pack_state(env.model.info, state)
        shape = packing.state_shape(env.model.info)
        return web.json_response({
            "object": "list",
            "model": self._model_name(),
            "data": [{
                "object": "states",
                "index": 0,
                "data": flat.reshape(-1).tolist(),
                "shape": list(shape),
            }],
            "usage": _usage(counter),
        })

    async def _embed_texts(self, env, texts: list[str],
                           state_id: str | None = None,
                           pooling: str | None = None) -> np.ndarray:
        """Model-derived sentence embeddings, L2-normalized.

        ``pooling="mean_hidden"`` (the default without a custom initial
        state): masked MEAN over all positions of the final hidden
        states (C dims) — measured retrieval-grade (recall@10 0.91 vs
        0.07 for final-state pooling on the real-prose eval,
        tools/eval_embed_quality.py / BASELINE.md), read from the
        hidden sums the serving prefill itself accumulates (one forward
        per text, batched across slots).  ``pooling="state"`` (the
        default WITH a custom ``state`` id): pooled full-state readout
        (3C dims: [mean att_x | mean ffn_x | wkv uniform-query
        readout], each part unit-normalized) — the readout that
        reflects a custom state's influence.  The two are mutually
        incomparable; the endpoint echoes which one it used.
        (Reference: the states endpoint returns the raw full state,
        run.rs:984-989; the embeddings endpoint is this build's native
        replacement for the retired RWKV-layer-embeddings API.)"""
        handles = []
        for text in texts:
            req = GenerateRequest(prompt=str(text), max_tokens=1,
                                  kind=GenerateKind.STATE,
                                  state_id=state_id, pooled=True,
                                  pooling=pooling)
            handles.append(await env.runtime.submit(req))
        vecs = []
        for handle in handles:
            vec = state = None
            async for msg in handle:
                if msg[0] == "embed_vec":
                    vec = np.asarray(msg[1], np.float32)
                elif msg[0] == "embed":
                    state = msg[1]
            if vec is None and state is not None:
                # Host-side fallback (same math as the device readout).
                parts = []
                att = np.asarray(state["att_x"], np.float32)  # (L, 1, C)
                ffn = np.asarray(state["ffn_x"], np.float32)
                parts.append(att.mean(axis=(0, 1)))
                parts.append(ffn.mean(axis=(0, 1)))
                if "wkv" in state:
                    wkv = np.asarray(state["wkv"], np.float32)  # (L,H,N,N)
                    parts.append(wkv.sum(axis=-1).mean(axis=0).reshape(-1))
                vec = np.concatenate([
                    p / max(float(np.linalg.norm(p)), 1e-12)
                    for p in parts])
                vec = vec / max(float(np.linalg.norm(vec)), 1e-12)
            if vec is None:
                raise RuntimeError("embedding aborted before state read")
            vecs.append(vec)
        return np.stack(vecs)

    async def embeddings(self, request: web.Request):
        body = await request.json()
        env = await self._env()
        inputs = [str(t) for t in _array(body.get("input"))]
        # Resolve the state BEFORE flipping parsed so a malformed
        # ``state`` field maps to a 400 like chat/completions, not a 500.
        state_id = await self._resolve_state(env, body.get("state"))
        pooling = body.get("pooling")
        if pooling is not None and pooling not in ("mean_hidden", "state"):
            return web.json_response(
                {"error": "pooling must be 'mean_hidden' (C dims) or "
                          "'state' (3C dims)"}, status=400)
        request["parsed"] = True
        vecs = await self._embed_texts(env, inputs, state_id=state_id,
                                       pooling=pooling)
        data = [{"object": "embedding", "index": i, "embedding": v.tolist()}
                for i, v in enumerate(vecs)]
        return web.json_response({
            "object": "list", "model": self._model_name(), "data": data,
            # Vectors from the two poolings are NOT comparable; echo
            # which one (and its dimensionality) this response used.
            "pooling": pooling or ("state" if state_id else "mean_hidden"),
            "dimensions": int(vecs.shape[-1]) if len(data) else 0,
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
        })

    async def embeds(self, request: web.Request):
        """External embedding sidecar endpoint (reference embed.rs:52-100):
        chunk the input by token budget, embed each chunk.  Requires the
        `[embed]` model (400 otherwise, like the reference)."""
        body = await request.json()
        if self.embedder is None:
            return web.json_response(
                {"error": "no [embed] model configured"}, status=400)
        text = str(body.get("input") or "")
        if not text:
            return web.json_response({"error": "empty input"}, status=400)
        max_tokens = int(body.get("max_tokens", 510))
        prefix = str(body.get("prefix", "query:"))
        emb = self.embedder
        loop = asyncio.get_event_loop()

        def work():
            chunks = emb.split_chunks(text, max_tokens)
            out = []
            for chunk in chunks:
                vec = emb.embed([prefix + chunk])
                out.append({"chunk": chunk, "embed": vec.tolist()})
            return out

        chunk_data = await loop.run_in_executor(None, work)
        return web.json_response({
            "object": "embeds", "model": emb.name,
            "data": [{"object": "embed", "index": 0, "chunks": chunk_data}],
        })

    # -- retrieval (RAG) ------------------------------------------------------

    async def retrieval_index(self, request: web.Request):
        body = await request.json()
        name = body["name"]
        texts = [str(t) for t in _array(body.get("texts"))]
        vectors = body.get("vectors")
        if vectors is not None:
            vecs = np.asarray(vectors, np.float32)
            self.retrieval.create(name, int(vecs.shape[-1]))
            self.retrieval.add(name, vecs, texts or None)
        elif texts:
            env = await self._env()
            vecs = await self._embed_texts(env, texts)
            self.retrieval.create(name, int(vecs.shape[-1]))
            self.retrieval.add(name, vecs, texts)
        else:
            self.retrieval.create(name, int(body.get("dim", 0)))
        if body.get("nlist"):
            loop = asyncio.get_event_loop()
            await loop.run_in_executor(
                None, self.retrieval.build_ivf, name, int(body["nlist"]))
        idx = self.retrieval.get(name)
        return web.json_response({"name": name, "size": idx.size,
                                  "dim": idx.dim})

    async def retrieval_add(self, request: web.Request):
        body = await request.json()
        name = body["name"]
        texts = [str(t) for t in _array(body.get("texts"))]
        if body.get("vectors") is not None:
            size = self.retrieval.add(
                name, np.asarray(body["vectors"], np.float32),
                texts or None)
        else:
            env = await self._env()
            vecs = await self._embed_texts(env, texts)
            size = self.retrieval.add(name, vecs, texts)
        return web.json_response({"name": name, "size": size})

    async def retrieval_build(self, request: web.Request):
        body = await request.json()
        loop = asyncio.get_event_loop()
        await loop.run_in_executor(
            None, lambda: self.retrieval.build_ivf(
                body["name"], int(body.get("nlist", 64)),
                int(body.get("iters", 10))))
        return web.json_response({"state": "built"})

    async def retrieval_search(self, request: web.Request):
        body = await request.json()
        name = body["name"]
        if body.get("vectors") is not None:
            q = np.asarray(body["vectors"], np.float32)
        else:
            env = await self._env()
            queries = [str(t) for t in
                       _array(body.get("query") or body.get("queries"))]
            q = await self._embed_texts(env, queries)
        loop = asyncio.get_event_loop()
        scores, ids, texts = await loop.run_in_executor(
            None, lambda: self.retrieval.search(
                name, q, top_k=int(body.get("top_k", 10)),
                nprobe=int(body.get("nprobe", 8)),
                exact=body.get("exact")))
        return web.json_response({
            "object": "list",
            "data": [{
                "index": qi,
                "hits": [{"id": int(i), "score": float(s), "text": t}
                         for i, s, t in zip(ids[qi], scores[qi], texts[qi])
                         if i >= 0],
            } for qi in range(len(ids))],
        })

    async def retrieval_list(self, request: web.Request):
        return web.json_response(self.retrieval.list())

    async def retrieval_drop(self, request: web.Request):
        body = await request.json()
        self.retrieval.drop(body["name"])
        return web.json_response({"state": "dropped"})

    async def oai_models(self, request: web.Request):
        env = await self._env()
        stem = os.path.splitext(os.path.basename(
            env.reload.model_path))[0]
        return web.json_response(
            {"data": [{"object": "models", "id": stem}]})

    # -- info/admin ----------------------------------------------------------

    async def adapters(self, request: web.Request):
        import jax

        devs = [f"{d.device_kind} ({d.platform})" for d in jax.devices()]
        return web.json_response(devs)

    async def models_info(self, request: web.Request):
        info = self.middleware.info()
        if info is None:
            return web.json_response({"state": "none"})
        return web.json_response({"state": "loaded", **info})

    async def models_state_sse(self, request: web.Request):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        try:
            # Stream until the client disconnects (model.rs:50-81 streams
            # unbounded; a write to a closed transport raises).
            while True:
                info = self.middleware.info()
                payload = json.dumps(
                    {"state": "loaded", **info} if info else {"state": "none"})
                await resp.write(f"data: {payload}\n\n".encode())
                await asyncio.sleep(1.0)
        except (ConnectionResetError, asyncio.CancelledError, OSError):
            pass
        return resp

    async def metrics(self, request: web.Request):
        """Prometheus-style text metrics (the reference has no metrics
        endpoint; its SSE info stream is the closest analog)."""
        lines = []
        env = self.middleware.env
        lines.append(f"ai00_model_loaded {int(env is not None)}")
        if env is not None:
            m = env.runtime.metrics
            for k, v in m.items():
                lines.append(f"ai00_runtime_{k} {v}")
            lines.append(f"ai00_slots_busy {env.runtime.busy_count()}")
            lines.append(f"ai00_slots_total {env.runtime.max_batch}")
            steps = max(m["steps"], 1)
            lines.append(
                f"ai00_step_seconds_avg {m['step_seconds'] / steps:.6f}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def profile_start(self, request: web.Request):
        """Start a JAX profiler trace (admin).  Body: {dir}."""
        import jax

        body = await request.json()
        trace_dir = body.get("dir", "/tmp/ai00_profile")
        jax.profiler.start_trace(trace_dir)
        return web.json_response({"state": "tracing", "dir": trace_dir})

    async def profile_stop(self, request: web.Request):
        import jax

        jax.profiler.stop_trace()
        return web.json_response({"state": "stopped"})

    async def models_list(self, request: web.Request):
        model_dir = self.config.model.get("path", "assets/models")
        loop = asyncio.get_event_loop()
        out = await loop.run_in_executor(
            None, files_mod.list_models, model_dir)
        return web.json_response(out)

    async def admin_load(self, request: web.Request):
        body = await request.json()
        if "tokenizer_path" not in body:
            # A partial reload (e.g. from the WebUI model manager) keeps
            # the server's configured tokenizer instead of the global
            # dataclass default (reference: Config->ReloadRequest merge,
            # crates/ai00-server/src/config.rs:30-77).
            body["tokenizer_path"] = self.config.tokenizer.get(
                "path", ReloadRequest().tokenizer_path)
        req = ReloadRequest.from_json(body)
        model_dir = self.config.model.get("path", "assets/models")
        try:
            check_path_permitted(req.model_path, [model_dir])
        except PermissionError:
            # Allow the "name within the configured dir" form too.
            candidate = os.path.join(model_dir, req.model_path)
            check_path_permitted(candidate, [model_dir])
            req.model_path = candidate
        try:
            await self.middleware.reload(req)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response({"state": "loaded"})

    async def admin_unload(self, request: web.Request):
        await self.middleware.unload()
        return web.json_response({"state": "unloaded"})

    async def admin_save(self, request: web.Request):
        body = await request.json()
        path = body.get("path") or body.get("model_path")
        model_dir = self.config.model.get("path", "assets/models")
        check_path_permitted(os.path.dirname(path) or model_dir, [model_dir])
        try:
            await self.middleware.save(path)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response({"state": "saved", "path": path})

    async def admin_unzip(self, request: web.Request):
        body = await request.json()
        source = body.get("zip_path") or body.get("source")
        target = body.get("target_dir") or body.get("target")
        for p in (source, target):
            check_path_permitted(p, files_mod.PERMITTED)
        loop = asyncio.get_event_loop()
        await loop.run_in_executor(None, files_mod.unzip, source, target)
        return web.json_response({"state": "ok"})

    async def admin_dir(self, request: web.Request):
        body = await request.json()
        path = body.get("path", ".")
        check_path_permitted(path, files_mod.PERMITTED)
        loop = asyncio.get_event_loop()
        out = await loop.run_in_executor(None, files_mod.list_dir, path)
        return web.json_response(out)

    async def admin_config_load(self, request: web.Request):
        body = await request.json()
        path = body.get("path", "assets/configs/Config.toml")
        check_path_permitted(path, files_mod.PERMITTED)
        cfg = Config.from_toml(path)
        return web.json_response(cfg.to_dict())

    async def admin_config_save(self, request: web.Request):
        body = await request.json()
        path = body.get("path", "assets/configs/Config.toml")
        check_path_permitted(os.path.dirname(path), files_mod.PERMITTED)
        cfg = Config.from_dict(body.get("config", {}))
        with open(path, "w") as f:
            f.write(dump_toml(cfg.to_dict()))
        return web.json_response({"state": "saved"})

    # -- docs -----------------------------------------------------------------

    async def openapi_json(self, request: web.Request):
        if self._openapi_cache is None:
            self._openapi_cache = build_spec(self.app)
        return web.json_response(self._openapi_cache)

    async def swagger(self, request: web.Request):
        return web.Response(text=SWAGGER_HTML, content_type="text/html")

    async def webui(self, request: web.Request):
        from .webui import WEBUI_HTML

        return web.Response(text=WEBUI_HTML, content_type="text/html")


def _usage(counter) -> dict:
    if counter is None:
        return {"prompt": 0, "completion": 0, "total": 0,
                "duration": {"secs": 0, "nanos": 0}}
    secs = int(counter.duration)
    nanos = int((counter.duration - secs) * 1e9)
    return {
        "prompt": counter.prompt,
        "completion": counter.completion,
        "total": counter.total,
        "duration": {"secs": secs, "nanos": nanos},
    }


async def _collect_text(handle):
    """Drain a generation to completion; cancel it if the client's HTTP
    task is torn down (disconnect -> CancelledError), mirroring the
    reference's is_disconnected() abort (run.rs:934-935)."""
    parts, reason, counter = [], FinishReason.NULL, None
    try:
        async for msg in handle:
            if msg[0] == "content":
                parts.append(msg[1])
            elif msg[0] == "stop":
                reason, counter = msg[1], msg[2]
    except asyncio.CancelledError:
        handle.cancel()
        raise
    return "".join(parts), reason, counter
