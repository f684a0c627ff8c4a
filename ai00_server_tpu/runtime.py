"""Batched generation runtime: slots, prefix cache, generation loop.

Re-designs the reference's L2 tier (crates/ai00-core/src/run.rs) for the
TPU engine:

* Continuous batching over ``max_batch`` slots.  The reference wires per-
  slot tokio tasks to channel pumps; here ONE async driver loop gathers all
  runnable slots each iteration, builds a merged fixed-shape ``(B, T)``
  step, and dispatches it to the Engine in a thread-pool executor.
* Slot selection policy Continue > Empty > Back (run.rs:304-331,503-532):
  prefer a slot whose resident state already matches a strict prompt
  prefix, then an empty slot, then preempt the least-recently-used idle
  slot.
* Prompt-prefix state cache: per-StateId token-trie of host-RAM state
  snapshots (plus prompt-end logits for the exact-hit fast path) with LRU
  eviction at 256 items and a >=32-token insert threshold (run.rs:40-41),
  plus in-flight futures so concurrent identical prompts await one prefill
  (run.rs:191-205).
* Per-token post-processing: UTF-8-safe streaming, incremental stop-word
  hold-back (run.rs:865-932), BNF mask scheduling, max_tokens / EOS
  handling, token/duration accounting.
* Choose (perplexity classification) and State extraction arms
  (run.rs:936-1010).
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger("ai00_server_tpu")

from .engine import Engine
from .ops import sampling
from .tokenizer import Tokenizer, Utf8Buffer

MAX_CACHE_ITEMS = 256          # run.rs:41
MIN_PROMPT_CACHE_TOKENS = 32   # run.rs:40
END_OF_TEXT = 0


# ---------------------------------------------------------------------------
# Request/response types (reference: lib.rs:46-53, lib.rs:175-198)
# ---------------------------------------------------------------------------


class GenerateKind(Enum):
    GENERATE = "generate"
    CHOOSE = "choose"
    STATE = "state"


@dataclass
class SamplerSpec:
    """Host-side sampler config -> engine row params."""
    kind: int = sampling.KIND_NUCLEUS
    top_p: float = 0.5
    top_k: int = 128
    temperature: float = 1.0
    presence_penalty: float = 0.3
    frequency_penalty: float = 0.3
    penalty_decay: float = 0.99654026
    miro_tau: float = 3.0
    miro_rate: float = 0.1

    def row_params(self) -> dict:
        # top_k <= 0 means "no top-k truncation"; the reference honors
        # arbitrary top_k over the full vocab (nucleus.rs:69-134).  Rows
        # with top_k in (0, TOP_K_CAP] take the fast partial-sort path;
        # 0 or > TOP_K_CAP selects the full-vocab sampler bucket (exact,
        # at a full on-device sort per step for that batch mix).
        top_k = max(0, int(self.top_k))
        return {
            "kind": self.kind,
            "top_p": self.top_p,
            "top_k": top_k,
            "temperature": self.temperature,
            "presence": self.presence_penalty,
            "frequency": self.frequency_penalty,
            "decay": self.penalty_decay,
            "miro_tau": self.miro_tau,
            "miro_rate": self.miro_rate,
        }


@dataclass
class GenerateRequest:
    prompt: str = ""
    model_text: str = ""           # model-authored text for penalty init
    max_tokens: int = 256
    stop: list[str] = field(default_factory=list)
    bias: dict[int, float] = field(default_factory=dict)
    sampler: SamplerSpec = field(default_factory=SamplerSpec)
    bnf_schema: Optional[str] = None
    state_id: Optional[str] = None  # initial-state UUID ("default" = init)
    kind: GenerateKind = GenerateKind.GENERATE
    choices: list[str] = field(default_factory=list)
    calibrate: bool = False
    # STATE requests: return the device-pooled embedding vector instead
    # of the full state (the /embeddings fast path — ~3C floats cross
    # the host boundary instead of the multi-MB state pytree).
    pooled: bool = False
    # Pooled readout: "mean_hidden" (C dims, masked mean of final hidden
    # states — the retrieval-grade default) or "state" (3C dims, pooled
    # full-state readout — the readout that reflects a CUSTOM initial
    # state's influence).  None = mean_hidden without a state_id, state
    # with one (the historical keying, kept for back-compat).
    pooling: Optional[str] = None

    def effective_pooling(self) -> str:
        return self.pooling or (
            "state" if self.state_id else "mean_hidden")


class FinishReason(str, Enum):
    STOP = "stop"
    LENGTH = "length"
    ABORT = "abort"
    NULL = "null"


@dataclass
class TokenCounter:
    prompt: int = 0
    completion: int = 0
    duration: float = 0.0

    @property
    def total(self) -> int:
        return self.prompt + self.completion


class GenerateHandle:
    """Per-request message stream.

    Messages:
      ("start",) ("content", str) ("stop", FinishReason, TokenCounter)
      ("choose", list[float]) ("embed", state_pytree) ("done",)
    """

    def __init__(self):
        self.queue: asyncio.Queue = asyncio.Queue()
        self.aborted = False

    def cancel(self) -> None:
        self.aborted = True

    async def __aiter__(self):
        while True:
            msg = await self.queue.get()
            yield msg
            if msg[0] == "done":
                return


# ---------------------------------------------------------------------------
# Prompt-prefix trie cache (reference: run.rs:231-273, 443-485)
# ---------------------------------------------------------------------------


class _LazyLogitsRow:
    """One row of a device-resident (B, V) logits array, materialized to
    host at most once, off the drive loop's critical path (the full
    prompt-end logits download is multi-MB through the device link)."""

    __slots__ = ("_dev", "_b", "_np")

    def __init__(self, dev, b):
        self._dev = dev
        self._b = b
        self._np = None

    def get(self) -> np.ndarray:
        if self._np is None:
            self._np = np.asarray(self._dev[self._b])
            self._dev = None
        return self._np


@dataclass
class CachedItem:
    state: Any                 # host batch-1 state pytree
    logits: np.ndarray | None  # (V,) prompt-end logits (exact-hit fast path)
    tokens: tuple[int, ...]
    instant: float = field(default_factory=time.monotonic)


class _TrieNode:
    __slots__ = ("children", "item")

    def __init__(self):
        self.children: dict[int, _TrieNode] = {}
        self.item: CachedItem | asyncio.Future | None = None


class StateCache:
    """Token-trie of state snapshots for ONE initial-state id."""

    def __init__(self):
        self.root = _TrieNode()
        self.count = 0

    def longest_prefix(self, tokens: tuple[int, ...], strict: bool = False):
        """Deepest ancestor of ``tokens`` holding an item.  ``strict``
        restricts to proper prefixes.  Returns (prefix_len, item) or
        (0, None)."""
        node = self.root
        best = (0, None)
        limit = len(tokens) - 1 if strict else len(tokens)
        for i, t in enumerate(tokens):
            if i >= limit + 1:
                break
            node = node.children.get(t)
            if node is None:
                break
            if node.item is not None and (i + 1) <= limit:
                best = (i + 1, node.item)
        return best

    def insert(self, tokens: tuple[int, ...], item) -> None:
        node = self.root
        for t in tokens:
            nxt = node.children.get(t)
            if nxt is None:
                nxt = _TrieNode()
                node.children[t] = nxt
            node = nxt
        if node.item is None:
            self.count += 1
        node.item = item

    def remove(self, tokens: tuple[int, ...]) -> None:
        node = self.root
        for t in tokens:
            node = node.children.get(t)
            if node is None:
                return
        if node.item is not None:
            node.item = None
            self.count -= 1

    def entries(self):
        out = []

        def walk(node, prefix):
            if node.item is not None:
                out.append((tuple(prefix), node.item))
            for t, child in node.children.items():
                prefix.append(t)
                walk(child, prefix)
                prefix.pop()

        walk(self.root, [])
        return out

    def maintain(self) -> None:
        """LRU-evict ready items beyond MAX_CACHE_ITEMS (run.rs:238-257)."""
        if self.count <= MAX_CACHE_ITEMS:
            return
        ready = [(k, v) for k, v in self.entries()
                 if isinstance(v, CachedItem)]
        ready.sort(key=lambda kv: kv[1].instant)
        for k, _ in ready[: self.count - MAX_CACHE_ITEMS]:
            self.remove(k)


# ---------------------------------------------------------------------------
# Stop-word incremental matcher (reference: run.rs:899-932)
# ---------------------------------------------------------------------------


class StopMatcher:
    """Byte-level hold-back matcher: emits only bytes that can no longer be
    part of a stop word; signals a hit when a stop word completes."""

    def __init__(self, stops: list[str]):
        self.stops = [s.encode("utf-8") for s in stops if s]
        self.held = b""

    def push(self, data: bytes) -> tuple[bytes, bool]:
        """Returns (emittable_bytes, stopped)."""
        if not self.stops:
            return data, False
        buf = self.held + data
        for s in self.stops:
            idx = buf.find(s)
            if idx != -1:
                self.held = b""
                return buf[:idx], True
        # Longest suffix of buf that is a proper prefix of any stop word.
        hold = 0
        for s in self.stops:
            for k in range(min(len(s) - 1, len(buf)), 0, -1):
                if buf.endswith(s[:k]):
                    hold = max(hold, k)
                    break
        self.held = buf[len(buf) - hold:] if hold else b""
        return buf[: len(buf) - hold], False

    def flush(self) -> bytes:
        out, self.held = self.held, b""
        return out


# ---------------------------------------------------------------------------
# Slots
# ---------------------------------------------------------------------------


class _SlotPhase(Enum):
    IDLE = "idle"
    PREFILL = "prefill"
    DECODE = "decode"


@dataclass
class _Slot:
    index: int
    phase: _SlotPhase = _SlotPhase.IDLE
    resident_tokens: tuple[int, ...] = ()
    resident_state_id: str = "default"
    idle_since: float = field(default_factory=time.monotonic)
    ctx: Optional["_ReqCtx"] = None


@dataclass
class _ReqCtx:
    request: GenerateRequest
    handle: GenerateHandle
    prompt_tokens: tuple[int, ...]
    model_tokens: tuple[int, ...]
    remaining: list[int]             # prompt tokens still to feed
    state_id: str
    all_tokens: list[int] = field(default_factory=list)
    utf8: Utf8Buffer = field(default_factory=Utf8Buffer)
    stop: StopMatcher | None = None
    formatter: Any = None            # BNF formatter or None
    counter: TokenCounter = field(default_factory=TokenCounter)
    start_time: float = field(default_factory=time.monotonic)
    cache_future: asyncio.Future | None = None
    prefill_cached: bool = False
    prefill_logits: np.ndarray | None = None
    finish: FinishReason = FinishReason.NULL
    # Deadline for deferring admission on an in-flight prefix-cache future
    # (0 = not deferring yet).
    defer_deadline: float = 0.0
    # BNF chunking state: the row's currently-uploaded allowed mask
    # (None = not computed yet), dirtied whenever the grammar advances;
    # bnf_misses counts consecutive chunks cut short by a mask change —
    # grammars whose mask shifts every token fall back to per-token
    # stepping (bnf_no_chunk).
    bnf_mask: Any = None
    bnf_dirty: bool = True
    bnf_misses: int = 0
    bnf_no_chunk: bool = False
    bnf_sticky: int = 0
    # Speculation credit: True after the row's last chunk replay accepted
    # every token under an unchanged mask.  A row without credit decodes
    # at the base chunk size with NO chained successor — a mask change
    # (grammar region exit) otherwise wastes a full in-flight 4x chunk of
    # device compute (~1 s at 7B) plus the discarded suffix of the chunk
    # it was detected in.  Credit is re-earned on the first full accept.
    bnf_full_accept: bool = False
    # Mask-ahead: per-token BNF rows launch allowed_mask() on the
    # executor the moment the grammar advances, so the (1.5 ms cached /
    # ~100 ms first-visit) mask computation overlaps the rest of the
    # post-step host work instead of serializing before the next step
    # (SURVEY §7 hard part (d)).
    bnf_future: Any = None
    # Device-resident grammar DFA (grammar.token_dfa_table, regular
    # grammars only): the decode scan applies exact per-state masks and
    # advances the state ON DEVICE — no replay mis-speculation, no
    # rollbacks, full chunk speed.  dfa_future resolves to
    # (table, state_map) or None (built off-loop at submit);
    # dfa_stale marks host-side grammar advances (per-token accepts)
    # that must be synced to the device before the next chunk launch.
    dfa_future: Any = None
    dfa_table: Any = None
    dfa_map: Any = None
    dfa_key: Any = None
    dfa_stale: bool = False


class Runtime:
    """The batched runtime for one loaded model."""

    def __init__(self, engine: Engine, tokenizer: Tokenizer,
                 states: dict[str, Any] | None = None,
                 decode_chunk_size: int = 8,
                 bnf_option: dict | None = None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.max_batch = engine.max_batch
        self.chunk = engine.token_chunk_size
        # Tokens decoded per device dispatch when every active slot is in
        # steady-state decode (no BNF): one lax.scan on device instead of
        # K host round-trips.  1 = per-token stepping.
        self.decode_chunk_size = max(1, int(decode_chunk_size))
        # BnfOption (reload.rs:80-86): start nonterminal for schemas.
        self.bnf_option = bnf_option or {}
        self.slots = [_Slot(i) for i in range(self.max_batch)]
        # init-state registry: id -> host batch-1 state pytree (None = fresh)
        self.states: dict[str, Any] = {"default": None}
        if states:
            self.states.update(states)
        self.caches: dict[str, StateCache] = {}
        self.pending: list[_ReqCtx] = []
        self._wake = asyncio.Event()
        self._stopped = False
        self._task: asyncio.Task | None = None
        # Observability counters (SURVEY.md §5.1: the reference only has
        # per-request TokenCounter; we add runtime-level aggregates).
        self._cache_stores: set = set()
        # In-flight decode chunk (tokens still on device) for the
        # speculative pipeline; AI00_SPECULATIVE_DECODE=off disables the
        # successor-launch (the launch/consume split stays).
        self._spec = None
        self._speculative = os.environ.get(
            "AI00_SPECULATIVE_DECODE", "on") != "off"
        # Dedicated single-thread executor for DRIVE-CRITICAL device
        # calls (merged steps, chunk launch/consume, rollbacks).  On the
        # shared default pool these queued behind bulk work like
        # back-cache full-state downloads — measured: a burst of 16
        # finishing requests delayed the next wave's prefill step by
        # ~3 s.  Bulk/background work (cache materialize, BNF masks,
        # embeds) stays on the default pool.
        import concurrent.futures as _cf

        self._device_pool = _cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="engine-drive")
        # (hsum_serial, (B, C) np) — coalesced embed-readout snapshot;
        # only touched from _device_pool (single thread).
        self._hsum_snap = None

        self.metrics = {
            "steps": 0,
            "prefill_tokens": 0,
            "decode_tokens": 0,
            "requests_started": 0,
            "requests_finished": 0,
            "cache_hits": 0,
            "step_seconds": 0.0,
            # Drive-loop diagnostics (AI00_DRIVE_STATS prints at stop).
            "chunk_launches": 0,
            "chunk_successors": 0,
            "chunk_wait_s": 0.0,
            "merged_steps": 0,
            "merged_step_s": 0.0,
            "rollbacks": 0,
            "spec_dead_rows": 0,
            # BNF chunking diagnostics: accepted replay tokens, short
            # chunks (acc<=2), per-token fallbacks entered, and sticky
            # rehabilitations back into chunked decode.
            "bnf_accepted": 0,
            "bnf_short_chunks": 0,
            "bnf_fallbacks": 0,
            "bnf_rehabs": 0,
        }

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def start(self) -> None:
        self._task = asyncio.get_event_loop().create_task(self._drive())

    async def stop(self) -> None:
        """Stop the drive loop and DRAIN: every in-flight request's stream
        is finalized with ABORT and every queued request is failed, so
        `/admin/models/unload` (or reload) under live traffic ends all
        HTTP streams instead of leaving handlers awaiting forever (the
        reference ends streams when the old runtime's senders drop,
        run.rs:1139-1141)."""
        self._stopped = True
        self._wake.set()
        if self._task:
            await self._task
        await self._abandon_spec()
        for s in self.slots:
            if s.ctx is not None:
                try:
                    await self._finalize(s, FinishReason.ABORT)
                except Exception:
                    logger.exception("drain: finalize failed")
                    s.phase = _SlotPhase.IDLE
                    s.ctx = None
                    s.resident_tokens = ()
        for ctx in self.pending:
            await ctx.handle.queue.put(
                ("stop", FinishReason.ABORT, ctx.counter))
            await ctx.handle.queue.put(("done",))
        self.pending = []
        self._device_pool.shutdown(wait=False)
        if os.environ.get("AI00_DRIVE_STATS"):
            import json as _json

            print("drive stats: " + _json.dumps(
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in sorted(self.metrics.items())}),
                flush=True)

    async def _abandon_spec(self) -> None:
        """Discard an in-flight speculative chunk record (crash recovery /
        shutdown): the chunk's device state is rolled back so row states
        match their books, and the record is dropped."""
        if self._spec is None:
            return
        self._spec = None
        loop = asyncio.get_event_loop()
        try:
            await loop.run_in_executor(self._device_pool,
                                       self.engine.restore_last_chunk)
        except Exception:
            logger.exception("speculative-chunk rollback failed")

    async def submit(self, request: GenerateRequest) -> GenerateHandle:
        """Queue a generation; returns the per-request handle."""
        handle = GenerateHandle()
        prompt_tokens = tuple(self.tokenizer.encode(request.prompt)) or (
            END_OF_TEXT,)
        model_tokens = tuple(self.tokenizer.encode(request.model_text))
        ctx = _ReqCtx(
            request=request,
            handle=handle,
            prompt_tokens=prompt_tokens,
            model_tokens=model_tokens,
            remaining=list(prompt_tokens),
            state_id=request.state_id or "default",
        )
        ctx.counter.prompt = len(prompt_tokens)
        ctx.stop = StopMatcher(request.stop)
        if request.bnf_schema:
            from .bnf import BnfFormatter

            start_nt = self.bnf_option.get("start_nonterminal", "start")
            ctx.formatter = BnfFormatter(
                request.bnf_schema, self.tokenizer, self.engine.vocab,
                start_nonterminal=start_nt)
            if self.decode_chunk_size > 1:
                # Device-DFA table build (cached per grammar; ~100 ms
                # first time) runs off-loop; _install awaits it.
                # Mirostat rows qualify too: the DFA path has no
                # mis-speculation, so the adaptive sampler state never
                # needs the host rebuild that bars mirostat from the
                # replay path (_can_chunk).
                from .grammar import token_dfa_table

                ctx.dfa_key = (request.bnf_schema, start_nt)
                ctx.dfa_future = asyncio.get_event_loop().run_in_executor(
                    None, token_dfa_table, request.bnf_schema,
                    self.tokenizer, self.engine.vocab, start_nt,
                    self.engine.dfa_height - 1)
        self.pending.append(ctx)
        self._wake.set()
        return handle

    def cache_for(self, state_id: str) -> StateCache:
        c = self.caches.get(state_id)
        if c is None:
            c = self.caches[state_id] = StateCache()
        return c

    def register_state(self, state_id: str, state) -> None:
        self.states[state_id] = state

    def busy_count(self) -> int:
        return sum(1 for s in self.slots if s.phase != _SlotPhase.IDLE)

    # ------------------------------------------------------------------
    # Driver loop
    # ------------------------------------------------------------------

    async def _drive(self) -> None:
        """Top-level driver with crash isolation: an exception in one
        iteration fails the affected requests and resets the slots
        (reference behavior: errors reset the slot to Idle,
        run.rs:649-656) instead of killing the loop."""
        fail_streak = 0
        while not self._stopped:
            try:
                await self._drive_once()
                fail_streak = 0
            except asyncio.CancelledError:
                raise
            except Exception:
                import logging

                # Rate-limit a persistent failure (e.g. a wedged device
                # failing every iteration): full tracebacks for the
                # first few, then one line per 100, with backoff — an
                # unthrottled loop once wrote hundreds of MB of
                # identical tracebacks.
                fail_streak += 1
                log = logging.getLogger(__name__)
                if fail_streak <= 3:
                    log.exception(
                        "runtime step failed; resetting busy slots")
                elif fail_streak % 100 == 0:
                    log.error("runtime step still failing (%d in a row)",
                              fail_streak)
                await asyncio.sleep(min(0.05 * fail_streak, 5.0))
                # A stale in-flight chunk record would either crash
                # _consume_chunk on the reset slots (ctx=None) or restore
                # a pre-crash whole-pool snapshot over freshly admitted
                # rows: roll it back NOW, while the books still match.
                await self._abandon_spec()
                for s in self.slots:
                    if s.ctx is not None:
                        try:
                            await self._finalize(s, FinishReason.ABORT)
                        except Exception:
                            s.phase = _SlotPhase.IDLE
                            s.ctx = None
                    # After a mid-step failure the pool rows can no
                    # longer be trusted to match the books; drop every
                    # continue-in-place record (the host prefix cache
                    # still serves).
                    s.resident_tokens = ()

    async def _drive_once(self) -> None:
        loop = asyncio.get_event_loop()
        if os.environ.get("AI00_TRACE_DRIVE"):
            logger.info("drive: pending=%d active=%d",
                        len(self.pending),
                        sum(1 for s in self.slots
                            if s.phase != _SlotPhase.IDLE))
        was_idle = all(s.phase == _SlotPhase.IDLE for s in self.slots)
        await self._admit()
        if was_idle and any(s.phase == _SlotPhase.PREFILL
                            for s in self.slots):
            # Admission grace from idle: a burst of concurrent requests
            # arrives over a few event-loop ticks; one short yield lets
            # the rest of the burst land so ALL rows share one merged
            # prefill step and the first decode chunk, instead of a
            # second wave queueing behind a 64-step chunk scan.
            await asyncio.sleep(0.002)
            await self._admit()
        active = [s for s in self.slots if s.phase != _SlotPhase.IDLE]
        if not active:
            self._wake.clear()
            if self.pending:
                return
            try:
                await asyncio.wait_for(self._wake.wait(), timeout=1.0)
            except asyncio.TimeoutError:
                pass
            return

        # ---- two-phase step (SURVEY §7 hard parts (b)/(d)) ----
        # Clean steady-state decode rows advance K tokens in ONE on-device
        # scan; BNF rows (per-token host masks) and prefill rows take the
        # merged step.  One grammar request or a mid-flight prefill no
        # longer drops every other stream to per-token host round-trips.
        if self.decode_chunk_size > 1:
            chunkable = [s for s in active
                         if s.phase == _SlotPhase.DECODE
                         and self._can_chunk(s.ctx)]
        else:
            chunkable = []
        rest = [s for s in active if s not in chunkable]
        if self._spec is not None:
            # Consume the in-flight chunk; in steady state the successor
            # (covering every currently-chunkable row, including rows that
            # finished prefill since the launch) goes out BEFORE the
            # token download, so the host sync overlaps device compute.
            await self._consume_chunk(loop, chunkable)
        elif chunkable:
            self._spec = await self._launch_chunk(
                loop, chunkable, self._pick_k())
        if rest:
            # Prefill and BNF rows take merged steps that overlap the
            # in-flight decode chunk (the device runs them back to back;
            # chunk rows ride along with length 0).
            await self._merged_step(loop, rest)

    async def _merged_step(self, loop, rows) -> None:
        """One fixed-shape merged step over ``rows`` (prefill chunks +
        per-token decode); other rows ride along with length 0."""
        B = self.max_batch
        T = 1
        for s in rows:
            if s.phase == _SlotPhase.PREFILL and (
                    len(s.ctx.remaining) > 1):
                T = self.chunk
                break
        tokens = np.zeros((B, T), np.int32)
        lengths = np.zeros(B, np.int32)
        sample_mask = np.zeros(B, np.bool_)
        completing = []  # slots whose prefill finishes this step
        for s in rows:
            ctx = s.ctx
            if s.phase == _SlotPhase.PREFILL:
                n = min(len(ctx.remaining), T)
                tokens[s.index, :n] = ctx.remaining[:n]
                lengths[s.index] = n
                if n == len(ctx.remaining):
                    completing.append(s)
                    sample_mask[s.index] = (
                        ctx.request.kind == GenerateKind.GENERATE)
            else:  # DECODE
                tokens[s.index, 0] = ctx.all_tokens[-1]
                lengths[s.index] = 1
                sample_mask[s.index] = True

        # BNF masks are computed on CPU and uploaded before the step
        # (cached: recomputed only after the grammar advanced; mask-ahead
        # futures from the previous step usually resolve instantly here,
        # and multiple BNF rows refresh concurrently).
        bnf_rows = [s for s in rows
                    if s.ctx.formatter is not None and sample_mask[s.index]]
        if bnf_rows:
            await asyncio.gather(*[
                self._refresh_bnf_mask(loop, s) for s in bnf_rows])

        want_logits = bool(completing)
        t0 = time.monotonic()
        result = await loop.run_in_executor(
            self._device_pool, self.engine.step, tokens, lengths,
            sample_mask,
            want_logits)
        self.metrics["steps"] += 1
        self.metrics["step_seconds"] += time.monotonic() - t0
        self.metrics["merged_steps"] += 1
        self.metrics["merged_step_s"] += time.monotonic() - t0
        self.metrics["prefill_tokens"] += int(lengths.sum())

        for s in completing:
            if result.logits is not None:
                s.ctx.prefill_logits = _LazyLogitsRow(
                    result.logits, s.index)

        # ---- distribute results ----
        for s in list(rows):
            await self._advance(s, lengths, sample_mask, result)

    def _can_chunk(self, ctx) -> bool:
        """BNF rows join the K-token decode chunk with REPLAY validation
        (SURVEY §7 hard part (d)): the chunk samples under the row's
        current mask; afterwards the host replays the tokens through the
        grammar and accepts the prefix sampled while the true mask stayed
        unchanged — exact reference distribution, chunk-scan speed for
        grammars whose mask is sticky.  Mirostat rows are excluded (their
        adaptive state cannot be host-rebuilt on mis-speculation), as are
        rows whose grammar keeps shifting the mask (bnf_no_chunk)."""
        if ctx.formatter is None:
            return True
        if ctx.dfa_table is not None:
            return True  # device-DFA: exact masks inside the scan
        return (not ctx.bnf_no_chunk
                and ctx.request.sampler.kind != sampling.KIND_MIROSTAT)

    async def _refresh_bnf_mask(self, loop, slot) -> None:
        """Bring mask_pool[row] up to date with the grammar state (the
        ~1 ms cached / ~100 ms first-visit native mask computation runs
        off the event loop)."""
        ctx = slot.ctx
        if ctx.formatter is None:
            return
        # Collect any in-flight mask-ahead BEFORE the dirty check: nothing
        # downstream (the chunk replay advances the grammar on another
        # executor thread) may ever run while an allowed_mask() is pending
        # on this formatter — the grammar engine is not thread-safe.
        mask = None
        if ctx.bnf_future is not None:
            mask = await ctx.bnf_future       # mask-ahead result
            ctx.bnf_future = None
        if not ctx.bnf_dirty:
            return
        if mask is None:
            mask = await loop.run_in_executor(
                None, ctx.formatter.allowed_mask)
        ctx.bnf_dirty = False
        if ctx.bnf_mask is not None and np.array_equal(mask, ctx.bnf_mask):
            # Unchanged mask: the grammar entered a sticky region (e.g. a
            # free-text or digit run after structural punctuation).  A row
            # parked in per-token mode by an earlier shifty stretch earns
            # its way back into chunked decode after two sticky steps —
            # bnf_no_chunk is a region property, not a request property.
            if ctx.bnf_no_chunk:
                ctx.bnf_sticky += 1
                if ctx.bnf_sticky >= 2:
                    ctx.bnf_no_chunk = False
                    ctx.bnf_misses = 0
                    ctx.bnf_sticky = 0
                    self.metrics["bnf_rehabs"] += 1
            return
        ctx.bnf_sticky = 0
        ctx.bnf_mask = mask
        self.engine.set_row_mask(slot.index, mask)

    def _rebuild_sampler_state(self, b: int, ctx) -> None:
        """Host-recompute row ``b``'s penalty state from the accepted
        token history and upload it (after a BNF mis-speculation rolled
        the row back: the device recurrence pen = pen*decay; pen[tok] =
        seen ? +frequency : presence is a pure function of the
        sequence)."""
        sp = ctx.request.sampler
        pen, seen = sampling.init_penalties_host(
            list(ctx.model_tokens), self.engine.vocab,
            sp.presence_penalty, sp.frequency_penalty, sp.penalty_decay)
        decay = np.float32(sp.penalty_decay)
        freq = np.float32(sp.frequency_penalty)
        pres = np.float32(sp.presence_penalty)
        for tok in ctx.all_tokens[len(ctx.prompt_tokens):]:
            pen *= decay
            pen[tok] = (pen[tok] + freq) if seen[tok] else pres
            seen[tok] = True
        self.engine.set_row_sampler_state(b, pen, seen)

    async def _launch_chunk(self, loop, active, K, first_device=None,
                            consumed=None):
        """Dispatch a decode chunk WITHOUT downloading its tokens.

        Returns the in-flight record; the tokens stay on device until
        :meth:`_consume_chunk` fetches them.  ``first_device`` chains a
        speculative chunk from the previous chunk's device-resident last
        tokens (no host round-trip between chunks); rows NOT in
        ``first_device``'s covering set (newly joining the pipeline)
        supply their first token from the host.

        Each row gets a per-row token BUDGET = remaining max_tokens
        (minus what the chunk being consumed will deliver, ``consumed``
        = {row: tokens}); the scan freezes the row at its budget, so a
        LENGTH stop never over-consumes state and needs no rollback.
        Rows whose budget would be zero are left out entirely."""
        B = self.max_batch
        consumed = consumed or {}
        budgets = {}
        for s in active:
            rem = (s.ctx.request.max_tokens - s.ctx.counter.completion
                   - consumed.get(s.index, 0))
            if rem > 0:
                budgets[s.index] = min(rem, K)
        active = [s for s in active if s.index in budgets]
        if not active:
            return None
        for s in active:
            if s.ctx.formatter is None:
                continue
            if s.ctx.dfa_table is not None:
                # Device-DFA row: no mask upload needed (the scan reads
                # the state's table row); sync the device state if the
                # host advanced the grammar outside a chunk (the prefill
                # first token, exact-hit fast path).
                if s.ctx.bnf_future is not None:
                    await s.ctx.bnf_future
                    s.ctx.bnf_future = None
                if s.ctx.dfa_stale:
                    st = s.ctx.dfa_map.get(
                        int(getattr(s.ctx.formatter.engine, "state",
                                    -1)))
                    if st is None:
                        # Unreachable in theory (every host accept walks
                        # token transitions from row 0); fall back to the
                        # replay path rather than serve a wrong mask.
                        s.ctx.dfa_table = None
                        await self._refresh_bnf_mask(loop, s)
                        continue
                    self.engine.set_row_dfa_state(s.index, st)
                    s.ctx.dfa_stale = False
            else:
                await self._refresh_bnf_mask(loop, s)
        mask = np.zeros(B, np.bool_)
        budget = np.zeros(B, np.int32)
        for s in active:
            mask[s.index] = True
            budget[s.index] = budgets[s.index]
        host_first = None
        if first_device is None:
            first = np.zeros(B, np.int32)
            for s in active:
                first[s.index] = s.ctx.all_tokens[-1]
        else:
            first = first_device["toks"]
            stale = first_device.get("dead", frozenset())
            joining = [s for s in active
                       if s.index not in first_device["rows"]
                       or s.index in stale]
            if joining:
                hmask = np.zeros(B, np.bool_)
                hvals = np.zeros(B, np.int32)
                for s in joining:
                    hmask[s.index] = True
                    hvals[s.index] = s.ctx.all_tokens[-1]
                host_first = (hmask, hvals)
        t0 = time.monotonic()
        toks_seq, _sp = await loop.run_in_executor(
            self._device_pool, lambda: self.engine.decode_chunk(
                first, mask, K, sync=False, host_first=host_first,
                budget=budget))
        self.metrics["launch_s"] = self.metrics.get(
            "launch_s", 0.0) + time.monotonic() - t0
        self.metrics["chunk_launches"] += 1
        if first_device is not None:
            self.metrics["chunk_successors"] += 1
        return {"toks": toks_seq,
                "entries": [(s, s.ctx) for s in active],
                "rows": frozenset(s.index for s in active), "K": K,
                "budgets": budgets, "dead": set(),
                "launched": time.monotonic()}

    def _pick_k(self):
        """Chunk size for the next decode chunk.  Per-row budgets make
        any size safe (rows freeze at max_tokens), so this is purely a
        latency/throughput knob: the 4x bucket amortizes the dispatch
        round-trip whenever no request is waiting to join mid-chunk
        (pending admission or an active prefill); new arrivals join at
        base-chunk granularity.  BNF rows must also hold speculation
        credit (last replay fully accepted): right after a grammar region
        exit the next mask change is near, so a 4x chunk would mostly be
        discarded suffix."""
        base = self.decode_chunk_size
        if not self.pending and all(
                s.phase == _SlotPhase.DECODE
                and (s.ctx.formatter is None
                     or s.ctx.dfa_table is not None
                     or s.ctx.bnf_full_accept)
                for s in self.slots if s.ctx is not None):
            return base * 4
        return base

    async def _consume_chunk(self, loop, chunkable) -> None:
        """Consume the in-flight decode chunk (pipelined).

        In steady state the successor chunk — over every currently-
        chunkable row, not just the consumed chunk's rows — launches
        BEFORE the token download, so the ~100 ms host sync overlaps the
        next chunk's device compute.  Row stops/aborts are RESUMABLE for
        everyone else: the successor keeps running for the surviving
        rows; its tokens for a stopped row are skipped at the next
        consume via ctx-identity tracking.

        Stops keep HONEST BOOKS instead of rolling back: the tokens the
        scan consumed past a mid-chunk stop are recorded (unemitted) in
        ``all_tokens`` so cache/resident keys exactly match the device
        state — no restore + re-feed on the critical path.  (LENGTH can
        never over-consume at all: per-row budgets freeze the row in the
        scan.)  The only device fix-up left is the cheap single-row
        restore when a successor already advanced a finished row.
        """
        spec = self._spec
        self._spec = None
        K = spec["K"]
        live = [(s, c) for (s, c) in spec["entries"] if s.ctx is c]
        newspec = None
        # Only rows with speculation credit ride the chained successor: a
        # BNF row whose last replay was cut by a mask change is likely to
        # be cut again, and its successor tokens would be pure waste (the
        # successor is launched BEFORE this consume's replay can rule).
        # Device-DFA rows always have credit — their masks are exact
        # inside the scan, so a successor can never be invalidated.
        chunkable = [s for s in chunkable
                     if s.ctx.formatter is None
                     or s.ctx.dfa_table is not None
                     or s.ctx.bnf_full_accept]
        if self._speculative and chunkable and len(live) == len(
                spec["entries"]) and spec["rows"].issubset(
                    frozenset(s.index for s in chunkable)):
            newspec = await self._launch_chunk(
                loop, chunkable, self._pick_k(),
                first_device={"toks": spec["toks"][-1],
                              "rows": spec["rows"],
                              "dead": frozenset(spec["dead"])},
                consumed={b: k for b, k in spec["budgets"].items()
                          if b not in spec["dead"]})
            # Record it NOW so a crash mid-processing rolls it back
            # (_abandon_spec) instead of leaving a dangling chunk.
            self._spec = newspec
        t0 = time.monotonic()
        toks_seq = await loop.run_in_executor(
            self._device_pool, np.asarray, spec["toks"])
        self.metrics["steps"] += 1
        # Blocking time only: launch-to-consume spans overlap other work
        # (that's the point of the pipeline) and would double-count.
        self.metrics["step_seconds"] += time.monotonic() - t0
        self.metrics["chunk_wait_s"] += time.monotonic() - t0
        dead = spec["dead"]
        self.metrics["decode_tokens"] += sum(
            k for b, k in spec["budgets"].items() if b not in dead)
        self.metrics["spec_dead_rows"] += len(spec["entries"]) - len(live)

        # BNF replay (off-loop, parallel per row): advance each grammar
        # through its sampled tokens; the accepted prefix is where the
        # true mask matched the mask the chunk sampled under.
        replays = {}
        bnf_live = [(s, c) for s, c in live
                    if c.formatter is not None and s.index not in dead
                    and not c.handle.aborted]
        if bnf_live:
            # Belt-and-suspenders: no replay may touch a formatter while a
            # mask-ahead future is still in flight (every chunk entry path
            # collects it in _refresh_bnf_mask, but the grammar engine
            # corrupts state on concurrent access, so enforce it here too).
            for _, c in bnf_live:
                if c.bnf_future is not None:
                    await c.bnf_future
                    c.bnf_future = None

            def _replay(ctx, toks):
                if ctx.dfa_table is not None:
                    # Device-DFA row: every token was sampled under the
                    # exact per-step mask ON DEVICE — the host walk only
                    # advances the grammar books and finds the halt
                    # position (the scan froze the row there).
                    acc, halted = 0, False
                    for t in toks:
                        halted = ctx.formatter.accept(int(t))
                        acc += 1
                        if halted:
                            break
                    return acc, halted, None
                acc, halted, new_mask = 0, False, None
                for t in toks:
                    halted = ctx.formatter.accept(int(t))
                    acc += 1
                    if halted:
                        break
                    m = ctx.formatter.allowed_mask()
                    if ctx.bnf_mask is None or not np.array_equal(
                            m, ctx.bnf_mask):
                        new_mask = m
                        break
                return acc, halted, new_mask

            rs = await asyncio.gather(*[
                loop.run_in_executor(
                    None, _replay, c,
                    toks_seq[:spec["budgets"][s.index], s.index])
                for s, c in bnf_live])
            replays = {s.index: r for (s, c), r in zip(bnf_live, rs)}

        for s, ctx in live:
            b = s.index
            if b in dead:
                continue  # invalidated by a BNF mis-spec last consume
            kb = spec["budgets"][b]          # tokens this row really drew
            row = [int(t) for t in toks_seq[:kb, b]]
            in_successor = (newspec is not None
                            and b in newspec["rows"])
            if ctx.formatter is not None and not ctx.handle.aborted:
                await self._consume_bnf_row(
                    loop, s, ctx, row, kb, replays[b], newspec)
                continue
            if ctx.handle.aborted:
                # Record all kb consumed tokens so cache/resident keys
                # stay honest; if the successor advanced this row past
                # the abort, restore it to its post-chunk state (ring
                # depth -1 == this chunk's pre-successor output).
                ctx.all_tokens.extend(row)
                if in_successor:
                    self.metrics["rollbacks"] += 1
                    await loop.run_in_executor(
                        self._device_pool,
                        self.engine.rollback_row, b, [], -1)
                await self._finalize(s, FinishReason.ABORT)
                continue
            for j, token in enumerate(row):
                reason = await self._postprocess_token(s, token)
                if reason is None:
                    continue
                # Honest books: append the over-decoded suffix the scan
                # consumed but the request never saw (last sampled token
                # stays un-fed, preserving the _consumed_tokens
                # invariant).
                ctx.all_tokens.extend(row[j + 1:])
                if in_successor:
                    self.metrics["rollbacks"] += 1
                    await loop.run_in_executor(
                        self._device_pool,
                        self.engine.rollback_row, b, [], -1)
                await self._finalize(s, reason)
                break
        self._spec = newspec

    async def _consume_bnf_row(self, loop, s, ctx, row, kb, replay,
                               newspec) -> None:
        """Process one BNF row's chunk tokens using the replay verdict.

        ``replay = (acc, halted, new_mask)``: the grammar accepted
        ``row[:acc]``; ``halted`` means the grammar completed on the
        acc-th token; ``new_mask`` is the changed allowed mask (tokens
        past acc were sampled under a stale mask and are DISCARDED).
        Exactness: every emitted token was sampled under a mask equal to
        the true grammar mask at its step — identical distribution to
        per-token stepping (bnf.rs:35-47 semantics).
        """
        b = s.index
        acc, halted, new_mask = replay
        # Device-DFA rows freeze ON DEVICE at the halting token: tokens
        # past ``acc`` were never consumed (the scan emitted frozen
        # copies), so the books end at ``acc`` and no rollback is needed
        # — the successor kept the row frozen too.
        dfa_halt = ctx.dfa_table is not None and halted
        if ctx.dfa_table is not None and acc:
            # The replay advanced the HOST formatter; the host mask
            # (mask_pool, used only by merged per-token steps) is now
            # stale and must be recomputed if this row ever takes one
            # (e.g. a mixed prefill+decode step while a new request
            # admits).  The DEVICE state needs no sync — the scan
            # advanced it in lockstep.
            ctx.bnf_dirty = True
        reason = None
        for j in range(acc):
            reason = await self._postprocess_token(
                s, row[j], halted=(halted and j == acc - 1))
            if reason is not None:
                # Honest books for the rest of what the scan consumed.
                ctx.all_tokens.extend(row[j + 1: acc if dfa_halt
                                          else len(row)])
                break

        if reason is not None:
            if (newspec is not None and b in newspec["rows"]
                    and not dfa_halt):
                newspec["dead"].add(b)
                self.metrics["rollbacks"] += 1
                await loop.run_in_executor(
                    self._device_pool,
                    self.engine.rollback_row, b, [], -1)
            await self._finalize(s, reason)
            return

        self.metrics["bnf_accepted"] += acc
        if new_mask is None:
            # Full chunk accepted under an unchanged mask: nothing to fix.
            ctx.bnf_misses = 0
            ctx.bnf_full_accept = True
            return

        # Mis-speculation: tokens past ``acc`` were sampled under a stale
        # mask.  Resume the row at its accepted prefix.
        ctx.bnf_full_accept = False
        self.metrics["rollbacks"] += 1
        if newspec is not None and b in newspec["rows"]:
            newspec["dead"].add(b)
        if acc < kb:
            # The scan over-consumed state: restore from THIS chunk's
            # pre-snapshot and re-feed the accepted tokens (device-side).
            depth = -2 if newspec is not None else -1
            feed = ctx.all_tokens[-(acc + 1):-1]
            await loop.run_in_executor(
                self._device_pool,
                self.engine.rollback_row, b, feed, depth)
            await loop.run_in_executor(
                self._device_pool, self._rebuild_sampler_state, b, ctx)
        elif newspec is not None and b in newspec["dead"]:
            # State is exactly post-chunk, but the successor advanced it:
            # restore the post-chunk row and rebuild the sampler state.
            await loop.run_in_executor(
                self._device_pool, self.engine.rollback_row, b, [], -1)
            await loop.run_in_executor(
                self._device_pool, self._rebuild_sampler_state, b, ctx)
        ctx.bnf_mask = new_mask
        ctx.bnf_dirty = False
        ctx.bnf_sticky = 0
        self.engine.set_row_mask(b, new_mask)
        # Grammars whose mask shifts every token or two gain nothing from
        # chunking (every chunk rolls back almost immediately): fall back
        # to per-token merged stepping for this request.
        if acc <= 2:
            ctx.bnf_misses += 1
            self.metrics["bnf_short_chunks"] += 1
            if ctx.bnf_misses >= 2:
                if not ctx.bnf_no_chunk:
                    self.metrics["bnf_fallbacks"] += 1
                ctx.bnf_no_chunk = True
        else:
            ctx.bnf_misses = 0

    async def _admit(self) -> None:
        """Assign pending requests to free slots (Continue > Empty > Back)."""
        remaining = []
        for ctx in self.pending:
            if ctx.handle.aborted:
                await ctx.handle.queue.put(
                    ("stop", FinishReason.ABORT, ctx.counter))
                await ctx.handle.queue.put(("done",))
                continue
            slot = self._choose_slot(ctx)
            if slot is None:
                remaining.append(ctx)
                continue
            installed = await self._install(slot, ctx)
            if not installed:
                # Deferred on an in-flight prefix-cache future: the prefill
                # resolving it runs in THIS loop, so never await here — just
                # re-check next iteration (the reference gets this for free
                # from per-slot tokio tasks).
                remaining.append(ctx)
        self.pending = remaining

    def _choose_slot(self, ctx: _ReqCtx) -> Optional[_Slot]:
        """Continue > Empty > Back (run.rs:304-331,503-532)."""
        best_cont, best_len = None, 0
        empty = None
        oldest = None
        for s in self.slots:
            if s.phase != _SlotPhase.IDLE:
                continue
            if not s.resident_tokens and empty is None:
                empty = s
            if (s.resident_state_id == ctx.state_id
                    and s.resident_tokens
                    and len(s.resident_tokens) < len(ctx.prompt_tokens)
                    and ctx.prompt_tokens[: len(s.resident_tokens)]
                    == s.resident_tokens
                    and len(s.resident_tokens) > best_len):
                best_cont, best_len = s, len(s.resident_tokens)
            if oldest is None or s.idle_since < oldest.idle_since:
                oldest = s
        return best_cont or empty or oldest

    async def _install(self, slot: _Slot, ctx: _ReqCtx) -> bool:
        """Checkout the longest cached prefix and configure the engine row.

        Returns False (without touching the slot) when admission should be
        deferred: the best cached prefix is an in-flight future owned by a
        prefill that this same drive loop must execute — awaiting it here
        would deadlock the whole runtime.
        """
        eng = self.engine
        b = slot.index
        exact_item: CachedItem | None = None

        # Mean-hidden embeds read the step()-accumulated hidden sums, so
        # their FULL prompt must run through step() from a fresh state:
        # no resident-state continue, no prefix-cache checkout.  (The
        # whole point: one prefill instead of prefill + a dedicated
        # re-forward; skipping reuse costs at most what the old dedicated
        # forward always paid.)
        mean_hidden = (ctx.request.pooled
                       and ctx.request.kind == GenerateKind.STATE
                       and ctx.request.effective_pooling() == "mean_hidden")

        reused = 0
        if mean_hidden:
            init = (self.states.get(ctx.state_id)
                    if ctx.request.state_id else None)
            eng.load_row_state(
                b, _to_device(init) if init is not None else None)
        elif (slot.resident_state_id == ctx.state_id and slot.resident_tokens
                and len(slot.resident_tokens) < len(ctx.prompt_tokens)
                and ctx.prompt_tokens[: len(slot.resident_tokens)]
                == slot.resident_tokens):
            # Continue-in-place: resident state is a strict prompt prefix.
            reused = len(slot.resident_tokens)
        else:
            cache = self.cache_for(ctx.state_id)
            plen, item = cache.longest_prefix(ctx.prompt_tokens)
            if isinstance(item, asyncio.Future):
                if item.done():
                    try:
                        item = item.result()
                    except Exception:
                        item = None
                else:
                    now = time.monotonic()
                    if ctx.defer_deadline == 0.0:
                        ctx.defer_deadline = now + 60.0
                    if now < ctx.defer_deadline:
                        return False  # re-admit next drive iteration
                    item = None  # gave up waiting: treat as cache miss
            if (isinstance(item, CachedItem)
                    and plen == len(ctx.prompt_tokens)
                    and item.logits is None
                    and ctx.request.kind != GenerateKind.STATE):
                # Exact hit WITHOUT prompt-end logits (a Back-cached item,
                # run.rs:990-1005).  Generate needs logits to sample from;
                # choose needs them for the head log-prob term
                # (run.rs:968-976) — back off to a strict prefix so the
                # last token is re-fed and the logits regenerate.
                plen, item = cache.longest_prefix(
                    ctx.prompt_tokens, strict=True)
                if isinstance(item, asyncio.Future):
                    try:
                        item = item.result() if item.done() else None
                    except Exception:
                        item = None
                if item is None:
                    plen = 0
            if isinstance(item, CachedItem):
                item.instant = time.monotonic()
                if plen == len(ctx.prompt_tokens) and item.logits is not None:
                    exact_item = item
                eng.load_row_state(b, _to_device(item.state))
                reused = plen
            else:
                init = self.states.get(ctx.state_id)
                eng.load_row_state(
                    b, _to_device(init) if init is not None else None)

        ctx.remaining = list(ctx.prompt_tokens[reused:])
        ctx.all_tokens = list(ctx.prompt_tokens)

        # Penalty init from model-authored tokens (run.rs:152-188).
        eng.set_row_sampler(b, ctx.request.sampler.row_params(),
                            prompt_tokens=ctx.model_tokens)
        bias = None
        if ctx.request.bias:
            bias = np.zeros(eng.vocab, np.float32)
            for t, v in ctx.request.bias.items():
                if 0 <= int(t) < eng.vocab:
                    bias[int(t)] = v
        eng.set_row_bias(b, bias)
        eng.set_row_mask(b, None)
        if ctx.dfa_future is not None:
            res = await ctx.dfa_future
            ctx.dfa_future = None
            if res is not None:
                ctx.dfa_table, ctx.dfa_map = res
        if ctx.dfa_table is not None:
            # Grammar starts fresh at generation start: table row 0.
            # The first token is sampled by the prefill step under the
            # host-uploaded mask; the device state is synced to the
            # grammar before the first chunk launch (dfa_stale).
            eng.set_row_dfa(b, ctx.dfa_table, 0, key=ctx.dfa_key)
            ctx.dfa_stale = False
        else:
            eng.clear_row_dfa(b)

        # In-flight cache future for this prompt (run.rs:191-205).
        if (len(ctx.prompt_tokens) >= MIN_PROMPT_CACHE_TOKENS
                and ctx.request.kind == GenerateKind.GENERATE
                and exact_item is None and ctx.remaining):
            fut = asyncio.get_event_loop().create_future()
            self.cache_for(ctx.state_id).insert(ctx.prompt_tokens, fut)
            ctx.cache_future = fut

        slot.ctx = ctx
        slot.resident_state_id = ctx.state_id
        self.metrics["requests_started"] += 1
        if reused:
            self.metrics["cache_hits"] += 1
        await ctx.handle.queue.put(("start",))

        if exact_item is not None:
            # The cached prompt-end logits serve the sample fast path
            # (GENERATE) and the head log-prob term (CHOOSE, run.rs:968-976).
            ctx.prefill_logits = exact_item.logits
        if exact_item is not None \
                and ctx.request.kind == GenerateKind.GENERATE:
            # Exact-hit fast path: sample directly from the cached
            # prompt-end logits (reference CachedItem.output, run.rs:199-223).
            slot.phase = _SlotPhase.DECODE
            if ctx.formatter is not None:
                ctx.bnf_mask = ctx.formatter.allowed_mask()
                ctx.bnf_dirty = False
                eng.set_row_mask(b, ctx.bnf_mask)
            token = await asyncio.get_event_loop().run_in_executor(
                None, eng.sample_only, b, exact_item.logits)
            await self._accept_token(slot, token)
        elif not ctx.remaining:
            # Cached state covers the whole prompt but without logits (e.g.
            # STATE/CHOOSE flows, which never sample): handle per kind.
            if ctx.request.kind == GenerateKind.STATE:
                await self._emit_state(slot)
            elif ctx.request.kind == GenerateKind.CHOOSE:
                await self._run_choose(slot)
            else:
                # Re-prefill the last token is incorrect; redo the prompt.
                ctx.remaining = list(ctx.prompt_tokens)
                init = self.states.get(ctx.state_id)
                eng.load_row_state(
                    b, _to_device(init) if init is not None else None)
                slot.phase = _SlotPhase.PREFILL
        else:
            slot.phase = _SlotPhase.PREFILL
        return True

    async def _advance(self, slot: _Slot, lengths, sample_mask,
                       result) -> None:
        ctx = slot.ctx
        if ctx is None:
            return
        b = slot.index

        # Account for what the engine consumed THIS step before any abort
        # check: on disconnect the row state has still advanced by the fed
        # chunk/token, and resident_tokens/cache keys must reflect that —
        # otherwise a retried identical prompt takes the continue-in-place
        # path and double-feeds tokens.
        if slot.phase == _SlotPhase.PREFILL:
            fed = int(lengths[b])
            del ctx.remaining[:fed]
        elif sample_mask[b] and ctx.handle.aborted:
            # Decode row: the previous sample (all_tokens[-1]) was fed this
            # step; the fresh sample was NOT.  Appending it keeps
            # _consumed_tokens' all_tokens[:-1] invariant exact.
            ctx.all_tokens.append(int(result.tokens[b]))

        if ctx.handle.aborted:
            await self._finalize(slot, FinishReason.ABORT)
            return

        if slot.phase == _SlotPhase.PREFILL:
            if ctx.remaining:
                return  # still prefilling
            # Prefill done: cache the prompt state (run.rs:789-804).
            # Non-blocking, like the finalize-path Back store: the
            # device-side row copy is enqueued NOW (before any later pool
            # write can race it); the multi-MB device->host transfer runs
            # in a worker thread and the trie insert lands via a loop
            # callback.  The synchronous form stalled the whole drive
            # loop one RTT + transfer per completed prefill.
            if ctx.cache_future is not None and not ctx.prefill_cached:
                ctx.prefill_cached = True
                loop = asyncio.get_event_loop()
                row = await loop.run_in_executor(
                    self._device_pool, self.engine.read_row_state_device,
                    b)
                cache = self.cache_for(ctx.state_id)
                lazy = ctx.prefill_logits

                def _materialize(r=row, lg=lazy):
                    return (jax.tree.map(np.asarray, r),
                            lg.get() if lg is not None else None)

                fut = loop.run_in_executor(None, _materialize)
                self._cache_stores.add(fut)
                cf = ctx.cache_future
                key = ctx.prompt_tokens

                def _store(f, cache=cache, cf=cf, key=key):
                    self._cache_stores.discard(f)
                    try:
                        state_np, logits_np = f.result()
                        item = CachedItem(state=state_np, logits=logits_np,
                                          tokens=key)
                        cache.insert(key, item)
                        cache.maintain()
                        if not cf.done():
                            cf.set_result(item)
                    except Exception:
                        logger.exception("prefill cache store failed")
                        if not cf.done():
                            cf.set_result(None)

                fut.add_done_callback(_store)
            if ctx.request.kind == GenerateKind.STATE:
                await self._emit_state(slot)
                return
            if ctx.request.kind == GenerateKind.CHOOSE:
                await self._run_choose(slot)
                return
            slot.phase = _SlotPhase.DECODE
            if not sample_mask[b]:
                return

        token = int(result.tokens[b])
        await self._accept_token(slot, token)

    async def _postprocess_token(self, slot: _Slot, token: int,
                                 halted: bool | None = None
                                 ) -> FinishReason | None:
        """Append + stream one sampled token; detect stop conditions.

        Returns the finish reason (without finalizing) or None to keep
        decoding.  ``halted`` carries a precomputed grammar-halt verdict
        when the BNF replay already advanced the formatter (chunked BNF
        rows); None means advance it here.
        """
        ctx = slot.ctx
        ctx.all_tokens.append(token)
        ctx.counter.completion += 1

        if halted is None:
            if ctx.formatter is not None:
                if ctx.bnf_future is not None:
                    # Never advance the grammar while a mask computation
                    # is in flight on the executor.
                    await ctx.bnf_future
                    ctx.bnf_future = None
                halted = ctx.formatter.accept(token)
                ctx.bnf_dirty = True
                ctx.dfa_stale = True  # host advanced outside a chunk
                if not halted and ctx.dfa_table is None:
                    # Mask-ahead: start the next allowed-mask computation
                    # now; _refresh_bnf_mask collects it before the next
                    # step (per-token rows only — chunked rows compute
                    # masks inside their replay; device-DFA rows never
                    # take per-token masked steps after this one).
                    ctx.bnf_future = asyncio.get_event_loop() \
                        .run_in_executor(None, ctx.formatter.allowed_mask)
            else:
                halted = False

        if token == END_OF_TEXT:
            await self._emit_bytes(ctx, b"", final=True)
            return FinishReason.STOP

        data = self.tokenizer.token_to_bytes(token)
        stopped = await self._emit_bytes(ctx, data)
        if stopped:
            return FinishReason.STOP
        if halted:
            await self._emit_bytes(ctx, b"", final=True)
            return FinishReason.STOP
        if ctx.counter.completion >= ctx.request.max_tokens:
            await self._emit_bytes(ctx, b"", final=True)
            return FinishReason.LENGTH
        slot.phase = _SlotPhase.DECODE
        return None

    async def _accept_token(self, slot: _Slot, token: int) -> bool:
        """Post-process one sampled token; finalize on a stop condition.
        Returns True when the slot finished."""
        reason = await self._postprocess_token(slot, token)
        if reason is not None:
            await self._finalize(slot, reason)
            return True
        return False

    async def _emit_bytes(self, ctx: _ReqCtx, data: bytes,
                          final: bool = False) -> bool:
        emit, stopped = ctx.stop.push(data)
        if final:
            emit += ctx.stop.flush()
        text = ctx.utf8.push(emit)
        if final:
            text += ctx.utf8.flush()
        if text:
            await ctx.handle.queue.put(("content", text))
        return stopped

    async def _emit_state(self, slot: _Slot) -> None:
        if slot.ctx.request.pooled:
            ctx = slot.ctx
            if ctx.request.effective_pooling() == "mean_hidden":
                # Default init state: mean-hidden readout off the hidden
                # sums the serving prefill ALREADY accumulated (install
                # forced a fresh-state full-prompt prefill for this row),
                # so an embed costs exactly one forward.  The pool pull
                # is COALESCED: when several embed rows complete in the
                # same step, the first readout downloads the whole
                # (B, C) pool once (hsum_serial-keyed snapshot) and the
                # rest slice it — N tunnel round-trips become one.
                def _mean(b=slot.index, n=len(ctx.prompt_tokens)):
                    snap = self._hsum_snap
                    serial = self.engine.hsum_serial
                    if snap is None or snap[0] != serial:
                        snap = (serial, self.engine.read_hidden_sums())
                        self._hsum_snap = snap
                    v = (snap[1][b] / max(n, 1)).astype(np.float64)
                    return (v / max(float(np.linalg.norm(v)), 1e-12)
                            ).astype(np.float32)

                vec = await asyncio.get_event_loop().run_in_executor(
                    self._device_pool, _mean)
            else:
                # Custom initial state: its influence lives in the row
                # state, so pool that (the legacy readout).
                vec = await asyncio.get_event_loop().run_in_executor(
                    None, self.engine.read_row_embed, slot.index)
            await slot.ctx.handle.queue.put(("embed_vec", vec))
        else:
            state = await asyncio.get_event_loop().run_in_executor(
                None, self.engine.read_row_state, slot.index)
            await slot.ctx.handle.queue.put(("embed", state))
        await self._finalize(slot, FinishReason.STOP)

    def _consumed_tokens(self, ctx: _ReqCtx) -> tuple[int, ...]:
        """Tokens the engine state has actually consumed.

        Every decode path leaves exactly ONE pending token: the freshly
        sampled one is only fed on the next step.  Mid-prefill aborts have
        consumed only a prompt prefix.  Cache keys and resident-token
        records must use this, not ``all_tokens`` — an off-by-one key
        would corrupt prefix-cache continuations.
        """
        if ctx.remaining:  # aborted mid-prefill
            n = len(ctx.prompt_tokens) - len(ctx.remaining)
            return ctx.prompt_tokens[:n]
        if len(ctx.all_tokens) > len(ctx.prompt_tokens):
            return tuple(ctx.all_tokens[:-1])  # last sample not yet fed
        return tuple(ctx.all_tokens)

    async def _finalize(self, slot: _Slot, reason: FinishReason) -> None:
        ctx = slot.ctx
        b = slot.index
        ctx.counter.duration = time.monotonic() - ctx.start_time

        if ctx.cache_future is not None and not ctx.cache_future.done():
            ctx.cache_future.set_result(None)
            if not ctx.prefill_cached:
                self.cache_for(ctx.state_id).remove(ctx.prompt_tokens)

        consumed = self._consumed_tokens(ctx)

        # Back: cache the final state keyed by the consumed tokens
        # (run.rs:990-1005).
        if (ctx.request.kind == GenerateKind.GENERATE
                and reason in (FinishReason.STOP, FinishReason.LENGTH)
                and len(consumed) >= MIN_PROMPT_CACHE_TOKENS):
            # Non-blocking Back-cache store: the device-side row copy is
            # enqueued NOW (so slot reuse cannot race it); the 6-34 MB
            # device->host transfer runs in a worker thread and the
            # insert lands via a loop callback.  The synchronous form
            # stalled the whole drive loop one RTT+transfer per finished
            # request.
            row = self.engine.read_row_state_device(b)
            cache = self.cache_for(ctx.state_id)
            loop = asyncio.get_event_loop()
            fut = loop.run_in_executor(
                None, lambda r=row: jax.tree.map(np.asarray, r))
            self._cache_stores.add(fut)

            def _store(f, cache=cache, consumed=consumed):
                self._cache_stores.discard(f)
                try:
                    cache.insert(consumed, CachedItem(
                        state=f.result(), logits=None, tokens=consumed))
                    cache.maintain()
                except Exception:  # cache store is best-effort
                    logger.exception("back-cache store failed")

            fut.add_done_callback(_store)

        self.metrics["requests_finished"] += 1
        await ctx.handle.queue.put(("stop", reason, ctx.counter))
        await ctx.handle.queue.put(("done",))
        # Drop compile-key-relevant sampler params (kind, top_k) back to
        # defaults: an idle row's values otherwise stay in engine
        # ._sampler_key() and one finished top_k=0 / mirostat request
        # would force every later batch into its slow bucket.
        self.engine.reset_row_sampler_key(b)
        slot.resident_tokens = consumed
        slot.idle_since = time.monotonic()
        slot.phase = _SlotPhase.IDLE
        slot.ctx = None
        self._wake.set()

    async def flush_cache_stores(self) -> None:
        """Await all in-flight Back-cache store transfers (tests/shutdown;
        the stores themselves are off the drive loop's critical path)."""
        while self._cache_stores:
            await asyncio.gather(*list(self._cache_stores),
                                 return_exceptions=True)
            await asyncio.sleep(0)  # let the done-callbacks run

    # ------------------------------------------------------------------
    # Choose (perplexity classification, run.rs:936-1010)
    # ------------------------------------------------------------------

    async def _run_choose(self, slot: _Slot) -> None:
        loop = asyncio.get_event_loop()
        ctx = slot.ctx
        b = slot.index
        choices_tokens = [tuple(self.tokenizer.encode(c))
                          for c in ctx.request.choices]
        ppl = [float("inf")] * len(choices_tokens)

        if ctx.request.calibrate:
            # Perplexity of each choice from the INIT state, negated
            # (run.rs:941-963; divisor is len(choice)+1 via the [0] prefix).
            init = self.states.get(ctx.state_id)
            for i, toks in enumerate(choices_tokens):
                if not toks:
                    continue
                fed = (END_OF_TEXT,) + toks
                lp = await loop.run_in_executor(
                    None, lambda f=fed: self.engine.position_logps(
                        list(f),
                        state=init if init is not None
                        else _host_init(self.engine)))
                ppl[i] = float(np.sum(lp)) / len(fed)

        head_logp = None
        if ctx.prefill_logits is not None:
            raw = ctx.prefill_logits
            if isinstance(raw, _LazyLogitsRow):
                raw = await loop.run_in_executor(None, raw.get)
            x = raw.astype(np.float64)
            x = x - x.max()
            head_logp = x - np.log(np.exp(x).sum())

        for i, toks in enumerate(choices_tokens):
            if not toks:
                continue
            lp = await loop.run_in_executor(
                None, lambda t=toks: self.engine.position_logps(
                    list(t), b=b))
            h = float(head_logp[toks[0]]) if head_logp is not None else 0.0
            p = -(h + float(np.sum(lp))) / len(toks)
            ppl[i] = (ppl[i] + p) if ctx.request.calibrate else p

        await ctx.handle.queue.put(("choose", ppl))
        await self._finalize(slot, FinishReason.STOP)


def _to_device(state_host):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, state_host)


def _host_init(engine: Engine):
    import jax

    return jax.tree.map(np.asarray, engine.fresh_row_state())
