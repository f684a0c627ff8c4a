"""Build + bind the native (C++) runtime components via ctypes.

The shared library is compiled on demand from ``native/*.cpp`` with g++
(no pybind11 in this environment; plain C ABI).  Artifacts are cached in
``native/build/`` keyed by a source hash.  Everything here has a pure-
Python fallback (grammar.py), so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import weakref

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "grammar_engine.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_BUILD_DIR, f"libai00_native_{digest}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = out + ".tmp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
        check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            lib = ctypes.CDLL(_build())
        except Exception:
            _lib_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.grammar_new.restype = ctypes.c_void_p
        lib.grammar_new.argtypes = [i64p, ctypes.c_int64, u64p,
                                    ctypes.c_int64, ctypes.c_int64]
        lib.grammar_free_grammar.argtypes = [ctypes.c_void_p]
        lib.engine_new.restype = ctypes.c_void_p
        lib.engine_new.argtypes = [ctypes.c_void_p]
        lib.engine_free.argtypes = [ctypes.c_void_p]
        lib.engine_advance.restype = ctypes.c_int
        lib.engine_advance.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
        lib.engine_can_finish.restype = ctypes.c_int
        lib.engine_can_finish.argtypes = [ctypes.c_void_p]
        lib.engine_dead.restype = ctypes.c_int
        lib.engine_dead.argtypes = [ctypes.c_void_p]
        lib.engine_allowed_bytes.argtypes = [ctypes.c_void_p, u8p]
        lib.trie_new.restype = ctypes.c_void_p
        lib.trie_new.argtypes = [i32p, u8p, i32p, i32p, ctypes.c_int64,
                                 ctypes.c_int64]
        lib.trie_free.argtypes = [ctypes.c_void_p]
        lib.engine_allowed_tokens.restype = ctypes.c_int64
        lib.engine_allowed_tokens.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i32p, ctypes.c_int64]
        _lib = lib
        return _lib


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class NativeTrie:
    """CSR form of a Tokenizer's byte trie, owned by the native lib."""

    # Weak-keyed so an entry dies with its tokenizer: a plain id()-keyed
    # dict can hand back a stale trie after CPython reuses the id of a
    # GC'd tokenizer (e.g. across admin model reloads).
    _cache: "weakref.WeakKeyDictionary" = None  # created lazily below

    def __init__(self, tokenizer):
        lib = get_lib()
        assert lib is not None
        children = tokenizer._children
        accept = tokenizer._accept
        n_nodes = len(children)
        edge_start = np.zeros(n_nodes + 1, np.int32)
        bytes_l, targets = [], []
        for i, ch in enumerate(children):
            edge_start[i] = len(bytes_l)
            for b in sorted(ch):
                bytes_l.append(b)
                targets.append(ch[b])
        edge_start[n_nodes] = len(bytes_l)
        self._edge_start = edge_start
        self._edge_byte = np.asarray(bytes_l, np.uint8)
        self._edge_target = np.asarray(targets, np.int32)
        self._accept = np.asarray(accept, np.int32)
        self.ptr = lib.trie_new(
            _as_ptr(self._edge_start, ctypes.c_int32),
            _as_ptr(self._edge_byte, ctypes.c_uint8),
            _as_ptr(self._edge_target, ctypes.c_int32),
            _as_ptr(self._accept, ctypes.c_int32),
            n_nodes, len(bytes_l))
        self._lib = lib

    @classmethod
    def for_tokenizer(cls, tokenizer) -> "NativeTrie":
        if cls._cache is None:
            cls._cache = weakref.WeakKeyDictionary()
        t = cls._cache.get(tokenizer)
        if t is None:
            t = cls._cache[tokenizer] = cls(tokenizer)
        return t

    def __del__(self):
        try:
            self._lib.trie_free(self.ptr)
        except Exception:
            pass


class NativeGrammarEngine:
    """ctypes twin of grammar.GrammarEngine (same API surface)."""

    def __init__(self, text: str, start: str = "start"):
        from .grammar import lower_grammar

        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        data, classes, start_id = lower_grammar(text, start)
        self._data = np.asarray(data, np.int64)
        self._classes = np.asarray(classes, np.uint64).reshape(-1)
        self._lib = lib
        self._grammar = lib.grammar_new(
            _as_ptr(self._data, ctypes.c_int64), len(self._data),
            _as_ptr(self._classes, ctypes.c_uint64),
            len(self._classes) // 4, start_id)
        self._engine = lib.engine_new(self._grammar)

    def __del__(self):
        try:
            self._lib.engine_free(self._engine)
            self._lib.grammar_free_grammar(self._grammar)
        except Exception:
            pass

    @property
    def dead(self) -> bool:
        return bool(self._lib.engine_dead(self._engine))

    def advance(self, data: bytes) -> bool:
        arr = np.frombuffer(data, np.uint8)
        if len(arr) == 0:
            return not self.dead
        return bool(self._lib.engine_advance(
            self._engine, _as_ptr(arr, ctypes.c_uint8), len(arr)))

    def can_finish(self) -> bool:
        return bool(self._lib.engine_can_finish(self._engine))

    def allowed_bytes(self) -> int:
        out = np.zeros(256, np.uint8)
        self._lib.engine_allowed_bytes(
            self._engine, _as_ptr(out, ctypes.c_uint8))
        mask = 0
        for b in np.nonzero(out)[0]:
            mask |= 1 << int(b)
        return mask

    def must_finish(self) -> bool:
        return self.can_finish() and self.allowed_bytes() == 0

    def allowed_tokens(self, tokenizer) -> list[int]:
        trie = NativeTrie.for_tokenizer(tokenizer)
        out = np.zeros(tokenizer.vocab_len + 1, np.int32)
        n = self._lib.engine_allowed_tokens(
            self._engine, trie.ptr, _as_ptr(out, ctypes.c_int32), len(out))
        return out[:n].tolist()


def make_grammar_engine(text: str, start: str = "start"):
    """Native engine when buildable, else the pure-Python one."""
    if os.environ.get("AI00_GRAMMAR_IMPL") != "python" and get_lib():
        try:
            return NativeGrammarEngine(text, start)
        except RuntimeError:
            pass
    from .grammar import GrammarEngine

    return GrammarEngine(text, start=start)
