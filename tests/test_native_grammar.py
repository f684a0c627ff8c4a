"""Native (C++) grammar engine vs the pure-Python Earley reference."""

import numpy as np
import pytest

from ai00_server_tpu import native
from ai00_server_tpu.grammar import GrammarEngine
from ai00_server_tpu.tokenizer import Tokenizer

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native lib unavailable (no g++)")

GRAMMARS = [
    "start ::= 'ab' | 'cd';",
    "start ::= 'a'* 'b'+ 'c'?;",
    "start ::= expr; expr ::= '(' expr ')' | 'x';",
    "start ::= a b 'z'; a ::= 'x' | ; b ::= 'y' | ;",
    r"start ::= #'[a-c]+[0-9]{2}';",
    r"""
    start ::= object;
    object ::= '{' ws pair (',' ws pair)* ws '}' | '{' ws '}';
    pair ::= string ws ':' ws value;
    value ::= string | number | object | 'true' | 'false' | 'null';
    string ::= '"' #'[a-zA-Z0-9_ ]*' '"';
    number ::= #'-?[0-9]+(\.[0-9]+)?';
    ws ::= #'[ \t\n]*';
    """,
]

INPUTS = [
    "ab", "cd", "ad", "aabbc", "b", "((x))", "((x)", "xyz", "z", "xy",
    "ab12", "c00", "abc", '{"a": 1}', '{"a": {"b": "c"}}', '{"a" 1}', "{}",
]


@pytest.mark.parametrize("g", GRAMMARS, ids=range(len(GRAMMARS)))
def test_advance_and_finish_parity(g):
    for s in INPUTS:
        py = GrammarEngine(g)
        nat = native.NativeGrammarEngine(g)
        data = s.encode()
        ok_py = py.advance(data)
        ok_nat = nat.advance(data)
        assert ok_py == ok_nat, (g, s)
        if ok_py:
            assert py.can_finish() == nat.can_finish(), (g, s)
            assert py.allowed_bytes() == nat.allowed_bytes(), (g, s)
            assert py.must_finish() == nat.must_finish(), (g, s)


@pytest.fixture(scope="module")
def tiny_tokenizer():
    vocab = {}
    tid = 1
    for ch in 'abcdefghij(){}:,"0123456789 xyz':
        vocab[tid] = ch.encode()
        tid += 1
    for s in ["ab", "abc", "true", "null", '"a"', "((", "))"]:
        vocab[tid] = s.encode()
        tid += 1
    return Tokenizer(vocab)


@pytest.mark.parametrize("g", GRAMMARS, ids=range(len(GRAMMARS)))
def test_allowed_tokens_parity(g, tiny_tokenizer):
    tok = tiny_tokenizer
    for prefix in ["", "a", "(", '{"a', "x"]:
        py = GrammarEngine(g)
        nat = native.NativeGrammarEngine(g)
        data = prefix.encode()
        if not py.advance(data):
            assert not nat.advance(data)
            continue
        assert nat.advance(data)
        assert sorted(py.allowed_tokens(tok)) == \
            sorted(nat.allowed_tokens(tok)), (g, prefix)


def test_full_vocab_speed():
    """Native masking against the real 65529-token world vocab."""
    import time

    tok = Tokenizer.from_file(
        "/root/reference/assets/tokenizer/rwkv_vocab_v20230424.json")
    g = r"""
    start ::= object;
    object ::= '{' ws pair (',' ws pair)* ws '}' | '{' ws '}';
    pair ::= string ws ':' ws value;
    value ::= string | number | object | 'true' | 'false' | 'null';
    string ::= '"' #'[a-zA-Z0-9_ ]*' '"';
    number ::= #'-?[0-9]+(\.[0-9]+)?';
    ws ::= #'[ ]*';
    """
    nat = native.NativeGrammarEngine(g)
    t0 = time.time()
    ids0 = nat.allowed_tokens(tok)
    first_ms = (time.time() - t0) * 1e3
    assert ids0  # '{' and friends
    assert nat.advance(b'{"key": ')
    t0 = time.time()
    ids = nat.allowed_tokens(tok)
    step_ms = (time.time() - t0) * 1e3
    assert ids
    # Production budget: a mask per decode step must be far under the
    # ~1-10ms device step time.
    assert step_ms < 100, f"native mask too slow: {step_ms:.1f}ms"
    texts = {tok.token_to_bytes(t) for t in ids}
    assert b'"' in texts
    assert b"7" in texts or b"1" in texts
