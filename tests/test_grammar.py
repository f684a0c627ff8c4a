"""KBNF grammar engine: recognition, masking, and BNF formatter behavior."""

import numpy as np
import pytest

from ai00_server_tpu.grammar import GrammarEngine, GrammarError
from ai00_server_tpu.tokenizer import Tokenizer
from ai00_server_tpu.bnf import BnfFormatter


def accepts(g: str, s: str, start="start") -> bool:
    e = GrammarEngine(g, start=start)
    return e.advance(s.encode()) and e.can_finish()


def test_literal_and_alternation():
    g = "start ::= 'ab' | 'cd';"
    assert accepts(g, "ab")
    assert accepts(g, "cd")
    assert not accepts(g, "ad")
    assert not accepts(g, "abc")  # can't finish isn't enough: 'c' rejects
    e = GrammarEngine(g)
    assert e.advance(b"a")
    assert not e.can_finish()
    assert not e.advance(b"d")
    assert e.dead


def test_repetition_ops():
    g = "start ::= 'a'* 'b'+ 'c'?;"
    for s, ok in [("b", True), ("aab", True), ("abbc", True), ("c", False),
                  ("aac", False), ("aabbc", True), ("", False)]:
        assert accepts(g, s) == ok, s


def test_recursion_nesting():
    g = "start ::= expr; expr ::= '(' expr ')' | 'x';"
    for s, ok in [("x", True), ("(x)", True), ("((x))", True),
                  ("((x)", False), ("()", False)]:
        assert accepts(g, s) == ok, s


def test_nullable_rules():
    g = "start ::= a b 'z'; a ::= 'x' | ; b ::= 'y' | ;"
    for s, ok in [("xyz", True), ("yz", True), ("xz", True), ("z", True),
                  ("xy", False)]:
        assert accepts(g, s) == ok, s


def test_regex_terminal():
    g = "start ::= #'[a-c]+[0-9]{2}';"
    for s, ok in [("ab12", True), ("c00", True), ("abc", False),
                  ("1a", False), ("aa1", False)]:
        assert accepts(g, s) == ok, s


def test_regex_alternation_and_escapes():
    g = r"start ::= #'(foo|bar)\d*';"
    for s, ok in [("foo", True), ("bar42", True), ("baz", False)]:
        assert accepts(g, s) == ok, s


def test_json_like_grammar():
    g = r"""
    start ::= object;
    object ::= '{' ws pair (',' ws pair)* ws '}' | '{' ws '}';
    pair ::= string ws ':' ws value;
    value ::= string | number | object | 'true' | 'false' | 'null';
    string ::= '"' #'[a-zA-Z0-9_ ]*' '"';
    number ::= #'-?[0-9]+(\.[0-9]+)?';
    ws ::= #'[ \t\n]*';
    """
    for s, ok in [('{}', True), ('{"a": 1}', True),
                  ('{"a": {"b": "c"}, "d": true}', True),
                  ('{"a" 1}', False), ('{a: 1}', False),
                  ('{"x": -3.5}', True)]:
        assert accepts(g, s) == ok, s


def test_allowed_bytes():
    e = GrammarEngine("start ::= 'a' | 'b';")
    ab = e.allowed_bytes()
    assert (ab >> ord("a")) & 1 and (ab >> ord("b")) & 1
    assert not (ab >> ord("c")) & 1
    e.advance(b"a")
    assert e.allowed_bytes() == 0
    assert e.must_finish()


def test_undefined_start_raises():
    with pytest.raises(GrammarError):
        GrammarEngine("foo ::= 'a';")


@pytest.fixture(scope="module")
def tiny_tokenizer():
    # Vocab: single chars + a few multi-char tokens.
    vocab = {}
    tid = 1
    for ch in "abcdefghij(){}:,\"0123456789 yesno":
        vocab[tid] = ch.encode()
        tid += 1
    for s in ["yes", "no", "ab", "abc", '"a"']:
        vocab[tid] = s.encode()
        tid += 1
    return Tokenizer(vocab)


def test_allowed_tokens(tiny_tokenizer):
    tok = tiny_tokenizer
    e = GrammarEngine("start ::= 'yes' | 'no';")
    allowed = e.allowed_tokens(tok)
    texts = sorted(tok.token_to_bytes(t).decode() for t in allowed)
    # Tokens that are full prefixes of valid continuations: y/n/ye..?
    # Only tokens whose ENTIRE bytes are consumable: 'y', 'n', 'yes', 'no'.
    assert "yes" in texts and "no" in texts
    assert "y" in texts and "n" in texts
    assert "e" not in texts and "a" not in texts


def test_bnf_formatter_drives_to_completion(tiny_tokenizer):
    tok = tiny_tokenizer
    f = BnfFormatter("start ::= 'yes' | 'no';", tok, tok.vocab_len)
    mask = f.allowed_mask()
    allowed_ids = np.nonzero(mask)[0]
    # pick 'yes' token
    yes_id = next(t for t in allowed_ids
                  if tok.token_to_bytes(int(t)) == b"yes")
    halt = f.accept(int(yes_id))
    assert halt  # grammar complete and no extension possible


def test_bnf_formatter_step_by_step(tiny_tokenizer):
    tok = tiny_tokenizer
    f = BnfFormatter("start ::= 'ab' 'c'+;", tok, tok.vocab_len)
    ab = next(t for t in range(tok.vocab_len)
              if tok.token_to_bytes(t) == b"ab")
    c = next(t for t in range(tok.vocab_len)
             if tok.token_to_bytes(t) == b"c")
    assert not f.accept(ab)
    mask = f.allowed_mask()
    assert mask[c]
    # 'c' can repeat forever: EOS allowed once grammar can finish.
    assert not f.accept(c)
    assert f.allowed_mask()[0]  # EOS allowed
    assert f.accept(0)  # EOS halts
