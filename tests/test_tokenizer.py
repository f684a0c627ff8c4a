import json
import os

import pytest

from ai00_server_tpu.tokenizer import Tokenizer, Utf8Buffer

REFERENCE_VOCAB = "/root/reference/assets/tokenizer/rwkv_vocab_v20230424.json"


def tiny_vocab() -> Tokenizer:
    """A synthetic byte-complete vocab with a few multi-byte merges."""
    vocab = {i + 1: bytes([i]) for i in range(256)}
    nxt = 300
    for word in [b"he", b"hell", b"hello", b"hello world", b"ab", b"abc", b"\xe4\xb8\xad"]:
        vocab[nxt] = word
        nxt += 1
    return Tokenizer(vocab)


def test_greedy_longest_match():
    tok = tiny_vocab()
    ids = tok.encode("hello world")
    # Should take the single longest token.
    assert ids == [303]
    assert tok.decode(ids) == "hello world"

    ids = tok.encode("hellow")
    # "hello" (302) + "w"
    assert ids[0] == 302
    assert tok.decode(ids) == "hellow"


def test_roundtrip_arbitrary_bytes():
    tok = tiny_vocab()
    data = bytes(range(256)) * 3 + "中中文".encode("utf-8")
    ids = tok.encode_bytes(data)
    assert tok.decode_bytes(ids) == data


def test_token_zero_is_empty():
    tok = tiny_vocab()
    assert tok.token_to_bytes(0) == b""
    assert tok.decode_bytes([0, 1, 0]) == b"\x00"


@pytest.mark.skipif(not os.path.exists(REFERENCE_VOCAB), reason="real vocab not present")
def test_real_world_vocab_roundtrip():
    tok = Tokenizer.from_file(REFERENCE_VOCAB)
    assert tok.vocab_len == 65530
    texts = [
        "Hello, world!",
        "The Eiffel Tower is located in the city of Paris.",
        "今天天气不错。RWKV は RNN です。",
        "emoji 🎉🧪 mixed\n\nnewlines\tand tabs",
        " leading and trailing spaces ",
        "",
    ]
    for text in texts:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    # Byte-level fallback: arbitrary binary survives.
    data = bytes(range(256))
    assert tok.decode_bytes(tok.encode_bytes(data)) == data


@pytest.mark.skipif(not os.path.exists(REFERENCE_VOCAB), reason="real vocab not present")
def test_real_vocab_greediness():
    tok = Tokenizer.from_file(REFERENCE_VOCAB)
    # Greedy longest match means re-encoding a decode is stable.
    ids = tok.encode("The quick brown fox jumps over the lazy dog. 敏捷的棕色狐狸")
    assert tok.encode(tok.decode(ids)) == ids


def test_utf8_buffer_split_char():
    buf = Utf8Buffer()
    data = "中".encode("utf-8")  # 3 bytes
    assert buf.push(data[:1]) == ""
    assert buf.push(data[1:2]) == ""
    assert buf.push(data[2:]) == "中"
    assert buf.flush() == ""


def test_utf8_buffer_invalid_byte():
    buf = Utf8Buffer()
    out = buf.push(b"ok\xffgo")
    assert out == "ok�go"


def test_utf8_buffer_flush_partial():
    buf = Utf8Buffer()
    assert buf.push("🎉".encode("utf-8")[:2]) == ""
    assert buf.flush() != ""


def test_from_json_list_values():
    tok = Tokenizer.from_json(json.dumps({"1": "a", "2": [0x62, 0x63]}))
    assert tok.encode("abc") == [1, 2]
