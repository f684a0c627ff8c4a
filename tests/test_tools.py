"""Converter tools: json2kbnf generated grammars actually constrain."""

import json
import subprocess
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from json2kbnf import json_schema_to_kbnf  # noqa: E402

from ai00_server_tpu.grammar import GrammarEngine  # noqa: E402


def accepts(g, s):
    e = GrammarEngine(g)
    return e.advance(s.encode()) and e.can_finish()


def test_object_schema():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "role": {"enum": ["admin", "user"]},
        },
    }
    g = json_schema_to_kbnf(schema)
    ok = '{"name": "bob", "age": 42, "tags": ["x", "y"], "role": "admin"}'
    assert accepts(g, ok), g
    assert not accepts(g, '{"name": 5, "age": 42, "tags": [], "role": "admin"}')
    assert not accepts(g, '{"name": "bob"}')  # all properties required


def test_nested_and_scalars():
    schema = {
        "type": "object",
        "properties": {
            "meta": {"type": "object",
                     "properties": {"ok": {"type": "boolean"}}},
            "score": {"type": "number"},
        },
    }
    g = json_schema_to_kbnf(schema)
    assert accepts(g, '{"meta": {"ok": true}, "score": -3.5e2}')
    assert not accepts(g, '{"meta": {"ok": 1}, "score": 2}')


def test_convert_tokenizer_cli(tmp_path):
    txt = tmp_path / "vocab.txt"
    txt.write_text("1 'a' 1\n2 'bc' 2\n3 b'\\xff' 1\n")
    out = tmp_path / "vocab.json"
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "convert_tokenizer.py"),
         "-i", str(txt), "-o", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    vocab = json.loads(out.read_text())
    assert vocab["1"] == "a"
    assert vocab["2"] == "bc"
    assert vocab["3"] == [255]
