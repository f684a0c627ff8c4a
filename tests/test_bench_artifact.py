"""The driver records bench.py's LAST stdout line; round 4 lost every
number because an XLA OOM message (tens of KB) was embedded verbatim in
the aggregate (VERDICT r4 weak #1).  These tests pin the contract: a part
raising a 100 KB-message exception still yields a final stdout line that
is json.loads-able and < 4 KB."""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_short_err_caps_100kb_message():
    e = RuntimeError("RESOURCE_EXHAUSTED " + "x" * 100_000)
    s = bench._short_err(e)
    assert len(s) < 400
    assert s.startswith("RuntimeError: RESOURCE_EXHAUSTED")
    assert s.endswith("...[truncated]")


def test_short_err_flattens_newlines():
    s = bench._short_err(ValueError("a\nb\nc"))
    assert "\n" not in s


def _final_line(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert out
    return out[-1]


def test_headline_line_parseable_with_huge_error(capsys):
    suite = {
        "decode_438m": {"decode_tok_s": 5330.0, "decode_step_ms": 3.0},
        "ivf_10m": {"error": "RuntimeError: " + "y" * 100_000},
        "e2e_16x256": {"tok_s": 1900.0, "total_tokens": 4096},
    }
    bench._emit_headline(suite)
    line = _final_line(capsys)
    rec = json.loads(line)
    assert len(line) < 4500
    assert rec["metric"] == "e2e_16x256"
    assert rec["value"] == 1900.0
    assert "error" in rec["suite"]["ivf_10m"]


def test_headline_line_parseable_when_every_part_errors(capsys):
    suite = {f"part_{i}": {"error": "E" * 50_000} for i in range(12)}
    bench._emit_headline(suite)
    line = _final_line(capsys)
    rec = json.loads(line)
    assert len(line) < 4500
    assert rec["metric"] == "suite_failed"


def test_cap_suite_preserves_numbers():
    suite = {
        "decode_438m": {"decode_tok_s": 5330.0, "batch": 16},
        "bad": {"error": "Z" * 100_000},
    }
    capped = bench._cap_suite_line(suite)
    assert capped["decode_438m"]["decode_tok_s"] == 5330.0
    assert len(json.dumps(capped)) <= bench._MAX_LINE
