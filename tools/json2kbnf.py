#!/usr/bin/env python
"""JSON-schema -> KBNF grammar converter.

Native, non-GUI replacement for assets/scripts/json2kbnf.py (which wraps
formatron's Tk GUI): turns a JSON schema (draft-07 subset) into a KBNF
grammar whose `start` nonterminal matches objects conforming to the
schema.  Use the output as the `bnf_schema` request field.

Supported: object (properties, required treated as all), string, number,
integer, boolean, null, array (items), enum (string/number literals),
nested objects/arrays.

Usage:
  python tools/json2kbnf.py --schema schema.json
  echo '{"type":"object","properties":{"a":{"type":"string"}}}' \
      | python tools/json2kbnf.py
"""

import argparse
import itertools
import json
import sys

_counter = itertools.count()

BASE_RULES = {
    "__string": "__string ::= '\"' #'[^\"\\\\\\x00-\\x1f]*' '\"';",
    "__number": "__number ::= #'-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][-+]?[0-9]+)?';",
    "__integer": "__integer ::= #'-?(0|[1-9][0-9]*)';",
    "__boolean": "__boolean ::= 'true' | 'false';",
    "__null": "__null ::= 'null';",
    "__ws": "__ws ::= #'[ \\t\\n]*';",
}


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def compile_schema(schema: dict, name: str, rules: list,
                   used: set) -> str:
    """Emit rules for `schema`; returns the nonterminal name."""
    if "enum" in schema:
        alts = []
        for v in schema["enum"]:
            if isinstance(v, str):
                alts.append(f"'\"{_escape(v)}\"'")
            elif isinstance(v, bool):
                alts.append("'true'" if v else "'false'")
            elif v is None:
                alts.append("'null'")
            else:
                alts.append(f"'{json.dumps(v)}'")
        rules.append(f"{name} ::= {' | '.join(alts)};")
        return name

    t = schema.get("type", "object")
    if t == "string":
        used.add("__string")
        return "__string"
    if t == "number":
        used.add("__number")
        return "__number"
    if t == "integer":
        used.add("__integer")
        return "__integer"
    if t == "boolean":
        used.add("__boolean")
        return "__boolean"
    if t == "null":
        used.add("__null")
        return "__null"
    used.add("__ws")
    if t == "array":
        item = schema.get("items", {})
        item_nt = compile_schema(item, f"{name}_item", rules, used)
        rules.append(
            f"{name} ::= '[' __ws {item_nt} (',' __ws {item_nt})* __ws ']'"
            f" | '[' __ws ']';")
        return name
    if t == "object":
        props = schema.get("properties", {})
        if not props:
            rules.append(f"{name} ::= '{{' __ws '}}';")
            return name
        parts = []
        for i, (key, sub) in enumerate(props.items()):
            sub_nt = compile_schema(sub, f"{name}_p{next(_counter)}",
                                    rules, used)
            pair = f"'\"{_escape(key)}\"' __ws ':' __ws {sub_nt}"
            parts.append(pair)
        body = " ',' __ws ".join(parts)
        rules.append(f"{name} ::= '{{' __ws {body} __ws '}}';")
        return name
    raise ValueError(f"unsupported schema type: {t!r}")


def json_schema_to_kbnf(schema: dict) -> str:
    rules: list[str] = []
    used: set[str] = set()
    root = compile_schema(schema, "root", rules, used)
    lines = [f"start ::= {root};"]
    lines.extend(rules)
    for base in sorted(used):
        lines.append(BASE_RULES[base])
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--schema", "-s", default=None,
                   help="path to JSON schema (default: stdin)")
    args = p.parse_args()
    text = (open(args.schema).read() if args.schema else sys.stdin.read())
    print(json_schema_to_kbnf(json.loads(text)))


if __name__ == "__main__":
    main()
