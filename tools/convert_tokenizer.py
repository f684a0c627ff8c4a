#!/usr/bin/env python
"""Tokenizer converter: RWKV vocab ``.txt`` -> ``.json``.

Native replacement for assets/scripts/convert_tokenizer.py: each line of
the txt vocab is ``<id> <python-literal> <byte-len>``; the output JSON
maps id -> string (or byte list for non-UTF-8 tokens).

Usage: python tools/convert_tokenizer.py --input vocab.txt --output vocab.json
"""

import argparse
import ast
import json


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", required=True)
    args = p.parse_args()

    out = {}
    with open(args.input, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            idx = line.index(" ")
            ridx = line.rindex(" ")
            tid = int(line[:idx])
            token = ast.literal_eval(line[idx:ridx].strip())
            if isinstance(token, str):
                out[str(tid)] = token
            else:
                out[str(tid)] = list(token)

    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=0)
    print(f"wrote {len(out)} tokens to {args.output}")


if __name__ == "__main__":
    main()
