#!/usr/bin/env python
"""Model converter CLI: RWKV ``.pth`` -> converted ``.st`` safetensors.

Native replacement for the reference's converter binary
(crates/converter/src/main.rs) and assets/scripts/convert_safetensors.py:
same rename table (time_faaaa -> time_first, time_maa -> time_mix,
lora_A/B -> lora.0/1), transpose list, v5.1 time_decay/time_first repeat,
fp16 output, lowercased keys.

Usage: python tools/convert.py --input model.pth [--output model.st]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--input", "-i", required=True, help="path to .pth model")
    p.add_argument("--output", "-o", default=None,
                   help="output .st path (default: alongside input)")
    p.add_argument("--fp32", action="store_true",
                   help="store fp32 instead of fp16")
    args = p.parse_args()

    import numpy as np

    from ai00_server_tpu.loader import convert_pth, save_safetensors
    from ai00_server_tpu.models.info import detect_info

    out = args.output
    if out is None:
        stem, _ = os.path.splitext(args.input)
        out = stem + ".st"

    tensors = convert_pth(args.input)
    info = detect_info({k: v.shape for k, v in tensors.items()})
    print(f"Model detected: {info.version.value} "
          f"(layers={info.num_layer}, emb={info.num_emb}, "
          f"heads={info.num_head}x{info.head_size}, vocab={info.num_vocab})")
    for k, v in tensors.items():
        print(f"{k}\t{tuple(v.shape)}\t{v.dtype}")
    save_safetensors(tensors, out,
                     dtype=np.float32 if args.fp32 else np.float16)
    print(f"Saved to {out}")


if __name__ == "__main__":
    main()
