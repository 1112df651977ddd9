#!/usr/bin/env python
"""Checkpoint converter CLI — parity with the reference's exporter
(train/export.py:492-567 argument contract: version selects the output
format; input may be a llama2.c .bin, a HF model dir, or a Meta ckpt dir).

Usage:
  python tools/export.py out.bin --version 0|1|2 \
      [--checkpoint model.bin | --hf hf_dir | --meta meta_dir] \
      [--group-size 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hip_llama_tpu.io.checkpoint import (
    LlamaWeights,
    load_checkpoint,
    write_v0,
    write_v1,
    write_v2,
    write_v4,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("filepath", help="output .bin (or model dir for --version hf)")
    ap.add_argument("--version", default="0", choices=["0", "1", "2", "4", "hf"],
                    help="4 = int4 (Q4_0-style, beyond-reference format); "
                    "hf = HuggingFace model dir (config.json + safetensors, "
                    "parity with reference train/export.py:262 hf_export)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "bfloat16"],
                    help="payload dtype for --version hf")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="input llama2.c .bin (v0/v1/v2)")
    src.add_argument("--hf", help="input HuggingFace model dir")
    src.add_argument("--meta", help="input Meta llama ckpt dir")
    ap.add_argument("--group-size", type=int, default=None,
                    help="quant group size (default: 64 for v2, 32 for v4)")
    args = ap.parse_args()

    if args.checkpoint:
        cfg, w = load_checkpoint(args.checkpoint)
        if not isinstance(w, LlamaWeights):
            from hip_llama_tpu.io.checkpoint import Q4Weights
            from hip_llama_tpu.models.params import (
                dense_weights_from_q4,
                dense_weights_from_quant,
            )

            # dequantize a quantized (v2/v4) input back to dense for
            # re-export — ON HOST: the old device round-trip materialized
            # the full fp32 model in HBM (a 7B does not fit a 16 GB chip)
            if isinstance(w, Q4Weights):
                w = dense_weights_from_q4(cfg, w)
            else:
                w = dense_weights_from_quant(cfg, w)
    elif args.hf:
        from hip_llama_tpu.io.hf import load_hf_llama

        cfg, w = load_hf_llama(args.hf)
    else:
        from hip_llama_tpu.io.hf import load_meta_llama

        cfg, w = load_meta_llama(args.meta)

    if cfg.rope_theta != 10000.0 and args.version != "hf":
        print(
            f"note: source model uses rope_theta={cfg.rope_theta:g}; the "
            ".bin header cannot carry it — load with run.py "
            f"--rope-theta {cfg.rope_theta:g}"
        )
    if args.version == "hf":
        from hip_llama_tpu.io.hf import save_hf_llama

        save_hf_llama(args.filepath, cfg, w, dtype=args.dtype)
    elif args.version == "0":
        write_v0(args.filepath, cfg, w)
    elif args.version == "1":
        write_v1(args.filepath, cfg, w)
    elif args.version == "4":
        err = write_v4(args.filepath, cfg, w, group_size=args.group_size or 32)
        print(f"max quantization group error: {err:.6f}")
    else:
        err = write_v2(args.filepath, cfg, w, group_size=args.group_size or 64)
        print(f"max quantization group error: {err:.6f}")
    print(f"wrote {args.filepath} (version {args.version})")


if __name__ == "__main__":
    main()
