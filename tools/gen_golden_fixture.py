#!/usr/bin/env python
"""Build the committed golden-regression fixture + reference-engine goldens.

The reference ships CPU-engine golden outputs (assets/out/cpu_seq/, scored
by scripts/eval/eval_output.py) for its eval corpora. This repo's turnkey
equivalent:

  assets/golden/tokenizer.bin   512-token vocab trained by train/vocab.py
                                on the committed corpora text
  assets/golden/model.bin       tiny v0 checkpoint (deterministic seed)
  assets/out/ref_cpu/*.out      outputs of the COMPILED REFERENCE ENGINE
                                (/root/reference/run.cc, unmodified) over
                                every assets/in corpus — ground truth for
                                the coverage test (tests/test_goldens.py)

Rebuild with:  python tools/gen_golden_fixture.py [--sizes 8,32]
(needs /root/reference for the golden generation step; the fixture files
regenerate deterministically without it).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/run.cc"

# fixture model: small enough that 512-prompt corpora run in seconds on the
# reference's scalar CPU engine, dims friendly to every quant group size
CFG = dict(dim=64, hidden_dim=192, n_layers=4, n_heads=8, n_kv_heads=4,
           vocab_size=512, seq_len=96)
SEED = 11


def build_fixture(outdir: str) -> tuple[str, str]:
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights, write_v0
    from hip_llama_tpu.io.tokenizer_io import write_tokenizer_bin
    from hip_llama_tpu.train.vocab import train_vocab

    os.makedirs(outdir, exist_ok=True)
    # vocab trained on the committed corpora prompts themselves (everything
    # in-repo; prompts tokenize compactly, generations are whatever the
    # random model emits — determinism is the point, not quality)
    lines = []
    for p in sorted(glob.glob(os.path.join(REPO, "assets", "in", "*_in_512.txt"))):
        with open(p) as f:
            f.readline()
            lines += [l.strip() for l in f if l.strip()]
    vocab, scores = train_vocab(lines, CFG["vocab_size"])
    tok_path = os.path.join(outdir, "tokenizer.bin")
    write_tokenizer_bin(tok_path, vocab, scores)

    cfg = ModelConfig(**CFG)
    model_path = os.path.join(outdir, "model.bin")
    write_v0(model_path, cfg, random_weights(cfg, seed=SEED))
    print(f"fixture: {tok_path}, {model_path}")
    return model_path, tok_path


def gen_reference_goldens(model: str, tok: str, out_dir: str,
                          sizes: list[int]) -> None:
    ref_bin = "/tmp/ref_run_golden"
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-o", ref_bin, REF, "-lm"],
        check=True, timeout=300,
    )
    os.makedirs(out_dir, exist_ok=True)
    pats = [os.path.join(REPO, "assets", "in", f"*_in_{n}.txt") for n in sizes]
    corpora = sorted(p for pat in pats for p in glob.glob(pat))
    for path in corpora:
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(out_dir, name + ".out")
        subprocess.run(
            [ref_bin, model, "-z", tok, "-m", "test", "-f", path, "-o", out],
            check=True, timeout=1200, capture_output=True,
        )
        print("golden:", out, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8,32,64,128,173,256,512")
    ap.add_argument("--fixture-dir", default=os.path.join(REPO, "assets", "golden"))
    ap.add_argument("--out-dir", default=os.path.join(REPO, "assets", "out", "ref_cpu"))
    args = ap.parse_args()
    model, tok = build_fixture(args.fixture_dir)
    if os.path.exists(REF):
        gen_reference_goldens(model, tok, args.out_dir,
                              [int(s) for s in args.sizes.split(",")])
    else:
        print("reference not available; skipped golden generation")


if __name__ == "__main__":
    main()
