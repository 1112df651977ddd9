#!/usr/bin/env python
"""Golden-output workflow: run the engine over the eval corpora and write
per-corpus outputs for scoring with tools/eval_output.py — the equivalent
of the reference's CPU-golden pipeline (assets/out/cpu_seq/* produced by
the sequential engine, scored by scripts/eval/eval_output.py).

Example:
  # produce goldens from the fp32 oracle-precision engine
  python tools/gen_goldens.py model.bin -z tokenizer.bin -o assets/out/golden
  # run a candidate config and score it
  python tools/gen_goldens.py model.bin -z tokenizer.bin -o /tmp/cand -- --attn pallas
  python tools/eval_output.py assets/out/golden/gen_in_8.out /tmp/cand/gen_in_8.out
"""

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-z", dest="tokenizer", required=True)
    ap.add_argument("-o", dest="outdir", required=True)
    ap.add_argument("--indir", default=os.path.join(REPO, "assets", "in"))
    ap.add_argument("--pattern", default="*_in_8.txt",
                    help="which corpora to run (glob under --indir)")
    ap.add_argument("-b", dest="batch", default="4")
    ap.add_argument("extra", nargs="*",
                    help="extra run.py flags after '--' (e.g. -- --attn pallas)")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    corpora = sorted(glob.glob(os.path.join(args.indir, args.pattern)))
    if not corpora:
        sys.exit(f"no corpora match {args.pattern} under {args.indir}")
    for path in corpora:
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.outdir, name + ".out")
        cmd = [
            sys.executable, os.path.join(REPO, "run.py"), args.model,
            "-z", args.tokenizer, "-m", "test", "-f", path, "-o", out,
            "-b", args.batch, *args.extra,
        ]
        print("::", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
