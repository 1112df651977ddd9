#!/usr/bin/env python
"""Output-corpus scorer: compare two test-mode output files and report
per-prompt agreement ("test coverage").

Parity with the reference's scorer (scripts/eval/eval_output.py:7-86): both
files use the request-file format (first line = count, then one generation
per line, engine/requests.py); score = fraction of prompts whose generations
match. Adds word-level diff stats per mismatch like the original's
paragraph/word diff."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hip_llama_tpu.engine.requests import read_inputfile


def score(path_a: str, path_b: str, verbose: bool = True) -> float:
    a = read_inputfile(path_a)
    b = read_inputfile(path_b)
    # score against the LARGER count: a truncated candidate must not pass
    # with coverage 1.0 over only the generations it happens to contain
    n_cmp = min(a.num_reqs, b.num_reqs)
    n = max(a.num_reqs, b.num_reqs)
    if a.num_reqs != b.num_reqs:
        print(f"WARNING: count mismatch {a.num_reqs} vs {b.num_reqs}")
    same = 0
    for i in range(n_cmp):
        ga, gb = a.prompts[i], b.prompts[i]
        if ga == gb:
            same += 1
        elif verbose:
            wa, wb = ga.split(), gb.split()
            k = 0
            for x, y in zip(wa, wb):
                if x != y:
                    break
                k += 1
            print(
                f"[{i}] diverges at word {k}/{max(len(wa), len(wb))}: "
                f"{' '.join(wa[k:k+4])!r} vs {' '.join(wb[k:k+4])!r}"
            )
    cov = same / n if n else 0.0
    print(f"TEST COVERAGE = {cov:.4f} ({same}/{n})")
    return cov


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: eval_output.py <out_a> <out_b>", file=sys.stderr)
        sys.exit(1)
    sys.exit(0 if score(sys.argv[1], sys.argv[2]) == 1.0 else 2)
