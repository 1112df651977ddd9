"""Golden corpus regression tier (reference parity: assets/out/cpu_seq/*
scored by scripts/eval/eval_output.py, coverage target 1.0).

Two committed golden sets over the committed fixture
(assets/golden/{model,tokenizer}.bin, built by tools/gen_golden_fixture.py):

- assets/out/cpu_f32/   OUR engine, fp32, GREEDY (-t 0.0): the
  self-regression tier — reruns must be BYTE-IDENTICAL (true coverage 1.0;
  any engine change that shifts one sampled token fails here). Greedy
  because temp-1.0 draws flip on last-ulp logit differences between process
  environments (measured: the same sciq prompt sampled differently under
  pytest vs a bare CLI run, each deterministic within its env) — argmax is
  stable; the reference's own byte-exact tier is greedy too (test_all.py).
- assets/out/ref_cpu/   the COMPILED REFERENCE ENGINE's outputs (ground
  truth): scored with tools/eval_output.py. Cross-engine coverage is high
  but not exactly 1.0 — both engines run fp32, but XLA's dot reorders
  summation vs the reference's scalar loops, and a last-ulp logit difference
  occasionally flips a temp-1.0 sampling draw (the reference's own GPU runs
  had the same property vs its CPU goldens — that is WHY it ships a
  coverage metric rather than a byte-diff, eval_output.py:84-86).
"""

import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(REPO, "assets", "golden", "model.bin")
TOK = os.path.join(REPO, "assets", "golden", "tokenizer.bin")
IN = os.path.join(REPO, "assets", "in")
F32 = os.path.join(REPO, "assets", "out", "cpu_f32")
REF = os.path.join(REPO, "assets", "out", "ref_cpu")

CORPORA = ["gen", "sciq", "tinystories", "truthful_qa", "wikipedia"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(MODEL), reason="golden fixture not present"
)


def _serve_corpora(outdir, extra_args):
    sys.path.insert(0, REPO)
    import run as runmod

    outs = {}
    for c in CORPORA:
        out = str(outdir / f"{c}_in_8.out")
        with redirect_stdout(io.StringIO()):
            rc = runmod.main([
                "run.py", MODEL, "-z", TOK, "-m", "test",
                "-f", os.path.join(IN, f"{c}_in_8.txt"), "-o", out,
                "-b", "4", "--dtype", "float32", *extra_args,
            ])
        assert rc == 0, f"run.py failed on {c}"
        outs[c] = out
    return outs


@pytest.fixture(scope="module")
def greedy_outputs(tmp_path_factory):
    return _serve_corpora(tmp_path_factory.mktemp("greedy"), ["-t", "0.0"])


@pytest.fixture(scope="module")
def stochastic_outputs(tmp_path_factory):
    """run.cc-matched config: temp-1.0 request samplers, BOS-only stops."""
    return _serve_corpora(tmp_path_factory.mktemp("stoch"), ["--no-eos-stop"])


def test_self_regression_byte_identical(greedy_outputs):
    """Rerun == committed our-engine goldens, byte for byte (coverage 1.0)."""
    for c, out in greedy_outputs.items():
        with open(out, "rb") as f:
            got = f.read()
        with open(os.path.join(F32, f"{c}_in_8.out"), "rb") as f:
            want = f.read()
        assert got == want, f"{c}_in_8 output drifted from committed golden"


def test_cross_engine_coverage_vs_reference(stochastic_outputs):
    """Score against the reference engine's own outputs; near-tie sampling
    flips cap this below 1.0 on some corpora (module docstring)."""
    scores = {}
    for c, out in stochastic_outputs.items():
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "eval_output.py"),
             os.path.join(REF, f"{c}_in_8.out"), out],
            capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 0, f"eval_output.py failed on {c}: {r.stderr}"
        line = [l for l in r.stdout.splitlines() if "COVERAGE" in l][-1]
        scores[c] = float(line.split("=")[1].split()[0])
    full = sum(1 for v in scores.values() if v == 1.0)
    avg = sum(scores.values()) / len(scores)
    assert full >= 3, f"too few byte-identical corpora: {scores}"
    assert avg >= 0.75, f"cross-engine coverage collapsed: {scores}"
