"""E2E parity against the REFERENCE'S OWN CPU engine: compile run.cc
(read-only) from /root/reference, run both engines on the same generated
checkpoint + tokenizer, and compare outputs — the strongest form of the
reference's golden-output test tier (test_all.py byte-exact story check)."""

import os
import subprocess

import pytest

REF = "/root/reference/run.cc"
TOK = "/root/reference/assets/tokenizer.bin"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF) and os.path.exists(TOK)),
    reason="reference sources not available",
)


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ref") / "ref_run")
    try:
        subprocess.run(
            ["g++", "-O2", "-fopenmp", "-o", out, REF, "-lm"],
            check=True, capture_output=True, timeout=180,
        )
    except Exception:
        pytest.skip("cannot compile reference engine")
    return out


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights, write_v0

    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    cfg = ModelConfig(dim=64, hidden_dim=172, n_layers=5, n_heads=8,
                      n_kv_heads=4, vocab_size=32000, seq_len=256)
    write_v0(path, cfg, random_weights(cfg, seed=3))
    return path


def _run_ref(ref_bin, ckpt, args):
    out = subprocess.run(
        [ref_bin, ckpt] + args, capture_output=True, text=True, timeout=120
    ).stdout
    # generation is the line after the model-info block
    lines = [l for l in out.splitlines() if l.strip()]
    return lines[-1]


def _run_ours(ckpt, argv):
    import io
    from contextlib import redirect_stdout

    import run as runmod

    buf = io.StringIO()
    with redirect_stdout(buf):
        runmod.main(["run.py", ckpt] + argv)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    gen = [l for l in lines if not l.startswith(("-", "dim", "hidden", "n_",
                                                 "vocab", "seq_len", "total",
                                                 "achieved"))]
    return gen[-1]


def test_greedy_byte_exact_vs_reference(ref_bin, ckpt):
    args = ["-z", TOK, "-t", "0.0", "-n", "20", "-i", "Once upon a time"]
    want = _run_ref(ref_bin, ckpt, args)
    got = _run_ours(ckpt, args + ["--dtype", "float32"])
    assert got == want


def test_stochastic_rng_parity_vs_reference(ref_bin, ckpt):
    """Same seed => same sampling stream; require a long common prefix
    (backend fp32 last-ulp differences may flip a late near-tie draw)."""
    args = ["-z", TOK, "-t", "1.0", "-p", "0.9", "-s", "314028", "-n", "20",
            "-i", "Hello"]
    want = _run_ref(ref_bin, ckpt, args).split()
    got = _run_ours(ckpt, args + ["--dtype", "float32"]).split()
    prefix = 0
    for a, b in zip(want, got):
        if a != b:
            break
        prefix += 1
    assert prefix >= 8, (want, got)
