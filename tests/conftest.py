"""Test env: fake an 8-device CPU mesh before jax import (the TPU-less
equivalent of the reference's 4-GPU SLURM validation — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force-set: the harness presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hip_llama_tpu.config import tiny_config  # noqa: E402
from hip_llama_tpu.io.checkpoint import random_weights  # noqa: E402

REFERENCE_TOKENIZER = "/root/reference/assets/tokenizer.bin"


@pytest.fixture(scope="session")
def tiny_cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def tiny_weights(tiny_cfg):
    return random_weights(tiny_cfg, seed=0)


@pytest.fixture(scope="session")
def llama_tokenizer():
    """The real Llama-2 32000-vocab tokenizer, if available on this machine."""
    if not os.path.exists(REFERENCE_TOKENIZER):
        pytest.skip("reference tokenizer.bin not available")
    from hip_llama_tpu.tokenizer import Tokenizer

    return Tokenizer.from_file(REFERENCE_TOKENIZER, 32000)


@pytest.fixture(scope="session")
def toy_tokenizer():
    """Self-contained byte-level tokenizer: 3 specials + 256 bytes + a few
    merge pieces, exercising byte fallback and merges without external data."""
    from hip_llama_tpu.tokenizer import Tokenizer

    vocab = [b"<unk>", b"<s>", b"</s>"]
    scores = [0.0, 0.0, 0.0]
    for i in range(256):
        vocab.append(f"<0x{i:02X}>".encode())
        scores.append(-1e6)
    pieces = [b" ", b"h", b"e", b"l", b"o", b"he", b"ll", b"hell", b"hello", b" hello"]
    piece_scores = [-1.0, -2.0, -2.0, -2.0, -2.0, -3.0, -3.5, -2.5, -2.0, -1.5]
    vocab.extend(pieces)
    scores.extend(piece_scores)
    # pad to the tiny model's vocab size (512) so any sampled id decodes
    while len(vocab) < 512:
        vocab.append(f"<extra_{len(vocab)}>".encode())
        scores.append(-1e6)
    return Tokenizer(vocab, scores)


def assert_close(a, b, atol=1e-5, rtol=1e-4, msg=""):
    """Combined abs+rel tolerance, like the reference validators
    (scripts/test/thaDNN.test.cpp:62-77)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    diff = np.abs(a - b)
    ok = diff <= atol + rtol * np.abs(b)
    if not ok.all():
        bad = np.argwhere(~ok)[:10]
        detail = "; ".join(
            f"[{tuple(i)}] got={a[tuple(i)]:.6g} want={b[tuple(i)]:.6g}" for i in bad
        )
        raise AssertionError(f"{msg} mismatch at {(~ok).sum()} elems: {detail}")
