"""Native (C++) host runtime vs the Python reference implementations —
tokenizer encode/decode and sampler must agree exactly (the native library
is a host fast path, never a behavior change)."""

import numpy as np
import pytest

from hip_llama_tpu.native import get_lib, NativeSampler, NativeTokenizer
from hip_llama_tpu.sampler import Sampler

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no g++ toolchain")


def test_native_tokenizer_matches_python(toy_tokenizer):
    nt = NativeTokenizer(toy_tokenizer.vocab, toy_tokenizer.scores)
    cases = [
        "hello",
        " hello hello",
        "he said: héllo!\n",
        "",
        "\x00\x01 weird bytes \xff",
        "hellohellohello",
        "日本語テキスト",
    ]
    for text in cases:
        want = toy_tokenizer.encode(text, bos=True, eos=False)
        got = nt.encode(text, bos=True, eos=False)
        assert got == want, (text, got, want)
        want2 = toy_tokenizer.encode(text, bos=False, eos=True)
        got2 = nt.encode(text, bos=False, eos=True)
        assert got2 == want2, text


def test_native_tokenizer_real_vocab(llama_tokenizer):
    nt = NativeTokenizer(llama_tokenizer.vocab, llama_tokenizer.scores)
    for text in [
        "Once upon a time",
        "The quick brown fox jumps over the lazy dog.",
        "1 + 1 = 2; let x = f(y)",
        "emoji: ☺ and accents: naïve café",
    ]:
        assert nt.encode(text, True, False) == llama_tokenizer.encode(
            text, bos=True, eos=False
        ), text
    # decode_piece parity over the whole vocab sample
    rng = np.random.default_rng(0)
    for tok in rng.integers(0, llama_tokenizer.vocab_size, 200):
        for prev in (1, 2, 100):
            assert nt.decode_piece(prev, int(tok)) == llama_tokenizer.decode_piece(
                prev, int(tok)
            )


def test_native_sampler_matches_python():
    rng = np.random.default_rng(1)
    v = 512
    for temp, topp in [(0.0, 0.9), (1.0, 0.9), (0.8, 0.95), (1.0, 0.0)]:
        py = Sampler(v, temperature=temp, topp=topp, seed=314028)
        nat = NativeSampler(v, temperature=temp, topp=topp, seed=314028)
        for i in range(100):
            logits = rng.standard_normal(v).astype(np.float32) * 3
            a = py.sample(logits)
            b = nat.sample(logits)
            assert a == b, (temp, topp, i, a, b)
