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


def test_native_scheduler_serve_parity(monkeypatch):
    """engine.serve with the native C++ scheduler must produce BYTE-IDENTICAL
    generations to the pure-Python slot loop — both greedy and stochastic
    (the native sampler is bit-compatible with the reference RNG stream)."""
    import jax.numpy as jnp

    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.engine.engine import InferenceEngine
    from hip_llama_tpu.engine.requests import Requests
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.models.params import params_from_weights
    from hip_llama_tpu.sampler import Sampler

    cfg = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=2,
                      n_kv_heads=2, vocab_size=256, seq_len=64)
    params = params_from_weights(random_weights(cfg, seed=11))

    class _Tok:
        bos_id, eos_id = 1, 2
        def encode(self, text, bos=True, eos=False):
            return ([1] if bos else []) + [3 + (ord(c) % 200) for c in text]
        def decode_piece(self, prev, tok):
            return (chr(97 + tok % 26)).encode()

    def run(disable_native):
        if disable_native:
            import hip_llama_tpu.native as native_mod
            monkeypatch.setattr(native_mod, "get_lib", lambda: None)
        else:
            monkeypatch.undo()
        eng = InferenceEngine(cfg, params, _Tok(), batch_size=2,
                              attn_impl="xla", max_seq_len=32)
        reqs = Requests(prompts=["ab", "wxyz", "m"], generations=[""] * 3)
        samplers = [
            Sampler(cfg.vocab_size, temperature=t, topp=0.9, seed=314028 + i)
            for i, t in enumerate([0.0, 1.0, 0.8])
        ]
        n = eng.serve(reqs, steps=20, samplers=samplers)
        return n, list(reqs.generations), eng.used_native_sched

    n_nat, gen_nat, used_nat = run(disable_native=False)
    n_py, gen_py, used_py = run(disable_native=True)
    assert used_nat and not used_py  # both paths actually exercised
    assert n_nat == n_py
    assert gen_nat == gen_py
