"""Sampler parity: bit-exact xorshift64* RNG and sampling semantics
(reference: src/llama.cpp:262-422)."""

import numpy as np

from hip_llama_tpu.sampler import (
    Sampler,
    XorShift64Star,
    sample_argmax,
    sample_mult,
    sample_topp,
    softmax_f32,
    request_sampler,
)


def _c_xorshift_reference(seed, n):
    """Independent straight-line reimplementation of the C RNG for
    cross-checking (llama.cpp:365-374)."""
    mask = (1 << 64) - 1
    s = seed & mask
    out = []
    for _ in range(n):
        s ^= s >> 12
        s = (s ^ (s << 25)) & mask
        s ^= s >> 27
        out.append(((s * 0x2545F4914F6CDD1D) & mask) >> 32)
    return out


def test_xorshift_bit_exact():
    rng = XorShift64Star(314028)
    got = [rng.next_u32() for _ in range(100)]
    assert got == _c_xorshift_reference(314028, 100)


def test_random_f32_range_and_determinism():
    rng1, rng2 = XorShift64Star(42), XorShift64Star(42)
    vals = [rng1.next_f32() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert vals == [rng2.next_f32() for _ in range(1000)]


def test_argmax():
    assert sample_argmax(np.array([0.1, 0.9, 0.3], np.float32)) == 1


def test_mult_cdf():
    probs = np.array([0.2, 0.3, 0.5], np.float32)
    assert sample_mult(probs, 0.1) == 0
    assert sample_mult(probs, 0.25) == 1
    assert sample_mult(probs, 0.9) == 2
    assert sample_mult(probs, 0.999999) == 2


def test_topp_prefilter_and_truncation():
    # cutoff = (1-topp)/(n-1); tiny probs excluded before sorting (llama.cpp:318-327)
    probs = np.array([0.5, 0.35, 0.1, 0.04, 0.01], np.float32)
    # topp=0.8: sorted [0.5, 0.35] cum=0.85 > 0.8 -> truncate at idx 1
    assert sample_topp(probs, 0.8, 0.0) == 0
    assert sample_topp(probs, 0.8, 0.99) == 1


def test_greedy_temperature_zero():
    s = Sampler(5, temperature=0.0)
    assert s.sample(np.array([1.0, 3.0, 2.0, 0.0, -1.0], np.float32)) == 1


def test_request_sampler_deterministic():
    logits = np.random.default_rng(7).normal(size=512).astype(np.float32)
    a = request_sampler(512)
    b = request_sampler(512)
    seq_a = [a.sample(logits.copy()) for _ in range(20)]
    seq_b = [b.sample(logits.copy()) for _ in range(20)]
    assert seq_a == seq_b


def test_softmax_f32_matches_numpy64():
    x = np.random.default_rng(0).normal(size=1000).astype(np.float32)
    p = softmax_f32(x)
    q = np.exp(x.astype(np.float64) - x.max())
    q /= q.sum()
    np.testing.assert_allclose(p, q, rtol=1e-5, atol=1e-8)
    assert p.dtype == np.float32
