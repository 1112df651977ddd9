"""Greedy speculative decoding must reproduce the target's greedy stream
byte-for-byte — with a perfect draft (the target itself, 100% acceptance)
and with a mismatched draft (different random weights, low acceptance).
Stochastic (temperature > 0) speculative decoding must preserve the target
distribution: the rejection-sampling round's committed-token marginal is
checked empirically against the target distribution."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE_TOKENIZER
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.engine.engine import InferenceEngine
from hip_llama_tpu.engine.speculative import (
    _verify_round,
    _warp,
    speculative_generate,
)
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models.params import params_from_weights
from hip_llama_tpu.sampler import XorShift64Star, sample_mult, softmax_f32
from hip_llama_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def spec_setup():
    cfg = tiny_config(dim=64, hidden_dim=172, n_layers=4, n_heads=8,
                      n_kv_heads=4, seq_len=96)
    tok = Tokenizer.from_file(REFERENCE_TOKENIZER, cfg.vocab_size)
    target = InferenceEngine(
        cfg, params_from_weights(random_weights(cfg, seed=3), dtype=jnp.float32),
        tok, batch_size=1, use_prefill=True,
    )
    draft_other = InferenceEngine(
        cfg, params_from_weights(random_weights(cfg, seed=9), dtype=jnp.float32),
        tok, batch_size=1, use_prefill=True,
    )
    return cfg, tok, target, draft_other


def test_speculative_matches_greedy_perfect_draft(spec_setup):
    cfg, tok, target, _ = spec_setup
    base = target.generate("Once upon a time", steps=48)
    spec, stats = speculative_generate(target, target, "Once upon a time",
                                       steps=48, k=4)
    assert spec.text == base.text
    assert spec.token_ids == base.token_ids
    # a perfect draft is mostly accepted; not exactly 1.0 because decode-step
    # and prefill logits round differently and a random-weight model has
    # near-uniform logits whose argmax flips on ties
    assert stats.acceptance > 0.3


def test_speculative_matches_greedy_mismatched_draft(spec_setup):
    cfg, tok, target, draft = spec_setup
    base = target.generate("The history of", steps=40)
    spec, stats = speculative_generate(target, draft, "The history of",
                                       steps=40, k=3)
    assert spec.text == base.text
    assert spec.token_ids == base.token_ids
    assert stats.rounds > 0


def test_warp_is_nucleus_distribution():
    """_warp = softmax at temperature restricted to the top-p nucleus,
    renormalized (mirror of models/llama.py make_logit_sampler)."""
    logits = np.array([2.0, 1.0, 0.5, 0.0, -1.0, -3.0], np.float32)
    w = _warp(logits, temperature=1.0, topp=0.9)
    probs = softmax_f32(logits)
    # nucleus for this vector: sorted csum - p < 0.9 keeps the top 4
    order = np.argsort(-probs)
    csum = np.cumsum(probs[order])
    kept = order[: int(np.searchsorted(csum > 0.9, True)) + 1]
    assert set(np.nonzero(w)[0]) == set(kept)
    np.testing.assert_allclose(w[kept], probs[kept] / probs[kept].sum(),
                               rtol=1e-6)
    assert abs(float(w.sum()) - 1.0) < 1e-6
    # topp >= 1 disables the nucleus filter
    np.testing.assert_allclose(_warp(logits, 1.0, 1.0), probs, rtol=1e-6)


def test_verify_round_marginal_matches_target():
    """The committed first token of a rejection-sampling round is distributed
    exactly as the target distribution p, whatever the draft q proposes
    (speculative decoding correctness theorem, checked empirically)."""
    rng = XorShift64Star(12345)
    p = np.array([0.40, 0.30, 0.20, 0.05, 0.05, 0.00], np.float32)
    q = np.array([0.10, 0.50, 0.20, 0.10, 0.05, 0.05], np.float32)
    bonus = np.full(6, 1 / 6, np.float32)
    n = 40_000
    counts = np.zeros(6)
    for _ in range(n):
        x = sample_mult(q, rng.next_f32())
        commits, _ = _verify_round([p, bonus], [q], [x], rng)
        counts[commits[0]] += 1
    np.testing.assert_allclose(counts / n, p, atol=0.02)


def test_verify_round_point_mass_marginal():
    """qs=None (prompt-lookup point-mass proposals): accept x w.p. p[x],
    else sample p-without-x renormalized — the marginal is again exactly p,
    for ANY fixed proposed token."""
    rng = XorShift64Star(99)
    p = np.array([0.50, 0.25, 0.15, 0.10], np.float32)
    bonus = np.full(4, 0.25, np.float32)
    n = 40_000
    counts = np.zeros(4)
    for _ in range(n):
        commits, _ = _verify_round([p, bonus], None, [2], rng)
        counts[commits[0]] += 1
    np.testing.assert_allclose(counts / n, p, atol=0.02)


def test_verify_round_identical_dists_always_accepts():
    """p == q => acceptance ratio 1: every draft commits, plus a bonus."""
    rng = XorShift64Star(7)
    p = np.array([0.5, 0.3, 0.2], np.float32)
    for _ in range(200):
        x = sample_mult(p, rng.next_f32())
        commits, n_acc = _verify_round([p, p], [p], [x], rng)
        assert n_acc == 1 and commits[0] == x and len(commits) == 2


def test_stochastic_spec_deterministic_and_in_vocab(spec_setup):
    """temperature > 0 with a draft engine: same seed => identical stream;
    a perfect draft (the target itself) keeps acceptance well above zero."""
    cfg, tok, target, _ = spec_setup
    r1, s1 = speculative_generate(target, target, "Once upon a time",
                                  steps=32, k=4, temperature=1.0, topp=0.9,
                                  seed=77)
    r2, s2 = speculative_generate(target, target, "Once upon a time",
                                  steps=32, k=4, temperature=1.0, topp=0.9,
                                  seed=77)
    assert r1.token_ids == r2.token_ids
    assert all(0 <= t < cfg.vocab_size for t in r1.token_ids)
    assert s1.proposed == s2.proposed and s1.accepted == s2.accepted
    # p and q differ only by decode-vs-prefill rounding, so most drafts pass
    assert s1.acceptance > 0.3


def test_stochastic_spec_lookup_deterministic(spec_setup):
    """temperature > 0 with prompt-lookup proposals is seed-deterministic."""
    cfg, tok, target, _ = spec_setup
    r1, _ = speculative_generate(target, None, "One two one two one",
                                 steps=24, k=4, temperature=0.8, topp=0.9,
                                 seed=5)
    r2, _ = speculative_generate(target, None, "One two one two one",
                                 steps=24, k=4, temperature=0.8, topp=0.9,
                                 seed=5)
    assert r1.token_ids == r2.token_ids
    assert all(0 <= t < cfg.vocab_size for t in r1.token_ids)


def test_serve_spec_lookup_matches_plain_greedy(spec_setup):
    """SERVE-mode prompt-lookup speculation (engine spec_lookup=k) must
    reproduce the plain serve loop's greedy generations byte-for-byte,
    through mid-run retirement and refill, and actually accept proposals."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg, tok, target, _ = spec_setup
    prompts = ["Once upon a time", "The history of", "Once upon a time",
               "one two one two one"]

    def run(spec):
        eng = InferenceEngine(
            cfg, target.params, tok, batch_size=2, spec_lookup=spec,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
        stats = {}
        eng.serve(reqs, steps=40, samplers=samplers, stats=stats)
        return reqs.generations, stats

    base, _ = run(0)
    spec, stats = run(4)
    assert spec == base
    assert stats["spec_proposed"] > 0 and stats["spec_accepted"] > 0


def test_small_draft_window_falls_back(spec_setup):
    """A draft with a SMALLER KV window than the target must not cap
    generation at its own seq_len — past the draft window, proposals fall
    back to prompt lookup and the greedy stream still matches target-only.
    (A 2-layer seed-3 model generates a long non-terminating loop, so the
    stream genuinely crosses the 24-token draft window.)"""
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.io.checkpoint import random_weights as rw
    from hip_llama_tpu.models.params import params_from_weights as pfw

    _, tok, _, _ = spec_setup
    cfg_t = tiny_config(dim=64, hidden_dim=172, n_layers=2, n_heads=8,
                        n_kv_heads=4, seq_len=96)
    cfg_d = tiny_config(dim=64, hidden_dim=172, n_layers=2, n_heads=8,
                        n_kv_heads=4, seq_len=24)
    target = InferenceEngine(
        cfg_t, pfw(rw(cfg_t, seed=3), dtype=jnp.float32), tok,
        batch_size=1, use_prefill=True,
    )
    draft = InferenceEngine(
        cfg_d, pfw(rw(cfg_d, seed=3), dtype=jnp.float32), tok,
        batch_size=1, use_prefill=True, max_seq_len=24,
    )
    base = target.generate("Once upon a time", steps=60)
    spec, st = speculative_generate(target, draft, "Once upon a time",
                                    steps=60, k=4)
    assert spec.token_ids == base.token_ids
    assert len(spec.token_ids) > 24  # well past the draft window


def test_serve_spec_draft_matches_plain_greedy(spec_setup):
    """SERVE-mode speculation with a DRAFT ENGINE: one batched draft chain
    proposes per round; greedy acceptance must reproduce plain serving
    byte-for-byte — perfect draft (the target itself) and mismatched
    draft (different weights) alike."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg, tok, target, draft_other = spec_setup
    prompts = ["Once upon a time", "The history of", "Once upon a time"]

    def run(draft_eng, spec):
        eng = InferenceEngine(
            cfg, target.params, tok, batch_size=2, spec_lookup=spec,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
        stats = {}
        eng.serve(reqs, steps=36, samplers=samplers, stats=stats,
                  draft=draft_eng)
        return reqs.generations, stats

    base, _ = run(None, 0)
    perfect, st1 = run(target, 4)
    assert perfect == base
    assert st1["spec_accepted"] > 0
    mismatched, st2 = run(draft_other, 3)
    assert mismatched == base
    assert st2["spec_proposed"] > 0


def test_serve_spec_lookup_stochastic_deterministic(spec_setup):
    """Stochastic serve-mode speculation: per-request fixed-seed samplers
    make the committed streams seed-deterministic (rejection sampling draws
    coins from each request's own xorshift stream)."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg, tok, target, _ = spec_setup
    prompts = ["Once upon a time", "one two one two one"]

    def run():
        eng = InferenceEngine(
            cfg, target.params, tok, batch_size=2, spec_lookup=4,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, 1.0, 0.9, seed=314028)
                    for _ in prompts]
        eng.serve(reqs, steps=32, samplers=samplers)
        return reqs.generations

    a, bgen = run(), run()
    assert a == bgen
    assert all(g for g in a)


def test_speculative_prompt_lookup_matches_greedy(spec_setup):
    """draft=None (prompt-lookup proposals) must also reproduce the target
    greedy stream exactly — random-weight greedy loops repeat n-grams, so
    lookup proposals fire and get verified."""
    cfg, tok, target, _ = spec_setup
    base = target.generate("Once upon a time", steps=48)
    spec, stats = speculative_generate(target, None, "Once upon a time",
                                       steps=48, k=4)
    assert spec.text == base.text
    assert spec.token_ids == base.token_ids
