"""Greedy speculative decoding must reproduce the target's greedy stream
byte-for-byte — with a perfect draft (the target itself, 100% acceptance)
and with a mismatched draft (different random weights, low acceptance)."""

import jax.numpy as jnp
import pytest

from conftest import REFERENCE_TOKENIZER
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.engine.engine import InferenceEngine
from hip_llama_tpu.engine.speculative import speculative_generate
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models.params import params_from_weights
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
