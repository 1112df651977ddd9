"""Cross-feature parity matrix: every engine configuration must produce
BYTE-IDENTICAL greedy generations for the same request set.

Features compose (paged x chunked x prefix-cache x device-sampling x
prefill), and their interactions are where bugs hide — e.g. the idle-slot
trash-page clobber (fixed in block_manager.py) only manifested with paged
serving plus mid-run retirement. The plain contiguous host-sampled engine
is the oracle; greedy sampling makes every path's output comparable (all
configs share the same fp32 XLA compute on CPU)."""

import pytest

from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.engine import InferenceEngine, Requests
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models.params import params_from_weights
from hip_llama_tpu.sampler import Sampler

# prompts sized to force mid-run retirement, slot refill, end-of-queue
# idling, and (for prefix-cache) repeated prefixes
PROMPTS = [
    "hello hello hello hello hello hello",
    "he",
    "hello hello hello hello hello hello",
    " hello there",
]

CONFIGS = {
    "plain": {},
    "no_prefill": {"use_prefill": False},
    "device_sampling": {"device_sampling": True},
    "chunk4": {"chunk_steps": 4},
    "paged": {"paged": True, "page_size": 16},
    "paged_chunk": {"paged": True, "page_size": 16, "chunk_steps": 4},
    "paged_prefix": {"paged": True, "page_size": 16, "prefix_cache": True},
    "paged_chunk_prefix": {
        "paged": True, "page_size": 16, "chunk_steps": 4, "prefix_cache": True,
    },
    "small_buckets": {"prefill_buckets": (8,)},
    "spec_lookup4": {"spec_lookup": 4},
}


@pytest.fixture(scope="module")
def matrix_setup(toy_tokenizer):
    cfg = tiny_config(seq_len=96)
    params = params_from_weights(random_weights(cfg, seed=11))

    def run(**kw):
        eng = InferenceEngine(cfg, params, toy_tokenizer, batch_size=2, **kw)
        reqs = Requests(prompts=list(PROMPTS), generations=[""] * len(PROMPTS))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in PROMPTS]
        eng.serve(reqs, steps=28, samplers=samplers)
        return reqs.generations

    oracle = run()
    return run, oracle


@pytest.mark.parametrize("name", [k for k in CONFIGS if k != "plain"])
def test_config_matches_oracle(matrix_setup, name):
    run, oracle = matrix_setup
    assert run(**CONFIGS[name]) == oracle, f"config {name!r} diverged"


def test_streaming_engine_matches_oracle(matrix_setup, toy_tokenizer):
    """Weight streaming (host_step engine) joins the matrix: byte-identical
    greedy generations vs the resident oracle."""
    import jax.numpy as jnp

    from hip_llama_tpu.models.streaming import (
        host_params_from_weights,
        make_streaming_engine_fns,
    )

    _, oracle = matrix_setup
    cfg = tiny_config(seq_len=96)
    hp = host_params_from_weights(random_weights(cfg, seed=11), dtype=jnp.float32)
    h_step, h_prefill, h_cache = make_streaming_engine_fns(cfg, dtype=jnp.float32)
    eng = InferenceEngine(
        cfg, hp, toy_tokenizer, batch_size=2, cache_dtype=jnp.float32,
        host_step=h_step, host_prefill=h_prefill, cache_factory=h_cache,
    )
    reqs = Requests(prompts=list(PROMPTS), generations=[""] * len(PROMPTS))
    samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in PROMPTS]
    eng.serve(reqs, steps=28, samplers=samplers)
    assert reqs.generations == oracle, "streaming engine diverged"
