"""Multi-replica shared-queue serving (engine.serve_replicated): N
independent engines over N devices pulling request indices from ONE
thread-safe queue — the reference's actual DP serving topology
(/root/reference/src/llama.cpp:919-983: per-GPU engine replicas + `omp
critical (get_batch_idx)`), rebuilt with declarative JAX device placement
instead of MPI ranks.

Greedy corpus outputs must be byte-identical to single-replica serving:
per-slot math is independent of batch composition, so WHICH replica/slot
serves a request cannot change its generation.
"""

import jax
import jax.numpy as jnp
import pytest

from hip_llama_tpu.engine import InferenceEngine, Requests
from hip_llama_tpu.engine.engine import SharedRequestQueue, serve_replicated
from hip_llama_tpu.models import params_from_weights
from hip_llama_tpu.sampler import Sampler

PROMPTS = [
    "hello", "hello hello hello hello", "he",
    "llo hello", "o", "hello hello", "lo", "hello o he",
]


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_weights, toy_tokenizer):
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    return tiny_cfg, params, toy_tokenizer


def _greedy_samplers(cfg, n):
    return [Sampler(cfg.vocab_size, temperature=0.0) for _ in range(n)]


def test_shared_queue_drains_exactly_once():
    q = SharedRequestQueue(5)
    seen = [q.pop() for _ in range(7)]
    assert seen == [0, 1, 2, 3, 4, None, None]


def _serve_single(cfg, params, tok, reqs_list, steps=16):
    reqs = Requests(prompts=list(reqs_list), generations=[""] * len(reqs_list))
    eng = InferenceEngine(cfg, params, tok, batch_size=2)
    n = eng.serve(reqs, steps=steps,
                  samplers=_greedy_samplers(cfg, len(reqs_list)))
    return n, list(reqs.generations)


@pytest.mark.parametrize("n_replicas", [2, 3])
def test_replicated_serve_matches_single(setup, n_replicas):
    cfg, params, tok = setup
    n_single, gen_single = _serve_single(cfg, params, tok, PROMPTS)

    devs = jax.devices()[:n_replicas]
    assert len(devs) == n_replicas, "conftest provides 8 fake devices"
    engines = []
    for d in devs:
        with jax.default_device(d):
            p = jax.device_put(params, d)
            engines.append(InferenceEngine(
                cfg, p, tok, batch_size=2, device=d))
    reqs = Requests(prompts=list(PROMPTS), generations=[""] * len(PROMPTS))
    stats: dict = {}
    n_rep = serve_replicated(
        engines, reqs, steps=16, stats=stats,
        samplers=_greedy_samplers(cfg, len(PROMPTS)))

    assert n_rep == n_single
    assert list(reqs.generations) == gen_single  # byte-identical
    assert sum(stats["per_replica_tokens"]) == n_rep
    # the queue load-balances: with 8 requests and 2-slot engines, no
    # replica can have served everything while others sat idle
    assert all(c > 0 for c in stats["per_replica_tokens"])


def test_replicated_serve_paged(setup):
    """Replicas each own an independent block manager; paged serving
    composes with the shared queue."""
    cfg, params, tok = setup
    n_single, gen_single = _serve_single(cfg, params, tok, PROMPTS[:5])

    devs = jax.devices()[:2]
    engines = []
    for d in devs:
        with jax.default_device(d):
            p = jax.device_put(params, d)
            engines.append(InferenceEngine(
                cfg, p, tok, batch_size=2, device=d,
                paged=True, page_size=16))
    reqs = Requests(prompts=list(PROMPTS[:5]), generations=[""] * 5)
    n_rep = serve_replicated(engines, reqs, steps=16,
                             samplers=_greedy_samplers(cfg, 5))
    assert n_rep == n_single
    assert list(reqs.generations) == gen_single
