"""Pipeline-parallel decode on a faked CPU mesh vs the single-device oracle
(the reference validated its PP path only on the real 4-GPU node —
SURVEY.md §4; here the 8-device CPU mesh stands in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.parallel.pipeline import (
    make_pp_decode_step,
    pp_shardings,
    stage_params,
)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (4, 2)])
def test_pp_decode_matches_single(n_stages, n_micro):
    cfg = tiny_config(n_layers=4, seq_len=32)
    w = random_weights(cfg, seed=3)
    params = params_from_weights(w)
    b = 4

    devs = np.array(jax.devices()[:n_stages])
    mesh = Mesh(devs, axis_names=("pp",))
    sp = stage_params(params, n_stages)
    p_sh, c_sh = pp_shardings(cfg, mesh)
    sp = jax.device_put(sp, p_sh)

    step_pp = jax.jit(make_pp_decode_step(cfg, mesh, n_micro=n_micro))
    step_1 = jax.jit(make_decode_step(cfg))

    cache_pp = jax.device_put(init_kv_cache(cfg, b), c_sh)
    cache_1 = init_kv_cache(cfg, b)
    rng = np.random.default_rng(0)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        # genuinely ragged per-slot positions (continuous batching refills
        # desynchronize slots) to exercise masked writes
        pos = jnp.asarray([p + 3, p, 2 * p, p + 1], jnp.int32)
        l1, cache_1 = step_1(params, cache_1, toks, pos)
        lp, cache_pp = step_pp(sp, cache_pp, toks, pos)
        assert_close(lp, l1, atol=1e-4, rtol=1e-3, msg=f"pos {p}")
    # caches must agree too
    assert_close(
        np.asarray(cache_pp.k), np.asarray(cache_1.k), atol=1e-5, rtol=1e-4
    )


def test_pp_prefill_matches_oracle():
    """GPipe chunked prefill vs the single-device prefill oracle: logits at
    every valid position and the cache contents must agree."""
    from hip_llama_tpu.models import make_prefill
    from hip_llama_tpu.parallel.pipeline import make_pp_prefill

    cfg = tiny_config(n_layers=4, seq_len=32)
    params = params_from_weights(random_weights(cfg, seed=7))
    b, t = 4, 8
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    sp = jax.device_put(stage_params(params, 2), pp_shardings(cfg, mesh)[0])
    c_sh = pp_shardings(cfg, mesh)[1]

    pre_pp = jax.jit(make_pp_prefill(cfg, mesh, n_micro=2))
    pre_1 = jax.jit(make_prefill(cfg))

    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    start = jnp.asarray([0, 4, 8, 0], jnp.int32)  # ragged starts
    valid = jnp.asarray([8, 6, 8, 3], jnp.int32)  # ragged lengths

    cache_pp = jax.device_put(init_kv_cache(cfg, b), c_sh)
    cache_1 = init_kv_cache(cfg, b)
    lp, cache_pp = pre_pp(sp, cache_pp, toks, start, valid)
    l1, cache_1 = pre_1(params, cache_1, toks, start, valid)
    for s in range(b):
        v = int(valid[s])
        assert_close(np.asarray(lp)[s, :v], np.asarray(l1)[s, :v],
                     atol=1e-4, rtol=1e-3, msg=f"slot {s}")
    assert_close(np.asarray(cache_pp.k), np.asarray(cache_1.k),
                 atol=1e-5, rtol=1e-4)


def test_pp_serve_matches_single(toy_tokenizer):
    """Whole-engine PP serving (custom_step = the GPipe step) through
    continuous batching with retire/refill must match the single-device
    force-feed engine byte-for-byte (greedy; both paths force-feed)."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(n_layers=4, seq_len=48)
    params = params_from_weights(random_weights(cfg, seed=5))
    prompts = ["hello hello", "he", " hello there", "hell"]

    def run(pp):
        if pp:
            mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
            p_sh, c_sh = pp_shardings(cfg, mesh)
            eng = InferenceEngine(
                cfg, jax.device_put(stage_params(params, 2), p_sh),
                toy_tokenizer, batch_size=2,
                custom_step=make_pp_decode_step(cfg, mesh, n_micro=2),
                cache_sharding=c_sh,
            )
        else:
            eng = InferenceEngine(cfg, params, toy_tokenizer, batch_size=2,
                                  use_prefill=False)
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        eng.serve(reqs, steps=24,
                  samplers=[Sampler(cfg.vocab_size, 0.0) for _ in prompts])
        return reqs.generations

    assert run(True) == run(False)
