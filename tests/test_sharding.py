"""Multi-device sharding tests on a virtual 8-CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, set in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.models import (
    init_kv_cache,
    make_decode_step,
    make_prefill,
    params_from_weights,
)
from hip_llama_tpu.parallel import make_mesh, make_shardings, shard_params
from tests.conftest import assert_close


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def sharded_setup(tiny_cfg, tiny_weights):
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    mesh = make_mesh(tp=4, dp=2)
    sh = make_shardings(tiny_cfg, mesh)
    sparams = shard_params(params, sh)
    return tiny_cfg, params, sparams, sh


@requires_8_devices
def test_tp_dp_decode_matches_single_device(sharded_setup):
    cfg, params, sparams, sh = sharded_setup
    step = make_decode_step(cfg)
    b = 4
    tokens = jnp.array([5, 9, 100, 255], jnp.int32)
    pos = jnp.zeros((b,), jnp.int32)

    # single device
    cache1 = init_kv_cache(cfg, b)
    logits1, _ = jax.jit(step)(params, cache1, tokens, pos)

    # sharded
    cache2 = jax.device_put(init_kv_cache(cfg, b), sh.cache)
    sharded_step = jax.jit(
        step,
        in_shardings=(sh.params, sh.cache, sh.tokens, sh.tokens),
        out_shardings=(sh.logits, sh.cache),
    )
    logits2, cache2 = sharded_step(sparams, cache2, jax.device_put(tokens, sh.tokens), jax.device_put(pos, sh.tokens))
    assert_close(np.asarray(logits2), np.asarray(logits1), atol=1e-4, rtol=1e-3)


@requires_8_devices
def test_tp_dp_multi_step(sharded_setup):
    cfg, params, sparams, sh = sharded_setup
    step = make_decode_step(cfg)
    b = 4
    seq = [[3, 17, 100], [9, 5, 2], [100, 200, 300], [7, 7, 7]]

    cache1 = init_kv_cache(cfg, b)
    cache2 = jax.device_put(init_kv_cache(cfg, b), sh.cache)
    plain = jax.jit(step)
    sharded_step = jax.jit(
        step,
        in_shardings=(sh.params, sh.cache, sh.tokens, sh.tokens),
        out_shardings=(sh.logits, sh.cache),
    )
    for p in range(3):
        toks = jnp.array([s[p] for s in seq], jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        l1, cache1 = plain(params, cache1, toks, pos)
        l2, cache2 = sharded_step(
            sparams, cache2, jax.device_put(toks, sh.tokens), jax.device_put(pos, sh.tokens)
        )
        assert_close(np.asarray(l2), np.asarray(l1), atol=1e-4, rtol=1e-3, msg=f"pos {p}")


@requires_8_devices
def test_sharded_prefill(sharded_setup):
    cfg, params, sparams, sh = sharded_setup
    prefill = make_prefill(cfg)
    b, t = 4, 8
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    valid = jnp.array([8, 5, 1, 0], jnp.int32)

    cache1 = init_kv_cache(cfg, b)
    l1, c1 = jax.jit(prefill)(params, cache1, toks, start, valid)

    cache2 = jax.device_put(init_kv_cache(cfg, b), sh.cache)
    sp = jax.jit(
        prefill,
        in_shardings=(sh.params, sh.cache, None, None, None),
        out_shardings=(None, sh.cache),
    )
    l2, c2 = sp(sparams, cache2, toks, start, valid)
    # only compare logits at valid positions
    for i in range(b):
        v = int(valid[i])
        if v:
            assert_close(
                np.asarray(l2[i, :v]), np.asarray(l1[i, :v]), atol=1e-4, rtol=1e-3
            )
    assert_close(np.asarray(c2.k), np.asarray(c1.k), atol=1e-5, rtol=1e-4)


@requires_8_devices
def test_engine_with_shardings(tiny_cfg, tiny_weights, toy_tokenizer):
    from hip_llama_tpu.engine import InferenceEngine, Requests

    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    mesh = make_mesh(tp=4, dp=1)
    sh = make_shardings(tiny_cfg, mesh, shard_batch=False)
    sparams = shard_params(params, sh)

    e_plain = InferenceEngine(tiny_cfg, params, toy_tokenizer, batch_size=2)
    e_shard = InferenceEngine(
        tiny_cfg, sparams, toy_tokenizer, batch_size=2, shardings=sh
    )
    prompts = ["hello", "he llo", "hello hello"]
    r1 = Requests(prompts=list(prompts), generations=[""] * 3)
    r2 = Requests(prompts=list(prompts), generations=[""] * 3)
    e_plain.serve(r1, steps=10)
    e_shard.serve(r2, steps=10)
    assert r1.generations == r2.generations
