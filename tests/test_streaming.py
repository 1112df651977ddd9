"""Host-offload decode (weight streaming + KV host-swap) vs the resident
oracle — parity with the reference's 70B and layer-swap paths
(thaDNN.cpp:83-189, :291-427)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.models.streaming import (
    host_params_from_weights,
    init_host_kv,
    init_layer_kv,
    make_streaming_decode_step,
)


def test_weight_streaming_matches_resident(tiny_cfg, tiny_weights):
    cfg = tiny_cfg
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    hp = host_params_from_weights(tiny_weights, dtype=jnp.float32)
    b = 2
    step_r = jax.jit(make_decode_step(cfg))
    step_s = make_streaming_decode_step(cfg, dtype=jnp.float32)
    cache_r = init_kv_cache(cfg, b)
    cache_s = init_layer_kv(cfg, b, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    for p in range(4):
        toks = rng.integers(0, cfg.vocab_size, (b,)).astype(np.int32)
        pos = np.full((b,), p, np.int32)
        lr, cache_r = step_r(params, cache_r, jnp.asarray(toks), jnp.asarray(pos))
        ls, cache_s = step_s(hp, cache_s, toks, pos)
        assert_close(ls, lr, atol=1e-4, rtol=1e-3, msg=f"pos {p}")


def test_kv_host_swap_matches_resident(tiny_cfg, tiny_weights):
    cfg = tiny_cfg
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    hp = host_params_from_weights(tiny_weights, dtype=jnp.float32)
    b = 2
    step_r = jax.jit(make_decode_step(cfg))
    step_s = make_streaming_decode_step(cfg, dtype=jnp.float32, kv_host=True)
    cache_r = init_kv_cache(cfg, b)
    kv_host = init_host_kv(cfg, b)
    rng = np.random.default_rng(1)
    for p in range(4):
        toks = rng.integers(0, cfg.vocab_size, (b,)).astype(np.int32)
        pos = np.full((b,), p, np.int32)
        lr, cache_r = step_r(params, cache_r, jnp.asarray(toks), jnp.asarray(pos))
        ls, kv_host = step_s(hp, kv_host, toks, pos)
        assert_close(ls, lr, atol=1e-4, rtol=1e-3, msg=f"pos {p}")
    # host KV holds the same cache contents as the device cache
    assert_close(kv_host[0], np.asarray(cache_r.k), atol=1e-5, rtol=1e-4)
