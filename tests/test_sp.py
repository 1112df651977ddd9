"""Sequence-parallel (context-parallel) decode vs the single-device oracle
on the faked CPU mesh — cross-chip online-softmax combine correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.parallel.sp import make_sp_decode_step, sp_shardings


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_decode_matches_single(sp):
    cfg = tiny_config(n_layers=3, seq_len=64)
    w = random_weights(cfg, seed=7)
    params = params_from_weights(w)
    b = 2
    mesh = Mesh(np.array(jax.devices()[:sp]), axis_names=("sp",))
    _, c_sh = sp_shardings(cfg, mesh)

    step_sp = jax.jit(make_sp_decode_step(cfg, mesh))
    step_1 = jax.jit(make_decode_step(cfg))

    cache_sp = jax.device_put(init_kv_cache(cfg, b), c_sh)
    cache_1 = init_kv_cache(cfg, b)
    rng = np.random.default_rng(0)
    # run across the shard boundary (seq_len/sp = 32 or 16)
    for p in range(20):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        l1, cache_1 = step_1(params, cache_1, toks, pos)
        ls, cache_sp = step_sp(params, cache_sp, toks, pos)
        assert_close(ls, l1, atol=1e-4, rtol=1e-3, msg=f"pos {p}")
    assert_close(np.asarray(cache_sp.k), np.asarray(cache_1.k), atol=1e-5, rtol=1e-4)
