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
        # ragged per-slot positions to exercise masked writes
        pos = jnp.asarray([p, p, p, p], jnp.int32)
        l1, cache_1 = step_1(params, cache_1, toks, pos)
        lp, cache_pp = step_pp(sp, cache_pp, toks, pos)
        assert_close(lp, l1, atol=1e-4, rtol=1e-3, msg=f"pos {p}")
    # caches must agree too
    assert_close(
        np.asarray(cache_pp.k), np.asarray(cache_1.k), atol=1e-5, rtol=1e-4
    )
