"""shard_map tensor-parallel decode (dense AND Q8_0) vs the single-device
oracle on the faked CPU mesh — the int8 tensor-sharded target of
BASELINE.md that pjit auto-partitioning can't serve (Pallas calls aren't
auto-partitionable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.models.params import quantize_params_q8
from hip_llama_tpu.parallel.tp import make_tp_decode_step, tp_shardings


def _mesh(tp, dp=1):
    devs = np.array(jax.devices()[: tp * dp]).reshape(dp, tp)
    return Mesh(devs, axis_names=("dp", "tp"))


@pytest.mark.parametrize("tp,dp", [(2, 1), (4, 2)])
def test_tp_dense_matches_single(tp, dp):
    cfg = tiny_config(n_layers=3, seq_len=32, hidden_dim=192)
    w = random_weights(cfg, seed=4)
    params = params_from_weights(w)
    b = 4 * dp
    mesh = _mesh(tp, dp)
    p_sh, c_sh = tp_shardings(params, mesh)
    params_s = jax.device_put(params, p_sh)
    step_tp = jax.jit(make_tp_decode_step(cfg, mesh, params, attn_impl="xla",
                                          precision="highest"))
    step_1 = jax.jit(make_decode_step(cfg))
    cache_tp = jax.device_put(init_kv_cache(cfg, b), c_sh)
    cache_1 = init_kv_cache(cfg, b)
    rng = np.random.default_rng(0)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        l1, cache_1 = step_1(params, cache_1, toks, pos)
        lt, cache_tp = step_tp(params_s, cache_tp, toks, pos)
        assert_close(lt, l1, atol=1e-4, rtol=1e-3, msg=f"pos {p}")


def test_tp_q8_matches_single():
    cfg = tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=32)
    w = random_weights(cfg, seed=5)
    qp = quantize_params_q8(cfg, w, group_size=32)
    b = 4
    mesh = _mesh(tp=2)
    p_sh, c_sh = tp_shardings(qp, mesh)
    qp_s = jax.device_put(qp, p_sh)
    step_tp = jax.jit(make_tp_decode_step(cfg, mesh, qp, attn_impl="xla"))
    step_1 = jax.jit(make_decode_step(cfg, precision="default"))
    cache_tp = jax.device_put(init_kv_cache(cfg, b, dtype=jnp.bfloat16), c_sh)
    cache_1 = init_kv_cache(cfg, b, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        l1, cache_1 = step_1(qp, cache_1, toks, pos)
        lt, cache_tp = step_tp(qp_s, cache_tp, toks, pos)
        assert_close(lt, l1, atol=0.05, rtol=0.02, msg=f"pos {p}")


def test_tp_prefill_matches_single():
    from hip_llama_tpu.models import make_prefill
    from hip_llama_tpu.parallel.tp import make_tp_prefill

    cfg = tiny_config(n_layers=3, seq_len=32, hidden_dim=192)
    w = random_weights(cfg, seed=8)
    params = params_from_weights(w)
    b, t = 2, 8
    mesh = _mesh(tp=2)
    p_sh, c_sh = tp_shardings(params, mesh)
    params_s = jax.device_put(params, p_sh)

    pre_tp = jax.jit(make_tp_prefill(cfg, mesh, params, attn_impl="xla",
                                     precision="highest"))
    pre_1 = jax.jit(make_prefill(cfg))
    step_tp = jax.jit(make_tp_decode_step(cfg, mesh, params, attn_impl="xla",
                                          precision="highest"))

    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    valid = jnp.asarray([t, t - 3], jnp.int32)

    cache_tp = jax.device_put(init_kv_cache(cfg, b), c_sh)
    cache_1 = init_kv_cache(cfg, b)
    lt, cache_tp = pre_tp(params_s, cache_tp, toks, start, valid)
    l1, cache_1 = pre_1(params, cache_1, toks, start, valid)
    for s in range(b):
        v = int(valid[s])
        assert_close(lt[s, :v], l1[s, :v], atol=1e-4, rtol=1e-3, msg=f"slot {s}")

    # prefill-then-decode consistency through the TP cache
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    pos = jnp.asarray([t, t - 3], jnp.int32)
    ld, _ = step_tp(params_s, cache_tp, tok, pos)
    from hip_llama_tpu.models import make_decode_step as _mds

    step_1 = jax.jit(_mds(cfg))
    l1d, _ = step_1(params, cache_1, tok, pos)
    assert_close(ld, l1d, atol=1e-4, rtol=1e-3)


def test_tp_int8_kv_matches_single():
    """TP shard_map decode with the int8 KV cache (scale planes sharded on
    "tp") must track the single-device int8-KV engine."""
    cfg = tiny_config(n_layers=3, seq_len=32, hidden_dim=192)
    w = random_weights(cfg, seed=6)
    params = params_from_weights(w)
    b = 4
    mesh = _mesh(tp=2)
    p_sh, c_sh = tp_shardings(params, mesh, kv_quant=True)
    params_s = jax.device_put(params, p_sh)
    step_tp = jax.jit(make_tp_decode_step(cfg, mesh, params, attn_impl="xla",
                                          precision="highest", kv_quant=True))
    step_1 = jax.jit(make_decode_step(cfg))
    # pad=False: the TP spmd derives local head counts from cfg, so the
    # shard_map cache keeps the unpadded head layout (models/llama.py)
    cache_tp = jax.device_put(
        init_kv_cache(cfg, b, quantized=True, pad=False), c_sh)
    cache_1 = init_kv_cache(cfg, b, quantized=True)
    assert cache_tp.quantized
    rng = np.random.default_rng(2)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        l1, cache_1 = step_1(params, cache_1, toks, pos)
        lt, cache_tp = step_tp(params_s, cache_tp, toks, pos)
        assert_close(lt, l1, atol=1e-4, rtol=1e-3, msg=f"pos {p}")


def test_tp_int8_kv_prefill_matches_single():
    from hip_llama_tpu.models.llama import make_prefill
    from hip_llama_tpu.parallel.tp import make_tp_prefill

    cfg = tiny_config(n_layers=2, seq_len=32, hidden_dim=192)
    w = random_weights(cfg, seed=7)
    params = params_from_weights(w)
    b = 2
    mesh = _mesh(tp=2)
    p_sh, c_sh = tp_shardings(params, mesh, kv_quant=True)
    params_s = jax.device_put(params, p_sh)
    pre_tp = jax.jit(make_tp_prefill(cfg, mesh, params, attn_impl="xla",
                                     precision="highest", kv_quant=True))
    pre_1 = jax.jit(make_prefill(cfg))
    # pad=False: the TP spmd derives local head counts from cfg, so the
    # shard_map cache keeps the unpadded head layout (models/llama.py)
    cache_tp = jax.device_put(
        init_kv_cache(cfg, b, quantized=True, pad=False), c_sh)
    cache_1 = init_kv_cache(cfg, b, quantized=True)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 8)), jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    valid = jnp.array([8, 5], jnp.int32)
    l1, cache_1 = pre_1(params, cache_1, toks, start, valid)
    lt, cache_tp = pre_tp(params_s, cache_tp, toks, start, valid)
    assert_close(lt, l1, atol=1e-4, rtol=1e-3)
