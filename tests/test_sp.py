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


def test_sp_serve_matches_single(toy_tokenizer):
    """Whole-engine SP serving (KV sequence-sharded custom step) matches the
    single-device force-feed engine on greedy generations (the cross-chip
    psum reorders fp reductions, so stochastic coin-boundary parity is not
    expected — greedy argmax is)."""
    import numpy as np
    from jax.sharding import Mesh

    from hip_llama_tpu.config import tiny_config
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.models.params import params_from_weights
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(n_layers=4, seq_len=48)
    params = params_from_weights(random_weights(cfg, seed=5))
    prompts = ["hello hello", "he", " hello there"]

    def run(sp_n):
        if sp_n:
            mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
            p_sh, c_sh = sp_shardings(cfg, mesh)
            eng = InferenceEngine(
                cfg, jax.device_put(params, p_sh), toy_tokenizer,
                batch_size=2,
                custom_step=make_sp_decode_step(cfg, mesh),
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


@pytest.mark.parametrize("sp", [2, 4])
def test_ring_train_forward_matches_single(sp):
    """Ring-attention context-parallel training forward == single-device
    training forward, including gradient flow."""
    from hip_llama_tpu.parallel.ring import make_ring_train_forward
    from hip_llama_tpu.train.model import cross_entropy_loss, make_train_forward

    cfg = tiny_config(n_layers=2, seq_len=32, vocab_size=128)
    w = random_weights(cfg, seed=11)
    params = params_from_weights(w)
    mesh = Mesh(np.array(jax.devices()[:sp]), axis_names=("sp",))

    fwd_ring = jax.jit(make_ring_train_forward(cfg, mesh, precision="highest"))
    fwd_1 = jax.jit(make_train_forward(cfg, remat=False, precision="highest"))

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    lr = fwd_ring(params, toks)
    l1 = fwd_1(params, toks)
    assert_close(lr, l1, atol=1e-4, rtol=1e-3)

    # gradients through the ring (ppermute is differentiable)
    tgts = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)

    def loss_ring(p):
        return cross_entropy_loss(fwd_ring(p, toks), tgts)

    def loss_1(p):
        return cross_entropy_loss(fwd_1(p, toks), tgts)

    g_r = jax.grad(loss_ring)(params)
    g_1 = jax.grad(loss_1)(params)
    assert_close(g_r.wq, g_1.wq, atol=1e-5, rtol=1e-3)
    assert_close(g_r.tok_emb, g_1.tok_emb, atol=1e-5, rtol=1e-3)
