"""Host-offload decode (weight streaming + KV host-swap) vs the resident
oracle — parity with the reference's 70B and layer-swap paths
(thaDNN.cpp:83-189, :291-427), plus the beyond-reference axes: int8 streamed
weights, a chunked streaming prefill, and engine-integrated batched corpus
serving (-m test --stream; the reference's test_70B forced batch=1,
llama.cpp:1099)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.engine import InferenceEngine, Requests
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.models.params import quantize_params_q8, unstack_quant_params
from hip_llama_tpu.models.streaming import (
    host_params_from_weights,
    host_quantize_params,
    init_host_kv,
    init_layer_kv,
    make_streaming_decode_step,
    make_streaming_engine_fns,
    make_streaming_prefill,
)
from hip_llama_tpu.sampler import Sampler


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


def test_kv_host_swap_matches_resident_batch3(tiny_cfg, tiny_weights):
    """kv_host with batch > 1 — the reference's 70B scheduler forced
    batch=1 (llama.cpp:1099); the host KV layout carries any batch."""
    cfg = tiny_cfg
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    hp = host_params_from_weights(tiny_weights, dtype=jnp.float32)
    b = 3
    step_r = jax.jit(make_decode_step(cfg))
    step_s = make_streaming_decode_step(cfg, dtype=jnp.float32, kv_host=True)
    cache_r = init_kv_cache(cfg, b)
    kv_host = init_host_kv(cfg, b)
    rng = np.random.default_rng(1)
    for p in range(4):
        toks = rng.integers(0, cfg.vocab_size, (b,)).astype(np.int32)
        # ragged per-slot positions exercise per-slot masking
        pos = np.asarray([p, p, p], np.int32)
        lr, cache_r = step_r(params, cache_r, jnp.asarray(toks), jnp.asarray(pos))
        ls, kv_host = step_s(hp, kv_host, toks, pos)
        assert_close(ls, lr, atol=1e-4, rtol=1e-3, msg=f"pos {p}")
    # host KV holds the same cache contents as the device cache
    assert_close(kv_host[0], np.asarray(cache_r.k), atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def q8s_cfg():
    return tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)


@pytest.fixture(scope="module")
def q8s_weights(q8s_cfg):
    return random_weights(q8s_cfg, seed=7)


def test_q8_streaming_matches_resident_q8(q8s_cfg, q8s_weights):
    """INT8 streamed weights (beyond the reference's fp32-only stream,
    models.cpp:511-692): the host-quantized layers carry the exact same
    Q8_0 payload as the resident fused-int8 path, so the streamed decode
    must track the resident quantized decode."""
    cfg = q8s_cfg
    qp = unstack_quant_params(quantize_params_q8(cfg, q8s_weights, group_size=32))
    hp = host_quantize_params(cfg, q8s_weights, group_size=32)
    b = 2
    step_r = jax.jit(make_decode_step(cfg))
    step_s = make_streaming_decode_step(cfg, dtype=jnp.bfloat16)
    cache_r = init_kv_cache(cfg, b, dtype=jnp.bfloat16)
    cache_s = init_layer_kv(cfg, b, dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    for p in range(4):
        toks = rng.integers(0, cfg.vocab_size, (b,)).astype(np.int32)
        pos = np.full((b,), p, np.int32)
        lr, cache_r = step_r(qp, cache_r, jnp.asarray(toks), jnp.asarray(pos))
        ls, cache_s = step_s(hp, cache_s, toks, pos)
        # both sides run bf16 activations over identical int8 payloads;
        # op-order differences keep this near (but not exactly) bit-equal
        assert_close(ls, lr, atol=3e-2, rtol=3e-2, msg=f"pos {p}")


def test_streaming_prefill_matches_forcefeed(tiny_cfg, tiny_weights):
    """Chunked streaming prefill == feeding the same tokens one-by-one
    through the streaming decode step (cache contents AND next logits)."""
    cfg = tiny_cfg
    hp = host_params_from_weights(tiny_weights, dtype=jnp.float32)
    b, t = 2, 7
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32)
    valid = np.asarray([t, t - 3], np.int32)

    prefill = make_streaming_prefill(cfg, dtype=jnp.float32)
    cache_p = init_layer_kv(cfg, b, dtype=jnp.float32)
    logits_p, cache_p = prefill(
        hp, cache_p, toks, np.zeros((b,), np.int32), valid
    )

    step = make_streaming_decode_step(cfg, dtype=jnp.float32)
    cache_f = init_layer_kv(cfg, b, dtype=jnp.float32)
    logits_f = np.zeros((b, t, cfg.vocab_size), np.float32)
    for p in range(t):
        lf, cache_f = step(
            hp, cache_f, toks[:, p], np.full((b,), p, np.int32)
        )
        logits_f[:, p] = lf
    for s in range(b):
        v = int(valid[s])
        assert_close(
            logits_p[s, v - 1], logits_f[s, v - 1], atol=1e-4, rtol=1e-3,
            msg=f"slot {s} last-valid logits",
        )
        # cache rows 0..v-1 match; rows beyond `valid` were masked
        kp = np.asarray(cache_p[0][0][s, 0])  # layer 0 K (KVH, S, HS)
        kf = np.asarray(cache_f[0][0][s, 0])
        assert_close(kp[:, :v], kf[:, :v], atol=1e-5, rtol=1e-4)
        assert np.all(kp[:, v:] == 0.0), "writes beyond valid must be masked"


def _mk_engines(cfg, weights, tok, *, kv_host=False, quant=False, batch=2):
    if quant:
        params = unstack_quant_params(
            quantize_params_q8(cfg, weights, group_size=32)
        )
        hp = host_quantize_params(cfg, weights, group_size=32)
        dt = jnp.bfloat16
    else:
        params = params_from_weights(weights, dtype=jnp.float32)
        hp = host_params_from_weights(weights, dtype=jnp.float32)
        dt = jnp.float32
    resident = InferenceEngine(
        cfg, params, tok, batch_size=batch,
        precision="highest" if dt == jnp.float32 else "default",
        cache_dtype=dt,
    )
    h_step, h_prefill, h_cache = make_streaming_engine_fns(
        cfg, dtype=dt, kv_host=kv_host
    )
    streaming = InferenceEngine(
        cfg, hp, tok, batch_size=batch, cache_dtype=dt,
        host_step=h_step, host_prefill=h_prefill, cache_factory=h_cache,
    )
    return resident, streaming


def test_streaming_engine_serve_matches_resident(tiny_cfg, tiny_weights, toy_tokenizer):
    """`-m test --stream`: the continuous-batching scheduler drives the
    streaming step/prefill; greedy generations must be byte-identical to
    the resident engine's over the same corpus."""
    cfg = tiny_cfg
    resident, streaming = _mk_engines(cfg, tiny_weights, toy_tokenizer)
    prompts = ["hello", "hello hello", "he", "llo hello", "o"]
    r1 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    r2 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    s1 = [Sampler(cfg.vocab_size, 0.0) for _ in prompts]
    s2 = [Sampler(cfg.vocab_size, 0.0) for _ in prompts]
    n1 = resident.serve(r1, steps=16, samplers=s1)
    n2 = streaming.serve(r2, steps=16, samplers=s2)
    assert n1 == n2
    assert r1.generations == r2.generations


def test_streaming_engine_serve_kv_host(tiny_cfg, tiny_weights, toy_tokenizer):
    cfg = tiny_cfg
    resident, streaming = _mk_engines(
        cfg, tiny_weights, toy_tokenizer, kv_host=True
    )
    prompts = ["hello hello", "he llo"]
    r1 = Requests(prompts=list(prompts), generations=[""] * 2)
    r2 = Requests(prompts=list(prompts), generations=[""] * 2)
    n1 = resident.serve(r1, steps=12, samplers=[Sampler(cfg.vocab_size, 0.0)] * 2)
    n2 = streaming.serve(r2, steps=12, samplers=[Sampler(cfg.vocab_size, 0.0)] * 2)
    assert n1 == n2
    assert r1.generations == r2.generations


def test_streaming_engine_guards(tiny_cfg, tiny_weights, toy_tokenizer):
    hp = host_params_from_weights(tiny_weights, dtype=jnp.float32)
    h_step, h_prefill, h_cache = make_streaming_engine_fns(
        tiny_cfg, dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="host_step"):
        InferenceEngine(
            tiny_cfg, hp, toy_tokenizer, cache_dtype=jnp.float32,
            host_step=h_step, cache_factory=h_cache, paged=True,
        )
    with pytest.raises(ValueError, match="cache_factory"):
        InferenceEngine(
            tiny_cfg, hp, toy_tokenizer, cache_dtype=jnp.float32,
            host_step=h_step,
        )
