"""int4 (Q4_0-style) weight-only path — BEYOND the reference (runq.c stops
at Q8_0; decode is weight-bandwidth-bound, so int4 halves the dominant HBM
traffic term). Kernel-vs-oracle sweeps mirror the Q8 validation treatment
(reference validators: scripts/test/thaDNN.test.cpp)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, make_prefill
from hip_llama_tpu.models.params import (
    params_from_weights,
    quantize_params_q4,
    unstack_quant_params,
)
from hip_llama_tpu.ops.quant4 import (
    Q4Tensor,
    q4_dequantize,
    q4_matmul,
    q4_matmul_silu,
    q4_matmul_xla,
    q4_quantize_weights,
    q4_unpack,
)

GS = 32


def test_q4_roundtrip_error_bound():
    """|w - dequant(quant(w))| <= scale/2 elementwise (symmetric absmax/7,
    codes clipped to [-8, 7] — the -8 code is never needed for absmax/7)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 96)).astype(np.float32)
    t = q4_quantize_weights(w, group_size=GS)
    dq = np.asarray(q4_dequantize(t))
    s_exp = np.repeat(np.asarray(t.s), GS, axis=0)
    assert np.all(np.abs(w - dq) <= s_exp * 0.5 + 1e-7)
    # codes stay in the signed int4 range
    codes = np.asarray(q4_unpack(t))
    assert codes.min() >= -8 and codes.max() <= 7


def test_q4_pack_unpack_inverse():
    """Half-split nibble packing: unpack(pack(w)) reproduces the codes in
    original K order."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    t = q4_quantize_weights(w, group_size=GS)
    codes = np.asarray(q4_unpack(t), np.float32)
    s_exp = np.repeat(np.asarray(t.s), GS, axis=0)
    np.testing.assert_allclose(codes * s_exp, np.asarray(q4_dequantize(t)),
                               rtol=1e-6)
    assert t.k_dim == 128 and t.group_size == GS


@pytest.mark.parametrize("b,k,n", [(8, 512, 256), (3, 256, 384), (16, 128, 128)])
def test_q4_matmul_matches_oracle(b, k, n):
    """Pallas kernel (single-K-block fast path, interpret on CPU) vs the
    grouped-einsum oracle; bf16-dot tolerance."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
    t = q4_quantize_weights(rng.normal(size=(k, n)), group_size=GS)
    got = q4_matmul(x, t, interpret=True)
    want = q4_matmul_xla(x, t)
    assert_close(got.astype(jnp.float32), want.astype(jnp.float32),
                 atol=0.1, rtol=0.05, msg=f"{(b, k, n)}")


def test_q4_matmul_multi_k_block():
    """Multi-K-block accumulation path (grid over packed K halves) + the
    large-M block/pad path."""
    rng = np.random.default_rng(3)
    b, k, n = 520, 1024, 256  # b*k*2 > 2 MiB forces bkh < kh; b > 512 pads
    x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
    t = q4_quantize_weights(rng.normal(size=(k, n)), group_size=GS)
    got = q4_matmul(x, t, block_k=256, interpret=True)
    want = q4_matmul_xla(x, t)
    assert got.shape == (b, n)
    # k=1024-deep bf16 dots: absolute noise ~eps*sqrt(k) on O(1) magnitudes
    assert_close(got.astype(jnp.float32), want.astype(jnp.float32),
                 atol=0.3, rtol=0.05)


def test_q4_matmul_fused_norm_matches_separate():
    """q4_matmul(norm_weight=g) == q4_matmul(rmsnorm(x, g)) — fused rmsnorm
    prologue over the two half-row blocks."""
    from hip_llama_tpu.models.llama import rmsnorm

    rng = np.random.default_rng(4)
    for b, k, n in [(8, 256, 256), (4, 128, 384)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.5 + 1.0, jnp.float32)
        t = q4_quantize_weights(rng.normal(size=(k, n)), group_size=GS)
        fused = q4_matmul(x, t, norm_weight=g, norm_eps=1e-5, interpret=True)
        manual = q4_matmul(rmsnorm(x, g, 1e-5), t, interpret=True)
        assert_close(fused.astype(jnp.float32), manual.astype(jnp.float32),
                     atol=0.05, rtol=0.05, msg=f"{(b, k, n)}")


def test_q4_matmul_silu_matches_separate():
    """Fused SwiGLU kernel == silu/gate on the plain matmul output."""
    rng = np.random.default_rng(5)
    for b, k, h in [(8, 256, 384), (700, 256, 384)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.3 + 1.0, jnp.float32)
        t = q4_quantize_weights(rng.normal(size=(k, 2 * h)), group_size=GS)
        fused = q4_matmul_silu(x, t, norm_weight=g, norm_eps=1e-5,
                               interpret=True)
        h13 = q4_matmul(x, t, norm_weight=g, norm_eps=1e-5,
                        interpret=True).astype(jnp.float32)
        ref = jax.nn.silu(h13[:, :h]) * h13[:, h:]
        assert_close(fused.astype(jnp.float32), ref, atol=0.1, rtol=0.05,
                     msg=f"{(b, k, h)}")


@pytest.fixture(scope="module")
def q4_cfg():
    return tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)


@pytest.fixture(scope="module")
def q4_weights(q4_cfg):
    return random_weights(q4_cfg, seed=5)


def test_q4_decode_matches_dequant_dense(q4_cfg, q4_weights):
    """Quantized step == dense step on the DEQUANTIZED weights (the same
    numbers stream through the matmuls; differences are bf16 fusion order)."""
    cfg = q4_cfg
    qp = quantize_params_q4(cfg, q4_weights, group_size=GS)

    def dq(t):
        return np.swapaxes(np.asarray(q4_dequantize(t)), 1, 2)

    dw = dataclasses.replace(
        q4_weights,
        tok_emb=np.asarray(qp.tok_emb),
        wq=dq(qp.wq), wk=dq(qp.wk), wv=dq(qp.wv), wo=dq(qp.wo),
        w1=dq(qp.w1), w2=dq(qp.w2), w3=dq(qp.w3),
        wcls=np.asarray(q4_dequantize(qp.wcls)).T,
    )
    dp = params_from_weights(dw, dtype=jnp.bfloat16)

    step = jax.jit(make_decode_step(cfg, precision="default"))
    cache_q = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    cache_d = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
        pos = jnp.full((2,), p, jnp.int32)
        lq, cache_q = step(qp, cache_q, toks, pos)
        ld, cache_d = step(dp, cache_d, toks, pos)
        assert_close(lq, ld, atol=0.15, rtol=0.05, msg=f"step {p}")


def test_q4_unrolled_matches_scan(q4_cfg, q4_weights):
    """unstack_quant_params preserves Q4Tensor types (fused QKV / W1|W3
    concatenation along N is bit-identical — groups run along K)."""
    cfg = q4_cfg
    qp = quantize_params_q4(cfg, q4_weights, group_size=GS)
    qpu = unstack_quant_params(qp)
    assert isinstance(qpu.wq[0], Q4Tensor)
    step = jax.jit(make_decode_step(cfg, precision="default"))
    c1 = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    c2 = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for p in range(3):
        t = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
        pos = jnp.full((2,), p, jnp.int32)
        l1, c1 = step(qp, c1, t, pos)
        l2, c2 = step(qpu, c2, t, pos)
        assert_close(l2, l1, atol=0.05, rtol=0.02, msg=f"step {p}")


def test_q4_prefill_matches_stepwise(q4_cfg, q4_weights):
    cfg = q4_cfg
    qp = quantize_params_q4(cfg, q4_weights, group_size=GS)
    prefill = jax.jit(make_prefill(cfg, precision="default"))
    step = jax.jit(make_decode_step(cfg, precision="default"))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)

    cache_a = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
    logits_a, cache_a = prefill(
        qp, cache_a, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
        jnp.full((1,), 8, jnp.int32),
    )
    cache_b = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
    for p in range(8):
        logits_b, cache_b = step(
            qp, cache_b, jnp.asarray(toks[:, p]), jnp.full((1,), p, jnp.int32)
        )
    assert_close(logits_a[:, 7], logits_b, atol=0.15, rtol=0.05)


def test_q4_greedy_matches_dequant_dense(q4_cfg, q4_weights):
    """Greedy decode through the int4 kernels shares a long prefix with the
    dense model built from the DEQUANTIZED weights — the same numbers stream
    through the matmuls, so only bf16 fusion-order noise can flip a token.
    (A tiny RANDOM model's logits are near-uniform, so tracking fp32 is not
    a meaningful bar at 4 bits; real-model quality is the perplexity test.)"""
    cfg = q4_cfg
    qp = quantize_params_q4(cfg, q4_weights, group_size=GS)

    def dq(t):
        return np.swapaxes(np.asarray(q4_dequantize(t)), 1, 2)

    dw = dataclasses.replace(
        q4_weights,
        tok_emb=np.asarray(qp.tok_emb),
        wq=dq(qp.wq), wk=dq(qp.wk), wv=dq(qp.wv), wo=dq(qp.wo),
        w1=dq(qp.w1), w2=dq(qp.w2), w3=dq(qp.w3),
        wcls=np.asarray(q4_dequantize(qp.wcls)).T,
    )
    dp = params_from_weights(dw, dtype=jnp.bfloat16)
    step = jax.jit(make_decode_step(cfg, precision="default"))

    def greedy(params, n=20):
        cache = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
        tok = jnp.asarray([1], jnp.int32)
        out = []
        for p in range(n):
            logits, cache = step(params, cache, tok, jnp.full((1,), p, jnp.int32))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(int(tok[0]))
        return out

    a = greedy(qp)
    b = greedy(dp)
    prefix = 0
    for x, y in zip(a, b):
        if x != y:
            break
        prefix += 1
    assert prefix >= 10, (a, b)


def test_q4_perplexity_delta(q4_cfg, q4_weights, toy_tokenizer):
    """int4 weight-only perplexity within a modest delta of FP32 (looser
    than the Q8 gate — 4-bit noise on a tiny random model; real-model
    deltas are far smaller relative to their perplexity)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from perplexity import perplexity

    cfg = q4_cfg
    fp = params_from_weights(q4_weights, dtype=jnp.float32)
    qp = quantize_params_q4(cfg, q4_weights, group_size=GS)
    text = "hello hello hello " * 200
    p_fp = perplexity(cfg, fp, toy_tokenizer, text, seq_len=32, max_batches=2)
    p_q4 = perplexity(cfg, qp, toy_tokenizer, text, seq_len=32, max_batches=2)
    assert abs(p_q4 - p_fp) / p_fp < 0.25, (p_fp, p_q4)
