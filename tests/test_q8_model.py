"""End-to-end Q8_0 weight-only decode path (the runq-engine equivalent,
reference: runq.c) — quantized decode step vs the dequantized dense oracle,
plus lossless v2 checkpoint round-trip into the fused-int8 params."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import load_checkpoint, random_weights, write_v2
from hip_llama_tpu.models import init_kv_cache, make_decode_step, make_prefill
from hip_llama_tpu.models.params import (
    params_from_weights,
    qparams_from_quant_weights,
    quantize_params_q8,
)

GS = 32


@pytest.fixture(scope="module")
def q8_cfg():
    # dims divisible by group size 32
    return tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)


@pytest.fixture(scope="module")
def q8_weights(q8_cfg):
    return random_weights(q8_cfg, seed=5)


def test_q8_decode_matches_dequant_dense(q8_cfg, q8_weights):
    """Quantized step == dense step on the DEQUANTIZED weights (exactly the
    same numbers stream through the matmuls, so tolerances are tight)."""
    cfg = q8_cfg
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
    # dense oracle built from the dequantized tensors
    from hip_llama_tpu.ops.quant import q8_dequantize
    import dataclasses

    dw = dataclasses.replace(
        q8_weights,
        tok_emb=np.asarray(qp.tok_emb),
        wq=np.swapaxes(np.asarray(q8_dequantize(qp.wq)), 1, 2),
        wk=np.swapaxes(np.asarray(q8_dequantize(qp.wk)), 1, 2),
        wv=np.swapaxes(np.asarray(q8_dequantize(qp.wv)), 1, 2),
        wo=np.swapaxes(np.asarray(q8_dequantize(qp.wo)), 1, 2),
        w1=np.swapaxes(np.asarray(q8_dequantize(qp.w1)), 1, 2),
        w2=np.swapaxes(np.asarray(q8_dequantize(qp.w2)), 1, 2),
        w3=np.swapaxes(np.asarray(q8_dequantize(qp.w3)), 1, 2),
        wcls=np.asarray(q8_dequantize(qp.wcls)).T,
    )
    dp = params_from_weights(dw, dtype=jnp.bfloat16)

    step_q = jax.jit(make_decode_step(cfg, precision="default"))
    step_d = jax.jit(make_decode_step(cfg, precision="default"))
    cache_q = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    cache_d = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
        pos = jnp.full((2,), p, jnp.int32)
        lq, cache_q = step_q(qp, cache_q, toks, pos)
        ld, cache_d = step_d(dp, cache_d, toks, pos)
        # both paths run bf16 activations; differences are bf16 rounding in
        # different fusion orders
        assert_close(lq, ld, atol=0.15, rtol=0.05, msg=f"step {p}")


def test_q8_greedy_generation_matches_fp32(q8_cfg, q8_weights):
    """Quality bar: Q8_0 greedy decode tracks the fp32 model (quantization
    noise may flip a late token; require a long identical prefix)."""
    cfg = q8_cfg
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
    fp = params_from_weights(q8_weights, dtype=jnp.float32)
    step_q = jax.jit(make_decode_step(cfg, precision="default"))
    step_f = jax.jit(make_decode_step(cfg, precision="highest"))

    def greedy(step, params, n=20):
        cache = init_kv_cache(
            cfg, 1, dtype=jnp.bfloat16 if params is qp else jnp.float32
        )
        tok = jnp.asarray([1], jnp.int32)
        out = []
        for p in range(n):
            logits, cache = step(params, cache, tok, jnp.full((1,), p, jnp.int32))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(int(tok[0]))
        return out

    a = greedy(step_q, qp)
    b = greedy(step_f, fp)
    # identical prefix of at least 10 tokens
    prefix = 0
    for x, y in zip(a, b):
        if x != y:
            break
        prefix += 1
    assert prefix >= 10, (a, b)


def test_v2_checkpoint_loads_lossless(tmp_path, q8_cfg, q8_weights):
    """write_v2 -> read_v2 -> qparams: the int8 payload and scales must be
    BIT-IDENTICAL to quantizing in memory (the transpose preserves groups)."""
    cfg = q8_cfg
    path = os.path.join(tmp_path, "m.bin")
    write_v2(path, cfg, q8_weights, group_size=GS)
    cfg2, qw = load_checkpoint(path)
    assert cfg2.group_size == GS
    qp_file = qparams_from_quant_weights(cfg2, qw)
    qp_mem = quantize_params_q8(cfg, q8_weights, group_size=GS)
    np.testing.assert_array_equal(np.asarray(qp_file.wq.q), np.asarray(qp_mem.wq.q))
    assert_close(qp_file.wq.s, qp_mem.wq.s, atol=1e-7, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(qp_file.tok_emb_q), np.asarray(qp_mem.tok_emb_q)
    )

    # and the loaded params actually decode
    step = jax.jit(make_decode_step(cfg2, precision="default"))
    cache = init_kv_cache(cfg2, 1, dtype=jnp.bfloat16)
    logits, _ = step(
        qp_file, cache, jnp.asarray([1], jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_q8_prefill_matches_stepwise(q8_cfg, q8_weights):
    cfg = q8_cfg
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
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


def test_q8_unrolled_matches_scan(q8_cfg, q8_weights):
    """Unrolled per-layer-buffer path == scan path (bf16 reassociation
    tolerance — different program structures reassociate differently)."""
    from hip_llama_tpu.models.params import unstack_quant_params

    cfg = q8_cfg
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
    qpu = unstack_quant_params(qp)
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


def test_q8_perplexity_delta(q8_cfg, q8_weights, toy_tokenizer):
    """BASELINE.md quality gate: Q8_0 weight-only perplexity within a small
    delta of FP32 on the same text (relative bound scaled for a tiny random
    model — real-model deltas are far smaller)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from perplexity import perplexity

    cfg = q8_cfg
    fp = params_from_weights(q8_weights, dtype=jnp.float32)
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
    text = "hello hello hello " * 200
    p_fp = perplexity(cfg, fp, toy_tokenizer, text, seq_len=32, max_batches=2)
    p_q8 = perplexity(cfg, qp, toy_tokenizer, text, seq_len=32, max_batches=2)
    assert abs(p_q8 - p_fp) / p_fp < 0.05, (p_fp, p_q8)


def test_q8_matmul_fused_norm_matches_separate():
    """q8_matmul(norm_weight=g) == q8_matmul(rmsnorm(x, g)) — the fused
    rmsnorm prologue (single-K-block kernel) and both fallback branches."""
    from hip_llama_tpu.models.llama import rmsnorm
    from hip_llama_tpu.ops.quant import q8_matmul, q8_quantize_weights

    rng = np.random.default_rng(7)
    for b, k, n in [(8, 256, 256), (8, 128, 384), (4, 96, 64)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.5 + 1.0, jnp.float32)
        qt = q8_quantize_weights(rng.normal(size=(k, n)), group_size=32)
        fused = q8_matmul(x, qt, norm_weight=g, norm_eps=1e-5)
        manual = q8_matmul(rmsnorm(x, g, 1e-5), qt)
        assert_close(fused, manual, atol=0.05, rtol=0.05, msg=f"{(b, k, n)}")


def test_q8_matmul_fused_residual_matches_separate():
    """q8_matmul(residual=r) == r + q8_matmul(x) — the fused epilogue add,
    alone and combined with the fused-norm prologue, including the >512-row
    padded-M path and the tiny-shape XLA fallback."""
    from hip_llama_tpu.models.llama import rmsnorm
    from hip_llama_tpu.ops.quant import q8_matmul, q8_quantize_weights

    rng = np.random.default_rng(11)
    for b, k, n in [(8, 256, 256), (600, 256, 256), (4, 96, 64)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        r = jnp.asarray(rng.normal(size=(b, n)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.5 + 1.0, jnp.float32)
        qt = q8_quantize_weights(rng.normal(size=(k, n)), group_size=32)
        fused = q8_matmul(x, qt, residual=r)
        manual = r.astype(jnp.float32) + q8_matmul(x, qt).astype(jnp.float32)
        assert_close(fused.astype(jnp.float32), manual, atol=0.05, rtol=0.05,
                     msg=f"res {(b, k, n)}")
        both = q8_matmul(x, qt, residual=r, norm_weight=g, norm_eps=1e-5)
        manual2 = r.astype(jnp.float32) + q8_matmul(
            rmsnorm(x, g, 1e-5), qt
        ).astype(jnp.float32)
        assert_close(both.astype(jnp.float32), manual2, atol=0.05, rtol=0.05,
                     msg=f"norm+res {(b, k, n)}")


def test_q8_matmul_fused_rope_matches_separate():
    """q8_matmul(rope_pos=...) == rope() applied to the q|k segments of the
    plain matmul output — kernel path, padded-M path, XLA fallback, default
    and Llama-3-era theta."""
    from hip_llama_tpu.models.llama import rope
    from hip_llama_tpu.ops.quant import q8_matmul, q8_quantize_weights

    rng = np.random.default_rng(5)
    cases = [
        (8, 256, 128, 4, 2, 10000.0),   # kernel path, GQA
        (8, 256, 64, 4, 4, 500000.0),   # MHA, big theta
        (4, 96, 8, 4, 2, 10000.0),      # tiny shapes -> XLA fallback
        (600, 256, 128, 4, 2, 10000.0),  # padded-M path
    ]
    for b, k, hs, nh, nkv, theta in cases:
        d, kvd = nh * hs, nkv * hs
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        qt = q8_quantize_weights(rng.normal(size=(k, d + 2 * kvd)) * 0.3,
                                 group_size=32)
        pos = jnp.asarray(rng.integers(0, 50, (b,)), jnp.int32)
        fused = q8_matmul(x, qt, rope_pos=pos, rope_limit=d + kvd,
                          rope_head=hs, rope_theta=theta,
                          out_dtype=jnp.float32)
        base = q8_matmul(x, qt, out_dtype=jnp.float32)
        q = rope(base[:, :d].reshape(b, nh, hs), pos, theta).reshape(b, d)
        kk = rope(base[:, d:d + kvd].reshape(b, nkv, hs), pos,
                  theta).reshape(b, kvd)
        manual = jnp.concatenate([q, kk, base[:, d + kvd:]], axis=1)
        assert_close(fused, manual, atol=2e-4, rtol=1e-4,
                     msg=f"{(b, k, hs, theta)}")


def test_q8_stacked_fused_matches_unrolled(q8_cfg, q8_weights):
    """The stacked-fused layered-kernel decode branch (weights as (L, K, N)
    arrays + scalar-prefetched layer index) matches the unrolled per-layer
    buffers bit-for-bit on CPU (same kernels modulo layer addressing)."""
    from hip_llama_tpu.models.params import (
        fuse_stacked_quant_params,
        unstack_quant_params,
    )

    cfg = q8_cfg
    qp = quantize_params_q8(cfg, q8_weights, group_size=GS)
    pu = unstack_quant_params(qp)
    ps = fuse_stacked_quant_params(qp)
    step = jax.jit(make_decode_step(cfg, precision="default"))
    cu = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    cs = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for p in range(3):
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2,)), jnp.int32)
        pos = jnp.full((2,), p, jnp.int32)
        lu, cu = step(pu, cu, toks, pos)
        ls, cs = step(ps, cs, toks, pos)
        assert_close(ls, lu, atol=5e-2, rtol=5e-2, msg=f"step {p}")


def test_q8_matmul_silu_matches_separate():
    """q8_matmul_silu == silu(h13[:, :H]) * h13[:, H:] with h13 from the
    plain fused-norm matmul (gate product on fp32 accumulators in-kernel)."""
    from hip_llama_tpu.ops.quant import (
        q8_matmul,
        q8_matmul_silu,
        q8_quantize_weights,
    )

    rng = np.random.default_rng(11)
    for b, k, h in [(8, 256, 384), (700, 256, 384), (4, 96, 64)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.3 + 1.0, jnp.float32)
        qt = q8_quantize_weights(rng.normal(size=(k, 2 * h)), group_size=32)
        fused = q8_matmul_silu(x, qt, norm_weight=g, norm_eps=1e-5)
        h13 = q8_matmul(x, qt, norm_weight=g, norm_eps=1e-5).astype(jnp.float32)
        ref = jax.nn.silu(h13[:, :h]) * h13[:, h:]
        assert_close(fused.astype(jnp.float32), ref, atol=0.1, rtol=0.05,
                     msg=f"{(b, k, h)}")


def test_q8_matmul_a8_mode_matches_oracle():
    """dequant_mode='a8' (w8a8: int8 weight tiles feed the MXU directly,
    activations rowwise-group-quantized like runq.c:367) vs the dequant
    oracle. Tolerance covers the int8 activation-quantization noise (~1%
    relative) on top of the weight-quant noise both paths share."""
    from hip_llama_tpu.ops.quant import (
        q8_matmul,
        q8_matmul_layered,
        q8_matmul_silu,
        q8_quantize_weights,
    )

    rng = np.random.default_rng(21)
    b, k, n, h = 8, 256, 384, 320
    x = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(k,)) * 0.3 + 1.0, jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 50, (b,)), jnp.int32)
    qt = q8_quantize_weights(rng.normal(size=(k, n)), group_size=32)

    def rel(a, bb):
        a, bb = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        return np.max(np.abs(a - bb)) / (np.max(np.abs(bb)) + 1e-9)

    base = q8_matmul(x, qt, dequant_mode="reshape")
    assert rel(q8_matmul(x, qt, dequant_mode="a8"), base) < 0.03
    # fused epilogue/prologue variants under a8
    assert rel(
        q8_matmul(x, qt, dequant_mode="a8", norm_weight=g),
        q8_matmul(x, qt, dequant_mode="reshape", norm_weight=g),
    ) < 0.03
    assert rel(
        q8_matmul(x, qt, dequant_mode="a8", residual=res),
        q8_matmul(x, qt, dequant_mode="reshape", residual=res),
    ) < 0.03
    assert rel(
        q8_matmul(x, qt, dequant_mode="a8", rope_pos=pos, rope_limit=k,
                  rope_head=32),
        q8_matmul(x, qt, dequant_mode="reshape", rope_pos=pos, rope_limit=k,
                  rope_head=32),
    ) < 0.03
    # fused SwiGLU
    qt13 = q8_quantize_weights(rng.normal(size=(k, 2 * h)), group_size=32)
    assert rel(
        q8_matmul_silu(x, qt13, dequant_mode="a8", norm_weight=g),
        q8_matmul_silu(x, qt13, dequant_mode="reshape", norm_weight=g),
    ) < 0.03
    # layered (stacked) selection
    qtl = q8_quantize_weights(rng.normal(size=(2, k, n)), group_size=32)
    for lyr in range(2):
        assert rel(
            q8_matmul_layered(x, qtl, jnp.int32(lyr), dequant_mode="a8"),
            q8_matmul_layered(x, qtl, jnp.int32(lyr), dequant_mode="reshape"),
        ) < 0.03
    # large-M callers (prefill) now run the w8a8 path too (round 5:
    # group-chunked rescale + per-m-block x stash) — same activation-quant
    # tolerance as decode shapes, not the bit-identical demotion of r4
    xb = jnp.asarray(rng.normal(size=(300, k)), jnp.float32)
    assert rel(
        q8_matmul(xb, qt, dequant_mode="a8"),
        q8_matmul(xb, qt, dequant_mode="reshape"),
    ) < 0.03


def test_q8_matmul_ffn_matches_two_kernel():
    """q8_matmul_ffn (whole FFN in one kernel: norm + W1/W3 + swiglu + W2 +
    residual) == the two-kernel path (q8_matmul_silu then residual-w2
    q8_matmul) for kernel-eligible shapes, and the fallback is used (and
    identical) for ineligible ones."""
    from hip_llama_tpu.ops.quant import (
        q8_matmul,
        q8_matmul_ffn,
        q8_matmul_silu,
        q8_quantize_weights,
    )

    rng = np.random.default_rng(31)
    # (b, k, h): kernel-eligible; non-bn-divisible-h fallback; large-b fallback
    for b, k, h in [(8, 256, 384), (4, 128, 256), (8, 256, 192), (512, 256, 384)]:
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(k,)) * 0.3 + 1.0, jnp.float32)
        qt13 = q8_quantize_weights(rng.normal(size=(k, 2 * h)), group_size=32)
        qt2 = q8_quantize_weights(rng.normal(size=(h, k)) * 0.1, group_size=32)
        fused = q8_matmul_ffn(x, qt13, qt2, residual=x, norm_weight=g,
                              norm_eps=1e-5)
        hh = q8_matmul_silu(x, qt13, norm_weight=g, norm_eps=1e-5)
        ref = q8_matmul(hh, qt2, residual=x)
        assert_close(fused.astype(jnp.float32), ref.astype(jnp.float32),
                     atol=0.15, rtol=0.05, msg=f"{(b, k, h)}")


def test_q8_decode_ffn_fuse_off_matches_on(q8_cfg, q8_weights, monkeypatch):
    """The decode step's output is independent of HIPLLAMA_Q8_FFN (the
    fused-FFN kernel vs the two-kernel path)."""
    import hip_llama_tpu.models.llama as llama_mod

    cfg = q8_cfg
    from hip_llama_tpu.models.params import unstack_quant_params

    qp = unstack_quant_params(quantize_params_q8(cfg, q8_weights, group_size=GS))
    cache = init_kv_cache(cfg, 2, dtype=jnp.float32, seq_len=cfg.seq_len)
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)
    step = make_decode_step(cfg, attn_impl="xla", precision="highest")

    monkeypatch.setattr(llama_mod, "_ENV_FFN_FUSE", True)
    lo_on, _ = step(qp, cache, tokens, pos)
    monkeypatch.setattr(llama_mod, "_ENV_FFN_FUSE", False)
    lo_off, _ = step(qp, cache, tokens, pos)
    assert_close(lo_on, lo_off, atol=5e-2, rtol=5e-2)
