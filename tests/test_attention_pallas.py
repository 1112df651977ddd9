"""Pallas decode-attention kernel vs the XLA oracle — the op-level
GPU-vs-CPU validation tier of the reference (SURVEY.md §4.1,
scripts/test/thaDNN.test.cpp:62-77), re-targeted: Pallas (interpret mode on
CPU) vs the jnp einsum path, random inputs, size sweep incl. GQA and ragged
per-slot positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.models.llama import attention_decode_xla
from hip_llama_tpu.ops.attention import attention_decode_pallas


def _rand_case(rng, b, l, h, kvh, s, hs, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, h, hs)), dtype)
    kf = jnp.asarray(rng.standard_normal((b, l, kvh, s, hs)), dtype)
    vf = jnp.asarray(rng.standard_normal((b, l, kvh, s, hs)), dtype)
    kc = jnp.asarray(rng.standard_normal((b, kvh, hs)), dtype)
    vc = jnp.asarray(rng.standard_normal((b, kvh, hs)), dtype)
    return q, kf, vf, kc, vc


@pytest.mark.parametrize(
    "b,h,kvh,s,hs",
    [
        (1, 4, 4, 32, 16),  # MHA
        (2, 8, 4, 64, 16),  # GQA 2x
        (4, 8, 1, 64, 32),  # MQA
        (2, 12, 12, 128, 64),  # stories110M head shape
    ],
)
def test_pallas_matches_xla(b, h, kvh, s, hs):
    rng = np.random.default_rng(42)
    n_layers = 3
    q, kf, vf, kc, vc = _rand_case(rng, b, n_layers, h, kvh, s, hs)
    pos = jnp.asarray(rng.integers(0, s, (b,)), jnp.int32)
    for layer in range(n_layers):
        want = attention_decode_xla(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        got = attention_decode_pallas(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        assert_close(got, want, atol=1e-5, rtol=1e-4, msg=f"layer {layer}")


def test_pallas_pos_zero_and_full():
    """Degenerate positions: empty history (pos=0) and full window (pos=S)."""
    rng = np.random.default_rng(0)
    b, h, kvh, s, hs = 3, 4, 2, 32, 16
    q, kf, vf, kc, vc = _rand_case(rng, b, 1, h, kvh, s, hs)
    for p in (0, 1, s - 1, s):
        pos = jnp.full((b,), p, jnp.int32)
        want = attention_decode_xla(q, kf, vf, jnp.int32(0), pos, kc, vc)
        got = attention_decode_pallas(q, kf, vf, jnp.int32(0), pos, kc, vc)
        assert_close(got, want, atol=1e-5, rtol=1e-4, msg=f"pos={p}")


def test_pallas_ragged_pos_isolated_slots():
    """Each slot attends only to its own history length — raggedness parity
    with the reference's per-slot pos[] (thaBLAS.cpp:197)."""
    rng = np.random.default_rng(7)
    b, h, kvh, s, hs = 4, 4, 4, 64, 16
    q, kf, vf, kc, vc = _rand_case(rng, b, 1, h, kvh, s, hs)
    pos = jnp.asarray([0, 5, 33, 64], jnp.int32)
    want = attention_decode_xla(q, kf, vf, jnp.int32(0), pos, kc, vc)
    got = attention_decode_pallas(q, kf, vf, jnp.int32(0), pos, kc, vc)
    assert_close(got, want, atol=1e-5, rtol=1e-4)
    # poisoning cache beyond pos must not change the result
    kf2 = kf.at[:, :, :, 40:, :].set(1e6)
    pos2 = jnp.asarray([0, 5, 33, 40], jnp.int32)
    want2 = attention_decode_pallas(q, kf, vf, jnp.int32(0), pos2, kc, vc)
    got2 = attention_decode_pallas(q, kf2, vf, jnp.int32(0), pos2, kc, vc)
    assert_close(got2, want2, atol=1e-6, rtol=1e-6)


def test_pallas_bf16_cache():
    rng = np.random.default_rng(3)
    b, h, kvh, s, hs = 2, 8, 2, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, 2, h, kvh, s, hs, dtype=jnp.bfloat16)
    pos = jnp.asarray([17, 100], jnp.int32)
    want = attention_decode_xla(q, kf, vf, jnp.int32(1), pos, kc, vc)
    got = attention_decode_pallas(q, kf, vf, jnp.int32(1), pos, kc, vc)
    assert_close(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2, rtol=2e-2
    )


def test_decode_step_pallas_matches_xla(tiny_cfg, tiny_weights):
    """Whole decode step with attn_impl='pallas' vs 'xla' (whole-forward
    equivalence tier, SURVEY.md §4.2)."""
    from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights

    cfg = tiny_cfg
    params = params_from_weights(tiny_weights)
    b = 2
    rng = np.random.default_rng(11)
    step_x = jax.jit(make_decode_step(cfg, attn_impl="xla"))
    step_p = jax.jit(make_decode_step(cfg, attn_impl="pallas"))
    cache_x = init_kv_cache(cfg, b)
    cache_p = init_kv_cache(cfg, b)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    for p in range(4):
        pos = jnp.full((b,), p, jnp.int32)
        lx, cache_x = step_x(params, cache_x, tokens, pos)
        lp, cache_p = step_p(params, cache_p, tokens, pos)
        assert_close(lp, lx, atol=1e-4, rtol=1e-3, msg=f"step {p}")


# ---------------------------------------------------------------------------
# flash prefill kernel


def test_prefill_pallas_matches_xla_prefill(tiny_cfg, tiny_weights):
    """make_prefill(attn_impl='pallas') == make_prefill('xla') on logits for
    valid rows, mixed batch with different starts/valid lengths."""
    import jax
    from hip_llama_tpu.models import init_kv_cache, make_prefill, params_from_weights

    cfg = tiny_cfg
    params = params_from_weights(tiny_weights)
    b, t = 3, 16
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    start = jnp.asarray([0, 4, 0], jnp.int32)
    valid = jnp.asarray([16, 9, 0], jnp.int32)

    pre_x = jax.jit(make_prefill(cfg, attn_impl="xla"))
    pre_p = jax.jit(make_prefill(cfg, attn_impl="pallas"))
    # seed the history for slot 1 (start=4): fill via decode steps first
    cache_x = init_kv_cache(cfg, b)
    cache_p = init_kv_cache(cfg, b)
    from hip_llama_tpu.models import make_decode_step

    step = jax.jit(make_decode_step(cfg))
    for p in range(4):
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        _, cache_x = step(params, cache_x, tok, jnp.full((b,), p, jnp.int32))
        _, cache_p = step(params, cache_p, tok, jnp.full((b,), p, jnp.int32))

    lx, cache_x = pre_x(params, cache_x, toks, start, valid)
    lp, cache_p = pre_p(params, cache_p, toks, start, valid)
    for s in range(b):
        v = int(valid[s])
        if v:
            assert_close(lp[s, :v], lx[s, :v], atol=1e-4, rtol=1e-3, msg=f"slot {s}")
    # caches must agree (same scatter; tiny drift from attention rounding
    # propagating into later layers' K/V projections)
    assert_close(cache_p.k, cache_x.k, atol=1e-5, rtol=1e-3)


def test_prefill_pallas_then_decode_consistent(tiny_cfg, tiny_weights):
    """prefill(pallas) then decode == pure step-by-step decode."""
    import jax
    from hip_llama_tpu.models import (
        init_kv_cache,
        make_decode_step,
        make_prefill,
        params_from_weights,
    )

    cfg = tiny_cfg
    params = params_from_weights(tiny_weights)
    rng = np.random.default_rng(9)
    n = 8
    toks = rng.integers(0, cfg.vocab_size, (1, n)).astype(np.int32)
    step = jax.jit(make_decode_step(cfg))
    prefill = jax.jit(make_prefill(cfg, attn_impl="pallas"))

    cache_a = init_kv_cache(cfg, 1)
    la, cache_a = prefill(
        params, cache_a, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
        jnp.full((1,), n, jnp.int32),
    )
    cache_b = init_kv_cache(cfg, 1)
    for p in range(n):
        lb, cache_b = step(
            params, cache_b, jnp.asarray(toks[:, p]), jnp.full((1,), p, jnp.int32)
        )
    assert_close(la[:, n - 1], lb, atol=1e-4, rtol=1e-3)


def test_pallas_bfold_matches_xla(monkeypatch):
    """Batch-folded grid variant (HIPLLAMA_ATTN_BFOLD=1): per-slot math is
    identical to the default grid; only DMA granularity / grid shape and the
    max(pos) clamping change. Kept env-gated (measured 4% slower than the
    default grid on a real v5e at 7B b8 — BASELINE.md round-2 notes)."""
    import hip_llama_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_ENV_DECODE_BFOLD", "1")
    rng = np.random.default_rng(7)
    b, l, h, kvh, s, hs = 3, 2, 8, 4, 64, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    pos = jnp.asarray([0, 17, 63], jnp.int32)  # ragged incl. empty history
    for layer in range(l):
        want = attention_decode_xla(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        got = attention_decode_pallas(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        assert_close(got, want, atol=1e-5, rtol=1e-4, msg=f"layer {layer}")


def test_pallas_batch_block_matches_xla(monkeypatch):
    """HIPLLAMA_ATTN_BB=2: two slots share a grid step (per-group max(pos)
    clamping); numerics must match the oracle."""
    import hip_llama_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_ENV_DECODE_BB", 2)
    rng = np.random.default_rng(11)
    b, l, h, kvh, s, hs = 4, 2, 8, 4, 64, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    pos = jnp.asarray([5, 60, 0, 33], jnp.int32)
    for layer in range(l):
        want = attention_decode_xla(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        got = attention_decode_pallas(q, kf, vf, jnp.int32(layer), pos, kc, vc)
        assert_close(got, want, atol=1e-5, rtol=1e-4, msg=f"layer {layer}")


def _quant_kv(kf, vf):
    """Rowwise absmax/127 int8 quantization of (B, L, KVH, S, HS) caches."""
    def one(c):
        s = jnp.max(jnp.abs(c), axis=-1) / 127.0
        s = jnp.where(s == 0.0, 1.0, s)
        qi = jnp.round(c / s[..., None]).astype(jnp.int8)
        return qi, s.astype(jnp.float32)
    kq, ks = one(kf.astype(jnp.float32))
    vq, vs = one(vf.astype(jnp.float32))
    return kq, ks, vq, vs


@pytest.mark.parametrize("i8mxu", [True, False])
def test_pallas_int8_kv_i8mxu_paths(monkeypatch, i8mxu):
    """int8-KV decode kernel, both MXU feeds: i8mxu=True quantizes q and the
    probability rows so the int8 K/V tiles hit the MXU directly
    (int8xint8->int32); False folds scales into the small tensors with bf16
    dots. Both must track the dequantized-cache oracle within the int8-KV
    noise budget."""
    import hip_llama_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_ENV_I8MXU", i8mxu)
    rng = np.random.default_rng(13)
    b, l, h, kvh, s, hs = 3, 2, 8, 4, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    kq, ks, vq, vs = _quant_kv(kf, vf)
    pos = jnp.asarray([0, 37, 128], jnp.int32)
    for layer in range(l):
        want = attention_decode_xla(
            q, kq, vq, jnp.int32(layer), pos, kc, vc, ks, vs)
        got = attention_decode_pallas(
            q, kq, vq, jnp.int32(layer), pos, kc, vc, ks, vs)
        tol = 0.03 if i8mxu else 0.02  # bf16-dot rounding in the fold path
        assert_close(got, want, atol=tol, rtol=tol, msg=f"layer {layer}")


@pytest.mark.parametrize("i8mxu", [True, False])
def test_pallas_int8_kv_bfold_i8mxu(monkeypatch, i8mxu):
    """Batch-folded (BB=2) int8-KV grid under both MXU feeds."""
    import hip_llama_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_ENV_I8MXU", i8mxu)
    monkeypatch.setattr(attn_mod, "_ENV_DECODE_BB", 2)
    rng = np.random.default_rng(17)
    b, l, h, kvh, s, hs = 4, 2, 8, 4, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    kq, ks, vq, vs = _quant_kv(kf, vf)
    pos = jnp.asarray([5, 93, 0, 128], jnp.int32)
    for layer in range(l):
        want = attention_decode_xla(
            q, kq, vq, jnp.int32(layer), pos, kc, vc, ks, vs)
        got = attention_decode_pallas(
            q, kq, vq, jnp.int32(layer), pos, kc, vc, ks, vs)
        tol = 0.03 if i8mxu else 0.02  # bf16-dot rounding in the fold path
        assert_close(got, want, atol=tol, rtol=tol, msg=f"layer {layer}")


@pytest.mark.parametrize("i8mxu", [True, False])
@pytest.mark.parametrize("quantized", [True, False])
def test_bvec_matches_bfold(monkeypatch, quantized, i8mxu):
    """Vectorized batch-group kernel (HIPLLAMA_ATTN_BVEC) vs the unrolled
    batch-group kernel: identical math, different instruction schedule."""
    import hip_llama_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_ENV_I8MXU", i8mxu)
    monkeypatch.setattr(attn_mod, "_ENV_DECODE_BB", 2)
    rng = np.random.default_rng(23)
    b, l, h, kvh, s, hs = 4, 2, 8, 4, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    if quantized:
        kq, ks, vq, vs = _quant_kv(kf, vf)
        args = (q, kq, vq)
        scales = (ks, vs)
    else:
        args = (q, kf, vf)
        scales = ()
    pos = jnp.asarray([5, 93, 0, 128], jnp.int32)
    for layer in range(l):
        monkeypatch.setattr(attn_mod, "_ENV_BVEC", False)
        want = attention_decode_pallas(
            *args, jnp.int32(layer), pos, kc, vc, *scales)
        monkeypatch.setattr(attn_mod, "_ENV_BVEC", True)
        got = attention_decode_pallas(
            *args, jnp.int32(layer), pos, kc, vc, *scales)
        assert_close(got, want, atol=2e-5, rtol=1e-4, msg=f"layer {layer}")


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("h,kvh", [(8, 8), (8, 4)])
def test_fused_qkv_matches_sliced(monkeypatch, h, kvh, quantized):
    """attention_decode_fused on the head-split QKV tensor must be
    bit-identical to attention_decode_pallas on the sliced q/kc/vc rows
    (same kernel, index-map-addressed operands)."""
    import hip_llama_tpu.ops.attention as attn_mod
    from hip_llama_tpu.ops.attention import attention_decode_fused

    monkeypatch.setattr(attn_mod, "_ENV_DECODE_BB", 2)
    rng = np.random.default_rng(29)
    b, l, s, hs = 4, 2, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    qkv = jnp.concatenate([q, kc, vc], axis=1)  # (B, H+2KVH, HS)
    if quantized:
        kq, ks, vq, vs = _quant_kv(kf, vf)
        caches = (kq, vq)
        scales = (ks, vs)
    else:
        caches = (kf, vf)
        scales = ()
    pos = jnp.asarray([5, 93, 0, 128], jnp.int32)
    for layer in range(l):
        want = attention_decode_pallas(
            q, *caches, jnp.int32(layer), pos, kc, vc, *scales)
        got = attention_decode_fused(
            qkv, *caches, jnp.int32(layer), pos, *scales, n_heads=h)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"layer {layer}")


def test_fused_qkv_odd_batch_fallback():
    """b=1 (no batch group) must fall back to the sliced path — identical."""
    from hip_llama_tpu.ops.attention import attention_decode_fused

    rng = np.random.default_rng(31)
    b, l, h, kvh, s, hs = 1, 1, 8, 4, 128, 64
    q, kf, vf, kc, vc = _rand_case(rng, b, l, h, kvh, s, hs)
    qkv = jnp.concatenate([q, kc, vc], axis=1)
    pos = jnp.asarray([77], jnp.int32)
    want = attention_decode_pallas(q, kf, vf, jnp.int32(0), pos, kc, vc)
    got = attention_decode_fused(qkv, kf, vf, jnp.int32(0), pos, n_heads=h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("quantized", [False, True])
def test_prefill_tmaj_matches_head_major(monkeypatch, quantized):
    """T-major prefill kernel (q/output stay (B,T,H,HS); per-head dots via
    static sublane slices) must match the head-major kernel bit-for-bit —
    same math, different tiling (r5 relayout kill)."""
    import hip_llama_tpu.ops.attention as A

    b, L, kvh, s, hs, kv_mul, t = 2, 2, 8, 256, 128, 2, 32
    h = kvh * kv_mul
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, hs)), jnp.float32)
    start = jnp.asarray([0, 64], jnp.int32)
    valid = jnp.asarray([32, 20], jnp.int32)
    layer = jnp.int32(1)
    if quantized:
        kc = jnp.asarray(rng.integers(-90, 90, (b, L, kvh, s, hs)), jnp.int8)
        vc = jnp.asarray(rng.integers(-90, 90, (b, L, kvh, s, hs)), jnp.int8)
        scales = (jnp.full((b, L, kvh, s), 0.01, jnp.float32),) * 2
    else:
        kc = jnp.asarray(rng.standard_normal((b, L, kvh, s, hs)) * 0.2,
                         jnp.float32)
        vc = jnp.asarray(rng.standard_normal((b, L, kvh, s, hs)) * 0.2,
                         jnp.float32)
        scales = ()

    monkeypatch.setattr(A, "_ENV_PREFILL_TMAJ", True)
    out_t = A.attention_prefill_pallas(
        q, kc, vc, layer, start, valid, *scales, interpret=True)
    monkeypatch.setattr(A, "_ENV_PREFILL_TMAJ", False)
    out_h = A.attention_prefill_pallas(
        q, kc, vc, layer, start, valid, *scales, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_h))
