"""Whole-layer fused decode kernel (ops/layer_fused.py) vs the 4-kernel
layer path: the phase math reuses the standalone kernels' exact
expressions, so outputs must be BIT-identical where the kernel engages
(and it must decline cleanly where shapes don't fit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hip_llama_tpu.models.llama as L
from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step
from hip_llama_tpu.models.params import (
    quantize_params_q8,
    unstack_quant_params,
)
from hip_llama_tpu.ops.attention import attention_decode_fused
from hip_llama_tpu.ops.layer_fused import q8_layer_fused
from hip_llama_tpu.ops.quant import q8_quantize_weights


def _rand_qt(rng, k, n, gs=64):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    return q8_quantize_weights(jnp.asarray(w), gs)


@pytest.mark.parametrize("h,kvh", [(8, 8), (16, 8)])
@pytest.mark.parametrize("quantized", [False, True])
# b=3: odd batches shrink the slot-fold to bb=1 (ADVICE r4 — previously
# declined, now engaged, so the bb=1 configuration needs parity coverage)
@pytest.mark.parametrize("b", [4, 3])
def test_layer_kernel_matches_composed(h, kvh, quantized, b):
    rng = np.random.default_rng(0)
    hs, s, nl, hid = 128, 256, 2, 2816
    d = h * hs
    kvd = kvh * hs
    wqkv = _rand_qt(rng, d, d + 2 * kvd)
    wo = _rand_qt(rng, d, d)
    w13 = _rand_qt(rng, d, 2 * hid)
    w2 = _rand_qt(rng, hid, d)
    g1 = jnp.asarray(rng.random((d,)), jnp.float32)
    g2 = jnp.asarray(rng.random((d,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    pos = jnp.asarray([0, 37, 255, 128][:b], jnp.int32)
    layer = jnp.int32(1)
    if quantized:
        kc = jnp.asarray(
            rng.integers(-127, 128, (b, nl, kvh, s, hs)), jnp.int8)
        vc = jnp.asarray(
            rng.integers(-127, 128, (b, nl, kvh, s, hs)), jnp.int8)
        scales = (
            jnp.asarray(rng.random((b, nl, kvh, s)), jnp.float32),
            jnp.asarray(rng.random((b, nl, kvh, s)), jnp.float32),
        )
    else:
        kc = jnp.asarray(
            rng.standard_normal((b, nl, kvh, s, hs)), jnp.bfloat16)
        vc = jnp.asarray(
            rng.standard_normal((b, nl, kvh, s, hs)), jnp.bfloat16)
        scales = (None, None)

    got = q8_layer_fused(
        x, wqkv, wo, w13, w2, g1, g2, kc, vc, layer, pos, *scales,
        n_heads=h, head_size=hs, hidden=hid,
    )
    assert got is not None, "kernel declined an eligible shape"
    x_out, kv_rows = got

    qkv3 = L._mm_norm_rope(
        x, g1, wqkv, 1e-5, pos, d + kvd, hs, 10000.0, out_heads=True)
    att = attention_decode_fused(
        qkv3, kc, vc, layer, pos, *(scales if quantized else ()), n_heads=h
    ).reshape(b, d)
    x2 = L._mm_res(x, att, wo)
    x3 = L._mm_ffn(x2, g2, w13, w2, hid, 1e-5)
    np.testing.assert_array_equal(
        np.asarray(x_out, np.float32), np.asarray(x3, np.float32))
    np.testing.assert_array_equal(
        np.asarray(kv_rows, np.float32), np.asarray(qkv3[:, h:], np.float32))


def test_layer_kernel_declines_misaligned():
    rng = np.random.default_rng(1)
    d, h, kvh, hs, hid = 512, 4, 4, 128, 1024
    # nqkv = 1536, not divisible by the 8*HS strip — must return None
    wqkv = _rand_qt(rng, d, d + 2 * kvh * hs)
    wo = _rand_qt(rng, d, d)
    w13 = _rand_qt(rng, d, 2 * hid)
    w2 = _rand_qt(rng, hid, d)
    g = jnp.ones((d,), jnp.float32)
    x = jnp.zeros((4, d), jnp.bfloat16)
    kc = jnp.zeros((4, 1, kvh, 256, hs), jnp.bfloat16)
    pos = jnp.zeros((4,), jnp.int32)
    assert q8_layer_fused(
        x, wqkv, wo, w13, w2, g, g, kc, kc, jnp.int32(0), pos,
        n_heads=h, head_size=hs, hidden=hid,
    ) is None


def test_layer_kernel_declines_unaligned_head_counts():
    """h or kvh not a multiple of 8 (e.g. GQA kvh=4): the in-kernel
    sublane slices of qkv_scr at offsets h / h+kvh would not be 8-aligned
    and Mosaic would reject the static slice on real TPU — the kernel must
    DECLINE to the 4-kernel path instead (ADVICE r3)."""
    rng = np.random.default_rng(2)
    h, kvh, hs, hid = 8, 4, 128, 1024
    d = h * hs
    wqkv = _rand_qt(rng, d, d + 2 * kvh * hs)
    wo = _rand_qt(rng, d, d)
    w13 = _rand_qt(rng, d, 2 * hid)
    w2 = _rand_qt(rng, hid, d)
    g = jnp.ones((d,), jnp.float32)
    x = jnp.zeros((4, d), jnp.bfloat16)
    kc = jnp.zeros((4, 1, kvh, 256, hs), jnp.bfloat16)
    pos = jnp.zeros((4,), jnp.int32)
    assert q8_layer_fused(
        x, wqkv, wo, w13, w2, g, g, kc, kc, jnp.int32(0), pos,
        n_heads=h, head_size=hs, hidden=hid,
    ) is None


@pytest.mark.parametrize("kv_quant", [False, True])
def test_decode_step_layer_fuse_parity(monkeypatch, kv_quant):
    """Full decode step with the layer kernel engaged vs disabled:
    bit-identical logits, cache, and scale planes."""
    import hip_llama_tpu.ops.layer_fused as LF

    calls = {"n": 0}
    orig = LF.q8_layer_fused

    def counting(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(LF, "q8_layer_fused", counting)
    cfg = ModelConfig(
        dim=1024, hidden_dim=2816, n_layers=3, n_heads=8, n_kv_heads=8,
        vocab_size=512, seq_len=256,
    )
    w = random_weights(cfg, seed=3)
    qp = unstack_quant_params(quantize_params_q8(cfg, w, group_size=64),
                              fuse=True)
    tokens = jnp.arange(4, dtype=jnp.int32)
    pos = jnp.asarray([0, 10, 255, 128], jnp.int32)

    def run(flag):
        monkeypatch.setattr(L, "_ENV_LAYER_FUSE", flag)
        step = make_decode_step(cfg, attn_impl="pallas", precision="default")
        cache = init_kv_cache(cfg, 4, dtype=jnp.bfloat16, seq_len=256,
                              quantized=kv_quant)
        k = jax.random.normal(jax.random.PRNGKey(0), cache.k.shape)
        k = (k * 20).astype(cache.k.dtype) if kv_quant else (
            k * 0.3).astype(cache.k.dtype)
        cache = cache._replace(k=k, v=k)
        logits, c2 = step(qp, cache, tokens, pos)
        return logits, c2

    la, ca = run(True)
    assert calls["n"] == cfg.n_layers, calls
    lb, cb = run(False)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))
    if kv_quant:
        np.testing.assert_array_equal(
            np.asarray(ca.k_scale), np.asarray(cb.k_scale))
