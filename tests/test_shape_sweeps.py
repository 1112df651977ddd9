"""Odd/degenerate shape sweeps through the PUBLIC kernel entry points.

The reference validates its kernels on a ladder of adversarial sizes —
1, 111, 11111, 33333, 32000 (/root/reference/scripts/test/thaDNN.test.cpp:
485-529) — to catch silent tail-dropping (a non-divisor block flooring a
grid) and degenerate-dimension bugs. This file is the same idea aimed at
OUR fallback machinery: every public kernel entry must either run its
Pallas path or DECLINE to a fallback, and in both cases match the oracle —
for row counts, column counts, and sequence lengths that are deliberately
NOT tile-aligned (1, 3, 7, 111, 333, ...).

Sizes are scaled down from the reference's 11111/33333 because these run
in Pallas interpret mode on the CPU CI mesh — the grid/index-map/fallback
logic they exercise is size-independent; the multi-K/N-block regime is
covered by making the sizes span multiple blocks at the smaller widths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.ops.quant import (
    QTensor,
    q8_matmul,
    q8_matmul_ffn,
    q8_matmul_silu,
    q8_matmul_xla,
    q8_quantize_weights,
)


def _qt(rng, k, n, gs=64):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    return q8_quantize_weights(jnp.asarray(w), gs)


# --------------------------------------------------------------------------
# q8_matmul: B x K @ (K, N) over the size ladder


@pytest.mark.parametrize("b", [1, 3, 111])
@pytest.mark.parametrize("k,n", [(64, 1), (64, 111), (192, 333), (128, 2112)])
def test_q8_matmul_ladder(b, k, n):
    rng = np.random.default_rng(b * 1000 + k + n)
    qt = _qt(rng, k, n)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32) * 0.5
    got = q8_matmul(x, qt, out_dtype=jnp.float32)
    want = q8_matmul_xla(x, qt)
    assert got.shape == (b, n)
    assert_close(got, want, atol=2e-2, rtol=2e-2, msg=f"b{b} k{k} n{n}")


@pytest.mark.parametrize("b", [1, 7])
@pytest.mark.parametrize("n,head_size", [(333 * 3, 333), (96 * 5, 96)])
def test_q8_matmul_out_heads_ladder(b, n, head_size):
    """Head-split output at non-8-aligned head counts / sub-lane head sizes
    must route through the flat-emit fallback and still return the
    head-split layout, with no tail heads dropped."""
    rng = np.random.default_rng(n)
    k = 128
    qt = _qt(rng, k, n)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32) * 0.5
    got = q8_matmul(x, qt, out_dtype=jnp.float32, out_heads=head_size)
    want = q8_matmul_xla(x, qt).reshape(b, n // head_size, head_size)
    assert got.shape == want.shape
    assert_close(got, want, atol=2e-2, rtol=2e-2)


def test_q8_matmul_env_block_n_non_divisor(monkeypatch):
    """An env-overridden HIPLLAMA_Q8_BLOCK_N whose out_heads rounding
    lands on a NON-divisor of N must not floor the grid (ADVICE r3: tail
    head slices silently never written) — the guard routes to the flat
    emit which re-shrinks the block."""
    rng = np.random.default_rng(9)
    k, n, hs = 128, 15360, 128  # 13B-QKV-like: 15360 % 2048 = 1024
    qt = _qt(rng, k, n)
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.float32) * 0.5
    got = q8_matmul(
        x, qt, block_n=2560, out_dtype=jnp.float32, out_heads=hs
    )
    want = q8_matmul_xla(x, qt).reshape(2, n // hs, hs)
    assert_close(got, want, atol=2e-2, rtol=2e-2)
    # the tail head slices must carry real values, not zeros
    tail = np.asarray(got)[:, -8:, :]
    assert np.abs(tail).max() > 0


@pytest.mark.parametrize("b", [1, 111])
@pytest.mark.parametrize("h", [1, 111, 352])
def test_q8_matmul_silu_ladder(b, h):
    rng = np.random.default_rng(h)
    k = 128
    qt13 = _qt(rng, k, 2 * h)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32) * 0.5
    got = q8_matmul_silu(x, qt13, out_dtype=jnp.float32)
    h13 = q8_matmul_xla(x, qt13)
    want = jax.nn.silu(h13[:, :h]) * h13[:, h:]
    assert got.shape == (b, h)
    assert_close(got, want, atol=2e-2, rtol=2e-2, msg=f"b{b} h{h}")


@pytest.mark.parametrize("b,h,n", [(1, 111, 64), (3, 352, 320), (111, 128, 128)])
def test_q8_matmul_ffn_ladder(b, h, n):
    rng = np.random.default_rng(h + n)
    k = n  # residual lives in the model dim
    qt13 = _qt(rng, k, 2 * h)
    qt2 = _qt(rng, h, n) if h % 64 == 0 else QTensor(
        q=jnp.asarray(rng.integers(-127, 128, (h, n)), jnp.int8),
        s=jnp.full((1, n), 0.01, jnp.float32),
    )
    g = jnp.asarray(rng.random((k,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32) * 0.5
    res = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    got = q8_matmul_ffn(
        x, qt13, qt2, residual=res, norm_weight=g, out_dtype=jnp.float32
    )
    # oracle composed from the public pieces (fallback path definition)
    hh = q8_matmul_silu(x, qt13, out_dtype=jnp.float32, norm_weight=g)
    want = q8_matmul(hh, qt2, out_dtype=jnp.float32, residual=res)
    assert got.shape == (b, n)
    assert_close(got, want, atol=2e-2, rtol=2e-2, msg=f"b{b} h{h} n{n}")


# --------------------------------------------------------------------------
# decode/prefill attention over odd sequence lengths / head counts


def _attn_fixture(rng, b, h, kvh, hs, s, nl=2, quantized=False):
    q = jnp.asarray(rng.standard_normal((b, h, hs)), jnp.float32)
    if quantized:
        kc = jnp.asarray(rng.integers(-127, 128, (b, nl, kvh, s, hs)), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 128, (b, nl, kvh, s, hs)), jnp.int8)
        ks = jnp.asarray(rng.random((b, nl, kvh, s)), jnp.float32) * 0.02
        vs = jnp.asarray(rng.random((b, nl, kvh, s)), jnp.float32) * 0.02
    else:
        kc = jnp.asarray(rng.standard_normal((b, nl, kvh, s, hs)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((b, nl, kvh, s, hs)), jnp.float32)
        ks = vs = None
    k_cur = jnp.asarray(rng.standard_normal((b, kvh, hs)), jnp.float32)
    v_cur = jnp.asarray(rng.standard_normal((b, kvh, hs)), jnp.float32)
    return q, kc, vc, ks, vs, k_cur, v_cur


@pytest.mark.parametrize("s", [1, 37, 111])
@pytest.mark.parametrize("h,kvh,hs", [(1, 1, 64), (3, 1, 64), (8, 4, 128)])
def test_attention_decode_ladder(s, h, kvh, hs):
    from hip_llama_tpu.models.llama import attention_decode_xla
    from hip_llama_tpu.ops.attention import attention_decode_pallas

    rng = np.random.default_rng(s * 10 + h)
    b = 3
    q, kc, vc, ks, vs, k_cur, v_cur = _attn_fixture(rng, b, h, kvh, hs, s)
    pos = jnp.asarray([0, min(1, s), s - 1], jnp.int32)[:b]
    layer = jnp.int32(1)
    got = attention_decode_pallas(q, kc, vc, layer, pos, k_cur, v_cur)
    want = attention_decode_xla(q, kc, vc, layer, pos, k_cur, v_cur)
    # kernel runs bf16 dots (the serving dtype); oracle is fp32
    assert_close(got, want, atol=1e-2, rtol=1e-2, msg=f"s{s} h{h}")


@pytest.mark.parametrize("s", [111, 128])
def test_attention_decode_int8_ladder(s):
    from hip_llama_tpu.models.llama import attention_decode_xla
    from hip_llama_tpu.ops.attention import attention_decode_pallas

    rng = np.random.default_rng(s)
    b, h, kvh, hs = 2, 8, 8, 128
    q, kc, vc, ks, vs, k_cur, v_cur = _attn_fixture(
        rng, b, h, kvh, hs, s, quantized=True
    )
    pos = jnp.asarray([3, s - 1], jnp.int32)
    layer = jnp.int32(0)
    got = attention_decode_pallas(q, kc, vc, layer, pos, k_cur, v_cur, ks, vs)
    want = attention_decode_xla(q, kc, vc, layer, pos, k_cur, v_cur, ks, vs)
    # 128-aligned windows engage the int8-MXU q/p re-quantization (a
    # measured-accuracy trade, BASELINE.md quality table) — tolerance covers
    # that design error, the sweep's point is the shape/fallback machinery
    assert_close(got, want, atol=5e-2, rtol=5e-2, msg=f"s{s}")


@pytest.mark.parametrize("t", [1, 7, 111])
def test_attention_prefill_ladder(t):
    """Odd chunk widths through the flash prefill entry vs a causal
    einsum oracle (strictly-causal within the chunk, full history)."""
    from hip_llama_tpu.ops.attention import attention_prefill_pallas

    rng = np.random.default_rng(t)
    b, h, kvh, hs, s, nl = 2, 4, 4, 64, 128, 2
    q = jnp.asarray(rng.standard_normal((b, t, h, hs)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, nl, kvh, s, hs)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, nl, kvh, s, hs)), jnp.float32)
    start = jnp.asarray([0, 5], jnp.int32)
    valid = jnp.asarray([t, max(1, t - 1)], jnp.int32)
    layer = jnp.int32(1)
    got = attention_prefill_pallas(q, kc, vc, layer, start, valid)

    # einsum oracle (the xla branch of make_prefill, models/llama.py)
    pos = start[:, None] + jnp.arange(t)[None, :]
    kl, vl = kc[:, 1], vc[:, 1]
    qs = q.reshape(b, t, kvh, h // kvh, hs)
    scores = jnp.einsum("btgmd,bgsd->btgms", qs, kl) / np.sqrt(hs)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t, 1, 1, s), 4)
    mask = s_idx <= pos[:, :, None, None, None]
    att = jax.nn.softmax(jnp.where(mask, scores, -jnp.inf), axis=-1)
    want = jnp.einsum("btgms,bgsd->btgmd", att, vl).reshape(b, t, h, hs)
    # rows past a slot's valid_len are unspecified — compare valid rows only
    got = np.asarray(got.reshape(b, t, h, hs))
    want = np.asarray(want)
    for i in range(b):
        v = int(valid[i])
        assert_close(got[i, :v], want[i, :v], atol=1e-2, rtol=1e-2,
                     msg=f"t{t} slot{i}")
