"""Prefill chunk writers (ops/cache.py kv_write_chunk / scale_write_chunk)
vs a numpy reference: windowed in-place RMW must equal a row-wise scatter
for arbitrary (start, valid) combinations, including bystanders (valid=0)
and chunks ending at the last cache position."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.ops.cache import kv_write_chunk, scale_write_chunk

B, L, KVH, S, HS, T = 3, 2, 4, 256, 128, 96


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
def test_kv_write_chunk_matches_scatter(dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        cache0 = rng.integers(-100, 100, (B, L, KVH, S, HS)).astype(np.int8)
        rows = rng.integers(-100, 100, (B, T, KVH, HS)).astype(np.int8)
    else:
        cache0 = rng.normal(size=(B, L, KVH, S, HS)).astype(np.float32)
        rows = rng.normal(size=(B, T, KVH, HS)).astype(np.float32)
    start = np.array([0, 37, S - T], np.int32)   # aligned, odd, end-clamped
    valid = np.array([T, 51, 0], np.int32)       # full, partial, bystander
    layer = 1

    expect = cache0.copy().astype(np.float32)
    for b in range(B):
        for j in range(valid[b]):
            expect[b, layer, :, start[b] + j, :] = rows[b, j]  # (KVH, HS)

    out = kv_write_chunk(
        jnp.asarray(cache0, dtype), jnp.asarray(rows, dtype),
        jnp.int32(layer), jnp.asarray(start), jnp.asarray(valid),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(jnp.asarray(expect, dtype), np.float32),
        atol=1e-2, rtol=1e-2,
    )


def test_scale_write_chunk_matches_scatter():
    rng = np.random.default_rng(1)
    s = 512  # needs T + 256 lane slack
    sc0 = rng.normal(size=(B, L, KVH, s)).astype(np.float32)
    srows = rng.normal(size=(B, T, KVH)).astype(np.float32)
    start = np.array([0, 129, s - T], np.int32)
    valid = np.array([T, 40, T], np.int32)
    layer = 0

    expect = sc0.copy()
    for b in range(B):
        for j in range(valid[b]):
            expect[b, layer, :, start[b] + j] = srows[b, j]

    out = scale_write_chunk(
        jnp.asarray(sc0), jnp.asarray(srows),
        jnp.int32(layer), jnp.asarray(start), jnp.asarray(valid),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_prefill_bucket_overflow_preserves_history():
    """A prefill whose BUCKET window extends past the KV window end (valid
    rows still in range) must write the valid rows at their true positions
    and leave earlier history untouched. Regression: the XLA scatter path
    let dynamic_update_slice clamp the window start, landing rows at the
    wrong positions and clobbering history — hit by speculative verify and
    chat prefill near the window end (the Pallas chunk writer already
    handled the clamp via its slack window)."""
    import jax

    from hip_llama_tpu.config import tiny_config
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.models import (
        init_kv_cache,
        make_decode_step,
        make_prefill,
        params_from_weights,
    )

    cfg = tiny_config(seq_len=48)
    params = params_from_weights(random_weights(cfg, seed=2))
    pre = jax.jit(make_prefill(cfg))
    step = jax.jit(make_decode_step(cfg))
    rng = np.random.default_rng(0)

    cache = init_kv_cache(cfg, 1)
    for p in range(40):
        _, cache = step(params, cache, jnp.asarray([5 + p % 7]),
                        jnp.asarray([p]))
    before = np.asarray(cache.k[0, :, :, :40, :]).copy()

    # T=16 bucket at start=40: window 40..56 > 48; valid rows 40..44 only
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    _, cache2 = pre(params, cache, toks, jnp.asarray([40]), jnp.asarray([5]))
    np.testing.assert_array_equal(
        before, np.asarray(cache2.k[0, :, :, :40, :]),
        err_msg="history rows clobbered by overflowing bucket",
    )
    # the valid rows must land at 40..44 and match a decode-step oracle
    cache_o = cache
    for i in range(5):
        _, cache_o = step(params, cache_o, toks[:, i], jnp.asarray([40 + i]))
    np.testing.assert_allclose(
        np.asarray(cache2.k[0, :, :, 40:45, :]),
        np.asarray(cache_o.k[0, :, :, 40:45, :]), atol=1e-5,
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
def test_kv_write_chunk_paged_matches_scatter(dtype):
    """Paged chunk writer: page-aligned starts, T <= page_size, whole-page
    RMW per slot must equal a row-wise scatter into the physical pages."""
    from hip_llama_tpu.ops.cache import kv_write_chunk_paged

    PB, PL, PKVH, P, PS, PHS, PT = 3, 2, 4, 6, 128, 128, 96
    rng = np.random.default_rng(3)
    if dtype == jnp.int8:
        pages0 = rng.integers(-100, 100, (PL, PKVH, P, PS, PHS)).astype(np.int8)
        rows = rng.integers(-100, 100, (PB, PT, PKVH, PHS)).astype(np.int8)
    else:
        pages0 = rng.normal(size=(PL, PKVH, P, PS, PHS)).astype(np.float32)
        rows = rng.normal(size=(PB, PT, PKVH, PHS)).astype(np.float32)
    table = np.array([[1, 4], [2, 5], [3, 0]], np.int32)
    start = np.array([0, PS, 0], np.int32)  # slot1 writes its SECOND page
    valid = np.array([PT, 40, 0], np.int32)  # full, partial, bystander
    layer = 1

    # compare in the cache dtype (bf16 rounds both sides identically)
    pages0 = np.asarray(jnp.asarray(pages0).astype(dtype).astype(jnp.float32))
    rows = np.asarray(jnp.asarray(rows).astype(dtype).astype(jnp.float32))
    expect = pages0.copy().astype(np.float32)
    for b in range(PB):
        page = table[b, start[b] // PS]
        for j in range(valid[b]):
            expect[layer, :, page, j] = rows[b, j]

    out = kv_write_chunk_paged(
        jnp.asarray(pages0).astype(dtype), jnp.asarray(rows).astype(dtype),
        jnp.int32(layer), jnp.asarray(table), jnp.asarray(start),
        jnp.asarray(valid), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32), expect.astype(np.float32),
        atol=(0 if dtype == jnp.int8 else 1e-2),
    )


def test_scale_write_chunk_paged_matches_scatter():
    from hip_llama_tpu.ops.cache import scale_write_chunk_paged

    PB, PL, PKVH, P, PS, PT = 3, 2, 4, 6, 128, 96
    rng = np.random.default_rng(4)
    sp0 = rng.normal(size=(PL, PKVH, P, PS)).astype(np.float32)
    srows = rng.normal(size=(PB, PT, PKVH)).astype(np.float32)
    table = np.array([[1, 4], [2, 5], [3, 0]], np.int32)
    start = np.array([0, PS, 0], np.int32)
    valid = np.array([PT, 40, 0], np.int32)
    layer = 0

    expect = sp0.copy()
    for b in range(PB):
        page = table[b, start[b] // PS]
        for j in range(valid[b]):
            expect[layer, :, page, j] = srows[b, j]

    out = scale_write_chunk_paged(
        jnp.asarray(sp0), jnp.asarray(srows), jnp.int32(layer),
        jnp.asarray(table), jnp.asarray(start), jnp.asarray(valid),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_kv_commit_rows_matches_split_writers():
    """Combined K+V(+scales) commit kernel vs the 4-kernel path: identical
    cache and scale planes (in-kernel quantization bit-matches
    quantize_kv_rows)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hip_llama_tpu.models.llama import KVCache
    from hip_llama_tpu.ops.cache import (
        kv_commit_rows, kv_write_rows, quantize_kv_rows, scale_write_rows,
    )

    rng = np.random.default_rng(7)
    b, l, kvh, s, hs = 3, 4, 2, 256, 128
    pos = jnp.asarray([0, 129, 255], jnp.int32)
    k_rows = jnp.asarray(rng.standard_normal((l, b, kvh, hs)), jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((l, b, kvh, hs)), jnp.bfloat16)

    # int8 cache
    kq0 = jnp.asarray(rng.integers(-127, 128, (b, l, kvh, s, hs)), jnp.int8)
    vq0 = jnp.asarray(rng.integers(-127, 128, (b, l, kvh, s, hs)), jnp.int8)
    ks0 = jnp.asarray(rng.random((b, l, kvh, s)), jnp.float32)
    vs0 = jnp.asarray(rng.random((b, l, kvh, s)), jnp.float32)
    cache = KVCache(kq0, vq0, ks0, vs0)
    got = kv_commit_rows(cache, k_rows, v_rows, pos, interpret=True)
    kq, ksr = quantize_kv_rows(k_rows)
    vq, vsr = quantize_kv_rows(v_rows)
    want = KVCache(
        kv_write_rows(kq0, kq, pos, interpret=True),
        kv_write_rows(vq0, vq, pos, interpret=True),
        scale_write_rows(ks0, ksr, pos, interpret=True),
        scale_write_rows(vs0, vsr, pos, interpret=True),
    )
    # XLA-CPU sometimes rewrites the in-kernel absmax/127 into a
    # reciprocal multiply (1-ULP scale wobble; exact division on TPU —
    # the on-chip A/B shows bit-equal planes), so: scales to 1 ULP, int8
    # codes within one rounding step at the wobbled scales.
    for name in ("k_scale", "v_scale"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-7, atol=0, err_msg=name)
    for name in ("k", "v"):
        d = np.abs(
            np.asarray(getattr(got, name)).astype(np.int32)
            - np.asarray(getattr(want, name)).astype(np.int32)
        )
        assert d.max() <= 1, (name, d.max())

    # bf16 cache (no scales)
    kb0 = jnp.asarray(rng.standard_normal((b, l, kvh, s, hs)), jnp.bfloat16)
    vb0 = jnp.asarray(rng.standard_normal((b, l, kvh, s, hs)), jnp.bfloat16)
    cache = KVCache(kb0, vb0)
    got = kv_commit_rows(cache, k_rows, v_rows, pos, interpret=True)
    want = KVCache(
        kv_write_rows(kb0, k_rows, pos, interpret=True),
        kv_write_rows(vb0, v_rows, pos, interpret=True),
    )
    np.testing.assert_array_equal(np.asarray(got.k), np.asarray(want.k))
    np.testing.assert_array_equal(np.asarray(got.v), np.asarray(want.v))


def test_kv_commit_rows_valid_mask():
    """valid=False slots keep their previous rows and scales."""
    import jax.numpy as jnp
    import numpy as np

    from hip_llama_tpu.models.llama import KVCache
    from hip_llama_tpu.ops.cache import kv_commit_rows

    rng = np.random.default_rng(11)
    b, l, kvh, s, hs = 2, 2, 2, 128, 128
    pos = jnp.asarray([5, 64], jnp.int32)
    valid = jnp.asarray([True, False])
    k_rows = jnp.asarray(rng.standard_normal((l, b, kvh, hs)), jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((l, b, kvh, hs)), jnp.bfloat16)
    kq0 = jnp.asarray(rng.integers(-127, 128, (b, l, kvh, s, hs)), jnp.int8)
    ks0 = jnp.asarray(rng.random((b, l, kvh, s)), jnp.float32)
    cache = KVCache(kq0, kq0, ks0, ks0)
    got = kv_commit_rows(cache, k_rows, v_rows, pos, valid, interpret=True)
    # slot 1 untouched everywhere
    np.testing.assert_array_equal(np.asarray(got.k[1]), np.asarray(kq0[1]))
    np.testing.assert_array_equal(
        np.asarray(got.k_scale[1]), np.asarray(ks0[1]))
    # slot 0's row did change
    assert not np.array_equal(np.asarray(got.k[0]), np.asarray(kq0[0]))
