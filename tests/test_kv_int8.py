"""int8 KV cache: per-row-scale quantized cache vs the fp32 cache.

The reference keeps its KV cache fp32 (seq.cpp:117-121, runq.c:389-394);
int8 KV is a beyond-parity capability (halves decode-attention HBM traffic).
Correctness bar: logits within ~1-2% relative of the fp32-cache engine on
both attention implementations, and the scale-plane writer must match the
XLA dynamic-update-slice semantics exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step
from hip_llama_tpu.models.llama import make_prefill
from hip_llama_tpu.models.params import params_from_weights

CFG = ModelConfig(
    dim=256, hidden_dim=512, n_layers=3, n_heads=2, n_kv_heads=2,
    vocab_size=512, seq_len=256,
)


@pytest.fixture(scope="module")
def params():
    return params_from_weights(random_weights(CFG, seed=0), dtype=jnp.float32)


@pytest.mark.parametrize("attn", ["xla", "pallas"])
def test_int8_kv_matches_fp32_cache(params, attn):
    B = 2
    step = make_decode_step(CFG, attn_impl=attn)
    pre = make_prefill(CFG, attn_impl=attn)
    c_fp = init_kv_cache(CFG, B, dtype=jnp.float32)
    c_q8 = init_kv_cache(CFG, B, quantized=True)
    assert c_q8.k.dtype == jnp.int8 and c_q8.quantized

    toks = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    start = jnp.zeros((B,), jnp.int32)
    valid = jnp.full((B,), 4, jnp.int32)
    lg_fp, c_fp = pre(params, c_fp, toks, start, valid)
    lg_q8, c_q8 = pre(params, c_q8, toks, start, valid)
    scale = float(jnp.max(jnp.abs(lg_fp))) + 1e-9
    assert float(jnp.max(jnp.abs(lg_fp - lg_q8))) / scale < 0.05

    t = jnp.array([9, 10], jnp.int32)
    for i in range(3):
        pos = jnp.full((B,), 4 + i, jnp.int32)
        lf, c_fp = step(params, c_fp, t, pos)
        lq, c_q8 = step(params, c_q8, t, pos)
    scale = float(jnp.max(jnp.abs(lf))) + 1e-9
    assert float(jnp.max(jnp.abs(lf - lq))) / scale < 0.05


def test_quantize_kv_rows_roundtrip():
    from hip_llama_tpu.ops.cache import quantize_kv_rows

    rows = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 2, 64), jnp.float32)
    q, s = quantize_kv_rows(rows)
    assert q.dtype == jnp.int8 and s.shape == rows.shape[:-1]
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - rows))
    # per-row absmax/127 quantization: error bounded by scale/2 per element
    assert float(err.max()) <= float(np.asarray(s).max()) * 0.51


def test_scale_write_rows_matches_xla():
    from hip_llama_tpu.ops.cache import scale_write_rows

    B, L, KVH, S = 2, 3, 2, 256
    key = jax.random.PRNGKey(1)
    sc = jax.random.normal(key, (B, L, KVH, S), jnp.float32)
    srows = jax.random.normal(jax.random.fold_in(key, 1), (L, B, KVH), jnp.float32)
    pos = jnp.array([5, 131], jnp.int32)

    expect = np.asarray(sc).copy()
    sr = np.asarray(srows)
    for b in range(B):
        expect[b, :, :, int(pos[b])] = sr[:, b, :]

    got = scale_write_rows(sc.copy(), srows, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=0, atol=0)


def test_paged_int8_kv_matches_contiguous(params):
    """Paged int8 cache must track the contiguous int8 cache: same rows,
    same per-row scales; the paged Pallas kernels dequantize in bf16 while
    the contiguous XLA fallback uses fp32, so allow bf16-level slack."""
    from hip_llama_tpu.models.paged import (
        init_paged_kv_cache,
        make_paged_decode_step,
        make_paged_prefill,
    )

    B, PS = 2, 128
    step_c = make_decode_step(CFG, attn_impl="xla")
    pre_c = make_prefill(CFG, attn_impl="xla")
    step_p = make_paged_decode_step(CFG)
    pre_p = make_paged_prefill(CFG)

    c_cont = init_kv_cache(CFG, B, quantized=True)
    c_page = init_paged_kv_cache(CFG, num_pages=2 * B, page_size=PS, quantized=True)
    assert c_page.quantized and c_page.k.dtype == jnp.int8
    # slot i owns pages [2i, 2i+1]
    table = jnp.array([[0, 1], [2, 3]], jnp.int32)

    toks = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    start = jnp.zeros((B,), jnp.int32)
    valid = jnp.full((B,), 4, jnp.int32)
    lg_c, c_cont = pre_c(params, c_cont, toks, start, valid)
    lg_p, c_page = pre_p(params, c_page, table, toks, start, valid)
    scale = float(jnp.max(jnp.abs(lg_c))) + 1e-9
    assert float(jnp.max(jnp.abs(lg_c - lg_p))) / scale < 0.02

    t = jnp.array([9, 10], jnp.int32)
    for i in range(3):
        pos = jnp.full((B,), 4 + i, jnp.int32)
        lc, c_cont = step_c(params, c_cont, t, pos)
        lp, c_page = step_p(params, c_page, table, t, pos)
    scale = float(jnp.max(jnp.abs(lc))) + 1e-9
    assert float(jnp.max(jnp.abs(lc - lp))) / scale < 0.02


def test_engine_generates_with_int8_kv(params):
    from hip_llama_tpu.engine.engine import InferenceEngine
    from hip_llama_tpu.sampler import Sampler

    class _TinyTok:
        bos_id, eos_id = 1, 2
        def encode(self, text, bos=True, eos=False):
            return ([1] if bos else []) + [3 + (ord(c) % 100) for c in text]
        def decode_piece(self, prev, tok):
            return chr(97 + tok % 26).encode()

    eng = InferenceEngine(
        CFG, params, _TinyTok(), batch_size=1, attn_impl="xla",
        kv_quant=True, max_seq_len=64,
    )
    res = eng.generate("hi", 12, Sampler(CFG.vocab_size, 0.0, 0.9, 0), echo=False)
    assert res.n_gen_tokens > 0
