"""Prefill layout-variant parity: the T-major attention kernel and the
head-split wo consumption (round-5 relayout kills) against the baseline
head-major + flat-wo path.

- TMAJ alone is BIT-identical (same math, different tiling).
- TMAJ+XHEADS accumulates wo per head (fp32 adds in head order instead of
  one K-deep dot) — fp reassociation within quantization noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import hip_llama_tpu.models.llama as L
import hip_llama_tpu.ops.attention as A
from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_prefill
from hip_llama_tpu.models.params import (
    quantize_params_q8,
    unstack_quant_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(dim=1024, hidden_dim=1408, n_layers=2, n_heads=8,
                      n_kv_heads=8, vocab_size=512, seq_len=256)
    qp = unstack_quant_params(
        quantize_params_q8(cfg, random_weights(cfg, seed=4)))
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    start = jnp.asarray([0, 32], jnp.int32)
    valid = jnp.asarray([16, 12], jnp.int32)
    return cfg, qp, toks, start, valid


def _run(cfg, qp, toks, start, valid, tmaj, xheads, monkeypatch):
    monkeypatch.setattr(A, "_ENV_PREFILL_TMAJ", tmaj)
    monkeypatch.setattr(L, "_ENV_PREFILL_XHEADS", xheads)
    cache = init_kv_cache(cfg, 2, quantized=True)
    logits, newc = make_prefill(cfg, attn_impl="pallas")(
        qp, cache, toks, start, valid)
    return np.asarray(logits), np.asarray(newc.k)


def test_tmaj_bit_identical(setup, monkeypatch):
    cfg, qp, toks, start, valid = setup
    l0, k0 = _run(cfg, qp, toks, start, valid, False, False, monkeypatch)
    l1, k1 = _run(cfg, qp, toks, start, valid, True, False, monkeypatch)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(k0, k1)


def test_tmaj_xheads_close(setup, monkeypatch):
    cfg, qp, toks, start, valid = setup
    l0, k0 = _run(cfg, qp, toks, start, valid, False, False, monkeypatch)
    l2, k2 = _run(cfg, qp, toks, start, valid, True, True, monkeypatch)
    np.testing.assert_allclose(l2, l0, atol=0.05, rtol=0.02)
    # cache rows may differ by one int8 quantization step at the margin
    assert np.abs(k2.astype(np.int32) - k0.astype(np.int32)).max() <= 1
