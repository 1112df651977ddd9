"""v4 int4 checkpoint format (our extension; the reference's formats stop at
Q8_0/v2 — runq.c:189-251): write/read round-trip, bit-parity between the
numpy file packer and the jax in-memory quantizer, and end-to-end greedy
parity between a loaded v4 checkpoint and on-the-fly q4 quantization."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io.checkpoint import (
    Q4Weights,
    load_checkpoint,
    quantize_q40,
    random_weights,
    write_v4,
)
from hip_llama_tpu.models import init_kv_cache, make_decode_step
from hip_llama_tpu.models.params import (
    params_from_q4_dequant,
    qparams_from_q4_weights,
    quantize_params_q4,
)
from hip_llama_tpu.ops.quant4 import q4_quantize_weights

GS = 32


def test_numpy_packer_matches_jax_quantizer():
    """io/checkpoint.py::quantize_q40 (numpy, file writer) must produce the
    exact bytes of ops/quant4.py::q4_quantize_weights (jax, runtime)."""
    rng = np.random.default_rng(3)
    for k, n in [(128, 96), (64, 64), (256, 32)]:
        w = rng.normal(size=(k, n)).astype(np.float32)
        packed_np, scale_np, _ = quantize_q40(w, GS)
        t = q4_quantize_weights(w, group_size=GS)
        np.testing.assert_array_equal(packed_np, np.asarray(t.q))
        np.testing.assert_allclose(scale_np, np.asarray(t.s), rtol=1e-7)


def test_v4_roundtrip_bit_lossless(tmp_path):
    """write_v4 -> read_v4 -> qparams == quantize_params_q4 in memory
    (the file stores the runtime's packed layout, so loading is zero-copy
    and bit-identical)."""
    cfg = tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)
    w = random_weights(cfg, seed=7)
    path = os.path.join(tmp_path, "m4.bin")
    err = write_v4(path, cfg, w, group_size=GS)
    assert 0 < err < 0.2

    cfg2, w4 = load_checkpoint(path)
    assert isinstance(w4, Q4Weights)
    assert cfg2.group_size == GS
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers

    qp_file = qparams_from_q4_weights(cfg2, w4)
    qp_mem = quantize_params_q4(cfg, w, group_size=GS)
    for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wcls"):
        tf, tm = getattr(qp_file, name), getattr(qp_mem, name)
        np.testing.assert_array_equal(
            np.asarray(tf.q), np.asarray(tm.q), err_msg=name
        )
        assert_close(tf.s, tm.s, atol=1e-7, rtol=1e-6, msg=name)
    np.testing.assert_array_equal(
        np.asarray(qp_file.tok_emb_q), np.asarray(qp_mem.tok_emb_q)
    )
    assert_close(qp_file.tok_emb_s, qp_mem.tok_emb_s, atol=1e-7, rtol=1e-6)


def test_v4_loaded_params_decode_greedy_identical(tmp_path):
    """Greedy decode from the loaded v4 file == greedy decode from in-memory
    q4 quantization — byte-identical token stream (same quantized numbers)."""
    cfg = tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)
    w = random_weights(cfg, seed=9)
    path = os.path.join(tmp_path, "m4.bin")
    write_v4(path, cfg, w, group_size=GS)
    cfg2, w4 = load_checkpoint(path)
    qp_file = qparams_from_q4_weights(cfg2, w4)
    qp_mem = quantize_params_q4(cfg, w, group_size=GS)

    step = jax.jit(make_decode_step(cfg, precision="default"))

    def greedy(params, n=16):
        cache = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
        tok = jnp.asarray([1], jnp.int32)
        out = []
        for p in range(n):
            logits, cache = step(params, cache, tok, jnp.full((1,), p, jnp.int32))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            out.append(int(tok[0]))
        return out

    assert greedy(qp_file) == greedy(qp_mem)


def test_v4_dequant_dense_path(tmp_path):
    """params_from_q4_dequant (the --dequant debug path) produces finite
    dense params whose step agrees with the quantized step within bf16
    fusion noise."""
    cfg = tiny_config(dim=64, hidden_dim=192, n_heads=8, n_kv_heads=4, seq_len=64)
    w = random_weights(cfg, seed=11)
    path = os.path.join(tmp_path, "m4.bin")
    write_v4(path, cfg, w, group_size=GS)
    cfg2, w4 = load_checkpoint(path)
    dp = params_from_q4_dequant(cfg2, w4, dtype=jnp.bfloat16)
    qp = qparams_from_q4_weights(cfg2, w4)
    step = jax.jit(make_decode_step(cfg, precision="default"))
    cd = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
    cq = init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
    tok = jnp.asarray([1], jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    ld, _ = step(dp, cd, tok, pos)
    lq, _ = step(qp, cq, tok, pos)
    assert np.isfinite(np.asarray(ld)).all()
    assert_close(lq, ld, atol=0.15, rtol=0.05)
