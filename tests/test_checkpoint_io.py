"""Round-trip tests for v0/v1/v2 checkpoint formats and the tokenizer binary
(format parity with src/utils.cpp:119-170, runq.c:189-251,
train/export.py:75-260, train/tokenizer.py:62-70)."""

import numpy as np
import pytest

from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.io import (
    load_checkpoint,
    random_weights,
    read_tokenizer_bin,
    read_v0,
    read_v1,
    read_v2,
    write_tokenizer_bin,
    write_v0,
    write_v1,
    write_v2,
)
from hip_llama_tpu.io.checkpoint import quantize_q80


@pytest.mark.parametrize("shared", [True, False])
def test_v0_roundtrip(tmp_path, shared):
    cfg = tiny_config(shared_classifier=shared)
    w = random_weights(cfg, seed=1)
    path = str(tmp_path / "m.bin")
    write_v0(path, cfg, w)
    cfg2, w2 = read_v0(path)
    assert cfg2 == cfg
    for name in ("tok_emb", "rms_att", "wq", "wk", "wv", "wo", "w1", "w2", "w3", "rms_final", "wcls"):
        np.testing.assert_array_equal(getattr(w2, name), getattr(w, name), err_msg=name)


@pytest.mark.parametrize("shared", [True, False])
def test_v1_roundtrip(tmp_path, shared):
    cfg = tiny_config(shared_classifier=shared)
    w = random_weights(cfg, seed=2)
    path = str(tmp_path / "m1.bin")
    write_v1(path, cfg, w)
    cfg2, w2 = read_v1(path)
    assert cfg2.dim == cfg.dim and cfg2.shared_classifier == shared
    for name in ("tok_emb", "wq", "wk", "wv", "wo", "w1", "w2", "w3", "wcls"):
        np.testing.assert_array_equal(getattr(w2, name), getattr(w, name), err_msg=name)


def test_v2_roundtrip(tmp_path):
    cfg = tiny_config()
    w = random_weights(cfg, seed=3)
    path = str(tmp_path / "m2.bin")
    maxerr = write_v2(path, cfg, w, group_size=32)
    assert maxerr < 0.05
    cfg2, qw = read_v2(path)
    gs = cfg2.group_size
    assert gs == 32
    # dequantized values match an independent quantize-dequant cycle
    q, s, _ = quantize_q80(w.wq[0], gs)
    np.testing.assert_array_equal(qw.wq[0].q, q)
    np.testing.assert_allclose(qw.wq[0].dequantize(gs), q.astype(np.float32).reshape(-1, gs).__mul__(s[:, None]).reshape(q.shape), rtol=0, atol=0)
    # norms are exact fp32
    np.testing.assert_array_equal(qw.rms_att, w.rms_att)
    np.testing.assert_array_equal(qw.rms_final, w.rms_final)


def test_load_checkpoint_dispatch(tmp_path):
    cfg = tiny_config()
    w = random_weights(cfg, seed=4)
    p0, p1, p2 = (str(tmp_path / f"m{i}.bin") for i in range(3))
    write_v0(p0, cfg, w)
    write_v1(p1, cfg, w)
    write_v2(p2, cfg, w)
    for p in (p0, p1):
        c, _ = load_checkpoint(p)
        assert c.vocab_size == cfg.vocab_size
    c2, qw = load_checkpoint(p2)
    assert c2.group_size is not None


def test_quantize_q80_matches_reference_semantics():
    # float = q * s, scale = absmax/127 per group (runq.c:145-171)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    q, s, err = quantize_q80(x, 32)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    deq = q.astype(np.float32).reshape(-1, 32) * s[:, None]
    assert np.abs(deq.reshape(x.shape) - x).max() == pytest.approx(err)
    assert err < np.abs(x).max() / 127 * 0.51


def test_tokenizer_bin_roundtrip(tmp_path):
    vocab = [b"<unk>", b"<s>", b"</s>", b" he", b"llo", "é".encode()]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0, -3.0]
    p = str(tmp_path / "tok.bin")
    write_tokenizer_bin(p, vocab, scores)
    max_len, v2, s2 = read_tokenizer_bin(p, len(vocab))
    assert max_len == 5  # len(b"<unk>")
    assert v2 == vocab
    assert s2 == pytest.approx(scores)
