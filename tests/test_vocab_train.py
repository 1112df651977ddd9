"""Vocab training (pure-Python BPE) -> tokenizer.bin round-trip through the
engine tokenizer — parity with the reference's custom-vocab pipeline
(train/tinystories.py:71 train_vocab, train/tokenizer.py:62-70 export,
consumed by src/llama.cpp:52-76)."""

import pytest

from hip_llama_tpu.tokenizer import Tokenizer, BOS_ID
from hip_llama_tpu.train.vocab import train_vocab, train_vocab_file

CORPUS = [
    "the little fox ran through the forest",
    "the brave girl walked through the town",
    "a little robot dreamed of the stars",
    "the fox and the robot were friends",
    "once upon a time the forest was quiet",
    "the girl and the fox ran home",
] * 8


def _tok(vocab_size=300):
    vocab, scores = train_vocab(CORPUS, vocab_size)
    return Tokenizer(vocab, scores)


def test_trained_vocab_roundtrip():
    tok = _tok()
    text = "the little fox ran home"
    ids = tok.encode(text, bos=True, eos=False)
    assert ids[0] == BOS_ID
    # decode_piece chain reconstructs the text (the dummy-prefix space is
    # stripped after BOS, llama.cpp:85-90)
    out = bytearray()
    for prev, cur in zip(ids, ids[1:]):
        out += tok.decode_piece(prev, cur)
    assert out.decode() == text


def test_trained_vocab_compresses():
    tok = _tok()
    text = "the little fox ran through the forest"
    ids = tok.encode(text, bos=False, eos=False)
    # merges must actually fire: far fewer tokens than codepoints
    assert len(ids) < len(text) * 0.6


def test_byte_fallback_for_unseen_chars():
    tok = _tok()
    ids = tok.encode("féx", bos=False, eos=False)  # é not in corpus
    # é = 0xC3 0xA9 -> byte tokens 3 + 0xC3, 3 + 0xA9
    assert 3 + 0xC3 in ids and 3 + 0xA9 in ids
    out = bytearray()
    full = [BOS_ID] + ids
    for prev, cur in zip(full, full[1:]):
        out += tok.decode_piece(prev, cur)
    assert out.decode() == "féx"


def test_train_vocab_file_and_engine_load(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text(str(len(CORPUS)) + "\n" + "\n".join(CORPUS))
    out = tmp_path / "tok.bin"
    n = train_vocab_file([str(corpus)], 300, str(out))
    assert n == len(CORPUS)
    tok = Tokenizer.from_file(str(out), 300)
    ids = tok.encode("the fox ran", bos=True)
    assert len(ids) > 1
    out_b = bytearray()
    for prev, cur in zip(ids, ids[1:]):
        out_b += tok.decode_piece(prev, cur)
    assert out_b.decode() == "the fox ran"


def test_train_vocab_file_numeric_first_line_kept(tmp_path):
    # a plain-text corpus whose first document happens to be a number must
    # NOT be treated as a count header (auto mode verifies the line count)
    corpus = tmp_path / "c.txt"
    corpus.write_text("42\n" + "\n".join(CORPUS))
    n = train_vocab_file([str(corpus)], 300, str(tmp_path / "t.bin"))
    assert n == len(CORPUS) + 1

    # explicit header=True drops it regardless
    n = train_vocab_file([str(corpus)], 300, str(tmp_path / "t2.bin"),
                         header=True)
    assert n == len(CORPUS)

    # a real count header is auto-detected
    corpus2 = tmp_path / "c2.txt"
    corpus2.write_text(f"{len(CORPUS)}\n" + "\n".join(CORPUS))
    n = train_vocab_file([str(corpus2)], 300, str(tmp_path / "t3.bin"))
    assert n == len(CORPUS)


def test_vocab_size_exact_and_layout():
    vocab, scores = train_vocab(CORPUS, 280)
    assert len(vocab) == len(scores) == 280
    assert vocab[0] == b"<unk>" and vocab[1] == b"<s>" and vocab[2] == b"</s>"
    assert vocab[3] == b"<0x00>" and vocab[258] == b"<0xFF>"
    with pytest.raises(ValueError):
        train_vocab(CORPUS, 259)


def test_reference_engine_reads_trained_vocab(tmp_path):
    """The compiled reference engine tokenizes with our trained vocab — the
    file format is drop-in (llama.cpp:52-76 parser)."""
    import os
    import subprocess

    REF = "/root/reference/run.cc"
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    vocab, scores = train_vocab(CORPUS, 300)
    from hip_llama_tpu.io.tokenizer_io import write_tokenizer_bin

    tok_path = tmp_path / "tok.bin"
    write_tokenizer_bin(str(tok_path), vocab, scores)
    ref_bin = tmp_path / "ref_run"
    try:
        subprocess.run(
            ["g++", "-O2", "-fopenmp", "-o", str(ref_bin), REF, "-lm"],
            check=True, capture_output=True, timeout=180,
        )
    except Exception:
        pytest.skip("cannot compile reference engine")
    # tiny model with matching vocab; greedy output must be byte-identical
    # between the reference engine and ours under the trained vocab
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights, write_v0

    cfg = ModelConfig(dim=64, hidden_dim=172, n_layers=2, n_heads=8,
                      n_kv_heads=4, vocab_size=300, seq_len=64)
    ckpt = tmp_path / "m.bin"
    write_v0(str(ckpt), cfg, random_weights(cfg, seed=4))
    ref_out = subprocess.run(
        [str(ref_bin), str(ckpt), "-z", str(tok_path), "-t", "0.0",
         "-n", "12", "-i", "the fox"],
        capture_output=True, text=True, timeout=120,
    ).stdout
    ref_line = [l for l in ref_out.splitlines() if l.strip()][-1]

    import io
    from contextlib import redirect_stdout

    import run as runmod

    buf = io.StringIO()
    with redirect_stdout(buf):
        runmod.main(["run.py", str(ckpt), "-z", str(tok_path), "-t", "0.0",
                     "-n", "12", "-i", "the fox", "--dtype", "float32"])
    ours = [
        l for l in buf.getvalue().splitlines()
        if l.strip() and not l.startswith(("-", "dim", "hidden", "n_", "vocab",
                                           "seq_len", "total", "achieved"))
    ][-1]
    assert ours == ref_line
