"""Dataset pipeline: pretokenize text -> uint16 .bin shards -> memmap
batch iterator.

Parity with the reference's TinyStories pipeline (train/tinystories.py):
- pretokenize(): one .bin of uint16 token ids per input text file, BOS
  between documents (tinystories.py:127-173 writes all_tokens as uint16).
- PretokDataset: memmap the shards, yield random (tokens, targets) windows
  (tinystories.py:175-237); targets are tokens shifted left by one.
- The HTTP download step (tinystories.py:41) is NOT reproduced — this
  environment has no egress; point `pretokenize` at any local corpus.
- synthetic_batches(): deterministic structured random stream for tests
  (the role the stories260K fixture plays in test_all.py).
"""

from __future__ import annotations

import os

import numpy as np

from hip_llama_tpu.tokenizer import BOS_ID, Tokenizer


def pretokenize(
    text_files: list[str], tokenizer: Tokenizer, out_dir: str, shard_name: str = "data"
) -> list[str]:
    """Tokenize documents (one per line) into uint16 shards."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, tf in enumerate(text_files):
        all_tokens: list[int] = []
        with open(tf, "r", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                all_tokens.extend(tokenizer.encode(line, bos=True, eos=False))
        arr = np.asarray(all_tokens, dtype=np.uint16)
        p = os.path.join(out_dir, f"{shard_name}{i:02d}.bin")
        arr.tofile(p)
        paths.append(p)
    return paths


class PretokDataset:
    """Memmap shard reader yielding (tokens, targets) windows."""

    def __init__(self, shard_paths: list[str], max_seq_len: int, seed: int = 42):
        self.shards = [np.memmap(p, dtype=np.uint16, mode="r") for p in shard_paths]
        self.max_seq_len = max_seq_len
        self.rng = np.random.default_rng(seed)

    def batches(self, batch_size: int):
        t = self.max_seq_len
        # a (tokens, targets) window needs t+1 tokens: valid offsets are
        # 0..len-t-1 (count len-t). Weight the shard draw by its window
        # count so tokens are sampled uniformly across the corpus (a
        # uniform shard draw oversamples short shards).
        counts = np.array([max(len(s) - t, 0) for s in self.shards], np.float64)
        if counts.sum() == 0:
            raise ValueError("every shard is shorter than max_seq_len + 1")
        shard_p = counts / counts.sum()
        while True:
            toks = np.zeros((batch_size, t), np.int32)
            tgts = np.zeros((batch_size, t), np.int32)
            for i in range(batch_size):
                si = int(self.rng.choice(len(self.shards), p=shard_p))
                shard = self.shards[si]
                off = int(self.rng.integers(len(shard) - t))
                window = np.asarray(shard[off : off + t + 1], np.int32)
                toks[i] = window[:-1]
                tgts[i] = window[1:]
            yield toks, tgts


def synthetic_batches(
    vocab_size: int, batch_size: int, seq_len: int, seed: int = 0, pattern: bool = True
):
    """Deterministic learnable stream: token[i+1] = (token[i]*7+3) % vocab
    with noise-free structure, so a tiny model's loss must drop fast."""
    rng = np.random.default_rng(seed)
    while True:
        start = rng.integers(0, vocab_size, (batch_size, 1))
        toks = np.zeros((batch_size, seq_len + 1), np.int64)
        toks[:, :1] = start
        for j in range(1, seq_len + 1):
            if pattern:
                toks[:, j] = (toks[:, j - 1] * 7 + 3) % vocab_size
            else:
                toks[:, j] = rng.integers(0, vocab_size, batch_size)
        yield toks[:, :-1].astype(np.int32), toks[:, 1:].astype(np.int32)
