"""Tokenizer vocabulary training: a pure-Python byte-fallback BPE trainer
producing `tokenizer.bin` files the engine (and the reference's C engines)
load directly.

Parity with the reference's vocab-training path — `train/tinystories.py:71`
`train_vocab` (sentencepiece BPE) exported by `train/tokenizer.py:62-70` —
without the sentencepiece dependency (not in this image): the trained model
IS the exported artifact.

Vocab layout (the llama2.c convention the engine's encode/decode assume,
src/llama.cpp:34-256):
  0            <unk>
  1, 2         <s>, </s>            (BOS/EOS; never produced by encode)
  3..258       "<0x00>".."<0xFF>"   byte-fallback tokens
  259..        single codepoints seen in the corpus, then merged pieces

Scores drive the greedy merge loop at encode time (llama.cpp:136-256 picks
the mergeable pair whose concatenation has the highest score), so merges
learned earlier get strictly higher scores — the same contract sentencepiece
BPE models satisfy. Word-internal merges only (sentencepiece's default
split_by_whitespace=true); words carry their leading space (the exported SP
pieces replace the meta symbol U+2581 with ' ', train/tokenizer.py:66).
"""

from __future__ import annotations

import collections
from typing import Iterable

from hip_llama_tpu.io.tokenizer_io import write_tokenizer_bin

_N_SPECIAL = 3  # <unk>, <s>, </s>
_N_BYTES = 256


def _words(texts: Iterable[str]) -> collections.Counter:
    """Space-prefixed word counts (the add_dummy_prefix convention: encode
    prepends a ' ' piece, so every word's surface form starts with one)."""
    counts: collections.Counter = collections.Counter()
    for text in texts:
        for w in text.split():
            counts[" " + w] += 1
    return counts


def train_vocab(
    texts: Iterable[str], vocab_size: int,
) -> tuple[list[bytes], list[float]]:
    """BPE over the corpus -> (pieces, scores) in tokenizer.bin order.

    `vocab_size` is the TOTAL size including specials and byte tokens
    (minimum 259 + 1); the checkpoint's config.vocab_size must equal it.
    """
    base = _N_SPECIAL + _N_BYTES
    if vocab_size <= base:
        raise ValueError(f"vocab_size must exceed {base}, got {vocab_size}")

    word_counts = _words(texts)
    # symbol sequences per distinct word: tuples of single-codepoint strings
    seqs: dict[tuple[str, ...], int] = {
        tuple(w): n for w, n in word_counts.items()
    }

    # single codepoints by frequency (ties: lexicographic, deterministic)
    char_counts: collections.Counter = collections.Counter()
    for w, n in word_counts.items():
        for ch in w:
            char_counts[ch] += n
    chars = sorted(char_counts, key=lambda c: (-char_counts[c], c))
    budget = vocab_size - base
    chars = chars[:budget]
    char_set = set(chars)
    pieces: list[str] = list(chars)

    n_merges = budget - len(chars)
    merges: list[str] = []
    for _ in range(n_merges):
        pair_counts: collections.Counter = collections.Counter()
        for seq, n in seqs.items():
            for a, b in zip(seq, seq[1:]):
                # only merge symbols representable in the vocab (rare chars
                # that fell off the char budget byte-fallback at encode time
                # and must not appear inside learned pieces)
                if (a in char_set or len(a) > 1) and (b in char_set or len(b) > 1):
                    pair_counts[(a, b)] += n
        if not pair_counts:
            break
        (a, b), best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:  # singleton merges only memorize the corpus
            break
        merged = a + b
        merges.append(merged)
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, n in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + n
        seqs = new_seqs

    vocab: list[bytes] = [b"<unk>", b"<s>", b"</s>"]
    scores: list[float] = [0.0, 0.0, 0.0]
    for i in range(_N_BYTES):
        vocab.append(f"<0x{i:02X}>".encode())
        scores.append(-1e9)
    for ch in chars:
        vocab.append(ch.encode("utf-8"))
        scores.append(-1e6)
    for rank, piece in enumerate(merges):
        vocab.append(piece.encode("utf-8"))
        scores.append(-float(rank + 1))
    # pad to the exact size with never-matching pieces (a short corpus can
    # run out of mergeable pairs before the budget)
    pad = 0
    while len(vocab) < vocab_size:
        vocab.append(f"<pad{pad}>".encode())
        scores.append(-1e9)
        pad += 1
    assert len(vocab) == vocab_size
    return vocab, scores


def train_vocab_file(
    corpus_paths: list[str], vocab_size: int, out_path: str,
    header: bool | None = None,
) -> int:
    """Train on text files (one document per line) and write tokenizer.bin.
    Returns the number of corpus lines consumed.

    header: True  -> every file starts with a count line (eval-corpus format);
            False -> plain text, first line is data even if it is a number;
            None  -> auto: treat an all-digit first line as a count header
            only if it actually equals the number of remaining lines (so a
            plain-text corpus whose first document happens to be a number is
            not silently dropped)."""

    def file_lines(p):
        nonlocal consumed
        with open(p, encoding="utf-8") as f:
            rows = f.read().splitlines()
        skip = False
        if rows and rows[0].strip().isdigit():
            if header is True:
                skip = True
            elif header is None:
                skip = int(rows[0].strip()) == len(rows) - 1
        if skip:
            rows = rows[1:]
        consumed += len(rows)
        return rows

    def lines():
        for p in corpus_paths:
            yield from file_lines(p)

    consumed = 0
    vocab, scores = train_vocab(lines(), vocab_size)
    write_tokenizer_bin(out_path, vocab, scores)
    return consumed


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Train a byte-fallback BPE vocab -> tokenizer.bin "
        "(reference parity: train/tinystories.py train_vocab + "
        "train/tokenizer.py export)"
    )
    ap.add_argument("corpus", nargs="+", help="text files, one doc per line")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=512)
    args = ap.parse_args(argv)
    n = train_vocab_file(args.corpus, args.vocab_size, args.out)
    print(f"trained vocab_size={args.vocab_size} on {n} lines -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
