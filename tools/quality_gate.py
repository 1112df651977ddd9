#!/usr/bin/env python
"""End-to-end quality gate: train a tiny model from scratch, export every
checkpoint format, and measure the perplexity deltas of the quantized paths
against fp32 on held-out text.

This is the measured version of BASELINE.json's quality target (Q8_0
weight-only <= 0.1 ppl delta vs FP32) — the reference's analogous artifacts
are the export-time quant-error print (train/export.py:252-256) and the
byte-identical corpus diff (scripts/eval/eval_output.py).

Pipeline (everything in-repo, no downloads):
  corpus (tools/gen_corpora story generator) -> train_vocab (train/vocab.py)
  -> pretokenize (train/dataset.py) -> Trainer (train/trainer.py)
  -> export v0/v2/v4 (io/checkpoint.py) -> perplexity (tools/perplexity.py)
  + a decode-path perplexity through make_prefill for the int8-KV cache
  (the weight-dequant forward cannot see KV quantization).

Usage: python tools/quality_gate.py [--iters 800] [--out workdir]
Prints a markdown table; exits nonzero if the q8 delta exceeds the gate.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

GATE_Q8 = 0.1  # BASELINE.json: <=0.1 ppl delta for Q8_0


def story_lines(n: int, seed_cat: str = "tinystories"):
    from gen_corpora import prompts_for  # tools/ is on sys.path via __main__

    rng = random.Random(zlib.crc32(seed_cat.encode()) & 0xFFFF)
    gen = prompts_for(seed_cat, rng)
    # extend each prompt into a few-sentence "story" so windows have
    # structure beyond the prompt templates themselves
    tails = [
        "They walked for a long time and the sun was warm.",
        "It was hard at first, but they did not give up.",
        "A friend came along and helped, and they laughed together.",
        "At the end of the day, they found what they were looking for.",
        "Everyone was happy, and they went home to rest.",
    ]
    out = []
    for i in range(n):
        head = next(gen)
        body = " ".join(tails[(i + j) % len(tails)] for j in range(3))
        out.append(f"{head} {body}")
    return out


def perplexity_decode(cfg, params, tok_ids: np.ndarray, seq_len: int,
                      kv_quant: bool, batch: int = 4) -> float:
    """Perplexity through the SERVING path: chunked prefill over a fresh KV
    cache per window (exercises the fused kernels and — with kv_quant — the
    int8 cache with per-row scales, which the dense train-forward cannot)."""
    from hip_llama_tpu.models import init_kv_cache
    from hip_llama_tpu.models.llama import make_prefill

    prefill = jax.jit(make_prefill(cfg, attn_impl="xla", precision="default"),
                      donate_argnums=(1,))
    n = (len(tok_ids) - 1) // seq_len * seq_len
    toks = tok_ids[:n].reshape(-1, seq_len)
    tgts = tok_ids[1 : n + 1].reshape(-1, seq_len)
    total_nll, total_tok = 0.0, 0
    for i in range(0, len(toks), batch):
        tb = np.asarray(toks[i : i + batch], np.int32)
        gb = np.asarray(tgts[i : i + batch], np.int32)
        bsz = len(tb)
        if bsz < batch:  # keep one compiled shape
            pad = batch - bsz
            tb = np.concatenate([tb, np.zeros((pad, seq_len), np.int32)])
            gb = np.concatenate([gb, np.zeros((pad, seq_len), np.int32)])
        cache = init_kv_cache(cfg, batch, dtype=jnp.bfloat16,
                              seq_len=seq_len, quantized=kv_quant)
        logits, cache = prefill(
            params, cache, jnp.asarray(tb),
            jnp.zeros((batch,), jnp.int32), jnp.full((batch,), seq_len, jnp.int32),
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.asarray(gb)[..., None], axis=-1)
        total_nll += float(np.asarray(nll[:bsz]).sum())
        total_tok += bsz * seq_len
    return float(np.exp(total_nll / total_tok))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/quality_gate")
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--vocab-size", type=int, default=512)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-lines", type=int, default=4000)
    ap.add_argument("--eval-lines", type=int, default=400)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.out, exist_ok=True)

    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import (
        load_checkpoint, write_v0, write_v2, write_v4,
    )
    from hip_llama_tpu.models.params import (
        params_from_q4_dequant,
        params_from_quant_dequant,
        params_from_weights,
        qparams_from_quant_weights,
    )
    from hip_llama_tpu.tokenizer import Tokenizer
    from hip_llama_tpu.train.dataset import PretokDataset, pretokenize
    from hip_llama_tpu.train.trainer import TrainConfig, Trainer
    from hip_llama_tpu.train.vocab import train_vocab
    from perplexity import perplexity

    # 1. corpus + vocab
    train_text = story_lines(args.train_lines)
    eval_text = story_lines(args.eval_lines, seed_cat="gen")
    vocab, scores = train_vocab(train_text, args.vocab_size)
    from hip_llama_tpu.io.tokenizer_io import write_tokenizer_bin

    tok_path = os.path.join(args.out, "tokenizer.bin")
    write_tokenizer_bin(tok_path, vocab, scores)
    tok = Tokenizer(vocab, scores)
    print(f"vocab {args.vocab_size} trained on {len(train_text)} lines", flush=True)

    # 2. pretokenize + train
    train_file = os.path.join(args.out, "train.txt")
    with open(train_file, "w") as f:
        f.write("\n".join(train_text))
    shards = pretokenize([train_file], tok, os.path.join(args.out, "shards"))
    cfg = ModelConfig(
        dim=args.dim, hidden_dim=args.hidden, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.heads,
        vocab_size=args.vocab_size, seq_len=args.seq_len,
    )
    ds = PretokDataset(shards, cfg.seq_len)
    tc = TrainConfig(learning_rate=args.lr, warmup_iters=50,
                     max_iters=args.iters, batch_size=args.batch, seed=0)
    trainer = Trainer(cfg, tc)
    it = ds.batches(args.batch)
    for i in range(args.iters):
        toks, tgts = next(it)
        loss = trainer.step(toks, tgts)
        if i % 100 == 0 or i == args.iters - 1:
            print(f"iter {i}: loss {loss:.4f}", flush=True)

    # 3. export every format
    w = trainer.to_weights()
    p_v0 = os.path.join(args.out, "model_v0.bin")
    p_v2 = os.path.join(args.out, "model_v2.bin")
    p_v4 = os.path.join(args.out, "model_v4.bin")
    write_v0(p_v0, cfg, w)
    err2 = write_v2(p_v2, cfg, w, group_size=64)
    err4 = write_v4(p_v4, cfg, w, group_size=32)
    print(f"export quant maxerr: q8 {err2:.5f}, q4 {err4:.5f}", flush=True)

    # 4. perplexities on held-out text (weight-path via the train forward)
    eval_blob = " ".join(eval_text)
    cfg0, w0 = load_checkpoint(p_v0)
    cfg2, w2q = load_checkpoint(p_v2)
    cfg4, w4q = load_checkpoint(p_v4)
    results = {}
    results["fp32 (v0)"] = perplexity(
        cfg0, params_from_weights(w0, dtype=jnp.float32), tok, eval_blob,
        seq_len=cfg.seq_len)
    results["q8 dequant (v2)"] = perplexity(
        cfg2, params_from_quant_dequant(cfg2, w2q, dtype=jnp.float32), tok,
        eval_blob, seq_len=cfg.seq_len)
    results["q8 kernels (v2)"] = perplexity(
        cfg2, qparams_from_quant_weights(cfg2, w2q), tok, eval_blob,
        seq_len=cfg.seq_len)
    results["q4 dequant (v4)"] = perplexity(
        cfg4, params_from_q4_dequant(cfg4, w4q, dtype=jnp.float32), tok,
        eval_blob, seq_len=cfg.seq_len)

    # 5. decode-path ppl: bf16 KV vs int8 KV on the fp32 model
    ids = np.asarray(tok.encode(eval_blob, bos=True, eos=False), np.int32)
    params_bf16 = params_from_weights(w0, dtype=jnp.bfloat16)
    results["decode bf16-KV"] = perplexity_decode(
        cfg0, params_bf16, ids, cfg.seq_len, kv_quant=False)
    results["decode int8-KV"] = perplexity_decode(
        cfg0, params_bf16, ids, cfg.seq_len, kv_quant=True)

    base = results["fp32 (v0)"]
    print("\n| config | perplexity | delta vs fp32 |")
    print("|---|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v:.4f} | {v - base:+.4f} |")

    d_q8 = results["q8 kernels (v2)"] - base
    d_kv = results["decode int8-KV"] - results["decode bf16-KV"]
    print(f"\nq8 delta {d_q8:+.4f} (gate <= {GATE_Q8}); "
          f"int8-KV delta {d_kv:+.4f}", flush=True)
    return 0 if d_q8 <= GATE_Q8 else 1


if __name__ == "__main__":
    sys.exit(main())
