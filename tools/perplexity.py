#!/usr/bin/env python
"""Perplexity evaluation: score a text corpus under a checkpoint.

The quality gate for the quantized path (BASELINE.md: Q8_0 weight-only must
hold <=0.1 ppl delta vs FP32 — the reference's analogous gate is the
byte-identical greedy corpus diff, scripts/eval/eval_output.py).

Usage: python tools/perplexity.py model.bin -z tokenizer.bin -f corpus.txt
       [--quant q8] [--seq-len 512] [--max-batches N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(cfg, params, tokenizer, text: str, seq_len: int = 512,
               max_batches: int | None = None, batch: int = 4) -> float:
    from hip_llama_tpu.train.model import make_train_forward

    fwd = jax.jit(make_train_forward(cfg, remat=False, precision="default"))
    ids = tokenizer.encode(text, bos=True, eos=False)
    n = (len(ids) - 1) // seq_len * seq_len
    if n == 0:
        raise ValueError("corpus shorter than one window")
    toks = np.asarray(ids[:n], np.int32).reshape(-1, seq_len)
    tgts = np.asarray(ids[1 : n + 1], np.int32).reshape(-1, seq_len)
    total_nll, total_tok = 0.0, 0
    nb = len(toks) if max_batches is None else min(len(toks), max_batches * batch)
    for i in range(0, nb, batch):
        tb = toks[i : i + batch]
        gb = tgts[i : i + batch]
        logits = fwd(params, jnp.asarray(tb))
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.asarray(gb)[..., None], axis=-1)
        total_nll += float(nll.sum())
        total_tok += gb.size
    return float(np.exp(total_nll / total_tok))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("-z", dest="tokenizer", required=True)
    ap.add_argument("-f", dest="corpus", required=True)
    ap.add_argument("--quant", default=None, choices=[None, "q8"])
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--max-batches", type=int, default=None)
    args = ap.parse_args()

    from hip_llama_tpu.io.checkpoint import LlamaWeights, load_checkpoint
    from hip_llama_tpu.models.params import (
        params_from_weights,
        qparams_from_quant_weights,
        quantize_params_q8,
    )
    from hip_llama_tpu.tokenizer import Tokenizer

    cfg, w = load_checkpoint(args.checkpoint)
    if isinstance(w, LlamaWeights):
        params = (
            quantize_params_q8(cfg, w) if args.quant == "q8"
            else params_from_weights(w, dtype=jnp.bfloat16)
        )
    else:
        from hip_llama_tpu.io.checkpoint import Q4Weights

        if isinstance(w, Q4Weights):
            from hip_llama_tpu.models.params import qparams_from_q4_weights

            params = qparams_from_q4_weights(cfg, w)
        else:
            params = qparams_from_quant_weights(cfg, w)
    tok = Tokenizer.from_file(args.tokenizer, cfg.vocab_size)
    with open(args.corpus, errors="replace") as f:
        text = f.read()
    ppl = perplexity(cfg, params, tok, text, args.seq_len, args.max_batches)
    print(f"perplexity: {ppl:.4f}")


if __name__ == "__main__":
    main()
