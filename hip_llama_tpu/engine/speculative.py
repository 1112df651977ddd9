"""Greedy speculative decoding: a small draft model proposes k tokens, the
target model verifies them in ONE chunked-prefill call, and the longest
matching prefix (plus the target's correction token) commits.

BEYOND the reference (it decodes strictly one token per forward,
llama.cpp:540-552): at batch=1 the decode step is HBM-bound on the weight
stream, so verifying k+1 positions costs barely more than one step —
accepted drafts multiply single-sequence tokens/s by the acceptance length.

Output is EXACTLY the target model's greedy stream (the acceptance rule
only commits tokens the target itself would have picked), so correctness
is testable as byte-equality against InferenceEngine.generate at
temperature 0 — see tests/test_speculative.py.

Cache consistency requires no rollback machinery: rows the verify pass
writes for rejected draft positions sit at positions >= the new decode
point, are never read (attention reads strictly below the current
position), and are overwritten by later steps — the same invariant the
engine's continuous batching relies on for retired-slot reuse.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.engine.engine import BOS_ID, GenerationResult, InferenceEngine
from hip_llama_tpu.sampler import Sampler
from hip_llama_tpu.tokenizer import printable_piece


@dataclass
class SpecStats:
    proposed: int = 0
    accepted: int = 0
    rounds: int = 0

    @property
    def acceptance(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0


def speculative_generate(
    target: InferenceEngine,
    draft: InferenceEngine,
    prompt: str | None,
    steps: int | None = None,
    k: int = 4,
    echo: bool = False,
) -> tuple[GenerationResult, SpecStats]:
    """Greedy generation from `target`, accelerated by `draft` proposals.

    Both engines must share the tokenizer/vocab; k is the draft lookahead.
    """
    if target.paged or draft.paged:
        raise ValueError("speculative decoding over paged caches not supported")
    cfg = target.cfg
    steps = min(steps or target.max_seq_len, target.max_seq_len)
    toks = target.tokenizer.encode(prompt or "", bos=True, eos=False)

    t_cache = target.new_cache(batch=1)
    d_cache = draft.new_cache(batch=1)
    t0 = time.perf_counter()
    ttft = None
    stats = SpecStats()
    out_pieces: list[bytes] = []
    token_ids: list[int] = []

    pos = 0
    token = toks[0]
    if len(toks) > 1:
        _, t_cache = target._prefill_tokens(t_cache, 1, {0: toks[:-1]}, {0: 0})
        _, d_cache = draft._prefill_tokens(d_cache, 1, {0: toks[:-1]}, {0: 0})
        pos = len(toks) - 1
        token = toks[-1]
        for a, nxt in zip(toks, toks[1:]):
            piece = printable_piece(target.tokenizer.decode_piece(a, nxt))
            if echo and piece:
                print(piece.decode("utf-8", errors="replace"), end="", flush=True)
            out_pieces.append(piece)

    done = False
    while pos < steps and not done:
        # the verify chunk writes rows pos..pos+kk, which must fit both
        # caches; shrink the lookahead near the end of the window
        kk = min(k, target.max_seq_len - 1 - pos, draft.max_seq_len - 1 - pos)
        if kk < 1:
            break

        # 1) draft proposes kk greedy tokens from (token, pos)
        d_toks: list[int] = []
        d_tok, d_pos = token, pos
        for _ in range(kk):
            logits, d_cache = draft._do_step(
                d_cache, jnp.array([d_tok]), jnp.array([d_pos], jnp.int32), b=1
            )
            d_tok = int(np.argmax(np.asarray(logits[0])))
            d_toks.append(d_tok)
            d_pos += 1

        # 2) target verifies all kk+1 positions in one chunked prefill
        chunk = np.zeros((1, kk + 1), np.int32)
        chunk[0] = [token] + d_toks
        logits, t_cache = target._do_prefill(
            t_cache,
            jnp.asarray(chunk),
            jnp.asarray([pos], jnp.int32),
            jnp.asarray([kk + 1], jnp.int32),
            b=1,
        )
        g = np.argmax(np.asarray(logits[0, : kk + 1]), axis=-1)  # target greedy

        # 3) accept the matching prefix + the target's correction token
        n_acc = 0
        while n_acc < kk and d_toks[n_acc] == int(g[n_acc]):
            n_acc += 1
        commits = d_toks[:n_acc] + [int(g[n_acc])]
        stats.proposed += kk
        stats.accepted += n_acc
        stats.rounds += 1

        for nxt in commits:
            if pos >= steps:
                break
            pos += 1
            if ttft is None:
                ttft = time.perf_counter() - t0
            if nxt == BOS_ID:  # reference termination (llama.cpp:556-558)
                done = True
                break
            piece = printable_piece(target.tokenizer.decode_piece(token, nxt))
            if echo and piece:
                print(piece.decode("utf-8", errors="replace"), end="", flush=True)
            out_pieces.append(piece)
            token_ids.append(nxt)
            token = nxt

    elapsed = time.perf_counter() - t0
    text = b"".join(out_pieces).decode("utf-8", errors="replace")
    return (
        GenerationResult(
            text=text,
            token_ids=token_ids,
            n_gen_tokens=max(pos - 1, 0),
            elapsed_s=elapsed,
            ttft_s=ttft if ttft is not None else elapsed,
        ),
        stats,
    )
