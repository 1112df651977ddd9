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

import functools
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


def _lookup_propose(history: list[int], k: int, max_ngram: int = 3) -> list[int]:
    """Prompt-lookup proposal (draft-free speculation): find the most recent
    earlier occurrence of the trailing n-gram and propose the k tokens that
    followed it. Strong on extractive/repetitive continuations; proposes
    nothing when no n-gram repeats (the caller then takes a plain step)."""
    ln = len(history)
    for n in range(min(max_ngram, ln - 1), 0, -1):
        key = history[ln - n:]
        for i in range(ln - n - 1, -1, -1):
            if history[i:i + n] == key:
                cont = history[i + n:i + n + k]
                if cont:
                    return cont
        if n == 1:
            break
    return []


def speculative_generate(
    target: InferenceEngine,
    draft: InferenceEngine | None,
    prompt: str | None,
    steps: int | None = None,
    k: int = 4,
    echo: bool = False,
) -> tuple[GenerationResult, SpecStats]:
    """Greedy generation from `target`, accelerated by draft-model proposals
    (draft=engine) or prompt-lookup proposals (draft=None).

    A draft engine must share the tokenizer/vocab; k is the lookahead.
    """
    if target.paged or (draft is not None and draft.paged):
        raise ValueError("speculative decoding over paged caches not supported")
    cfg = target.cfg
    steps = min(steps or target.max_seq_len, target.max_seq_len)
    toks = target.tokenizer.encode(prompt or "", bos=True, eos=False)

    from hip_llama_tpu.models.llama import make_chunked_sampling_step, make_prefill

    # single-dispatch helpers: the draft proposes all k tokens in ONE
    # on-device chain, and the verify prefill folds its argmax so the host
    # fetches k+1 int32s — one device round-trip per phase (the per-token
    # dispatch latency is exactly what speculation is trying to amortize)
    raw_prefill = make_prefill(
        cfg, attn_impl=target.attn_impl, precision=target.precision
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def verify(params, cache, toks, start, valid):
        logits, cache = raw_prefill(params, cache, toks, start, valid)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    draft_chain = None
    if draft is not None:
        draft_chain = jax.jit(
            make_chunked_sampling_step(
                draft.cfg, k, attn_impl=draft.attn_impl,
                precision=draft.precision, temperature=0.0,
            ),
            donate_argnums=(1,),
        )
        _dkey = jax.random.PRNGKey(0)

    t_cache = target.new_cache(batch=1)
    d_cache = draft.new_cache(batch=1) if draft is not None else None
    t0 = time.perf_counter()
    ttft = None
    stats = SpecStats()
    out_pieces: list[bytes] = []
    token_ids: list[int] = []

    history = list(toks)
    pos = 0
    token = toks[0]
    if len(toks) > 1:
        _, t_cache = target._prefill_tokens(t_cache, 1, {0: toks[:-1]}, {0: 0})
        if draft is not None:
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
        kk = min(k, target.max_seq_len - 1 - pos)
        if draft is not None:
            kk = min(kk, draft.max_seq_len - 1 - pos)
        if kk < 1:
            break

        # 1) propose kk tokens from (token, pos)
        if draft is not None:
            if kk == k:
                # whole greedy draft chain in one dispatch
                d_dev, d_cache = draft_chain(
                    draft.params, d_cache, jnp.array([token]),
                    jnp.array([pos], jnp.int32), _dkey,
                )
                d_toks = [int(x) for x in np.asarray(d_dev[0])]
            else:
                d_toks = []
                d_tok, d_pos = token, pos
                for _ in range(kk):
                    logits, d_cache = draft._do_step(
                        d_cache, jnp.array([d_tok]), jnp.array([d_pos], jnp.int32),
                        b=1,
                    )
                    d_tok = int(jnp.argmax(logits[0]))
                    d_toks.append(d_tok)
                    d_pos += 1
        else:
            d_toks = _lookup_propose(history, kk)
            kk = len(d_toks)
            if kk == 0:
                # no repeating n-gram: take one plain greedy step
                logits, t_cache = target._do_step(
                    t_cache, jnp.array([token]), jnp.array([pos], jnp.int32), b=1
                )
                nxt = int(jnp.argmax(logits[0]))
                pos += 1
                if ttft is None:
                    ttft = time.perf_counter() - t0
                if nxt == BOS_ID:
                    break
                piece = printable_piece(target.tokenizer.decode_piece(token, nxt))
                if echo and piece:
                    print(piece.decode("utf-8", errors="replace"), end="", flush=True)
                out_pieces.append(piece)
                token_ids.append(nxt)
                history.append(nxt)
                token = nxt
                continue

        # 2) target verifies all kk+1 positions in one chunked prefill,
        # padded to the engine's smallest fitting prefill bucket so every
        # round reuses one compiled shape (and the Pallas chunk writers see
        # tile-aligned chunk lengths)
        tb = next(
            (x for x in sorted(target.prefill_buckets) if x >= kk + 1), kk + 1
        )
        chunk = np.zeros((1, tb), np.int32)
        chunk[0, : kk + 1] = [token] + d_toks
        g_dev, t_cache = verify(
            target.params,
            t_cache,
            jnp.asarray(chunk),
            jnp.asarray([pos], jnp.int32),
            jnp.asarray([kk + 1], jnp.int32),
        )
        g = np.asarray(g_dev[0, : kk + 1])  # target greedy per position

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
            history.append(nxt)
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
