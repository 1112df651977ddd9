"""Speculative decoding: a small draft model proposes k tokens, the
target model verifies them in ONE chunked-prefill call, and the longest
accepted prefix (plus a correction/bonus token) commits.

BEYOND the reference (it decodes strictly one token per forward,
llama.cpp:540-552): at batch=1 the decode step is HBM-bound on the weight
stream, so verifying k+1 positions costs barely more than one step —
accepted drafts multiply single-sequence tokens/s by the acceptance length.

Two verification rules, keyed on temperature:

* temperature == 0 (greedy): accept the longest prefix where the draft
  matches the target argmax. Output is EXACTLY the target model's greedy
  stream, so correctness is testable as byte-equality against
  InferenceEngine.generate at temperature 0 — see tests/test_speculative.py.
* temperature > 0 (stochastic): rejection sampling — accept draft token x_i
  with probability min(1, p_i(x_i)/q_i(x_i)) where p/q are the target/draft
  warped (temperature + top-p) distributions; on the first rejection sample
  the replacement from norm(max(p_i - q_i, 0)); if all k accepted, sample a
  bonus token from p_k. The committed stream is distributed EXACTLY as
  target-only ancestral sampling (speculative-decoding correctness
  theorem), at any temperature. Prompt-lookup proposals are the q = point
  mass special case: accept with probability p_i(x_i).

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
from hip_llama_tpu.sampler import XorShift64Star, sample_mult, softmax_f32
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


def _warp(logits: np.ndarray, temperature: float, topp: float) -> np.ndarray:
    """The warped sampling distribution, mirroring the on-device sampler
    (models/llama.py make_logit_sampler) bit-for-bit in fp32: softmax at
    `temperature`, restricted to the top-p nucleus (smallest sorted-prob
    prefix whose mass exceeds topp), renormalized."""
    probs = softmax_f32(np.asarray(logits, np.float32) / np.float32(temperature))
    if 0.0 < topp < 1.0:
        sp = -np.sort(-probs)
        csum = np.cumsum(sp, dtype=np.float32)
        keep = csum - sp < np.float32(topp)  # first element always kept
        thresh = sp[keep].min()
        probs = np.where(probs >= thresh, probs, np.float32(0.0))
    return probs / probs.sum(dtype=np.float32)


def _verify_round(
    ps: list[np.ndarray],
    qs: list[np.ndarray] | None,
    d_toks: list[int],
    rng: XorShift64Star,
) -> tuple[list[int], int]:
    """Rejection-sampling verification (the speculative-decoding acceptance
    rule): ps = k+1 target warped distributions, qs = k draft warped
    distributions (None = point-mass proposals, e.g. prompt lookup), d_toks
    = k draft tokens. Returns (committed tokens, n_accepted); the committed
    stream is distributed exactly as sampling from ps ancestrally."""
    k = len(d_toks)
    commits: list[int] = []
    for i in range(k):
        x = d_toks[i]
        p = ps[i]
        px = float(p[x])
        qx = 1.0 if qs is None else float(qs[i][x])
        if qx <= 0.0:
            # host fp32 nucleus disagrees with the device sampler at the
            # boundary (true q is tiny but nonzero): min(1, px/q_true) is
            # ~1 whenever px > 0, and 0 when px == 0 — decide without a
            # coin so the stream stays deterministic per seed
            accept = px > 0.0
        else:
            accept = rng.next_f32() < min(1.0, px / qx)
        if accept:
            commits.append(x)
            continue
        # rejected: replacement from the residual norm(max(p - q, 0))
        if qs is None:
            resid = p.copy()
            resid[x] = 0.0
        else:
            resid = np.maximum(p - qs[i], np.float32(0.0))
        s = resid.sum(dtype=np.float32)
        if s <= 0.0:
            # p <= q everywhere up to rounding (p == q): x was fine
            commits.append(x)
            continue
        commits.append(sample_mult(resid / s, rng.next_f32()))
        return commits, i
    # every draft accepted: bonus token from the target's k-th distribution
    commits.append(sample_mult(ps[k], rng.next_f32()))
    return commits, k


def speculative_generate(
    target: InferenceEngine,
    draft: InferenceEngine | None,
    prompt: str | None,
    steps: int | None = None,
    k: int = 4,
    echo: bool = False,
    temperature: float = 0.0,
    topp: float = 0.9,
    seed: int = 314028,
) -> tuple[GenerationResult, SpecStats]:
    """Generation from `target`, accelerated by draft-model proposals
    (draft=engine) or prompt-lookup proposals (draft=None).

    A draft engine must share the tokenizer/vocab; k is the lookahead.
    temperature == 0 gives the target's exact greedy stream; temperature > 0
    samples from the target's exact warped distribution via rejection
    sampling (module docstring), with host xorshift64* coins from `seed`.
    """
    if target.paged or (draft is not None and draft.paged):
        raise ValueError("speculative decoding over paged caches not supported")
    cfg = target.cfg
    stochastic = temperature > 0.0
    rng = XorShift64Star(seed)
    steps = min(steps or target.max_seq_len, target.max_seq_len)
    toks = target.tokenizer.encode(prompt or "", bos=True, eos=False)
    if len(toks) > steps:  # step budget bounds prompt consumption
        toks = toks[:steps]

    from hip_llama_tpu.models.llama import make_chunked_sampling_step, make_prefill

    # single-dispatch helpers: the draft proposes all k tokens in ONE
    # on-device chain, and the verify prefill folds its argmax (greedy) so
    # the host fetches k+1 int32s — one device round-trip per phase (the
    # per-token dispatch latency is exactly what speculation amortizes).
    # Stochastic verification instead fetches the k+1 logit rows (the host
    # needs the full target distribution for acceptance + residuals).
    raw_prefill = make_prefill(
        cfg, attn_impl=target.attn_impl, precision=target.precision
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def verify(params, cache, toks, start, valid):
        logits, cache = raw_prefill(params, cache, toks, start, valid)
        if stochastic:
            return logits, cache
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    draft_chain = None
    if draft is not None:
        draft_chain = jax.jit(
            make_chunked_sampling_step(
                draft.cfg, k, attn_impl=draft.attn_impl,
                precision=draft.precision, temperature=temperature,
                topp=topp, return_logits=stochastic,
            ),
            donate_argnums=(1,),
        )
        _dkey = jax.random.PRNGKey(seed)

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
            # truncated to the DRAFT's window: clamp-writes past it would
            # scribble on its last cache row (proposals just stop once pos
            # reaches the draft window — see use_draft below)
            _, d_cache = draft._prefill_tokens(
                d_cache, 1, {0: toks[:-1][:draft.max_seq_len - 1]}, {0: 0}
            )
        pos = len(toks) - 1
        token = toks[-1]
        for a, nxt in zip(toks, toks[1:]):
            piece = printable_piece(target.tokenizer.decode_piece(a, nxt))
            if echo and piece:
                print(piece.decode("utf-8", errors="replace"), end="", flush=True)
            out_pieces.append(piece)

    done = False
    while pos < steps and not done:
        # the verify chunk writes rows pos..pos+kk, which must fit the
        # target cache; shrink the lookahead near the end of the window
        kk = min(k, target.max_seq_len - 1 - pos)
        if kk < 1:
            break
        # a draft whose window is exhausted falls back to prompt-lookup
        # proposals (the target can keep generating; breaking here silently
        # capped generation at the DRAFT's seq_len)
        use_draft = draft is not None and pos + 1 < draft.max_seq_len
        if use_draft:
            kk = min(kk, draft.max_seq_len - 1 - pos)

        # 1) propose kk tokens from (token, pos); stochastic mode also
        # collects qs = the draft's warped distribution at each position
        qs: list[np.ndarray] | None = None
        if use_draft:
            if kk == k:
                # whole draft chain in one dispatch (fresh key per round —
                # the chain folds in the step index, we fold in pos)
                if stochastic:
                    d_dev, dl_dev, d_cache = draft_chain(
                        draft.params, d_cache, jnp.array([token]),
                        jnp.array([pos], jnp.int32),
                        jax.random.fold_in(_dkey, pos),
                    )
                    qs = [
                        _warp(row, temperature, topp)
                        for row in np.asarray(dl_dev[0])
                    ]
                else:
                    d_dev, d_cache = draft_chain(
                        draft.params, d_cache, jnp.array([token]),
                        jnp.array([pos], jnp.int32), _dkey,
                    )
                d_toks = [int(x) for x in np.asarray(d_dev[0])]
            else:
                d_toks = []
                qs = [] if stochastic else None
                d_tok, d_pos = token, pos
                for _ in range(kk):
                    logits, d_cache = draft._do_step(
                        d_cache, jnp.array([d_tok]), jnp.array([d_pos], jnp.int32),
                        b=1,
                    )
                    if stochastic:
                        q = _warp(np.asarray(logits[0]), temperature, topp)
                        d_tok = sample_mult(q, rng.next_f32())
                        qs.append(q)
                    else:
                        d_tok = int(jnp.argmax(logits[0]))
                    d_toks.append(d_tok)
                    d_pos += 1
        else:
            d_toks = _lookup_propose(history, kk)
            kk = len(d_toks)
            if kk == 0:
                # no repeating n-gram: take one plain (greedy or sampled) step
                logits, t_cache = target._do_step(
                    t_cache, jnp.array([token]), jnp.array([pos], jnp.int32), b=1
                )
                if stochastic:
                    nxt = sample_mult(
                        _warp(np.asarray(logits[0]), temperature, topp),
                        rng.next_f32(),
                    )
                else:
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

        # 3) accept: greedy = longest argmax-matching prefix + correction;
        # stochastic = rejection sampling against the target distributions
        if stochastic:
            ps = [
                _warp(row, temperature, topp)
                for row in np.asarray(g_dev[0, : kk + 1])
            ]
            commits, n_acc = _verify_round(ps, qs, d_toks, rng)
        else:
            g = np.asarray(g_dev[0, : kk + 1])  # target greedy per position
            n_acc = 0
            while n_acc < kk and d_toks[n_acc] == int(g[n_acc]):
                n_acc += 1
            commits = d_toks[:n_acc] + [int(g[n_acc])]
        if use_draft and n_acc == kk:
            # full acceptance: drop the bonus — the draft chain never wrote
            # the KV row for its LAST proposal (it fed tokens 0..kk-2 after
            # the root), so committing past it would leave a permanent hole
            # in the draft cache; the next round re-derives the dropped
            # token with the draft cache intact
            commits = commits[:n_acc]
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
