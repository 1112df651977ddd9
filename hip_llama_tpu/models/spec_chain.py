"""Dispatch-free speculative decoding: N whole speculative rounds
(proposal -> bucketed verify -> accept/commit) as ONE on-device dispatch.

The round-4 measurement showed the host-driven speculative loop is
strangled by ~3 ms/step of tunneled dispatch (wall multiplier 0.31-0.41x
despite real acceptance) — the same disease `--chunk N` cured for plain
decode. This module moves the whole loop under jit, the way a TPU wants
it: `lax.scan` over rounds, fixed shapes, no host round-trips.

Per round (greedy, b=1 — the latency-critical speculation case):
1. PROPOSE: on-device prompt-lookup — find the most recent occurrence of
   the current bigram in a (H,) history buffer and propose the k tokens
   that followed it (the TPU re-formulation of the engine's host-side
   n-gram lookup, engine/speculative.py). No draft model, no extra
   weight traffic: proposals are free.
2. VERIFY: one chunked prefill of the k+1 candidate rows through the
   target model (models/llama.py make_prefill, full per-position logits).
   This streams the weights ONCE for up to k+1 tokens — the entire
   speculative win on a memory-bound model.
3. ACCEPT/COMMIT: longest matching prefix vs the target's greedy argmax;
   the correction token is emitted from the verify logits. KV rows beyond
   the accepted prefix are stale-but-overwritten by the next round (same
   invariant as the host loop, engine/speculative.py docstring).

Greedy output is BYTE-IDENTICAL to the plain greedy chain by
construction; tests/test_spec_chain.py pins it.

Reference: speculative decoding itself is beyond the reference engine
(no counterpart in tienpm/hip_llama.cpp); the verify-as-prefill follows
the standard Leviathan et al. greedy acceptance rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import make_decode_step, make_prefill


def make_spec_lookup_chain(
    cfg: ModelConfig,
    *,
    k: int = 4,
    n_rounds: int = 32,
    hist_len: int = 512,
    attn_impl: str = "pallas",
    precision: str = "default",
):
    """Returns chain(params, cache, token (,) i32, pos (,) i32, hist (H,)
    i32) -> (out_tokens (n_rounds, k+1) i32, out_counts (n_rounds,) i32,
    cache, next_token, next_pos, hist).

    `hist` carries the recent committed token stream (seed it with the
    prompt tail; pad unknown slots with -7). out_tokens row r holds that
    round's committed tokens left-aligned; out_counts[r] how many are
    valid (n_acc + 1). Positions must satisfy pos + n_rounds*(k+1) <
    cache window. Greedy only (temperature 0)."""
    t_bucket = k + 1 if (k + 1) % 8 == 0 else (k + 1) + (8 - (k + 1) % 8)
    prefill = make_prefill(cfg, attn_impl=attn_impl, precision=precision,
                           last_only=False)
    H = hist_len

    def propose(hist, t_prev2, t_prev1):
        """Last-occurrence bigram lookup: positions j where
        hist[j-1] == t_prev2 and hist[j] == t_prev1; propose
        hist[j+1 : j+1+k]."""
        idx = jnp.arange(H)
        prev = jnp.roll(hist, 1)
        match = (hist == t_prev1) & (prev == t_prev2) & (idx > 0) & (
            idx < H - 1)
        best = jnp.max(jnp.where(match, idx, -1))
        ext = jnp.concatenate([hist, jnp.full((k,), -7, jnp.int32)])
        props = jax.lax.dynamic_slice(
            ext, (jnp.maximum(best + 1, 0),), (k,))
        # no match -> propose -7: never equals a real token, so the round
        # degenerates to one committed (corrected) token — the floor is a
        # plain decode step's cost, never worse
        return jnp.where(best >= 0, props, jnp.full((k,), -7, jnp.int32))

    def _bind(params):
        def body(carry, _):
            cache, token, pos, hist = carry
            props = propose(hist, hist[H - 2], token)
            seq = jnp.concatenate([token[None], jnp.maximum(props, 0)])
            seq_p = jnp.pad(seq, (0, t_bucket - (k + 1)))[None, :]
            logits, cache = prefill(
                params, cache, seq_p,
                jnp.full((1,), pos, jnp.int32),
                jnp.full((1,), k + 1, jnp.int32),
            )
            greedy = jnp.argmax(
                logits[0, : k + 1], axis=-1).astype(jnp.int32)
            ok = props == greedy[:k]
            acc = jnp.cumprod(ok.astype(jnp.int32))
            n_acc = jnp.sum(acc)
            nxt = greedy[n_acc]
            m = n_acc + 1
            i = jnp.arange(k + 1)
            committed = jnp.where(
                i < n_acc, jnp.maximum(props, 0)[jnp.minimum(i, k - 1)],
                jnp.where(i == n_acc, nxt, 0),
            ).astype(jnp.int32)
            shifted = jnp.roll(hist, -m)
            hist2 = shifted.at[H - m + i].set(
                jnp.where(i < m, committed, 0), mode="drop")
            return (cache, nxt, pos + m, hist2), (committed, m)

        return body

    def chain_fn(params, cache, token, pos, hist):
        (cache, nxt, pos, hist), (toks, counts) = jax.lax.scan(
            _bind(params), (cache, token, pos, hist), None, length=n_rounds)
        return toks, counts, cache, nxt, pos, hist

    return chain_fn


def make_plain_chain(cfg: ModelConfig, *, n_steps: int,
                     attn_impl: str = "pallas", precision: str = "default"):
    """Baseline: n_steps greedy decode steps in one dispatch (b=1) —
    the A/B denominator for the speculative multiplier."""
    step = make_decode_step(cfg, attn_impl=attn_impl, precision=precision)

    def chain_fn(params, cache, token, pos):
        def body(carry, _):
            cache, tok, p = carry
            logits, cache = step(
                params, cache, tok[None], jnp.full((1,), p, jnp.int32))
            nt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (cache, nt, p + 1), nt

        (cache, tok, pos), toks = jax.lax.scan(
            body, (cache, token, pos), None, length=n_steps)
        return toks, cache, tok, pos

    return chain_fn
