"""CPU numpy oracle: float32 Llama-2 forward with the reference's exact
conventions (transcription of semantics, not code, of src/seq.cpp:53-183).

Used as the golden model for every JAX/Pallas path, mirroring how the
reference validates GPU kernels against its scalar CPU engine
(scripts/test/thaDNN.test.cpp:485-552).

Conventions that matter:
- rmsnorm eps = 1e-5 added to mean-of-squares (seq.cpp:3-16)
- RoPE: consecutive (even, odd) pairs within each head, angle
  pos / 10000^(head_dim/head_size) with head_dim = i % head_size
  (seq.cpp:86-100); q rotates all heads, k rotates kv heads only
- GQA via kv_mul = n_heads / n_kv_heads (seq.cpp:61)
- attention scale 1/sqrt(head_size), softmax over positions 0..pos
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import LlamaWeights

F32 = np.float32


def rmsnorm(x: np.ndarray, weight: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    ss = F32(np.mean(x.astype(F32) ** 2) + eps)
    return (weight * (x / np.sqrt(ss))).astype(F32)


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(), dtype=F32)
    return e / e.sum(dtype=F32)


def rope_rotate(vec: np.ndarray, pos: int, head_size: int,
                theta: float = 10000.0) -> np.ndarray:
    """Rotate consecutive pairs; vec is flat (n_heads*head_size,)."""
    v = vec.reshape(-1, head_size // 2, 2).astype(F32)
    j = np.arange(head_size // 2, dtype=F32)
    freq = 1.0 / np.power(F32(theta), (2 * j) / F32(head_size))
    ang = F32(pos) * freq
    cos, sin = np.cos(ang, dtype=F32), np.sin(ang, dtype=F32)
    v0, v1 = v[..., 0], v[..., 1]
    out = np.stack([v0 * cos - v1 * sin, v0 * sin + v1 * cos], axis=-1)
    return out.reshape(vec.shape).astype(F32)


@dataclasses.dataclass
class RefState:
    """KV cache + scratch (mirrors RunState, include/models.hpp:41-58)."""

    key_cache: np.ndarray  # (L, S, kv_dim)
    value_cache: np.ndarray  # (L, S, kv_dim)

    @classmethod
    def create(cls, cfg: ModelConfig) -> "RefState":
        shape = (cfg.n_layers, cfg.seq_len, cfg.kv_dim)
        return cls(np.zeros(shape, F32), np.zeros(shape, F32))


def forward(
    cfg: ModelConfig, w: LlamaWeights, state: RefState, token: int, pos: int
) -> np.ndarray:
    """One decode step; returns logits (vocab_size,) float32."""
    c = cfg
    hs = c.head_size
    x = w.tok_emb[token].astype(F32).copy()

    for l in range(c.n_layers):
        xb = rmsnorm(x, w.rms_att[l])

        q = (w.wq[l] @ xb).astype(F32)
        k = (w.wk[l] @ xb).astype(F32)
        v = (w.wv[l] @ xb).astype(F32)

        q = rope_rotate(q, pos, hs, c.rope_theta)
        k = rope_rotate(k, pos, hs, c.rope_theta)
        state.key_cache[l, pos] = k
        state.value_cache[l, pos] = v

        # attention over positions 0..pos
        keys = state.key_cache[l, : pos + 1].reshape(pos + 1, c.n_kv_heads, hs)
        vals = state.value_cache[l, : pos + 1].reshape(pos + 1, c.n_kv_heads, hs)
        qh = q.reshape(c.n_heads, hs)
        out = np.empty_like(qh)
        for h in range(c.n_heads):
            kvh = h // c.kv_mul
            scores = (keys[:, kvh] @ qh[h]) / np.sqrt(F32(hs))
            att = softmax(scores.astype(F32))
            out[h] = att @ vals[:, kvh]
        xb = out.reshape(-1)

        x = x + (w.wo[l] @ xb).astype(F32)

        xb = rmsnorm(x, w.rms_ffn[l])
        h1 = (w.w1[l] @ xb).astype(F32)
        h3 = (w.w3[l] @ xb).astype(F32)
        h1 = h1 * (1.0 / (1.0 + np.exp(-h1, dtype=F32))) * h3
        x = x + (w.w2[l] @ h1).astype(F32)

    x = rmsnorm(x, w.rms_final)
    return (w.wcls @ x).astype(F32)


def generate_greedy(
    cfg: ModelConfig, w: LlamaWeights, prompt_tokens: list[int], n_steps: int
) -> list[int]:
    """Greedy decode for golden-text fixtures (generate loop semantics of
    src/llama.cpp:522-579: forced prompt tokens, then argmax; stop on BOS=1)."""
    state = RefState.create(cfg)
    out: list[int] = []
    token = prompt_tokens[0]
    pos = 0
    while pos < n_steps:
        logits = forward(cfg, w, state, token, pos)
        if pos < len(prompt_tokens) - 1:
            nxt = prompt_tokens[pos + 1]
        else:
            nxt = int(np.argmax(logits))
        pos += 1
        if nxt == 1:
            break
        out.append(nxt)
        token = nxt
    return out
