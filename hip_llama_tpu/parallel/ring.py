"""Ring attention: context-parallel training/prefill over an ("sp",) axis.

KV blocks rotate around the ICI ring via `lax.ppermute` while every device
computes attention for its local query chunk — after sp-1 rotations each
query has seen the full sequence, with communication overlapped against the
per-block matmuls and only O(T/sp) resident KV per device. The online-
softmax accumulators (m, l, o) carry across rotations exactly like the
flash kernels carry them across KV tiles.

Beyond-reference capability (the reference trains data-parallel only,
train/train.py:95, and caps context at the checkpoint seq_len); this is the
standard TPU recipe for sequences that don't fit one chip's activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import rmsnorm, rope
from hip_llama_tpu.models.params import LlamaParams

NEG = -0.7 * float(np.finfo(np.float32).max)


def ring_attention(
    q: jax.Array,  # (B, TL, H, HS) local query chunk (already rope'd)
    k: jax.Array,  # (B, TL, KVH, HS) local key chunk
    v: jax.Array,
    axis_name: str,
    axis_size: int,
    base: jax.Array,  # () int32: global position of local token 0
) -> jax.Array:
    """Causal ring attention; returns (B, TL, H, HS) fp32."""
    b, tl, h, hs = q.shape
    kvh = k.shape[2]
    kv_mul = h // kvh
    scale = 1.0 / (hs ** 0.5)
    idx = lax.axis_index(axis_name)
    qs = q.reshape(b, tl, kvh, kv_mul, hs)
    q_pos = base + lax.broadcasted_iota(jnp.int32, (1, tl, 1, 1, 1), 1)

    m = jnp.full((b, tl, kvh, kv_mul, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, tl, kvh, kv_mul, 1), jnp.float32)
    o = jnp.zeros((b, tl, kvh, kv_mul, hs), jnp.float32)
    kb, vb = k, v
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    for step in range(axis_size):
        src = (idx - step) % axis_size  # which chunk this block came from
        kv_base = src * tl
        s = jnp.einsum(
            "btgmd,bsgd->btgms", qs, kb, preferred_element_type=jnp.float32
        ) * scale  # (B, TL, KVH, M, TL)
        kv_pos = kv_base + lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, tl), 4)
        s = jnp.where(kv_pos <= q_pos, s, NEG)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o = alpha * o + jnp.einsum(
            "btgms,bsgd->btgmd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if step < axis_size - 1:
            kb = lax.ppermute(kb, axis_name, perm)
            vb = lax.ppermute(vb, axis_name, perm)

    out = o / jnp.maximum(l, 1e-30)
    return out.reshape(b, tl, h, hs)


def make_ring_train_forward(cfg: ModelConfig, mesh: Mesh, precision: str = "default"):
    """Context-parallel training forward: tokens (B, T) with T sharded over
    "sp"; weights replicated; returns logits (B, T, V) (T sharded)."""
    c = cfg
    sp = mesh.shape["sp"]

    def spmd(params: LlamaParams, tokens_local):
        b, tl = tokens_local.shape
        sid = lax.axis_index("sp")
        base = sid * tl
        pos = base + jnp.broadcast_to(jnp.arange(tl, dtype=jnp.int32), (b, tl))
        x = params.tok_emb[tokens_local]

        xs = (
            params.rms_att, params.wq, params.wk, params.wv, params.wo,
            params.rms_ffn, params.w1, params.w2, params.w3,
        )

        def layer(carry, wl):
            x = carry
            rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = wl
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = (xb @ wq).reshape(b, tl, c.n_heads, c.head_size)
            k = (xb @ wk).reshape(b, tl, c.n_kv_heads, c.head_size)
            v = (xb @ wv).reshape(b, tl, c.n_kv_heads, c.head_size)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)
            att = ring_attention(q, k, v, "sp", sp, base).reshape(
                b, tl, c.dim
            ).astype(x.dtype)
            x = x + att @ wo
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(xb @ w1) * (xb @ w3)
            return x + h @ w2, None

        x, _ = lax.scan(layer, x, xs)
        x = rmsnorm(x, params.rms_final, c.norm_eps)
        return (x @ params.wcls).astype(jnp.float32)

    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), LlamaParams(*([0] * 12))),
                  P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    )

    def forward(params, tokens):
        with jax.default_matmul_precision(precision):
            return f(params, tokens)

    return forward
