"""Sequence-parallel (context-parallel) decode attention over an ("sp",)
mesh axis.

Beyond-reference capability (the reference's only long-context mechanism is
host KV-swap, thaDNN.cpp:285-290): the KV cache shards along the SEQUENCE
dimension, each device computes partial flash attention over its local KV
shard, and the partials combine with the cross-chip online-softmax trick —
pmax for the global max, psum for the corrected numerators/denominators
(the distributed form of the same m/l algebra the Pallas kernels use
in VMEM). Communication per step is O(heads x head_size), not O(window).

Layout:
- KV cache (B, L, KVH, S, HS) sharded P(None, None, None, "sp", None):
  device i owns positions [i*S/sp, (i+1)*S/sp).
- The current token's K/V row is written only by its owner device (masked
  write); every device keeps full weights (combine with "dp"/"tp" axes for
  bigger meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import KVCache, _write_kv_rows, rmsnorm, rope
from hip_llama_tpu.models.params import LlamaParams


def sp_shardings(cfg: ModelConfig, mesh: Mesh):
    params = jax.tree.map(lambda _: NamedSharding(mesh, P()), _dummy_spec())
    cache = KVCache(
        k=NamedSharding(mesh, P(None, None, None, "sp", None)),
        v=NamedSharding(mesh, P(None, None, None, "sp", None)),
    )
    return params, cache


def _dummy_spec():
    return LlamaParams(*([0] * 12))


def make_sp_decode_step(cfg: ModelConfig, mesh: Mesh, precision: str = "highest"):
    """Returns step(params, cache, tokens (B,), pos (B,)) -> (logits, cache).
    Weights replicated; KV cache sequence-sharded over "sp"."""
    c = cfg
    sp = mesh.shape["sp"]

    def spmd(params: LlamaParams, k_cache, v_cache, tokens, pos):
        # local cache: (B, L, KVH, S/sp, HS)
        sid = lax.axis_index("sp")
        s_local = k_cache.shape[3]
        base = sid * s_local  # global position of local slot 0
        x = params.tok_emb[tokens]
        b = x.shape[0]

        layer_xs = (
            jnp.arange(c.n_layers, dtype=jnp.int32),
            params.rms_att, params.wq, params.wk, params.wv, params.wo,
            params.rms_ffn, params.w1, params.w2, params.w3,
        )

        def layer(carry, xs):
            x = carry
            l, rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = xs
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = (xb @ wq).reshape(b, c.n_heads, c.head_size)
            k = (xb @ wk).reshape(b, c.n_kv_heads, c.head_size)
            v = (xb @ wv).reshape(b, c.n_kv_heads, c.head_size)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)

            # local partial attention over this device's KV shard
            kc = lax.dynamic_index_in_dim(k_cache, l, 1, keepdims=False)
            vc = lax.dynamic_index_in_dim(v_cache, l, 1, keepdims=False)
            kv_mul = c.n_heads // c.n_kv_heads
            qs = q.reshape(b, c.n_kv_heads, kv_mul, c.head_size)
            inv = 1.0 / jnp.sqrt(jnp.float32(c.head_size))
            scores = jnp.einsum(
                "bgmd,bgsd->bgms", qs, kc, preferred_element_type=jnp.float32
            ) * inv
            tloc = lax.broadcasted_iota(jnp.int32, (1, 1, 1, s_local), 3) + base
            scores = jnp.where(tloc < pos[:, None, None, None], scores, -jnp.inf)
            # current token belongs to its owner device only
            own = (pos >= base) & (pos < base + s_local)
            s_cur = jnp.einsum(
                "bgmd,bgd->bgm", qs, k, preferred_element_type=jnp.float32
            ) * inv
            s_cur = jnp.where(own[:, None, None], s_cur, -jnp.inf)
            all_s = jnp.concatenate([scores, s_cur[..., None]], axis=-1)

            # local flash stats
            m_loc = jnp.max(all_s, axis=-1)  # (b, g, m)
            m_glob = lax.pmax(m_loc, "sp")
            p = jnp.exp(all_s - m_glob[..., None])
            l_loc = jnp.sum(p, axis=-1)
            o_loc = jnp.einsum(
                "bgms,bgsd->bgmd", p[..., :s_local].astype(vc.dtype), vc,
                preferred_element_type=jnp.float32,
            ) + p[..., s_local][..., None] * v.astype(jnp.float32)[:, :, None]
            l_glob = lax.psum(l_loc, "sp")
            o_glob = lax.psum(o_loc, "sp")
            att = (o_glob / jnp.maximum(l_glob, 1e-30)[..., None]).reshape(
                b, c.dim
            ).astype(x.dtype)

            x = x + att @ wo
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(xb @ w1) * (xb @ w3)
            x = x + h @ w2
            return x, (k, v)

        x, (k_rows, v_rows) = lax.scan(layer, x, layer_xs)

        # masked KV write: only the position's OWNER shard stores the new
        # row — routed through the shared writer (in-place Pallas DMA on
        # TPU) with the owner mask; the old per-slot dynamic-update-slice
        # chain materialized whole-cache copies (~5 ms/step at 7B,
        # models/llama.py measurement)
        own = (pos >= base) & (pos < base + s_local)
        pos_local = jnp.clip(pos - base, 0, s_local - 1)
        k_cache = _write_kv_rows(k_cache, k_rows, pos_local, valid=own)
        v_cache = _write_kv_rows(v_cache, v_rows, pos_local, valid=own)

        x = rmsnorm(x, params.rms_final, c.norm_eps)
        logits = (x @ params.wcls).astype(jnp.float32)
        return logits, k_cache, v_cache

    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), _dummy_spec()),
            P(None, None, None, "sp", None),
            P(None, None, None, "sp", None),
            P(),
            P(),
        ),
        out_specs=(P(), P(None, None, None, "sp", None),
                   P(None, None, None, "sp", None)),
        check_vma=False,
    )

    def step(params, cache: KVCache, tokens, pos):
        with jax.default_matmul_precision(precision):
            logits, k, v = f(params, cache.k, cache.v, tokens, pos)
        return logits, KVCache(k, v)

    return step
