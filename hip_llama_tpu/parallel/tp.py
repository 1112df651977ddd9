"""Explicit-SPMD tensor-parallel decode/prefill via shard_map.

Complements parallel/sharding.py (pjit auto-partitioning): Pallas kernels —
the fused Q8_0 matmul and the flash attention kernels — cannot be
auto-partitioned by XLA, so the tensor-parallel int8 path runs the whole
step as manual SPMD: every device executes the SAME step code on its LOCAL
weight/KV shards (the `_mm` dispatch is oblivious to sharding), with exactly
two psums per layer (after Wo and after W2, the Megatron pattern) and one
all-gather for the vocab-sharded logits.

Sharding layout (same as sharding.py):
- wq/wk/wv, w1/w3: output dim on "tp" (column-parallel, no comms in)
- wo, w2: input dim on "tp" (row-parallel, psum after)
- KV cache: kv-head dim on "tp"; attention is fully local (GQA co-location)
- wcls: vocab on "tp"; logits all-gathered
- batch optionally on "dp" (replica groups, zero comms at inference)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import (
    KVCache,
    _act_dtype,
    _embed,
    _mm,
    _write_kv_rows,
    rmsnorm,
    rope,
    scatter_kv_chunk,
    scatter_scale_chunk,
)
from hip_llama_tpu.models.params import LlamaParams, QuantLlamaParams
from hip_llama_tpu.ops.quant import QTensor


def _param_specs(params) -> object:
    """PartitionSpec pytree for dense or quantized params."""
    col = P(None, None, "tp")  # (L, K, N): shard N
    row = P(None, "tp", None)  # (L, K, N): shard K
    if isinstance(params, QuantLlamaParams):
        def qspec(spec):
            return QTensor(q=spec, s=spec)  # q and s shard identically

        return QuantLlamaParams(
            tok_emb_q=P(), tok_emb_s=P(), rms_att=P(),
            wq=qspec(col), wk=qspec(col), wv=qspec(col), wo=qspec(row),
            rms_ffn=P(), w1=qspec(col), w2=qspec(row), w3=qspec(col),
            rms_final=P(), wcls=QTensor(q=P(None, "tp"), s=P(None, "tp")),
        )
    return LlamaParams(
        tok_emb=P(), rms_att=P(),
        wq=col, wk=col, wv=col, wo=row,
        rms_ffn=P(), w1=col, w2=row, w3=col,
        rms_final=P(), wcls=P(None, "tp"),
    )


def tp_shardings(params, mesh: Mesh, kv_quant: bool = False):
    """NamedShardings to place params/cache for the shard_map TP step."""
    specs = _param_specs(params)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
    kv_ns = NamedSharding(mesh, P("dp", None, "tp", None, None))
    if kv_quant:
        sc_ns = NamedSharding(mesh, P("dp", None, "tp", None))
        cache_sh = KVCache(k=kv_ns, v=kv_ns, k_scale=sc_ns, v_scale=sc_ns)
    else:
        cache_sh = KVCache(k=kv_ns, v=kv_ns)
    return p_sh, cache_sh


def make_tp_decode_step(cfg: ModelConfig, mesh: Mesh, params_like,
                        attn_impl: str = "pallas", precision: str = "default",
                        kv_quant: bool = False):
    """Returns step(params, cache, tokens (B,), pos (B,)) -> (logits, cache).

    `params_like` (dense LlamaParams or QuantLlamaParams) fixes the pytree
    structure for the in_specs. tp must divide n_kv_heads, hidden_dim, dim,
    vocab; dp must divide batch. kv_quant=True runs the int8 KV cache: the
    scale planes shard on "tp" alongside their kv heads, so dequant stays
    fully local.
    """
    c = cfg
    tp = mesh.shape["tp"]
    assert c.n_kv_heads % tp == 0 and c.vocab_size % tp == 0
    p_specs = _param_specs(params_like)

    def spmd(params, k_cache, v_cache, k_scale, v_scale, tokens, pos):
        # local shapes: heads/tp, hidden/tp on the sharded dims
        x = _embed(params, tokens, _act_dtype(params))
        b = x.shape[0]
        n_heads_l = c.n_heads // tp
        n_kv_l = c.n_kv_heads // tp
        ks = k_scale if kv_quant else None
        vs = v_scale if kv_quant else None

        layer_xs = (
            jnp.arange(c.n_layers, dtype=jnp.int32),
            params.rms_att, params.wq, params.wk, params.wv, params.wo,
            params.rms_ffn, params.w1, params.w2, params.w3,
        )

        def layer(carry, xs):
            x = carry
            l, rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = xs
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = _mm(xb, wq).reshape(b, n_heads_l, c.head_size)
            k = _mm(xb, wk).reshape(b, n_kv_l, c.head_size)
            v = _mm(xb, wv).reshape(b, n_kv_l, c.head_size)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)
            if attn_impl == "pallas":
                from hip_llama_tpu.ops.attention import attention_decode_pallas

                att = attention_decode_pallas(
                    q, k_cache, v_cache, l, pos, k, v, ks, vs
                )
            else:
                from hip_llama_tpu.models.llama import attention_decode_xla

                att = attention_decode_xla(
                    q, k_cache, v_cache, l, pos, k, v, ks, vs
                )
            att = att.reshape(b, n_heads_l * c.head_size)
            # row-parallel Wo: local partial + psum (the Megatron all-reduce)
            x = x + lax.psum(_mm(att, wo), "tp")
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(_mm(xb, w1)) * _mm(xb, w3)
            x = x + lax.psum(_mm(h, w2), "tp")
            return x, (k, v)

        x, (k_rows, v_rows) = lax.scan(layer, x, layer_xs)
        if kv_quant:
            from hip_llama_tpu.models.llama import _write_scale_rows
            from hip_llama_tpu.ops.cache import quantize_kv_rows

            kq, ksr = quantize_kv_rows(k_rows)
            vq, vsr = quantize_kv_rows(v_rows)
            new_k = _write_kv_rows(k_cache, kq, pos)
            new_v = _write_kv_rows(v_cache, vq, pos)
            new_ks = _write_scale_rows(k_scale, ksr, pos)
            new_vs = _write_scale_rows(v_scale, vsr, pos)
        else:
            new_k = _write_kv_rows(k_cache, k_rows, pos)
            new_v = _write_kv_rows(v_cache, v_rows, pos)
            new_ks, new_vs = k_scale, v_scale
        x = rmsnorm(x, params.rms_final, c.norm_eps)
        logits_l = _mm(x, params.wcls).astype(jnp.float32)  # (B, V/tp)
        logits = lax.all_gather(logits_l, "tp", axis=1, tiled=True)
        return logits, new_k, new_v, new_ks, new_vs

    kv_spec = P("dp", None, "tp", None, None)
    sc_spec = P("dp", None, "tp", None) if kv_quant else P()
    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(p_specs, kv_spec, kv_spec, sc_spec, sc_spec, P("dp"), P("dp")),
        out_specs=(P("dp"), kv_spec, kv_spec, sc_spec, sc_spec),
        check_vma=False,
    )

    def step(params, cache: KVCache, tokens, pos):
        ksc = cache.k_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        vsc = cache.v_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        with jax.default_matmul_precision(precision):
            logits, k, v, ks, vs = f(
                params, cache.k, cache.v, ksc, vsc, tokens, pos
            )
        if kv_quant:
            return logits, KVCache(k, v, ks, vs)
        return logits, KVCache(k, v)

    return step


def make_tp_prefill(cfg: ModelConfig, mesh: Mesh, params_like,
                    attn_impl: str = "pallas", precision: str = "default",
                    kv_quant: bool = False):
    """shard_map tensor-parallel chunked prefill: same layout as
    make_tp_decode_step; KV chunk scatters into the local head shard and
    attention runs fully local (GQA co-location)."""
    c = cfg
    tp = mesh.shape["tp"]
    assert c.n_kv_heads % tp == 0 and c.n_heads % tp == 0, (c.n_kv_heads, tp)
    assert c.hidden_dim % tp == 0 and c.vocab_size % tp == 0, (c.hidden_dim, tp)
    p_specs = _param_specs(params_like)

    def spmd(params, k_cache, v_cache, k_scale, v_scale, tokens, start, valid):
        b, t = tokens.shape
        s = k_cache.shape[3]
        x = _embed(params, tokens, _act_dtype(params))
        pos = start[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        n_heads_l = c.n_heads // tp
        n_kv_l = c.n_kv_heads // tp

        layer_xs = (
            jnp.arange(c.n_layers, dtype=jnp.int32),
            params.rms_att, params.wq, params.wk, params.wv, params.wo,
            params.rms_ffn, params.w1, params.w2, params.w3,
        )

        def layer(carry, xs):
            x, kc_all, vc_all, ks_all, vs_all = carry
            l, rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = xs
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = _mm(xb, wq).reshape(b, t, n_heads_l, c.head_size)
            k = _mm(xb, wk).reshape(b, t, n_kv_l, c.head_size)
            v = _mm(xb, wv).reshape(b, t, n_kv_l, c.head_size)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)

            # shared chunk-merge helpers (models/llama.py): clamp + roll
            # handles buckets extending past the window end
            def scatter_seq(c_b, new_b, st, v):
                return scatter_kv_chunk(c_b, new_b, st, v, l=l, t=t, s=s)

            def scatter_scale(s_b, new_s, st, v):
                return scatter_scale_chunk(s_b, new_s, st, v, l=l, t=t, s=s)

            if kv_quant:
                from hip_llama_tpu.ops.cache import quantize_kv_rows

                kq, ksc = quantize_kv_rows(k)
                vq, vsc = quantize_kv_rows(v)
                kc_all = jax.vmap(scatter_seq)(kc_all, kq, start, valid)
                vc_all = jax.vmap(scatter_seq)(vc_all, vq, start, valid)
                ks_all = jax.vmap(scatter_scale)(ks_all, ksc, start, valid)
                vs_all = jax.vmap(scatter_scale)(vs_all, vsc, start, valid)
            else:
                kc_all = jax.vmap(scatter_seq)(kc_all, k, start, valid)
                vc_all = jax.vmap(scatter_seq)(vc_all, v, start, valid)

            if attn_impl == "pallas":
                from hip_llama_tpu.ops.attention import attention_prefill_pallas

                att = attention_prefill_pallas(
                    q, kc_all, vc_all, l, start, valid,
                    ks_all if kv_quant else None,
                    vs_all if kv_quant else None,
                )
            else:
                kc = lax.dynamic_index_in_dim(kc_all, l, 1, keepdims=False)
                vc = lax.dynamic_index_in_dim(vc_all, l, 1, keepdims=False)
                kv_mul = n_heads_l // n_kv_l
                qs = q.reshape(b, t, n_kv_l, kv_mul, c.head_size)
                if kv_quant:
                    kc = kc.astype(jnp.float32)
                    vc = vc.astype(jnp.float32)
                    qs = qs.astype(jnp.float32)
                scores = jnp.einsum(
                    "btgmd,bgsd->btgms", qs, kc,
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(jnp.float32(c.head_size))
                if kv_quant:
                    ks_l = lax.dynamic_index_in_dim(ks_all, l, 1, keepdims=False)
                    scores = scores * ks_l[:, None, :, None, :]
                s_idx = lax.broadcasted_iota(jnp.int32, (b, t, 1, 1, s), 4)
                mask = s_idx <= pos[:, :, None, None, None]
                scores = jnp.where(mask, scores, -jnp.inf)
                att_w = jax.nn.softmax(scores, axis=-1)
                if kv_quant:
                    vs_l = lax.dynamic_index_in_dim(vs_all, l, 1, keepdims=False)
                    att_w = att_w * vs_l[:, None, :, None, :]
                att = jnp.einsum(
                    "btgms,bgsd->btgmd", att_w.astype(vc.dtype), vc,
                    preferred_element_type=jnp.float32,
                ).reshape(b, t, n_heads_l, c.head_size)
            att = att.reshape(b, t, n_heads_l * c.head_size).astype(x.dtype)
            x = x + lax.psum(_mm(att, wo), "tp")
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(_mm(xb, w1)) * _mm(xb, w3)
            x = x + lax.psum(_mm(h, w2), "tp")
            return (x, kc_all, vc_all, ks_all, vs_all), None

        ks0 = k_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        vs0 = v_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        (x, new_k, new_v, new_ks, new_vs), _ = lax.scan(
            layer, (x, k_cache, v_cache, ks0, vs0), layer_xs
        )
        x = rmsnorm(x, params.rms_final, c.norm_eps)
        logits_l = _mm(x, params.wcls).astype(jnp.float32)
        logits = lax.all_gather(logits_l, "tp", axis=2, tiled=True)
        return logits, new_k, new_v, new_ks, new_vs

    kv_spec = P("dp", None, "tp", None, None)
    sc_spec = P("dp", None, "tp", None) if kv_quant else P()
    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            p_specs, kv_spec, kv_spec, sc_spec, sc_spec,
            P("dp"), P("dp"), P("dp"),
        ),
        out_specs=(P("dp"), kv_spec, kv_spec, sc_spec, sc_spec),
        check_vma=False,
    )

    def prefill(params, cache: KVCache, tokens, start, valid):
        ksc = cache.k_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        vsc = cache.v_scale if kv_quant else jnp.zeros((0,), jnp.float32)
        with jax.default_matmul_precision(precision):
            logits, k, v, ks, vs = f(
                params, cache.k, cache.v, ksc, vsc, tokens, start, valid
            )
        if kv_quant:
            return logits, KVCache(k, v, ks, vs)
        return logits, KVCache(k, v)

    return prefill
