"""Pipeline-parallel decode over a ("pp",) mesh axis.

TPU re-design of the reference's pipeline parallelism (SURVEY.md N17/N26):
- layer-range weight shards per device (models.cpp:327-372)
      -> layer-stacked params reshaped (S, L/S, ...) and sharded on "pp"
- 4 host threads = 4 in-flight microbatches, per-device omp locks
  (llama.cpp:1298-1366, thaDNN.cpp:204)
      -> a GPipe tick loop INSIDE one jitted shard_map: M microbatches
         drain through S stages in M+S-1 ticks, every stage busy in the
         steady state — the lock-step schedule the host threads were
         approximating.
- activation hand-off by D2D hipMemcpy (thaDNN.cpp:267-270,411-413)
      -> jax.lax.ppermute over the ICI ring.

Note: on TPU, tensor parallelism (parallel/sharding.py) is usually the
better decomposition (it also cuts latency, not just memory); PP is kept
for capability parity and for stacking pp x tp on larger meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import (
    KVCache,
    rmsnorm,
    rope,
    scatter_kv_chunk,
)
from hip_llama_tpu.models.params import LlamaParams


def stage_params(params: LlamaParams, n_stages: int) -> LlamaParams:
    """Reshape layer-stacked (L, ...) tensors to (S, L/S, ...) so dim 0
    shards across pipeline stages."""

    def r(x, stacked):
        if not stacked:
            return x
        return x.reshape(n_stages, x.shape[0] // n_stages, *x.shape[1:])

    return LlamaParams(
        tok_emb=params.tok_emb,
        rms_att=r(params.rms_att, True),
        wq=r(params.wq, True),
        wk=r(params.wk, True),
        wv=r(params.wv, True),
        wo=r(params.wo, True),
        rms_ffn=r(params.rms_ffn, True),
        w1=r(params.w1, True),
        w2=r(params.w2, True),
        w3=r(params.w3, True),
        rms_final=params.rms_final,
        wcls=params.wcls,
    )


def pp_shardings(cfg: ModelConfig, mesh: Mesh):
    """NamedShardings for staged params and the layer-sharded KV cache."""

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    n_stages = mesh.shape["pp"]
    params = LlamaParams(
        tok_emb=ns(),
        rms_att=ns("pp"), wq=ns("pp"), wk=ns("pp"), wv=ns("pp"), wo=ns("pp"),
        rms_ffn=ns("pp"), w1=ns("pp"), w2=ns("pp"), w3=ns("pp"),
        rms_final=ns(),
        # vocab-dim shard: every stage projects V/S columns (see
        # _project_logits); replicated only when V doesn't divide
        wcls=ns(None, "pp") if cfg.vocab_size % n_stages == 0 else ns(),
    )
    cache = KVCache(k=ns(None, "pp"), v=ns(None, "pp"))
    return params, cache


def _project_logits(c: ModelConfig, n_stages: int, y_out, pl_, is_last):
    """Final norm + vocab projection at the end of the tick loop.

    Only the last stage holds finished activations. Instead of every stage
    computing the full (D, V) matmul and psumming full fp32 logits (the
    largest possible collective — ADVICE r1), psum the (..., D) hidden
    state (V/D = 8x smaller) to all stages, project each stage's V/S
    vocab shard, and all-gather the shards."""
    if c.vocab_size % n_stages == 0:
        y_all = lax.psum(jnp.where(is_last, y_out, 0.0), "pp")
        xf = rmsnorm(y_all, pl_.rms_final, c.norm_eps)
        return lax.all_gather(
            (xf @ pl_.wcls).astype(jnp.float32), "pp", axis=-1, tiled=True
        )
    xf = rmsnorm(y_out, pl_.rms_final, c.norm_eps)
    logits_out = jnp.where(is_last, (xf @ pl_.wcls).astype(jnp.float32), 0.0)
    return lax.psum(logits_out, "pp")


def make_pp_decode_step(cfg: ModelConfig, mesh: Mesh, n_micro: int = 4,
                        precision: str = "highest"):
    """Returns step(staged_params, cache, tokens (B,), pos (B,)) ->
    (logits (B, V), cache). B must divide into n_micro microbatches.

    cache: (B, L, KVH, S, HS) sharded P(None, "pp") — each stage owns its
    layers' KV.
    """
    c = cfg
    n_stages = mesh.shape["pp"]
    assert c.n_layers % n_stages == 0

    def stage_layers(x, params_local, kc, vc, pos_mb):
        """Run this stage's L/S layers on one microbatch; returns x and the
        per-layer K/V rows to write."""
        b = x.shape[0]
        xs = (
            params_local.rms_att, params_local.wq, params_local.wk,
            params_local.wv, params_local.wo, params_local.rms_ffn,
            params_local.w1, params_local.w2, params_local.w3,
            jnp.arange(params_local.rms_att.shape[0], dtype=jnp.int32),
        )

        def layer(carry, t):
            x = carry
            rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3, l = t
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = (xb @ wq).reshape(b, c.n_heads, c.head_size)
            k = (xb @ wk).reshape(b, c.n_kv_heads, c.head_size)
            v = (xb @ wv).reshape(b, c.n_kv_heads, c.head_size)
            q = rope(q, pos_mb, c.rope_theta)
            k = rope(k, pos_mb, c.rope_theta)
            from hip_llama_tpu.models.llama import attention_decode_xla

            att = attention_decode_xla(q, kc, vc, l, pos_mb, k, v).reshape(b, c.dim)
            x = x + att @ wo
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(xb @ w1) * (xb @ w3)
            x = x + h @ w2
            return x, (k, v)

        x, rows = lax.scan(layer, x, xs)
        return x, rows

    def spmd(params_local: LlamaParams, k_local, v_local, tokens, pos):
        # params_local: (1, L/S, ...) on this device; squeeze the stage dim
        pl_ = jax.tree.map(
            lambda x: x[0] if x.ndim and x.shape[0] == 1 else x,
            LlamaParams(
                tok_emb=params_local.tok_emb,
                rms_att=params_local.rms_att,
                wq=params_local.wq, wk=params_local.wk, wv=params_local.wv,
                wo=params_local.wo, rms_ffn=params_local.rms_ffn,
                w1=params_local.w1, w2=params_local.w2, w3=params_local.w3,
                rms_final=params_local.rms_final, wcls=params_local.wcls,
            ),
        )
        sid = lax.axis_index("pp")
        b = tokens.shape[0]
        mb = b // n_micro
        x_all = pl_.tok_emb[tokens].astype(pl_.wq.dtype)  # (B, D) replicated

        act = jnp.zeros((mb, c.dim), pl_.wq.dtype)
        y_out = jnp.zeros((b, c.dim), pl_.wq.dtype)
        is_last = sid == n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for t in range(n_micro + n_stages - 1):
            m = t - sid  # microbatch this stage works on at tick t
            valid = (m >= 0) & (m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            # stage 0 injects a fresh microbatch
            inject = lax.dynamic_slice(x_all, (m_c * mb, 0), (mb, c.dim))
            act = jnp.where((sid == 0) & valid, inject, act)
            pos_mb = lax.dynamic_slice(pos, (m_c * mb,), (mb,))

            kc = lax.dynamic_slice(
                k_local, (m_c * mb, 0, 0, 0, 0), (mb,) + k_local.shape[1:]
            )
            vc = lax.dynamic_slice(
                v_local, (m_c * mb, 0, 0, 0, 0), (mb,) + v_local.shape[1:]
            )
            y, (k_rows, v_rows) = stage_layers(act, pl_, kc, vc, pos_mb)

            # masked KV write at (m_c*mb, :, :, pos, :) — one row per slot
            def write_rows(cache_local, rows):
                upd = jnp.moveaxis(rows, 1, 0).astype(cache_local.dtype)
                for i in range(mb):
                    old = lax.dynamic_slice(
                        cache_local,
                        (m_c * mb + i, 0, 0, pos_mb[i], 0),
                        (1, cache_local.shape[1], cache_local.shape[2], 1,
                         cache_local.shape[4]),
                    )
                    neww = jnp.where(valid, upd[i][None, :, :, None], old)
                    cache_local = lax.dynamic_update_slice(
                        cache_local, neww, (m_c * mb + i, 0, 0, pos_mb[i], 0)
                    )
                return cache_local

            k_local = write_rows(k_local, k_rows)
            v_local = write_rows(v_local, v_rows)

            # last stage banks its finished microbatch's activations; the
            # vocab projection runs ONCE after the tick loop instead of a
            # (D x V) matmul per stage per tick
            old = lax.dynamic_slice(y_out, (m_c * mb, 0), (mb, c.dim))
            y_out = lax.dynamic_update_slice(
                y_out, jnp.where(is_last & valid, y, old), (m_c * mb, 0)
            )
            # rotate activations around the ring (stage s -> s+1)
            act = lax.ppermute(y, "pp", perm)

        logits_out = _project_logits(c, n_stages, y_out, pl_, is_last)
        return logits_out, k_local, v_local

    wcls_spec = P(None, "pp") if c.vocab_size % n_stages == 0 else P()
    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            LlamaParams(
                tok_emb=P(), rms_att=P("pp"), wq=P("pp"), wk=P("pp"),
                wv=P("pp"), wo=P("pp"), rms_ffn=P("pp"), w1=P("pp"),
                w2=P("pp"), w3=P("pp"), rms_final=P(), wcls=wcls_spec,
            ),
            P(None, "pp"),
            P(None, "pp"),
            P(),
            P(),
        ),
        out_specs=(P(), P(None, "pp"), P(None, "pp")),
        check_vma=False,
    )

    def step(staged_params, cache: KVCache, tokens, pos):
        with jax.default_matmul_precision(precision):
            logits, k, v = f(staged_params, cache.k, cache.v, tokens, pos)
        return logits, KVCache(k, v)

    return step


def make_pp_prefill(cfg: ModelConfig, mesh: Mesh, n_micro: int = 4,
                    precision: str = "highest"):
    """GPipe prefill: prefill(staged_params, cache, tokens (B, T),
    start (B,), valid (B,)) -> (logits (B, T, V), cache).

    Same tick schedule as make_pp_decode_step but each microbatch carries a
    (mb, T, D) activation chunk — the reference's PP path force-feeds
    prompts one token per pipeline pass (llama.cpp:1030-1033 semantics);
    here a whole chunk flows through the stages per pass."""
    c = cfg
    n_stages = mesh.shape["pp"]
    assert c.n_layers % n_stages == 0

    def stage_layers(x, pl_, kc, vc, start_mb, valid_mb):
        """x (mb, T, D); kc/vc (mb, L/S, KVH, S, HS). Returns x and the
        updated local cache slices."""
        mb, t, _ = x.shape
        s = kc.shape[3]
        pos = start_mb[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        xs = (
            pl_.rms_att, pl_.wq, pl_.wk, pl_.wv, pl_.wo, pl_.rms_ffn,
            pl_.w1, pl_.w2, pl_.w3,
            jnp.arange(pl_.rms_att.shape[0], dtype=jnp.int32),
        )

        def layer(carry, tns):
            x, kc, vc = carry
            rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3, l = tns
            xb = rmsnorm(x, rms_a, c.norm_eps)
            q = (xb @ wq).reshape(mb, t, c.n_heads, c.head_size)
            k = (xb @ wk).reshape(mb, t, c.n_kv_heads, c.head_size)
            v = (xb @ wv).reshape(mb, t, c.n_kv_heads, c.head_size)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)

            def write_chunk(cache_l, new):
                # shared clamp+roll windowed merge (models/llama.py), vmapped
                # over the microbatch slots
                return jax.vmap(
                    lambda cb, nb, st, v: scatter_kv_chunk(
                        cb, nb, st, v, l=l, t=t, s=s
                    )
                )(cache_l, new, start_mb, valid_mb)

            kc = write_chunk(kc, k)
            vc = write_chunk(vc, v)
            kl = lax.dynamic_index_in_dim(kc, l, 1, keepdims=False)
            vl = lax.dynamic_index_in_dim(vc, l, 1, keepdims=False)
            kv_mul = c.n_heads // c.n_kv_heads
            qs = q.reshape(mb, t, c.n_kv_heads, kv_mul, c.head_size)
            if jax.default_backend() == "cpu":
                kl, vl, qs = (a.astype(jnp.float32) for a in (kl, vl, qs))
            scores = jnp.einsum(
                "btgmd,bgsd->btgms", qs, kl,
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.float32(c.head_size))
            s_idx = lax.broadcasted_iota(jnp.int32, (mb, t, 1, 1, s), 4)
            scores = jnp.where(
                s_idx <= pos[:, :, None, None, None], scores, -jnp.inf
            )
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum(
                "btgms,bgsd->btgmd", att.astype(vl.dtype), vl,
                preferred_element_type=jnp.float32,
            ).reshape(mb, t, c.dim).astype(x.dtype)
            x = x + out @ wo
            xb = rmsnorm(x, rms_f, c.norm_eps)
            h = jax.nn.silu(xb @ w1) * (xb @ w3)
            x = x + h @ w2
            return (x, kc, vc), None

        (x, kc, vc), _ = lax.scan(layer, (x, kc, vc), xs)
        return x, kc, vc

    def spmd(params_local, k_local, v_local, tokens, start, valid):
        pl_ = jax.tree.map(
            lambda x: x[0] if x.ndim and x.shape[0] == 1 else x,
            LlamaParams(
                tok_emb=params_local.tok_emb,
                rms_att=params_local.rms_att,
                wq=params_local.wq, wk=params_local.wk, wv=params_local.wv,
                wo=params_local.wo, rms_ffn=params_local.rms_ffn,
                w1=params_local.w1, w2=params_local.w2, w3=params_local.w3,
                rms_final=params_local.rms_final, wcls=params_local.wcls,
            ),
        )
        sid = lax.axis_index("pp")
        b, t = tokens.shape
        mb = b // n_micro
        x_all = pl_.tok_emb[tokens].astype(pl_.wq.dtype)  # (B, T, D)

        act = jnp.zeros((mb, t, c.dim), pl_.wq.dtype)
        y_out = jnp.zeros((b, t, c.dim), pl_.wq.dtype)
        is_last = sid == n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for tick in range(n_micro + n_stages - 1):
            m = tick - sid
            tvalid_tick = (m >= 0) & (m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            inject = lax.dynamic_slice(x_all, (m_c * mb, 0, 0), (mb, t, c.dim))
            act = jnp.where((sid == 0) & tvalid_tick, inject, act)
            start_mb = lax.dynamic_slice(start, (m_c * mb,), (mb,))
            # a tick this stage is idle for must not scribble on the cache:
            # zero the window mask by zeroing valid
            valid_mb = jnp.where(
                tvalid_tick, lax.dynamic_slice(valid, (m_c * mb,), (mb,)), 0
            )
            kc = lax.dynamic_slice(
                k_local, (m_c * mb, 0, 0, 0, 0), (mb,) + k_local.shape[1:]
            )
            vc = lax.dynamic_slice(
                v_local, (m_c * mb, 0, 0, 0, 0), (mb,) + v_local.shape[1:]
            )
            y, kc, vc = stage_layers(act, pl_, kc, vc, start_mb, valid_mb)
            k_local = lax.dynamic_update_slice(
                k_local, kc, (m_c * mb, 0, 0, 0, 0)
            )
            v_local = lax.dynamic_update_slice(
                v_local, vc, (m_c * mb, 0, 0, 0, 0)
            )

            old = lax.dynamic_slice(y_out, (m_c * mb, 0, 0), (mb, t, c.dim))
            y_out = lax.dynamic_update_slice(
                y_out, jnp.where(is_last & tvalid_tick, y, old),
                (m_c * mb, 0, 0),
            )
            act = lax.ppermute(y, "pp", perm)

        logits_out = _project_logits(c, n_stages, y_out, pl_, is_last)
        return logits_out, k_local, v_local

    wcls_spec = P(None, "pp") if c.vocab_size % n_stages == 0 else P()
    f = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            LlamaParams(
                tok_emb=P(), rms_att=P("pp"), wq=P("pp"), wk=P("pp"),
                wv=P("pp"), wo=P("pp"), rms_ffn=P("pp"), w1=P("pp"),
                w2=P("pp"), w3=P("pp"), rms_final=P(), wcls=wcls_spec,
            ),
            P(None, "pp"),
            P(None, "pp"),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(), P(None, "pp"), P(None, "pp")),
        check_vma=False,
    )

    def prefill(staged_params, cache: KVCache, tokens, start, valid):
        with jax.default_matmul_precision(precision):
            logits, k, v = f(
                staged_params, cache.k, cache.v, tokens, start, valid
            )
        return logits, KVCache(k, v)

    return prefill
