"""Host-offload execution: weight streaming (models bigger than HBM) and
KV host-swap (contexts bigger than HBM).

TPU re-design of the reference's two offload paths:
- N16 `thaDNN_s_forward_70B` (thaDNN.cpp:83-189): per-layer weights live in
  pinned host RAM and are copied H2D layer-by-layer per token
  (models.cpp:511-692 keeps ONE layer of weights + KV on device).
- N18 `..._layer_swap` (thaDNN.cpp:291-427): the KV tail beyond the device
  window streams host<->device around attention on a dedicated copy stream.

Here, host residency = numpy views over the checkpoint mmap (zero-copy from
disk cache) and the copy stream = JAX async dispatch: the H2D transfer for
layer l+1 is issued while layer l computes, so transfer and compute overlap
exactly like the reference's calc/copy streams (thaBLAS.hpp:23-24). The
per-layer compute is ONE jitted function reused across layers (identical
shapes => one compile).

Beyond the reference's fp32-only streaming (llama.cpp:1085-1278 +
models.cpp:511-692):
- INT8 streamed weights: host layers hold Q8_0 payload+scales and the layer
  compute runs the fused dequant kernels (ops/quant.py). Streaming decode is
  H2D-bandwidth-bound, so int8 halves the critical path vs the bf16 stream
  (and ~4x vs the reference's fp32 stream).
- a streaming PREFILL: each prompt chunk streams the weights ONCE for the
  whole (B, T) chunk instead of once per token (the reference force-feeds
  prompts one token per step, llama.cpp:1030-1033 — at 70B that's a full
  weight sweep per prompt token).
- batch > 1 and engine integration: `make_streaming_engine_fns` plugs the
  streaming step/prefill/cache into the continuous-batching engine
  (`-m test --stream` serves whole request corpora like the reference's
  test_70B scheduler, but batched).

This is the capacity escape hatch for single chips; the first-choice design
for big models is sharding across an ICI mesh (parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import LlamaWeights, QuantWeights, quantize_q80
from hip_llama_tpu.models.llama import (
    _mm_norm,
    _mm_norm_rope,
    _mm_norm_silu,
    _mm_res,
    _write_kv_rows,
    attention_decode_xla,
    scatter_kv_chunk,
)
from hip_llama_tpu.ops.quant import QTensor


@dataclasses.dataclass
class HostLayer:
    """One layer's weights host-resident, already in matmul orientation and
    FUSED (QKV along N, W1|W3 along N — one H2D transfer + one kernel each):
    plain np.ndarray for dense layers, QTensor of np arrays for Q8_0."""

    rms_att: np.ndarray  # (D,) f32
    wqkv: Any  # (D, D + 2*KVD) dense | QTensor
    wo: Any  # (D, D)
    rms_ffn: np.ndarray
    w13: Any  # (D, 2H)
    w2: Any  # (H, D)

    def tree(self):
        return (self.rms_att, self.wqkv, self.wo, self.rms_ffn, self.w13, self.w2)


@dataclasses.dataclass
class HostParams:
    layers: list[HostLayer]
    # device-resident top-level tensors (touched every step, small relative
    # to the layer stack). tok_emb: (V, D) dense array, or an (emb_q int8,
    # emb_s f32) pair for Q8_0 params (gather+dequant per step, runq.c:360).
    tok_emb: Any
    rms_final: Any
    wcls: Any  # (D, V) dense | QTensor

    @property
    def quantized(self) -> bool:
        return isinstance(self.wcls, QTensor)


def _fuse(*ws: np.ndarray) -> np.ndarray:
    return np.concatenate(ws, axis=1) if len(ws) > 1 else ws[0]


def _fuse_qt(*ts: QTensor) -> QTensor:
    return QTensor(
        q=np.concatenate([t.q for t in ts], axis=1),
        s=np.concatenate([t.s for t in ts], axis=1),
    )


def host_params_from_weights(w: LlamaWeights, dtype=jnp.bfloat16) -> HostParams:
    """Dense host params: per-layer host views pre-cast to the compute dtype
    (halves the fp32 H2D bytes — the transfer IS the streaming critical
    path), fused QKV / W1|W3."""

    np_dt = np.dtype(dtype)

    def t(x):  # (out, in) -> (in, out)
        return np.ascontiguousarray(np.swapaxes(np.asarray(x), -1, -2)).astype(np_dt)

    layers = [
        HostLayer(
            rms_att=np.asarray(w.rms_att[l], np.float32),
            wqkv=_fuse(t(w.wq[l]), t(w.wk[l]), t(w.wv[l])),
            wo=t(w.wo[l]),
            rms_ffn=np.asarray(w.rms_ffn[l], np.float32),
            w13=_fuse(t(w.w1[l]), t(w.w3[l])),
            w2=t(w.w2[l]),
        )
        for l in range(w.wq.shape[0])
    ]
    return HostParams(
        layers=layers,
        tok_emb=jnp.asarray(w.tok_emb, dtype),
        rms_final=jnp.asarray(w.rms_final, jnp.float32),
        wcls=jnp.asarray(np.asarray(w.wcls).T, dtype),
    )


def _np_qt(q_file: np.ndarray, s_file: np.ndarray, out_dim: int, in_dim: int,
           gs: int) -> QTensor:
    """Checkpoint-orientation Q8_0 (out, in), groups along `in`
    (export.py:46-70) -> matmul-oriented host QTensor q (in, out),
    s (in//gs, out). Group structure transposes exactly (lossless)."""
    q = np.ascontiguousarray(q_file.reshape(out_dim, in_dim).T)
    s = np.ascontiguousarray(
        s_file.reshape(out_dim, in_dim // gs).T.astype(np.float32)
    )
    return QTensor(q=q, s=s)


def host_qparams_from_quant_weights(cfg: ModelConfig, qw: QuantWeights) -> HostParams:
    """v2 Q8_0 checkpoint -> int8 host layers (bit-identical payload; the
    int8 stream is the whole point — H2D moves ~1/4 the reference's fp32
    bytes per layer)."""
    gs = cfg.group_size
    assert gs is not None
    c = cfg
    layers = [
        HostLayer(
            rms_att=np.asarray(qw.rms_att[l], np.float32),
            wqkv=_fuse_qt(
                _np_qt(qw.wq[l].q, qw.wq[l].s, c.dim, c.dim, gs),
                _np_qt(qw.wk[l].q, qw.wk[l].s, c.kv_dim, c.dim, gs),
                _np_qt(qw.wv[l].q, qw.wv[l].s, c.kv_dim, c.dim, gs),
            ),
            wo=_np_qt(qw.wo[l].q, qw.wo[l].s, c.dim, c.dim, gs),
            rms_ffn=np.asarray(qw.rms_ffn[l], np.float32),
            w13=_fuse_qt(
                _np_qt(qw.w1[l].q, qw.w1[l].s, c.hidden_dim, c.dim, gs),
                _np_qt(qw.w3[l].q, qw.w3[l].s, c.hidden_dim, c.dim, gs),
            ),
            w2=_np_qt(qw.w2[l].q, qw.w2[l].s, c.dim, c.hidden_dim, gs),
        )
        for l in range(c.n_layers)
    ]
    emb_q = jnp.asarray(qw.q_tokens.q.reshape(c.vocab_size, c.dim))
    emb_s = jnp.asarray(qw.q_tokens.s.reshape(c.vocab_size, c.dim // gs), jnp.float32)
    wcls = _np_qt(qw.wcls.q, qw.wcls.s, c.vocab_size, c.dim, gs)
    return HostParams(
        layers=layers,
        tok_emb=(emb_q, emb_s),
        rms_final=jnp.asarray(qw.rms_final, jnp.float32),
        wcls=QTensor(q=jnp.asarray(wcls.q), s=jnp.asarray(wcls.s)),
    )


def host_quantize_params(cfg: ModelConfig, w: LlamaWeights,
                         group_size: int = 64) -> HostParams:
    """Quantize an fp32 checkpoint to Q8_0 host layers on the host (the
    --stream --quant q8 path: stream int8 even when the file is fp32).
    Same group semantics as the v2 exporter (quantize_q80)."""
    c = cfg

    def qt(x: np.ndarray, out_dim: int, in_dim: int) -> QTensor:
        q, s, _ = quantize_q80(np.asarray(x, np.float32), group_size)
        return _np_qt(q, s, out_dim, in_dim, group_size)

    layers = [
        HostLayer(
            rms_att=np.asarray(w.rms_att[l], np.float32),
            wqkv=_fuse_qt(
                qt(w.wq[l], c.dim, c.dim),
                qt(w.wk[l], c.kv_dim, c.dim),
                qt(w.wv[l], c.kv_dim, c.dim),
            ),
            wo=qt(w.wo[l], c.dim, c.dim),
            rms_ffn=np.asarray(w.rms_ffn[l], np.float32),
            w13=_fuse_qt(
                qt(w.w1[l], c.hidden_dim, c.dim),
                qt(w.w3[l], c.hidden_dim, c.dim),
            ),
            w2=qt(w.w2[l], c.dim, c.hidden_dim),
        )
        for l in range(c.n_layers)
    ]
    eq, es, _ = quantize_q80(np.asarray(w.tok_emb, np.float32), group_size)
    cq, cs, _ = quantize_q80(np.asarray(w.wcls, np.float32), group_size)
    return HostParams(
        layers=layers,
        tok_emb=(
            jnp.asarray(eq.reshape(c.vocab_size, c.dim)),
            jnp.asarray(es.reshape(c.vocab_size, c.dim // group_size), jnp.float32),
        ),
        rms_final=jnp.asarray(w.rms_final, jnp.float32),
        wcls=QTensor(
            q=jnp.asarray(
                np.ascontiguousarray(cq.reshape(c.vocab_size, c.dim).T)
            ),
            s=jnp.asarray(
                np.ascontiguousarray(
                    cs.reshape(c.vocab_size, c.dim // group_size).T
                ),
                jnp.float32,
            ),
        ),
    )


# ---------------------------------------------------------------------------
# jitted building blocks (shared by decode + prefill; one compile per shape)


@jax.jit
def _embed_dense(tok_emb, tokens):
    return tok_emb[tokens]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _embed_q8(emb_q, emb_s, tokens, gs, dtype):
    q = emb_q[tokens]
    s = emb_s[tokens]
    d = q.shape[-1]
    g = q.astype(jnp.float32).reshape(*q.shape[:-1], d // gs, gs)
    return (g * s[..., None]).reshape(q.shape).astype(dtype)


def _embed_host(hp: HostParams, tokens, dtype):
    if isinstance(hp.tok_emb, tuple):
        gs = hp.tok_emb[0].shape[-1] // hp.tok_emb[1].shape[-1]
        return _embed_q8(hp.tok_emb[0], hp.tok_emb[1], tokens, gs, dtype)
    return _embed_dense(hp.tok_emb, tokens).astype(dtype)


def _put_layer(hl: HostLayer):
    """Async H2D of one layer's weights (the reference's 9-tensor copy,
    thaDNN.cpp:123-131). Dense layers are pre-cast to the compute dtype;
    int8 layers move the Q8_0 payload+scales (~1/4 the fp32 bytes)."""
    return jax.device_put(hl.tree())


def make_streaming_decode_step(cfg: ModelConfig, dtype=jnp.bfloat16,
                               kv_host: bool = False):
    """Returns step(host_params, cache, tokens (B,), pos (B,)) ->
    (logits (B, V) np fp32, cache).

    cache: a LIST of per-layer (k_l, v_l) device arrays (B, 1, KVH, S, HS) —
    per-layer buffers donate through layer_fn for true in-place updates (a
    stacked KVCache cost a whole-cache copy + transient 2x alloc per token)
    — or (k_host, v_host) numpy (B, L, KVH, S, HS) when kv_host=True (the
    70B mode: device holds one layer of KV at a time, models.cpp:715-744).

    Dense AND Q8_0 host layers run through the same code: the _mm_* helpers
    dispatch on the weight type (fused int8 kernels for QTensors)."""
    c = cfg

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def layer_fn(x, wl, k_l, v_l, pos):
        rms_a, wqkv, wo, rms_f, w13, w2 = wl
        b = x.shape[0]
        qkv = _mm_norm_rope(
            x, rms_a, wqkv, c.norm_eps, pos, c.dim + c.kv_dim, c.head_size,
            c.rope_theta,
        )
        q = qkv[:, : c.dim].reshape(b, c.n_heads, c.head_size)
        k = qkv[:, c.dim : c.dim + c.kv_dim].reshape(b, c.n_kv_heads, c.head_size)
        v = qkv[:, c.dim + c.kv_dim :].reshape(b, c.n_kv_heads, c.head_size)
        att = attention_decode_xla(
            q, k_l, v_l, jnp.int32(0), pos, k, v
        ).reshape(b, c.dim)
        x = _mm_res(x, att, wo)
        h = _mm_norm_silu(x, rms_f, w13, c.hidden_dim, c.norm_eps)
        x = _mm_res(x, h, w2)
        # write the current row into the layer cache (in-place DMA on TPU)
        k_l = _write_kv_rows(k_l, k[None].astype(k_l.dtype), pos)
        v_l = _write_kv_rows(v_l, v[None].astype(v_l.dtype), pos)
        return x, k_l, v_l

    @jax.jit
    def head_fn(x, rms_final, wcls):
        return _mm_norm(x, rms_final, wcls, c.norm_eps).astype(jnp.float32)

    def step(hp: HostParams, cache, tokens, pos):
        x = _embed_host(hp, jnp.asarray(tokens), dtype)
        pos_d = jnp.asarray(pos)
        n_layers = len(hp.layers)
        next_w = _put_layer(hp.layers[0])  # prefetch layer 0
        if kv_host:
            k_host, v_host = cache
            for l in range(n_layers):
                wl = next_w
                k_l = jax.device_put(k_host[:, l : l + 1])
                v_l = jax.device_put(v_host[:, l : l + 1])
                if l + 1 < n_layers:
                    next_w = _put_layer(hp.layers[l + 1])  # overlap H2D
                x, k_l, v_l = layer_fn(x, wl, k_l, v_l, pos_d)
                k_host[:, l : l + 1] = np.asarray(k_l)  # D2H writeback
                v_host[:, l : l + 1] = np.asarray(v_l)  # (thaDNN.cpp:176-177)
            logits = head_fn(x, hp.rms_final, hp.wcls)
            return np.asarray(logits), (k_host, v_host)
        new_cache = []
        for l in range(n_layers):
            wl = next_w
            if l + 1 < n_layers:
                next_w = _put_layer(hp.layers[l + 1])
            k_l, v_l = cache[l]
            x, k_l, v_l = layer_fn(x, wl, k_l, v_l, pos_d)
            new_cache.append((k_l, v_l))
        logits = head_fn(x, hp.rms_final, hp.wcls)
        return np.asarray(logits), new_cache

    return step


def make_streaming_prefill(cfg: ModelConfig, dtype=jnp.bfloat16,
                           kv_host: bool = False, attn_impl: str | None = None):
    """Returns prefill(host_params, cache, tokens (B, T), start (B,),
    valid (B,)) -> (logits fp32 (B, T, V), cache).

    The reference streams prompts one token per step — a FULL weight sweep
    per prompt token at 70B (llama.cpp:1030-1033 + thaDNN.cpp:123-131).
    Here each layer's weights stream H2D once per (B, T) chunk: prompt cost
    is ~1/T weight sweeps per token. Causal within the chunk, full attention
    over the already-written cache rows; KV writes beyond a slot's `valid`
    are masked (same contract as the resident prefill, models/llama.py)."""
    c = cfg
    if attn_impl is None:
        attn_impl = "pallas" if jax.default_backend() != "cpu" else "xla"

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def layer_prefill(x, wl, k_l, v_l, start, valid):
        rms_a, wqkv, wo, rms_f, w13, w2 = wl
        b, t, _ = x.shape
        s = k_l.shape[3]
        pos = start[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # (B, T)
        qkv = _mm_norm_rope(
            x, rms_a, wqkv, c.norm_eps, pos, c.dim + c.kv_dim, c.head_size,
            c.rope_theta,
        )
        q = qkv[..., : c.dim].reshape(b, t, c.n_heads, c.head_size)
        k = qkv[..., c.dim : c.dim + c.kv_dim].reshape(
            b, t, c.n_kv_heads, c.head_size
        )
        v = qkv[..., c.dim + c.kv_dim :].reshape(b, t, c.n_kv_heads, c.head_size)

        from hip_llama_tpu.ops.cache import _sublane_window

        sub_w = _sublane_window(k_l.dtype)
        pallas_w = (
            jax.default_backend() != "cpu"
            and c.head_size % 128 == 0
            and s % 128 == 0
            and t % 8 == 0
            and s >= -(-t // sub_w) * sub_w + 2 * sub_w
        )
        if pallas_w:
            from hip_llama_tpu.ops.cache import kv_write_chunk

            k_l = kv_write_chunk(k_l, k.astype(k_l.dtype), jnp.int32(0), start, valid)
            v_l = kv_write_chunk(v_l, v.astype(v_l.dtype), jnp.int32(0), start, valid)
        else:
            def scat(c_b, new_b, st, vl):
                return scatter_kv_chunk(c_b, new_b, st, vl, l=jnp.int32(0), t=t, s=s)

            k_l = jax.vmap(scat)(k_l, k.astype(k_l.dtype), start, valid)
            v_l = jax.vmap(scat)(v_l, v.astype(v_l.dtype), start, valid)

        if attn_impl == "pallas":
            from hip_llama_tpu.ops.attention import attention_prefill_pallas

            att = attention_prefill_pallas(
                q, k_l, v_l, jnp.int32(0), start, valid, None, None
            ).reshape(b, t, c.dim).astype(x.dtype)
        else:
            kc = k_l[:, 0]
            vc = v_l[:, 0]
            kv_mul = c.n_heads // c.n_kv_heads
            qs = q.reshape(b, t, c.n_kv_heads, kv_mul, c.head_size)
            if jax.default_backend() == "cpu":
                kc = kc.astype(jnp.float32)
                vc = vc.astype(jnp.float32)
                qs = qs.astype(jnp.float32)
            scores = jnp.einsum(
                "btgmd,bgsd->btgms", qs, kc, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(c.head_size))
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t, 1, 1, s), 4)
            mask = s_idx <= pos[:, :, None, None, None]
            scores = jnp.where(mask, scores, -jnp.inf)
            att_p = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum(
                "btgms,bgsd->btgmd", att_p.astype(vc.dtype), vc,
                preferred_element_type=jnp.float32,
            )
            att = out.reshape(b, t, c.dim).astype(x.dtype)

        x = _mm_res(x, att, wo)
        h = _mm_norm_silu(x, rms_f, w13, c.hidden_dim, c.norm_eps)
        x = _mm_res(x, h, w2)
        return x, k_l, v_l

    @jax.jit
    def head_fn(x, rms_final, wcls):
        return _mm_norm(x, rms_final, wcls, c.norm_eps).astype(jnp.float32)

    def prefill(hp: HostParams, cache, tokens, start, valid):
        x = _embed_host(hp, jnp.asarray(tokens), dtype)
        start_d = jnp.asarray(start)
        valid_d = jnp.asarray(valid)
        n_layers = len(hp.layers)
        next_w = _put_layer(hp.layers[0])
        if kv_host:
            k_host, v_host = cache
            for l in range(n_layers):
                wl = next_w
                k_l = jax.device_put(k_host[:, l : l + 1])
                v_l = jax.device_put(v_host[:, l : l + 1])
                if l + 1 < n_layers:
                    next_w = _put_layer(hp.layers[l + 1])
                x, k_l, v_l = layer_prefill(x, wl, k_l, v_l, start_d, valid_d)
                k_host[:, l : l + 1] = np.asarray(k_l)
                v_host[:, l : l + 1] = np.asarray(v_l)
            logits = head_fn(x, hp.rms_final, hp.wcls)
            return np.asarray(logits), (k_host, v_host)
        new_cache = []
        for l in range(n_layers):
            wl = next_w
            if l + 1 < n_layers:
                next_w = _put_layer(hp.layers[l + 1])
            k_l, v_l = cache[l]
            x, k_l, v_l = layer_prefill(x, wl, k_l, v_l, start_d, valid_d)
            new_cache.append((k_l, v_l))
        logits = head_fn(x, hp.rms_final, hp.wcls)
        return np.asarray(logits), new_cache

    return prefill


def init_layer_kv(cfg: ModelConfig, batch: int, seq_len: int | None = None,
                  dtype=jnp.bfloat16):
    """Per-layer device KV buffers for the streaming step: a list of
    (k_l, v_l) (B, 1, KVH, S, HS) arrays that donate through layer_fn.
    (The singleton layer axis lets the shared cache writers / attention
    kernels address them as 1-layer caches.)"""
    s = seq_len or cfg.seq_len
    shape = (batch, 1, cfg.n_kv_heads, s, cfg.head_size)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_layers)
    ]


def init_host_kv(cfg: ModelConfig, batch: int, seq_len: int | None = None,
                 dtype=np.float32):
    s = seq_len or cfg.seq_len
    shape = (batch, cfg.n_layers, cfg.n_kv_heads, s, cfg.head_size)
    return np.zeros(shape, dtype), np.zeros(shape, dtype)


def make_streaming_engine_fns(cfg: ModelConfig, *, dtype=jnp.bfloat16,
                              kv_host: bool = False, seq_len: int | None = None,
                              attn_impl: str | None = None):
    """(step, prefill, cache_factory) for InferenceEngine(host_step=...):
    plugs weight streaming into the continuous-batching scheduler — the
    batched version of the reference's test_70B corpus mode
    (llama.cpp:1085-1278, which forced batch=1 at :1099)."""
    step = make_streaming_decode_step(cfg, dtype=dtype, kv_host=kv_host)
    prefill = make_streaming_prefill(cfg, dtype=dtype, kv_host=kv_host,
                                     attn_impl=attn_impl)

    def cache_factory(batch: int):
        if kv_host:
            return init_host_kv(cfg, batch, seq_len=seq_len)
        return init_layer_kv(cfg, batch, seq_len=seq_len, dtype=dtype)

    return step, prefill, cache_factory


def generate_streaming(
    cfg: ModelConfig,
    hp: HostParams,
    tokenizer,
    sampler,
    prompt: str | None,
    steps: int,
    kv_host: bool = False,
    dtype=jnp.bfloat16,
    echo: bool = False,
):
    """Single-prompt generation through the streaming step — the engine-side
    counterpart of the reference's test_70B scheduler (llama.cpp:1085-1278,
    forced batch=1 at :1099)."""
    from hip_llama_tpu.tokenizer import BOS_ID, printable_piece

    steps = min(steps, cfg.seq_len)  # OOB scatter writes would silently
    # drop KV rows past the window (JAX clamps), freezing attention history
    step = make_streaming_decode_step(cfg, dtype=dtype, kv_host=kv_host)
    if kv_host:
        cache = init_host_kv(cfg, 1)  # host KV stays fp32 (runq keeps KV fp32)
    else:
        cache = init_layer_kv(cfg, 1, dtype=dtype)

    prompt_tokens = tokenizer.encode(prompt or "", bos=True, eos=False)
    token = prompt_tokens[0]
    pos = 0
    pieces = []
    while pos < steps:
        logits, cache = step(
            hp, cache, np.asarray([token], np.int32), np.asarray([pos], np.int32)
        )
        if pos < len(prompt_tokens) - 1:
            nxt = prompt_tokens[pos + 1]
        else:
            nxt = sampler.sample(logits[0])
        pos += 1
        if nxt == BOS_ID:
            break
        piece = printable_piece(tokenizer.decode_piece(token, nxt))
        if echo and piece:
            print(piece.decode("utf-8", errors="replace"), end="", flush=True)
        pieces.append(piece)
        token = nxt
    return b"".join(pieces).decode("utf-8", errors="replace")
