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
from hip_llama_tpu.io.checkpoint import LlamaWeights
from hip_llama_tpu.models.llama import attention_decode_xla, rmsnorm, rope


@dataclasses.dataclass
class HostLayer:
    """One layer's weights as host (numpy / mmap view) arrays, already in
    matmul orientation (in, out)."""

    rms_att: np.ndarray
    wq: np.ndarray
    wk: np.ndarray
    wv: np.ndarray
    wo: np.ndarray
    rms_ffn: np.ndarray
    w1: np.ndarray
    w2: np.ndarray
    w3: np.ndarray

    def tree(self):
        return (
            self.rms_att, self.wq, self.wk, self.wv, self.wo,
            self.rms_ffn, self.w1, self.w2, self.w3,
        )


@dataclasses.dataclass
class HostParams:
    layers: list[HostLayer]
    tok_emb: Any  # device (V, D) — needed every step
    rms_final: Any
    wcls: Any  # device (D, V)


def host_params_from_weights(w: LlamaWeights, dtype=jnp.bfloat16) -> HostParams:
    """Split checkpoint weights into per-layer host views + device-resident
    top-level tensors (embedding/classifier stay on device: they're touched
    every step and are small relative to the layer stack)."""

    np_dt = np.dtype(dtype)

    def t(x):  # (out, in) -> (in, out), pre-cast to the compute dtype so
        # the per-layer H2D stream moves half the fp32 bytes (the transfer
        # is the whole critical path of streaming decode)
        return np.ascontiguousarray(
            np.swapaxes(np.asarray(x), -1, -2)
        ).astype(np_dt)

    layers = [
        HostLayer(
            rms_att=np.asarray(w.rms_att[l]),
            wq=t(w.wq[l]), wk=t(w.wk[l]), wv=t(w.wv[l]), wo=t(w.wo[l]),
            rms_ffn=np.asarray(w.rms_ffn[l]),
            w1=t(w.w1[l]), w2=t(w.w2[l]), w3=t(w.w3[l]),
        )
        for l in range(w.wq.shape[0])
    ]
    return HostParams(
        layers=layers,
        tok_emb=jnp.asarray(w.tok_emb, dtype),
        rms_final=jnp.asarray(w.rms_final, jnp.float32),
        wcls=jnp.asarray(np.asarray(w.wcls).T, dtype),
    )


def make_streaming_decode_step(cfg: ModelConfig, dtype=jnp.bfloat16, kv_host: bool = False):
    """Returns step(host_params, cache, tokens (B,), pos (B,)) ->
    (logits (B, V) np, cache).

    cache: a LIST of per-layer (k_l, v_l) device arrays (B, KVH, S, HS) —
    per-layer buffers donate through layer_fn for true in-place updates (a
    stacked KVCache cost a whole-cache copy + transient 2x alloc per token)
    — or (k_host, v_host) numpy (B, L, KVH, S, HS) when kv_host=True (the
    70B mode: device holds one layer of KV at a time, models.cpp:715-744)."""
    c = cfg

    @jax.jit
    def embed(tok_emb, tokens):
        return tok_emb[tokens].astype(dtype)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def layer_fn(x, wl, k_layer, v_layer, pos):
        rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = wl
        b = x.shape[0]
        xb = rmsnorm(x, rms_a, c.norm_eps)
        q = (xb @ wq).reshape(b, c.n_heads, c.head_size)
        k = (xb @ wk).reshape(b, c.n_kv_heads, c.head_size)
        v = (xb @ wv).reshape(b, c.n_kv_heads, c.head_size)
        q = rope(q, pos, c.rope_theta)
        k = rope(k, pos, c.rope_theta)
        att = attention_decode_xla(
            q, k_layer[:, None], v_layer[:, None], jnp.int32(0), pos, k, v
        ).reshape(b, c.dim)
        x = x + att @ wo
        xb = rmsnorm(x, rms_f, c.norm_eps)
        h = jax.nn.silu(xb @ w1) * (xb @ w3)
        x = x + h @ w2
        # write the current row into the layer cache
        bidx = jnp.arange(b)
        k_layer = k_layer.at[bidx, :, pos].set(k.astype(k_layer.dtype))
        v_layer = v_layer.at[bidx, :, pos].set(v.astype(v_layer.dtype))
        return x, k_layer, v_layer

    @jax.jit
    def head_fn(x, rms_final, wcls):
        x = rmsnorm(x, rms_final, c.norm_eps)
        return (x @ wcls).astype(jnp.float32)

    def put_layer(hl: HostLayer):
        # async H2D of one layer's weights (the reference's 9-tensor copy,
        # thaDNN.cpp:123-131); host arrays are PRE-CAST to the compute dtype
        # (host_params_from_weights), so the transfer is half the fp32 bytes
        return tuple(jax.device_put(a) for a in hl.tree())

    def step(hp: HostParams, cache, tokens, pos):
        x = embed(hp.tok_emb, jnp.asarray(tokens))
        pos_d = jnp.asarray(pos)
        n_layers = len(hp.layers)
        next_w = put_layer(hp.layers[0])  # prefetch layer 0
        if kv_host:
            k_host, v_host = cache
            for l in range(n_layers):
                wl = next_w
                k_l = jax.device_put(k_host[:, l])
                v_l = jax.device_put(v_host[:, l])
                if l + 1 < n_layers:
                    next_w = put_layer(hp.layers[l + 1])  # overlap H2D
                x, k_l, v_l = layer_fn(x, wl, k_l, v_l, pos_d)
                k_host[:, l] = np.asarray(k_l)  # D2H writeback (thaDNN.cpp:176-177)
                v_host[:, l] = np.asarray(v_l)
            logits = head_fn(x, hp.rms_final, hp.wcls)
            return np.asarray(logits), (k_host, v_host)
        else:
            new_cache = []
            for l in range(n_layers):
                wl = next_w
                if l + 1 < n_layers:
                    next_w = put_layer(hp.layers[l + 1])
                k_l, v_l = cache[l]
                x, k_l, v_l = layer_fn(x, wl, k_l, v_l, pos_d)
                new_cache.append((k_l, v_l))
            logits = head_fn(x, hp.rms_final, hp.wcls)
            return np.asarray(logits), new_cache

    return step


def init_layer_kv(cfg: ModelConfig, batch: int, seq_len: int | None = None,
                  dtype=jnp.bfloat16):
    """Per-layer device KV buffers for the streaming step: a list of
    (k_l, v_l) (B, KVH, S, HS) arrays that donate through layer_fn."""
    s = seq_len or cfg.seq_len
    shape = (batch, cfg.n_kv_heads, s, cfg.head_size)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_layers)
    ]


def init_host_kv(cfg: ModelConfig, batch: int, seq_len: int | None = None, dtype=np.float32):
    s = seq_len or cfg.seq_len
    shape = (batch, cfg.n_layers, cfg.n_kv_heads, s, cfg.head_size)
    return np.zeros(shape, dtype), np.zeros(shape, dtype)


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
