"""Training-time Llama forward (no KV cache) + loss.

The JAX re-design of the reference's PyTorch training model
(reference: train/model.py — Transformer at :206, loss at :261-268,
precompute_freqs_cis at :41). Same architecture as the inference model
(models/llama.py), same param pytree (LlamaParams), so a trained state
exports straight into the llama2.c v0/v1/v2 formats and runs in the engine.

TPU notes: full causal attention as one einsum per layer (prefill-shaped,
MXU-dense); `jax.checkpoint` around each layer trades FLOPs for activation
memory so long-T batches fit HBM; scan over stacked layer params keeps
compile time flat.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import _act_dtype, _embed, _mm, rmsnorm, rope
from hip_llama_tpu.models.params import LlamaParams


def make_train_forward(cfg: ModelConfig, remat: bool = True, precision: str = "default",
                       act_dtype=None):
    """Returns forward(params, tokens (B, T)) -> logits fp32 (B, T, V).

    act_dtype: activation dtype (e.g. jnp.bfloat16 for AMP — params and the
    loss/grad math stay fp32); None keeps the param dtype (used by the
    fp32 parity oracles, tests/test_hf_import.py)."""
    c = cfg

    def layer_fn(x, xs, pos):
        rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = xs
        b, t, _ = x.shape
        xb = rmsnorm(x, rms_a, c.norm_eps)
        q = _mm(xb, wq).reshape(b, t, c.n_heads, c.head_size)
        k = _mm(xb, wk).reshape(b, t, c.n_kv_heads, c.head_size)
        v = _mm(xb, wv).reshape(b, t, c.n_kv_heads, c.head_size)
        q = rope(q, pos, c.rope_theta)
        k = rope(k, pos, c.rope_theta)
        kv_mul = c.n_heads // c.n_kv_heads
        qs = q.reshape(b, t, c.n_kv_heads, kv_mul, c.head_size)
        scores = jnp.einsum(
            "bqgmd,bkgd->bgmqk", qs, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(c.head_size))
        qi = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t, t), 3)
        ki = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t, t), 4)
        scores = jnp.where(ki <= qi, scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bgmqk,bkgd->bqgmd", att.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(b, t, c.dim).astype(x.dtype)
        x = x + _mm(out, wo)
        xb = rmsnorm(x, rms_f, c.norm_eps)
        h = jax.nn.silu(_mm(xb, w1)) * _mm(xb, w3)
        return x + _mm(h, w2)

    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=())

    def forward(params, tokens: jax.Array) -> jax.Array:
        with jax.default_matmul_precision(precision):
            b, t = tokens.shape
            x = _embed(params, tokens, act_dtype or _act_dtype(params))
            pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
            xs = (
                params.rms_att, params.wq, params.wk, params.wv, params.wo,
                params.rms_ffn, params.w1, params.w2, params.w3,
            )

            def body(carry, layer_xs):
                return layer_fn(carry, layer_xs, pos), None

            x, _ = lax.scan(body, x, xs)
            x = rmsnorm(x, params.rms_final, c.norm_eps)
            return _mm(x, params.wcls).astype(jnp.float32)

    return forward


def cross_entropy_loss(logits: jax.Array, targets: jax.Array, ignore_id: int = -1):
    """Mean next-token CE over non-ignored targets (train/model.py:261-268
    uses ignore_index=-1)."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    mask = targets != ignore_id
    tgt = jnp.where(mask, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    return nll.sum() / jnp.maximum(mask.sum(), 1)
