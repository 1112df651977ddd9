"""Parameter pytree for the JAX model.

Weights are transposed from the checkpoint's (out, in) row-major layout into
(in, out) so the hot path is `x @ W` — the natural MXU orientation. Per-layer
tensors are stacked on a leading layer axis for `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import LlamaWeights, QuantWeights


class LlamaParams(NamedTuple):
    tok_emb: jax.Array  # (V, D)
    rms_att: jax.Array  # (L, D)
    wq: jax.Array  # (L, D, D)        x @ wq
    wk: jax.Array  # (L, D, KV)
    wv: jax.Array  # (L, D, KV)
    wo: jax.Array  # (L, D, D)
    rms_ffn: jax.Array  # (L, D)
    w1: jax.Array  # (L, D, H)
    w2: jax.Array  # (L, H, D)
    w3: jax.Array  # (L, D, H)
    rms_final: jax.Array  # (D,)
    wcls: jax.Array  # (D, V)


def params_from_weights(
    w: LlamaWeights, dtype=jnp.float32, device=None
) -> LlamaParams:
    """Build the JAX param pytree from checkpoint-oriented numpy weights."""

    def put(x: np.ndarray, transpose_2d: bool) -> jax.Array:
        arr = np.asarray(x)
        if transpose_2d:
            if arr.ndim == 3:  # (L, out, in) -> (L, in, out)
                arr = np.swapaxes(arr, 1, 2)
            elif arr.ndim == 2:  # (out, in) -> (in, out)
                arr = arr.T
        arr = np.ascontiguousarray(arr)
        y = jnp.asarray(arr, dtype=dtype)
        if device is not None:
            y = jax.device_put(y, device)
        return y

    return LlamaParams(
        tok_emb=put(w.tok_emb, False),
        rms_att=put(w.rms_att, False),
        wq=put(w.wq, True),
        wk=put(w.wk, True),
        wv=put(w.wv, True),
        wo=put(w.wo, True),
        rms_ffn=put(w.rms_ffn, False),
        w1=put(w.w1, True),
        w2=put(w.w2, True),
        w3=put(w.w3, True),
        rms_final=put(w.rms_final, False),
        wcls=put(w.wcls, True),
    )


def params_from_quant_dequant(
    cfg: ModelConfig, qw: QuantWeights, dtype=jnp.float32
) -> LlamaParams:
    """Dequantize a v2 Q8_0 checkpoint into dense params (correctness path;
    the fused int8 kernel path lives in ops/quant.py)."""
    gs = cfg.group_size
    assert gs is not None

    def dq_stack(tensors) -> np.ndarray:
        return np.stack([t.dequantize(gs) for t in tensors])

    tok_emb = qw.q_tokens.dequantize(gs)
    wcls = tok_emb if cfg.shared_classifier else qw.wcls.dequantize(gs)
    w = LlamaWeights(
        tok_emb=tok_emb,
        rms_att=qw.rms_att,
        wq=dq_stack(qw.wq),
        wk=dq_stack(qw.wk),
        wv=dq_stack(qw.wv),
        wo=dq_stack(qw.wo),
        rms_ffn=qw.rms_ffn,
        w1=dq_stack(qw.w1),
        w2=dq_stack(qw.w2),
        w3=dq_stack(qw.w3),
        rms_final=qw.rms_final,
        wcls=wcls,
    )
    return params_from_weights(w, dtype=dtype)
