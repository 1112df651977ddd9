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
from hip_llama_tpu.io.checkpoint import (
    LlamaWeights,
    QuantTensor,
    QuantWeights,
    q4_group_size,
)
from hip_llama_tpu.ops.quant import QTensor, q8_quantize_weights


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


class QuantLlamaParams(NamedTuple):
    """Q8_0 weight-only param pytree: the TPU-native runq engine
    (reference: runq.c int8 grouped matmul, :317-342). All big matmul
    weights are QTensors in (K, N) matmul orientation; norms stay fp32
    (runq.c:383) and the embedding stays int8 with per-row-group scales,
    dequantized per gathered token (runq.c:360-364)."""

    tok_emb_q: jax.Array  # (V, D) int8
    tok_emb_s: jax.Array  # (V, D//gs) f32
    rms_att: jax.Array  # (L, D) f32
    wq: QTensor  # (L, D, D)
    wk: QTensor  # (L, D, KV)
    wv: QTensor  # (L, D, KV)
    wo: QTensor  # (L, D, D)
    rms_ffn: jax.Array
    w1: QTensor  # (L, D, H)
    w2: QTensor  # (L, H, D)
    w3: QTensor  # (L, D, H)
    rms_final: jax.Array  # (D,) f32
    wcls: QTensor  # (D, V)

    @property
    def group_size(self) -> int:
        return self.tok_emb_q.shape[1] // self.tok_emb_s.shape[1]

    @property
    def tok_emb(self) -> jax.Array:
        """Dequantized embedding table view (test/debug only — the hot path
        gathers rows and dequantizes per token)."""
        gs = self.group_size
        v, d = self.tok_emb_q.shape
        g = self.tok_emb_q.astype(jnp.float32).reshape(v, d // gs, gs)
        return (g * self.tok_emb_s[..., None]).reshape(v, d)


def _qt_transpose(t: QuantTensor, out_dim: int, in_dim: int, gs: int) -> QTensor:
    """Checkpoint QuantTensor (out, in) row-major, groups along `in`
    (export.py:46-70) -> matmul-oriented QTensor q (in, out), s (in//gs, out).
    The group structure transposes exactly: no requantization, the v2 file
    loads LOSSLESSLY (bit-identical int8 payload)."""
    q = np.ascontiguousarray(t.q.reshape(out_dim, in_dim).T)
    s = np.ascontiguousarray(t.s.reshape(out_dim, in_dim // gs).T)
    return QTensor(q=jnp.asarray(q), s=jnp.asarray(s, jnp.float32))


def _qt_stack(tensors, out_dim: int, in_dim: int, gs: int) -> QTensor:
    qs = [_qt_transpose(t, out_dim, in_dim, gs) for t in tensors]
    return QTensor(
        q=jnp.stack([t.q for t in qs]), s=jnp.stack([t.s for t in qs])
    )


def fuse_stacked_quant_params(qp: QuantLlamaParams) -> QuantLlamaParams:
    """Concatenate Q/K/V (and W1/W3) along N while KEEPING the stacked
    (L, K, N) layout — the layout for the layered-kernel decode path
    (models/llama.py stacked-fused branch): weights stay single HBM arrays
    addressed by the kernel's scalar-prefetched layer index. Groups run
    along K, so the fused quantization is bit-identical. wk/wv/w3 become
    empty tuples (the branch marker)."""

    def cat(*ts: QTensor) -> QTensor:
        # type(t) so Q4Tensors (ops/quant4.py) keep their type: the group
        # structure runs along K for both, so concatenation along N is
        # bit-identical for either
        return type(ts[0])(
            q=jnp.concatenate([t.q for t in ts], axis=-1),
            s=jnp.concatenate([t.s for t in ts], axis=-1),
        )

    return qp._replace(
        wq=cat(qp.wq, qp.wk, qp.wv), wk=(), wv=(),
        w1=cat(qp.w1, qp.w3), w3=(),
        rms_att=jnp.asarray(qp.rms_att, jnp.float32),
        rms_ffn=jnp.asarray(qp.rms_ffn, jnp.float32),
    )


def unstack_quant_params(qp: QuantLlamaParams, fuse: bool = True) -> QuantLlamaParams:
    """Convert stacked (L, K, N) weight QTensors into per-layer tuples of
    2-D QTensors (each layer its own buffer).

    Inside the decode step this selects the 'unrolled' layer loop: every
    pallas matmul reads its weight buffer directly, with NO per-layer
    dynamic-slice (a sliced operand feeding a pallas_call is a real copy —
    the scan path re-reads+writes the full weight set every step).

    With fuse=True, Q/K/V concatenate along N into one matmul per layer and
    W1/W3 likewise (7 -> 4 kernel launches per layer; groups run along K so
    the quantization is bit-identical). The step splits the outputs. Fused
    weights are stored in `wq` / `w1`; `wk`/`wv`/`w3` become empty tuples.

    The norm weights also become per-layer (D,) tuples: a row sliced from
    the stacked (L, D) array is strided in the T(8,128) tiling, so XLA
    re-copies all ~2L+1 norm vectors to linear layouts EVERY step (~21 us
    each on the decode critical path, 1.3 ms/step at 7B — measured with
    tools/profile_step.py); standalone vectors are already linear."""

    def unstack(t: QTensor):
        n_layers = t.q.shape[0]
        return tuple(
            type(t)(q=t.q[l], s=t.s[l]) for l in range(n_layers)
        )

    def unstack_rms(a):
        return tuple(jnp.asarray(a[l]) for l in range(a.shape[0]))

    if not fuse:
        return qp._replace(
            wq=unstack(qp.wq), wk=unstack(qp.wk), wv=unstack(qp.wv),
            wo=unstack(qp.wo), w1=unstack(qp.w1), w2=unstack(qp.w2),
            w3=unstack(qp.w3),
            rms_att=unstack_rms(qp.rms_att), rms_ffn=unstack_rms(qp.rms_ffn),
        )

    n_layers = qp.wq.q.shape[0]

    def cat(*ts: QTensor, l: int) -> QTensor:
        return type(ts[0])(
            q=jnp.concatenate([t.q[l] for t in ts], axis=-1),
            s=jnp.concatenate([t.s[l] for t in ts], axis=-1),
        )

    wqkv = tuple(cat(qp.wq, qp.wk, qp.wv, l=l) for l in range(n_layers))
    w13 = tuple(cat(qp.w1, qp.w3, l=l) for l in range(n_layers))
    return qp._replace(
        wq=wqkv, wk=(), wv=(),
        wo=unstack(qp.wo),
        w1=w13, w3=(),
        w2=unstack(qp.w2),
        rms_att=unstack_rms(qp.rms_att), rms_ffn=unstack_rms(qp.rms_ffn),
    )


def pad_kv_head_params(qp: QuantLlamaParams, cfg: ModelConfig) -> QuantLlamaParams:
    """Zero-pad the per-layer fused-QKV weights' q/k/v head blocks (columns)
    and wo's input rows up to the 8-aligned stored KV-head count
    (models/llama.py::kvh_storage), so an int8-KV padded cache costs ZERO
    per-step ops: the QKV kernel emits already-padded head rows, the
    attention kernels consume/produce the stored head count natively, and
    wo eats the padded attention output directly. Without this transform
    the decode step pads/slices at runtime (~6 extra XLA ops/layer — a
    measured 29% throughput hit on dispatch-bound stories110M, r5).

    Only applies to the unrolled FUSED layout (wq = per-layer fused QKV
    QTensors, wk/wv empty); anything else is returned unchanged. Padded
    weight columns/rows are zeros with scale 1, so emitted pad head rows
    are exact zeros and contribute nothing through wo."""
    from hip_llama_tpu.models.llama import kvh_storage

    kvh = cfg.n_kv_heads
    kvh_c = kvh_storage(kvh, True)
    hs = cfg.head_size
    gs = cfg.group_size or 64
    kv_mul = cfg.n_heads // kvh
    pad = kvh_c - kvh
    if pad == 0:
        return qp
    if not (
        isinstance(qp.wq, tuple) and qp.wq and isinstance(qp.wk, tuple)
        and len(qp.wk) == 0 and isinstance(qp.wq[0], QTensor)
        and isinstance(qp.wo, tuple) and isinstance(qp.wo[0], QTensor)
    ):
        return qp  # not the unrolled fused q8 layout
    if (pad * hs * kv_mul) % gs or (pad * hs) % gs:
        return qp  # pad blocks must stay group-aligned
    d, nqkv = qp.wq[0].q.shape
    if nqkv != (kv_mul * kvh + 2 * kvh) * hs or qp.wo[0].q.shape != (d, d):
        return qp

    h, kvd = kv_mul * kvh * hs, kvh * hs
    padq, padkv = pad * kv_mul * hs, pad * hs

    def pad_cols(t: QTensor) -> QTensor:
        # [q | k | v] -> [q | 0 | k | 0 | v | 0]
        def ins(arr, fill):
            qb, kb, vb = (arr[:, :h], arr[:, h:h + kvd], arr[:, h + kvd:])
            z = jnp.full((arr.shape[0], padq), fill, arr.dtype)
            zkv = jnp.full((arr.shape[0], padkv), fill, arr.dtype)
            return jnp.concatenate([qb, z, kb, zkv, vb, zkv], axis=1)

        return QTensor(q=ins(t.q, 0), s=ins(t.s, 1.0))

    def pad_rows(t: QTensor) -> QTensor:
        # extra input rows for the pad q heads' (zero) attention outputs
        zq = jnp.zeros((padq, t.q.shape[1]), t.q.dtype)
        zs = jnp.ones((padq // gs, t.s.shape[1]), t.s.dtype)
        return QTensor(
            q=jnp.concatenate([t.q, zq], axis=0),
            s=jnp.concatenate([t.s, zs], axis=0),
        )

    return qp._replace(
        wq=tuple(pad_cols(t) for t in qp.wq),
        wo=tuple(pad_rows(t) for t in qp.wo),
    )


def qparams_from_quant_weights(cfg: ModelConfig, qw: QuantWeights) -> QuantLlamaParams:
    """Load a v2 Q8_0 checkpoint straight into the fused-int8 path."""
    gs = cfg.group_size
    assert gs is not None
    c = cfg
    emb_q = jnp.asarray(qw.q_tokens.q.reshape(c.vocab_size, c.dim))
    emb_s = jnp.asarray(
        qw.q_tokens.s.reshape(c.vocab_size, c.dim // gs), jnp.float32
    )
    wcls = _qt_transpose(qw.wcls, c.vocab_size, c.dim, gs)
    return QuantLlamaParams(
        tok_emb_q=emb_q,
        tok_emb_s=emb_s,
        rms_att=jnp.asarray(qw.rms_att, jnp.float32),
        wq=_qt_stack(qw.wq, c.dim, c.dim, gs),
        wk=_qt_stack(qw.wk, c.kv_dim, c.dim, gs),
        wv=_qt_stack(qw.wv, c.kv_dim, c.dim, gs),
        wo=_qt_stack(qw.wo, c.dim, c.dim, gs),
        rms_ffn=jnp.asarray(qw.rms_ffn, jnp.float32),
        w1=_qt_stack(qw.w1, c.hidden_dim, c.dim, gs),
        w2=_qt_stack(qw.w2, c.dim, c.hidden_dim, gs),
        w3=_qt_stack(qw.w3, c.hidden_dim, c.dim, gs),
        rms_final=jnp.asarray(qw.rms_final, jnp.float32),
        wcls=wcls,
    )


def quantize_params_q8(
    cfg: ModelConfig, w: LlamaWeights, group_size: int = 64
) -> QuantLlamaParams:
    """Quantize fp32 checkpoint weights to the Q8_0 path on the fly
    (what `export.py 2` does offline — train/export.py:182-260)."""
    gs = group_size
    c = cfg

    def qt(arr: np.ndarray) -> QTensor:
        a = np.asarray(arr, np.float32)
        a = np.swapaxes(a, -1, -2)  # (…, out, in) -> (…, in, out)
        return q8_quantize_weights(jnp.asarray(a), gs)

    emb = np.asarray(w.tok_emb, np.float32)  # (V, D), groups along D
    v, d = emb.shape
    g = emb.reshape(v, d // gs, gs)
    absmax = np.abs(g).max(axis=-1)
    s = absmax / 127.0
    s_safe = np.where(s == 0, 1.0, s)
    q = np.round(g / s_safe[..., None]).astype(np.int8).reshape(v, d)

    return QuantLlamaParams(
        tok_emb_q=jnp.asarray(q),
        tok_emb_s=jnp.asarray(s, jnp.float32),
        rms_att=jnp.asarray(w.rms_att, jnp.float32),
        wq=qt(w.wq),
        wk=qt(w.wk),
        wv=qt(w.wv),
        wo=qt(w.wo),
        rms_ffn=jnp.asarray(w.rms_ffn, jnp.float32),
        w1=qt(w.w1),
        w2=qt(w.w2),
        w3=qt(w.w3),
        rms_final=jnp.asarray(w.rms_final, jnp.float32),
        wcls=qt(w.wcls),
    )


def qparams_from_q4_weights(cfg: ModelConfig, w4) -> QuantLlamaParams:
    """Load a v4 int4 checkpoint (io/checkpoint.py::read_v4) straight into
    the fused-int4 kernel path — the file stores the packed matmul-oriented
    layout, so this is pure zero-copy device_put (bit-lossless)."""
    from hip_llama_tpu.ops.quant4 import Q4Tensor

    def qt(t) -> Q4Tensor:
        return Q4Tensor(q=jnp.asarray(t.q), s=jnp.asarray(t.s, jnp.float32))

    return QuantLlamaParams(
        tok_emb_q=jnp.asarray(w4.emb_q),
        tok_emb_s=jnp.asarray(w4.emb_s, jnp.float32),
        rms_att=jnp.asarray(w4.rms_att, jnp.float32),
        wq=qt(w4.wq), wk=qt(w4.wk), wv=qt(w4.wv), wo=qt(w4.wo),
        rms_ffn=jnp.asarray(w4.rms_ffn, jnp.float32),
        w1=qt(w4.w1), w2=qt(w4.w2), w3=qt(w4.w3),
        rms_final=jnp.asarray(w4.rms_final, jnp.float32),
        wcls=qt(w4.wcls),
    )


def params_from_q4_dequant(cfg: ModelConfig, w4, dtype=jnp.float32) -> LlamaParams:
    """Dequantize a v4 checkpoint into dense params (correctness/debug path,
    the analog of params_from_quant_dequant)."""
    from hip_llama_tpu.ops.quant4 import Q4Tensor, q4_dequantize

    def dq(t) -> jax.Array:
        return jnp.asarray(
            q4_dequantize(Q4Tensor(q=jnp.asarray(t.q), s=jnp.asarray(t.s))),
            dtype,
        )

    egs = w4.emb_q.shape[1] // w4.emb_s.shape[1]
    v, d = w4.emb_q.shape
    emb = (
        w4.emb_q.astype(np.float32).reshape(v, d // egs, egs)
        * w4.emb_s[..., None]
    ).reshape(v, d)
    return LlamaParams(
        tok_emb=jnp.asarray(emb, dtype),
        rms_att=jnp.asarray(w4.rms_att, dtype),
        wq=dq(w4.wq), wk=dq(w4.wk), wv=dq(w4.wv), wo=dq(w4.wo),
        rms_ffn=jnp.asarray(w4.rms_ffn, dtype),
        w1=dq(w4.w1), w2=dq(w4.w2), w3=dq(w4.w3),
        rms_final=jnp.asarray(w4.rms_final, dtype),
        wcls=dq(w4.wcls),
    )


def quantize_params_q4(
    cfg: ModelConfig, w: LlamaWeights, group_size: int = 32
) -> QuantLlamaParams:
    """Quantize fp32 checkpoint weights to the int4 path (BEYOND reference —
    runq.c stops at Q8_0). Matmul weights become Q4Tensors (ops/quant4.py,
    symmetric absmax/7 per group along K, half-split nibble packing); the
    embedding table stays Q8_0 int8 (negligible traffic — one row gather per
    token — and quality-sensitive), norms stay fp32 (runq.c:383)."""
    from hip_llama_tpu.ops.quant4 import q4_quantize_weights

    gs = group_size
    c = cfg

    def qt(arr: np.ndarray):
        a = np.asarray(arr, np.float32)
        a = np.swapaxes(a, -1, -2)  # (…, out, in) -> (…, in, out)
        k = a.shape[-2]
        # shared with the checkpoint layout (io/checkpoint.py): awkward tiny
        # dims shrink the group to a divisor of K/2
        return q4_quantize_weights(jnp.asarray(a), q4_group_size(k, gs))

    # embedding: Q8_0 per-row groups, same as quantize_params_q8
    egs = 64
    emb = np.asarray(w.tok_emb, np.float32)
    v, d = emb.shape
    g = emb.reshape(v, d // egs, egs)
    absmax = np.abs(g).max(axis=-1)
    s = absmax / 127.0
    s_safe = np.where(s == 0, 1.0, s)
    q = np.round(g / s_safe[..., None]).astype(np.int8).reshape(v, d)

    return QuantLlamaParams(
        tok_emb_q=jnp.asarray(q),
        tok_emb_s=jnp.asarray(s, jnp.float32),
        rms_att=jnp.asarray(w.rms_att, jnp.float32),
        wq=qt(w.wq),
        wk=qt(w.wk),
        wv=qt(w.wv),
        wo=qt(w.wo),
        rms_ffn=jnp.asarray(w.rms_ffn, jnp.float32),
        w1=qt(w.w1),
        w2=qt(w.w2),
        w3=qt(w.w3),
        rms_final=jnp.asarray(w.rms_final, jnp.float32),
        wcls=qt(w.wcls),
    )


def dense_weights_from_quant(cfg: ModelConfig, qw: QuantWeights) -> LlamaWeights:
    """Dequantize a v2 Q8_0 checkpoint to dense fp32 LlamaWeights ON HOST
    (numpy, file orientation) — re-export and other host-side consumers need
    no device round-trip (a 7B fp32 model does not fit a 16 GB chip)."""
    gs = cfg.group_size
    assert gs is not None

    def dq_stack(tensors) -> np.ndarray:
        return np.stack([t.dequantize(gs) for t in tensors])

    tok_emb = qw.q_tokens.dequantize(gs)
    wcls = tok_emb if cfg.shared_classifier else qw.wcls.dequantize(gs)
    return LlamaWeights(
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


def params_from_quant_dequant(
    cfg: ModelConfig, qw: QuantWeights, dtype=jnp.float32
) -> LlamaParams:
    """Dequantize a v2 Q8_0 checkpoint into dense params (correctness path;
    the fused int8 kernel path lives in ops/quant.py)."""
    return params_from_weights(dense_weights_from_quant(cfg, qw), dtype=dtype)


def dense_weights_from_q4(cfg: ModelConfig, w4) -> LlamaWeights:
    """Dequantize a v4 int4 checkpoint to dense fp32 LlamaWeights ON HOST
    (numpy, file (out, in) orientation)."""

    def dq(t) -> np.ndarray:
        q = np.asarray(t.q).astype(np.int32)
        lo = (q & 15) - 8
        hi = ((q >> 4) & 15) - 8
        codes = np.concatenate([lo, hi], axis=-2).astype(np.float32)
        k, n = codes.shape[-2], codes.shape[-1]
        g = t.s.shape[-2]
        w = codes.reshape(*codes.shape[:-2], g, k // g, n) * np.asarray(
            t.s, np.float32
        )[..., :, None, :]
        return np.swapaxes(w.reshape(*codes.shape), -1, -2)

    egs = w4.emb_q.shape[1] // w4.emb_s.shape[1]
    v, d = w4.emb_q.shape
    emb = (
        w4.emb_q.astype(np.float32).reshape(v, d // egs, egs)
        * w4.emb_s[..., None]
    ).reshape(v, d)
    return LlamaWeights(
        tok_emb=emb,
        rms_att=np.asarray(w4.rms_att, np.float32),
        wq=dq(w4.wq), wk=dq(w4.wk), wv=dq(w4.wv), wo=dq(w4.wo),
        rms_ffn=np.asarray(w4.rms_ffn, np.float32),
        w1=dq(w4.w1), w2=dq(w4.w2), w3=dq(w4.w3),
        rms_final=np.asarray(w4.rms_final, np.float32),
        wcls=dq(w4.wcls),
    )
