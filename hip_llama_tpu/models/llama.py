"""Pure-functional JAX Llama-2 forward: one jitted decode step + chunked
prefill over a preallocated KV cache.

TPU-first design notes (vs the reference's per-op HIP kernel launches,
src/thaDNN.cpp:13-81):
- The whole token step is ONE traced function: XLA fuses rmsnorm/rope/swiglu
  into the surrounding matmuls; `lax.scan` over stacked layer params keeps
  compile time flat in n_layers.
- Fixed shapes everywhere: the batch is a fixed slot array and raggedness is
  expressed with a per-slot `pos` vector + masking — the jit-stable
  re-formulation of the reference's continuous batching (llama.cpp:968-1073).
- KV cache layout (B, L, KVH, S, HS) — batch-major so per-slot updates are
  windowed in-place writes (no carry layout-conversion copies in the layer
  loop), and head-major so one (head, S-block) slice is a CONTIGUOUS
  (block_k, head_size) matrix in HBM: the Pallas decode-attention kernel
  streams K/V tiles at full HBM bandwidth instead of 256-byte strided DMAs
  (the analog of the reference's fused KV-scatter GEMV, thaBLAS.cpp:191-228).
- Attention is pluggable: "xla" (this file) or "pallas" (ops/attention.py).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.params import LlamaParams, QuantLlamaParams
from hip_llama_tpu.ops.quant import QTensor, q8_matmul
from hip_llama_tpu.ops.quant4 import Q4Tensor


class KVCache(NamedTuple):
    k: jax.Array  # (B, L, KVH, S, HS)
    v: jax.Array  # (B, L, KVH, S, HS)
    # int8 KV mode: k/v hold int8 rows and these hold one fp32 scale per
    # cached row (B, L, KVH, S) — absmax/127 over the head dim. Halves the
    # decode-attention HBM traffic vs bf16.
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @property
    def batch(self) -> int:
        return self.k.shape[0]

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def kvh_storage(kvh: int, quantized: bool) -> int:
    """KV-head count as STORED in the cache. int8 caches pad the head dim
    up to a multiple of 8: the (B, L, KVH, S) fp32 scale plane has KVH as
    its second-minor dim, and Mosaic rejects HBM window DMAs across a
    tiling-padded second-minor (kvh=12 — stories110M — previously forced
    the whole int8-KV decode path onto XLA fallbacks; VERDICT r4 weak #7).
    Padded head rows hold zeros with scale 1 and are sliced away / masked
    at every consumer. HIPLLAMA_KVH_PAD=0 restores the unpadded layout
    (XLA-fallback attention) for A/Bs."""
    if os.environ.get("HIPLLAMA_KVH_PAD", "1") == "0":
        return kvh
    return -(-kvh // 8) * 8 if quantized and kvh % 8 else kvh


def init_kv_cache(
    cfg: ModelConfig,
    batch: int,
    dtype=jnp.float32,
    seq_len: int | None = None,
    quantized: bool = False,
    pad: bool | None = None,
) -> KVCache:
    """pad=False forces the unpadded head layout — for shard_map consumers
    (tp/sp custom steps) whose local head math derives from cfg, not from
    the stored cache shape."""
    s = seq_len or cfg.seq_len
    kvh = (
        cfg.n_kv_heads if pad is False
        else kvh_storage(cfg.n_kv_heads, quantized)
    )
    shape = (batch, cfg.n_layers, kvh, s, cfg.head_size)
    if quantized:
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.ones(shape[:-1], jnp.float32),
            jnp.ones(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _pad_kv_heads(arr: jax.Array, kvh_c: int, axis: int) -> jax.Array:
    """Zero-pad the KV-head axis up to the cache's stored head count."""
    pad = kvh_c - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


# ---------------------------------------------------------------------------
# building blocks


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Always computed in fp32 (reference keeps norms fp32 even in the int8
    engine, runq.c:383)."""
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(ss + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul dispatch: dense `x @ W`, fused int8 dequant+matmul for Q8_0
    QTensors (the TPU analog of runq.c:317-342 — int8 is the only weight HBM
    traffic), or fused int4 for Q4Tensors (ops/quant4.py, beyond reference)."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        y = q8_matmul(x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype)
        return y.reshape(*lead, y.shape[-1])
    if isinstance(w, Q4Tensor):
        from hip_llama_tpu.ops.quant4 import q4_matmul

        lead = x.shape[:-1]
        y = q4_matmul(x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype)
        return y.reshape(*lead, y.shape[-1])
    return x @ w


def _mm_res(res: jax.Array, x: jax.Array, w) -> jax.Array:
    """res + x @ w with the residual add fused into the quantized kernels'
    epilogue (fp32 accumulator add; saves one XLA op dispatch per call —
    2/layer in the decode step). Dense weights keep the XLA add (fused by
    XLA anyway)."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        y = q8_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=res.dtype,
            residual=res.reshape(-1, res.shape[-1]),
        )
        return y.reshape(*lead, y.shape[-1])
    if isinstance(w, Q4Tensor):
        from hip_llama_tpu.ops.quant4 import q4_matmul

        lead = x.shape[:-1]
        y = q4_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=res.dtype,
            residual=res.reshape(-1, res.shape[-1]),
        )
        return y.reshape(*lead, y.shape[-1])
    return res + _mm(x, w)


def _mm_norm(x: jax.Array, g: jax.Array, w, eps: float) -> jax.Array:
    """rmsnorm(x, g) @ w with the norm fused into the q8 kernel prologue.

    For QTensor weights the norm weight becomes a kernel operand riding the
    pipelined VMEM fetch — standalone per-layer norm ops each stall ~21 us
    on an HBM->VMEM copy of the (D,) weight (1.4 ms/step at 7B, measured).
    Dense weights keep the XLA-fused rmsnorm."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        y = q8_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps,
        )
        return y.reshape(*lead, y.shape[-1])
    if isinstance(w, Q4Tensor):
        from hip_llama_tpu.ops.quant4 import q4_matmul

        lead = x.shape[:-1]
        y = q4_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps,
        )
        return y.reshape(*lead, y.shape[-1])
    return _mm(rmsnorm(x, g, eps), w)


def _mm_norm_rope(x: jax.Array, g: jax.Array, w, eps: float, pos: jax.Array,
                  rot_limit: int, head_size: int, theta: float,
                  out_heads: bool = False) -> jax.Array:
    """rmsnorm(x, g) @ w with RoPE applied to the first `rot_limit` output
    columns (the q|k segments of a QKV projection, head-aligned).

    For QTensor weights ALL THREE stages fuse into one kernel (norm
    prologue, int8 dequant matmul, rope epilogue on the fp32 accumulator) —
    the decode step's 2 standalone rope ops per layer disappear. Other
    weight types project then rotate via rope().

    `out_heads=True` returns the head-split (..., N//head_size, head_size)
    layout (relayout fused into the q8 kernel epilogue when shapes allow;
    one XLA reshape otherwise) — what attention_decode_fused consumes."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        y = q8_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps, rope_pos=pos.reshape(-1),
            rope_limit=rot_limit, rope_head=head_size, rope_theta=theta,
            out_heads=head_size if out_heads else 0,
        )
        if out_heads:
            return y.reshape(*lead, *y.shape[-2:])
        return y.reshape(*lead, y.shape[-1])
    if isinstance(w, Q4Tensor):
        from hip_llama_tpu.ops.quant4 import q4_matmul

        lead = x.shape[:-1]
        y = q4_matmul(
            x.reshape(-1, x.shape[-1]), w, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps, rope_pos=pos.reshape(-1),
            rope_limit=rot_limit, rope_head=head_size, rope_theta=theta,
        )
        if out_heads:
            return y.reshape(*lead, y.shape[-1] // head_size, head_size)
        return y.reshape(*lead, y.shape[-1])
    y = _mm_norm(x, g, w, eps)
    lead = y.shape[:-1]
    seg = rope(
        y[..., :rot_limit].reshape(*lead, rot_limit // head_size, head_size),
        pos, theta,
    ).reshape(*lead, rot_limit)
    if rot_limit != y.shape[-1]:
        seg = jnp.concatenate([seg, y[..., rot_limit:]], axis=-1)
    if out_heads:
        return seg.reshape(*lead, seg.shape[-1] // head_size, head_size)
    return seg


def _mm_norm_silu(x: jax.Array, g: jax.Array, w13, hidden: int, eps: float):
    """silu(rmsnorm(x, g) @ W1) * (rmsnorm(x, g) @ W3) with W1|W3 fused
    along N — one Q8 kernel, gate product on the fp32 accumulators
    (ops/quant.py::q8_matmul_silu); the (.., 2H) h13 intermediate and its
    slice/convert/multiply ops never materialize."""
    if isinstance(w13, QTensor):
        from hip_llama_tpu.ops.quant import q8_matmul_silu

        lead = x.shape[:-1]
        y = q8_matmul_silu(
            x.reshape(-1, x.shape[-1]), w13, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps,
        )
        return y.reshape(*lead, hidden)
    if isinstance(w13, Q4Tensor):
        from hip_llama_tpu.ops.quant4 import q4_matmul_silu

        lead = x.shape[:-1]
        y = q4_matmul_silu(
            x.reshape(-1, x.shape[-1]), w13, out_dtype=x.dtype,
            norm_weight=g, norm_eps=eps,
        )
        return y.reshape(*lead, hidden)
    h13 = _mm(rmsnorm(x, g, eps), w13)
    return jax.nn.silu(h13[..., :hidden]) * h13[..., hidden:]


_ENV_FFN_FUSE = os.environ.get("HIPLLAMA_Q8_FFN", "1") == "1"
# head-split QKV -> fused attention (q8_matmul out_heads +
# ops/attention.py::attention_decode_fused); HIPLLAMA_QKV_HEADS=0 reverts to
# flat QKV + per-layer slice/reshape ops
_ENV_QKV_HEADS = os.environ.get("HIPLLAMA_QKV_HEADS", "1") == "1"
# combined K+V(+scales) cache commit in one pallas call with in-kernel row
# quantization; HIPLLAMA_KV_COMMIT=0 reverts to the 4-kernel path
_ENV_KV_COMMIT = os.environ.get("HIPLLAMA_KV_COMMIT", "1") == "1"
# whole-layer fused decode kernel (QKV+attention+Wo+FFN in one pipeline,
# ops/layer_fused.py); HIPLLAMA_LAYER_FUSE=0 reverts to the 4-kernel layer.
# Gated to the default `reshape` dequant mode: the fused kernel implements
# reshape-dequant math only, so under HIPLLAMA_Q8_MODE=a8/repeat/bf16 it
# would silently mix numerics across layers (eligible layers reshape,
# ineligible ones the other mode). Note the HIPLLAMA_ATTN_BB/BLOCK_K/I8MXU
# knobs configure the STANDALONE attention kernel only — the fused layer
# kernel has its own defaults (bb=2, block_k=128, i8mxu on).
_ENV_LAYER_FUSE = (
    os.environ.get("HIPLLAMA_LAYER_FUSE", "1") == "1"
    and os.environ.get("HIPLLAMA_Q8_MODE", "reshape") == "reshape"
)
# prefill QKV head-split emission (see make_prefill): kills part of the
# ~9 GB/pass of relayout copies around the prefill attention kernel
# (BASELINE r4 HLO histogram). Needs block_m=256 + a 100 MB scoped-vmem
# limit in the out_heads kernel at prefill row counts (ops/quant.py).
# Bit-identical to the flat path; measured TTFT 569/571 vs 581/585 ms in
# back-to-back A/B/A (r4) — default ON since round 4.
_ENV_PREFILL_HEADS = os.environ.get("HIPLLAMA_PREFILL_HEADS", "1") == "1"
# wo consumes the T-major head-split attention output directly (see
# ops/quant.py q8_matmul_xheads); default from the round-5 on-chip A/B
_ENV_PREFILL_XHEADS = os.environ.get("HIPLLAMA_PREFILL_XHEADS", "0") == "1"


def _mm_res_heads(res: jax.Array, x4: jax.Array, w) -> jax.Array:
    """res + x4 @ w with x4 in the (B, T, NH, HS) head-split layout."""
    b, t, nh, hs = x4.shape
    if isinstance(w, QTensor):
        from hip_llama_tpu.ops.quant import q8_matmul_xheads

        y = q8_matmul_xheads(
            x4.reshape(b * t, nh, hs), w,
            residual=res.reshape(b * t, res.shape[-1]), out_dtype=res.dtype,
        )
        return y.reshape(b, t, -1)
    return _mm_res(res, x4.reshape(b, t, nh * hs), w)


def _mm_ffn(x: jax.Array, g: jax.Array, w13, w2, hidden: int, eps: float):
    """x + W2(silu(rmsnorm(x,g) @ W1) * (rmsnorm(x,g) @ W3)) — the whole
    FFN sub-block. For Q8 weights with decode-shaped inputs this is ONE
    Pallas kernel streaming W1|W3|W2 through a single pipeline
    (ops/quant.py::q8_matmul_ffn); otherwise the fused-silu + residual-w2
    two-kernel path (bit-identical math)."""
    if _ENV_FFN_FUSE and isinstance(w13, QTensor) and isinstance(w2, QTensor):
        from hip_llama_tpu.ops.quant import q8_matmul_ffn

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        y = q8_matmul_ffn(
            x2, w13, w2, residual=x2, norm_weight=g, norm_eps=eps,
            out_dtype=x.dtype,
        )
        return y.reshape(*lead, y.shape[-1])
    h = _mm_norm_silu(x, g, w13, hidden, eps)
    return _mm_res(x, h, w2)


def _embed(params, tokens: jax.Array, act_dtype) -> jax.Array:
    """Token embedding gather; for Q8_0 params, gather int8 rows + their
    group scales and dequantize only the gathered rows (runq.c:360-364)."""
    if isinstance(params, QuantLlamaParams):
        q = params.tok_emb_q[tokens]  # (..., D) int8
        s = params.tok_emb_s[tokens]  # (..., D//gs)
        gs = params.group_size
        d = q.shape[-1]
        g = q.astype(jnp.float32).reshape(*q.shape[:-1], d // gs, gs)
        return (g * s[..., None]).reshape(q.shape).astype(act_dtype)
    return params.tok_emb[tokens]


def _act_dtype(params):
    """bf16 activations for the int8 path (MXU-native; norms still fp32
    internally), else the dense param dtype."""
    if isinstance(params, QuantLlamaParams):
        return jnp.bfloat16
    return params.tok_emb.dtype


def rope(x: jax.Array, pos: jax.Array, theta: float = 10000.0) -> jax.Array:
    """Rotate consecutive (even, odd) pairs per head — llama2.c convention
    (src/seq.cpp:86-100), NOT the HF half-rotation. `theta` is the RoPE base
    (reference hardcodes 10000; Llama-3-era models use larger bases).

    x: (..., n_heads, head_size); pos: broadcastable to x's leading dims.

    Formulated as full-width elementwise math:
        out = x * cos_full + pairswap_signed(x) * sin_full
    where pairswap_signed is a constant +-1 permutation MATMUL — the MXU
    does lane shuffles for free, whereas the slice/stack form cost 8 strided
    sub-lane copies per call (~0.5 ms/step at 7B) and an explicit `rev` op
    costs ~0.6 ms/step (both measured with tools/profile_step.py). EXACT:
    the permutation matmul has one +-1 nonzero per column, so every output
    element is a single negation — bit-identical to the pairwise form.
    """
    head_size = x.shape[-1]
    half = head_size // 2
    freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / head_size))
    # pos: (B,) -> angles (B, 1, half) against x (B, H, half)
    ang = pos.astype(jnp.float32)[..., None, None] * freq
    # expand pairwise to full head width: [c0, c0, c1, c1, ...]
    c_full = jnp.repeat(jnp.cos(ang), 2, axis=-1)
    s_full = jnp.repeat(jnp.sin(ang), 2, axis=-1)
    # P[2i, 2i+1] = 1, P[2i+1, 2i] = -1:  (x @ P)[2i] = -x[2i+1],
    # (x @ P)[2i+1] = x[2i]
    j = jnp.arange(head_size)
    perm = jnp.where(
        (j[:, None] % 2 == 0) & (j[None, :] == j[:, None] + 1), 1.0,
        jnp.where((j[:, None] % 2 == 1) & (j[None, :] == j[:, None] - 1), -1.0, 0.0),
    ).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    partner = jnp.einsum("...d,de->...e", xf, perm)
    out = xf * c_full + partner * s_full
    return out.astype(x.dtype)


def scatter_kv_chunk(c_b, new_b, st, v, *, l, t, s):
    """Single-slot windowed KV chunk merge into (L, KVH, S, HS) at
    (l, :, st) — vmap over the batch. Positions past `v` keep their previous
    contents. A window whose BUCKET extends past S would be silently clamped
    by dynamic_update_slice, landing valid rows at the wrong positions AND
    clobbering earlier history — so the start is clamped deliberately and
    the new rows rolled into place (the same end-of-cache handling as the
    Pallas chunk writer, ops/cache.py kv_write_chunk). Shared by the
    contiguous prefill and the TP shard_map prefill (parallel/tp.py)."""
    st_c = jnp.minimum(st, s - t)
    shift = st - st_c
    old = lax.dynamic_slice(
        c_b, (l, 0, st_c, 0), (1, c_b.shape[1], t, c_b.shape[3])
    )[0]  # (KVH, T, HS)
    new_kv = jnp.roll(
        jnp.swapaxes(new_b, 0, 1).astype(c_b.dtype), shift, axis=1
    )
    w_idx = jnp.arange(t)
    m = (w_idx >= shift) & (w_idx < shift + v)
    merged = jnp.where(m[None, :, None], new_kv, old)
    return lax.dynamic_update_slice(c_b, merged[None], (l, 0, st_c, 0))


def scatter_scale_chunk(s_b, new_s, st, v, *, l, t, s):
    """Chunk-merge companion for the int8 KV scale plane (L, KVH, S)."""
    st_c = jnp.minimum(st, s - t)
    shift = st - st_c
    old = lax.dynamic_slice(s_b, (l, 0, st_c), (1, s_b.shape[1], t))[0]
    new_sc = jnp.roll(jnp.swapaxes(new_s, 0, 1), shift, axis=1)
    w_idx = jnp.arange(t)
    m = (w_idx >= shift) & (w_idx < shift + v)
    merged = jnp.where(m[None, :], new_sc, old)
    return lax.dynamic_update_slice(s_b, merged[None], (l, 0, st_c))


def _write_kv_rows(cache: jax.Array, rows: jax.Array, pos: jax.Array,
                   valid: jax.Array | None = None) -> jax.Array:
    """Write one new KV row per slot for ALL layers at once: rows (L, B, KVH,
    HS) into cache (B, L, KVH, S, HS) at (b, :, :, pos[b]).

    Done OUTSIDE the layer scan, via the in-place Pallas DMA writer on TPU
    (ops/cache.py — the XLA dynamic-update-slice chain materialized
    whole-cache copies, ~5 ms/step at 7B). The analog of the reference's
    fused KV-scatter GEMV addressing (thaBLAS.cpp:191-228).

    `valid` (B,) bool: slots with False keep their old row — used by the
    sequence-parallel step, where only the position's owner shard writes."""
    if jax.default_backend() != "cpu" and cache.shape[-1] % 128 == 0:
        # head_size must fill whole lanes for the DMA (7B/13B/70B: HS=128);
        # smaller heads take the XLA path (their caches are small anyway)
        from hip_llama_tpu.ops.cache import kv_write_rows

        return kv_write_rows(cache, rows, pos, valid=valid)
    b = cache.shape[0]
    upd = jnp.moveaxis(rows, 1, 0).astype(cache.dtype)  # (B, L, KVH, HS)
    for i in range(b):
        new = upd[i][None, :, :, None]
        if valid is not None:
            old = lax.dynamic_slice(
                cache, (i, 0, 0, pos[i], 0),
                (1, cache.shape[1], cache.shape[2], 1, cache.shape[4]),
            )
            new = jnp.where(valid[i], new, old)
        cache = lax.dynamic_update_slice(cache, new, (i, 0, 0, pos[i], 0))
    return cache


def _commit_kv_rows(cache: KVCache, k_rows: jax.Array, v_rows: jax.Array, pos):
    """Write this step's K/V rows (L, B, KVH, HS) into the cache; int8 caches
    quantize per row and also update the scale planes."""
    kvh_c = cache.k.shape[2]
    if k_rows.shape[2] != kvh_c:  # padded int8 cache (see kvh_storage)
        k_rows = _pad_kv_heads(k_rows, kvh_c, 2)
        v_rows = _pad_kv_heads(v_rows, kvh_c, 2)
    s = cache.k.shape[-2]
    if (
        _ENV_KV_COMMIT
        and jax.default_backend() != "cpu"
        and cache.k.shape[-1] % 128 == 0
        and s % 32 == 0
        and (not cache.quantized or s % 128 == 0)
    ):
        # combined commit: K+V (+int8 scales) in ONE pallas dispatch with
        # in-kernel row quantization (ops/cache.py::kv_commit_rows)
        from hip_llama_tpu.ops.cache import kv_commit_rows

        return kv_commit_rows(cache, k_rows, v_rows, pos)
    if cache.quantized:
        from hip_llama_tpu.ops.cache import quantize_kv_rows

        kq, ks = quantize_kv_rows(k_rows)
        vq, vs = quantize_kv_rows(v_rows)
        return KVCache(
            _write_kv_rows(cache.k, kq, pos),
            _write_kv_rows(cache.v, vq, pos),
            _write_scale_rows(cache.k_scale, ks, pos),
            _write_scale_rows(cache.v_scale, vs, pos),
        )
    return KVCache(
        _write_kv_rows(cache.k, k_rows, pos),
        _write_kv_rows(cache.v, v_rows, pos),
    )


def _write_scale_rows(sc: jax.Array, srows: jax.Array, pos: jax.Array) -> jax.Array:
    if jax.default_backend() != "cpu":
        from hip_llama_tpu.ops.cache import scale_write_rows

        return scale_write_rows(sc, srows, pos)
    b = sc.shape[0]
    upd = jnp.moveaxis(srows, 1, 0)  # (B, L, KVH)
    for i in range(b):
        sc = lax.dynamic_update_slice(sc, upd[i][None, :, :, None], (i, 0, 0, pos[i]))
    return sc


def attention_decode_xla(
    q: jax.Array,  # (B, H, HS)
    k_full: jax.Array,  # (B, L, KVH, S, HS) — FULL cache (history only)
    v_full: jax.Array,  # (B, L, KVH, S, HS)
    layer: jax.Array,  # () int32
    pos: jax.Array,  # (B,) int32 — current position (history is 0..pos-1)
    k_cur: jax.Array,  # (B, KVH, HS) — this token's key
    v_cur: jax.Array,  # (B, KVH, HS)
    k_scale: jax.Array | None = None,  # (B, L, KVH, S) f32 — int8 KV mode
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Masked GQA decode attention, fp32 softmax. The XLA re-formulation of
    the reference's 3-phase MHA kernels (src/thaDNN/thaDNN_mha.cpp).

    Two TPU-critical choices:
    - the cache stays in its storage dtype on the dot inputs —
      `preferred_element_type` gives fp32 accumulation on the MXU without a
      whole-cache VPU upconvert (~3 ms/step at 7B on v5e);
    - the current token's K/V enter as explicit operands rather than being
      scattered into the cache first, so the layer loop never mutates the
      cache (in-loop TPU scatters cost ~7.5 ms/step at 7B).

    int8 KV mode (k_scale/v_scale given): scales fold into the score /
    probability columns, mirroring the Pallas kernel (ops/attention.py).
    """
    if k_cur.shape[1] != k_full.shape[2]:
        # padded int8 cache (kvh_storage): XLA slices back to the logical
        # head count for free — only Mosaic window DMAs needed the padding
        kvh_l = k_cur.shape[1]
        k_full = k_full[:, :, :kvh_l]
        v_full = v_full[:, :, :kvh_l]
        if k_scale is not None:
            k_scale = k_scale[:, :, :kvh_l]
            v_scale = v_scale[:, :, :kvh_l]
    k_cache = lax.dynamic_index_in_dim(k_full, layer, 1, keepdims=False)
    v_cache = lax.dynamic_index_in_dim(v_full, layer, 1, keepdims=False)
    quantized = k_scale is not None
    if not quantized and jax.default_backend() == "cpu":
        # XLA's CPU thunk runtime has no bf16 dot: big-enough bf16 einsums
        # lower to an unsupported DotThunk (small ones become loop fusions
        # and slip through). fp32 on CPU is the oracle precision anyway.
        k_cache = k_cache.astype(jnp.float32)
        v_cache = v_cache.astype(jnp.float32)
    if quantized:
        # fp32 dequant: this is the fallback/oracle path (the Pallas kernel
        # is the fast path; CPU's dot has no bf16 support)
        ks = lax.dynamic_index_in_dim(k_scale, layer, 1, keepdims=False)
        vs = lax.dynamic_index_in_dim(v_scale, layer, 1, keepdims=False)
        k_cache = k_cache.astype(jnp.float32)
        v_cache = v_cache.astype(jnp.float32)
    b, h, hs = q.shape
    kvh = k_cache.shape[1]
    s = k_cache.shape[2]
    kv_mul = h // kvh
    qs = q.reshape(b, kvh, kv_mul, hs)
    if quantized:
        qs = qs.astype(jnp.float32)
    inv_scale = 1.0 / jnp.sqrt(jnp.float32(hs))
    scores = (
        jnp.einsum("bgmd,bgsd->bgms", qs, k_cache, preferred_element_type=jnp.float32)
        * inv_scale
    )
    if quantized:
        scores = scores * ks[:, :, None, :]
    t = jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1, s), 3)
    mask = t < pos[:, None, None, None]  # strict: row `pos` comes in as k_cur
    scores = jnp.where(mask, scores, -jnp.inf)
    cur = (
        jnp.einsum("bgmd,bgd->bgm", qs, k_cur.astype(qs.dtype),
                   preferred_element_type=jnp.float32)
        * inv_scale
    )
    all_scores = jnp.concatenate([scores, cur[..., None]], axis=-1)
    att = jax.nn.softmax(all_scores, axis=-1)
    att_hist = att[..., :s]
    if quantized:
        att_hist = (att_hist * vs[:, :, None, :]).astype(v_cache.dtype)
    else:
        att_hist = att_hist.astype(v_cache.dtype)
    out = jnp.einsum(
        "bgms,bgsd->bgmd",
        att_hist,
        v_cache,
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bgm,bgd->bgmd",
        att[..., s].astype(jnp.float32),
        v_cur.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, hs).astype(q.dtype)


AttnFn = Callable[..., jax.Array]  # (q, k_full, v_full, layer, pos, k_cur, v_cur)


def _get_attn(attn_impl: str) -> AttnFn:
    if attn_impl == "xla":
        return attention_decode_xla
    if attn_impl == "pallas":
        from hip_llama_tpu.ops.attention import attention_decode_pallas

        return attention_decode_pallas
    raise ValueError(f"unknown attn_impl {attn_impl!r}")


# ---------------------------------------------------------------------------
# decode step


def make_decode_step(cfg: ModelConfig, attn_impl: str = "xla", precision: str = "highest"):
    """Returns step(params, cache, tokens (B,), pos (B,)) -> (logits fp32
    (B, V), cache). Jit/pjit-ready; donate the cache at the jit boundary.

    `precision` sets jax.default_matmul_precision for the step: "highest"
    makes fp32 params exact on the MXU (needed for oracle parity); it is a
    no-op for bf16/int8 params, so the fast paths keep full MXU throughput.
    """
    attn = _get_attn(attn_impl)
    c = cfg

    def step_inner(params, cache: KVCache, tokens: jax.Array, pos: jax.Array):
        x = _embed(params, tokens, _act_dtype(params))  # (B, D) gather
        b = x.shape[0]

        if (
            isinstance(params.wq, QTensor)
            and params.wq.q.ndim == 3
            and isinstance(params.wk, tuple)
            and len(params.wk) == 0
        ):
            # STACKED-FUSED layered path (params.fuse_stacked_quant_params):
            # weights stay as single (L, K, N) HBM arrays and every matmul
            # selects its layer via the kernel's scalar-prefetched index
            # maps — no per-layer weight copies AND no XLA VMEM promotion
            # of weight buffers (whose async-copy waits cost ~2.2 ms/step
            # at 7B on the unrolled layout).
            from hip_llama_tpu.ops.quant import q8_matmul_layered

            def layer(carry, l):
                x = carry
                qkv = q8_matmul_layered(
                    x, params.wq, l, out_dtype=x.dtype,
                    norm_weight=params.rms_att, norm_eps=c.norm_eps,
                    rope_pos=pos, rope_limit=c.dim + c.kv_dim,
                    rope_head=c.head_size, rope_theta=c.rope_theta,
                )
                q = qkv[:, : c.dim].reshape(b, c.n_heads, c.head_size)
                k = qkv[:, c.dim : c.dim + c.kv_dim].reshape(
                    b, c.n_kv_heads, c.head_size
                )
                v = qkv[:, c.dim + c.kv_dim :].reshape(
                    b, c.n_kv_heads, c.head_size
                )
                att_out = attn(
                    q, cache.k, cache.v, l, pos, k, v,
                    cache.k_scale, cache.v_scale,
                ).reshape(b, c.dim)
                x = q8_matmul_layered(att_out, params.wo, l, out_dtype=x.dtype,
                                      residual=x)
                h13 = q8_matmul_layered(
                    x, params.w1, l, out_dtype=x.dtype,
                    norm_weight=params.rms_ffn, norm_eps=c.norm_eps,
                )
                h = jax.nn.silu(h13[:, : c.hidden_dim]) * h13[:, c.hidden_dim :]
                x = q8_matmul_layered(h, params.w2, l, out_dtype=x.dtype,
                                      residual=x)
                return x, (k, v)

            x, (k_rows, v_rows) = lax.scan(
                layer, x, jnp.arange(c.n_layers, dtype=jnp.int32)
            )
            new_cache = _commit_kv_rows(cache, k_rows, v_rows, pos)
            logits = _mm_norm(
                x, params.rms_final, params.wcls, c.norm_eps
            ).astype(jnp.float32)
            return logits, new_cache

        if isinstance(params.wq, (tuple, list)) and not isinstance(
            params.wq, (QTensor, Q4Tensor)
        ):
            # UNROLLED layer loop: per-layer weight buffers, no slicing
            # (see params.unstack_quant_params) — each pallas matmul reads
            # its own resident buffer, zero per-step weight copies.
            fused = len(params.wk) == 0  # QKV / W1W3 concatenated along N
            # head-split fused attention: the QKV kernel emits (B, NH, HS)
            # head rows (relayout in its epilogue, hidden under the weight
            # stream) and attention's index maps pick the q/k/v rows — the
            # 3 column slices + 3 lane-relayout reshapes per layer vanish
            fused_attn = (
                fused and attn_impl == "pallas" and _ENV_QKV_HEADS
            )
            k_list, v_list = [], []
            for l in range(c.n_layers):
                rms_a = params.rms_att[l]
                if (
                    fused_attn
                    and _ENV_LAYER_FUSE
                    and isinstance(params.wq[l], QTensor)
                    and isinstance(params.wo[l], QTensor)
                    and isinstance(params.w1[l], QTensor)
                    and isinstance(params.w2[l], QTensor)
                ):
                    # whole layer in ONE kernel when shapes allow
                    from hip_llama_tpu.ops.layer_fused import q8_layer_fused

                    res = q8_layer_fused(
                        x, params.wq[l], params.wo[l], params.w1[l],
                        params.w2[l], params.rms_att[l], params.rms_ffn[l],
                        cache.k, cache.v, jnp.int32(l), pos,
                        cache.k_scale, cache.v_scale,
                        n_heads=c.n_heads, head_size=c.head_size,
                        hidden=c.hidden_dim, norm_eps=c.norm_eps,
                        theta=c.rope_theta,
                    )
                    if res is not None:
                        x, kvr = res
                        k_list.append(kvr[:, : c.n_kv_heads])
                        v_list.append(kvr[:, c.n_kv_heads :])
                        continue
                if fused_attn:
                    from hip_llama_tpu.ops.attention import (
                        attention_decode_fused,
                    )

                    # padded-weight layout (params.pad_kv_head_params):
                    # QKV emits the cache's stored (8-aligned) head count
                    # directly, wo consumes the padded attention output —
                    # zero per-step pad/slice ops
                    kvh_c = cache.k.shape[2]
                    kv_mul = c.n_heads // c.n_kv_heads
                    h_eff = kvh_c * kv_mul
                    wpad = (
                        kvh_c != c.n_kv_heads
                        and params.wq[l].q.shape[1]
                        == (h_eff + 2 * kvh_c) * c.head_size
                    )
                    n_heads_eff = h_eff if wpad else c.n_heads
                    kvh_eff = kvh_c if wpad else c.n_kv_heads
                    qkv3 = _mm_norm_rope(
                        x, rms_a, params.wq[l], c.norm_eps, pos,
                        (n_heads_eff + kvh_eff) * c.head_size, c.head_size,
                        c.rope_theta, out_heads=True,
                    )  # (B, H + 2*KVH, HS)
                    att_out = attention_decode_fused(
                        qkv3, cache.k, cache.v, jnp.int32(l), pos,
                        cache.k_scale, cache.v_scale, n_heads=n_heads_eff,
                    ).reshape(b, n_heads_eff * c.head_size)
                    x = _mm_res(x, att_out, params.wo[l])
                    rms_f = params.rms_ffn[l]
                    x = _mm_ffn(
                        x, rms_f, params.w1[l], params.w2[l], c.hidden_dim,
                        c.norm_eps,
                    )
                    k_list.append(qkv3[:, n_heads_eff : n_heads_eff + kvh_eff])
                    v_list.append(qkv3[:, n_heads_eff + kvh_eff :])
                    continue
                if fused:
                    # norm + int8 matmul + rope in ONE kernel (q|k rotate in
                    # the epilogue; v passes through). Padded-weight layout
                    # (pad_kv_head_params): same slicing at the padded head
                    # counts; attention + wo consume the padded blocks.
                    kvh_c = cache.k.shape[2]
                    kv_mul = c.n_heads // c.n_kv_heads
                    wpad = (
                        kvh_c != c.n_kv_heads
                        and params.wq[l].q.shape[1]
                        == (kvh_c * kv_mul + 2 * kvh_c) * c.head_size
                    )
                    n_heads_eff = kvh_c * kv_mul if wpad else c.n_heads
                    kvh_eff = kvh_c if wpad else c.n_kv_heads
                    d_eff = n_heads_eff * c.head_size
                    kvd_eff = kvh_eff * c.head_size
                    qkv = _mm_norm_rope(
                        x, rms_a, params.wq[l], c.norm_eps, pos,
                        d_eff + kvd_eff, c.head_size, c.rope_theta,
                    )
                    q = qkv[:, :d_eff].reshape(b, n_heads_eff, c.head_size)
                    k = qkv[:, d_eff : d_eff + kvd_eff].reshape(
                        b, kvh_eff, c.head_size
                    )
                    v = qkv[:, d_eff + kvd_eff :].reshape(
                        b, kvh_eff, c.head_size
                    )
                else:
                    n_heads_eff = c.n_heads
                    q = _mm_norm_rope(
                        x, rms_a, params.wq[l], c.norm_eps, pos, c.dim,
                        c.head_size, c.rope_theta,
                    ).reshape(b, c.n_heads, c.head_size)
                    k = _mm_norm_rope(
                        x, rms_a, params.wk[l], c.norm_eps, pos, c.kv_dim,
                        c.head_size, c.rope_theta,
                    ).reshape(b, c.n_kv_heads, c.head_size)
                    v = _mm_norm(x, rms_a, params.wv[l], c.norm_eps).reshape(
                        b, c.n_kv_heads, c.head_size
                    )
                att_out = attn(
                    q, cache.k, cache.v, jnp.int32(l), pos, k, v,
                    cache.k_scale, cache.v_scale,
                ).reshape(b, n_heads_eff * c.head_size)
                x = _mm_res(x, att_out, params.wo[l])
                rms_f = params.rms_ffn[l]
                if fused:
                    # whole FFN (norm + W1/W3 + swiglu + W2 + residual) in
                    # one kernel when q8_matmul_ffn accepts the shape
                    x = _mm_ffn(
                        x, rms_f, params.w1[l], params.w2[l], c.hidden_dim,
                        c.norm_eps,
                    )
                else:
                    h = jax.nn.silu(
                        _mm_norm(x, rms_f, params.w1[l], c.norm_eps)
                    ) * _mm_norm(x, rms_f, params.w3[l], c.norm_eps)
                    x = _mm_res(x, h, params.w2[l])
                k_list.append(k)
                v_list.append(v)
            k_rows = jnp.stack(k_list)
            v_rows = jnp.stack(v_list)
            new_cache = _commit_kv_rows(cache, k_rows, v_rows, pos)
            logits = _mm_norm(
                x, params.rms_final, params.wcls, c.norm_eps
            ).astype(jnp.float32)
            return logits, new_cache

        # weights ride in the scan xs: the scan's per-iteration slicing is
        # double-buffered by XLA (measured faster than both explicit
        # dynamic_index and the layered-kernel zero-copy variant)
        layer_xs = (
            jnp.arange(c.n_layers, dtype=jnp.int32),
            params.rms_att,
            params.wq,
            params.wk,
            params.wv,
            params.wo,
            params.rms_ffn,
            params.w1,
            params.w2,
            params.w3,
        )

        def layer(carry, xs):
            x = carry
            l, rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3 = xs
            q = _mm_norm_rope(
                x, rms_a, wq, c.norm_eps, pos, c.dim, c.head_size,
                c.rope_theta,
            ).reshape(b, c.n_heads, c.head_size)
            k = _mm_norm_rope(
                x, rms_a, wk, c.norm_eps, pos, c.kv_dim, c.head_size,
                c.rope_theta,
            ).reshape(b, c.n_kv_heads, c.head_size)
            v = _mm_norm(x, rms_a, wv, c.norm_eps).reshape(b, c.n_kv_heads, c.head_size)
            # cache is read-only inside the loop; the current row rides along
            # as explicit attention operands and is written once after the scan
            att_out = attn(
                q, cache.k, cache.v, l, pos, k, v, cache.k_scale, cache.v_scale
            ).reshape(b, c.dim)
            x = _mm_res(x, att_out, wo)
            h = jax.nn.silu(_mm_norm(x, rms_f, w1, c.norm_eps)) * _mm_norm(
                x, rms_f, w3, c.norm_eps
            )
            x = _mm_res(x, h, w2)
            return x, (k, v)

        x, (k_rows, v_rows) = lax.scan(layer, x, layer_xs)
        new_cache = _commit_kv_rows(cache, k_rows, v_rows, pos)
        logits = _mm_norm(
            x, params.rms_final, params.wcls, c.norm_eps
        ).astype(jnp.float32)
        return logits, new_cache

    def step(params, cache, tokens, pos):
        with jax.default_matmul_precision(precision):
            return step_inner(params, cache, tokens, pos)

    return step


# ---------------------------------------------------------------------------
# chunked prefill


def make_prefill(cfg: ModelConfig, attn_impl: str = "xla",
                 precision: str = "highest", last_only: bool = False):
    """Returns prefill(params, cache, tokens (B, T), start (B,), valid_len
    (B,)) -> (logits fp32 (B, T, V), cache).

    `last_only=True` instead returns logits fp32 (B, V) for each slot's
    LAST valid position only: the x rows are gathered BEFORE the final
    norm + classifier, so the (B, T, V) logits tensor (0.5 GB at 7B
    b8xT512) is never computed or materialized — a chunked serving prefill
    only ever consumes row valid-1 of the final chunk (engine.py
    _prefill_tokens). The speculative verifier needs per-position logits
    and keeps the full variant.

    Processes up to T prompt tokens per slot in one pass (positions
    start..start+valid_len-1) — the TTFT lever the reference lacks (it
    streams prompts one token per step, llama.cpp:1030-1033). Causal within
    the chunk, full attention over the existing cache. KV writes beyond a
    slot's `valid_len` are masked to the old cache contents, so slots with
    valid_len=0 are bystanders: a mixed batch can prefill one slot while
    others hold mid-decode state.

    attn_impl="pallas" uses the flash prefill kernel (ops/attention.py):
    the (T, S) score matrix is never materialized — at 7B serving shapes
    the einsum path's score tensor is ~0.5 GB per layer.
    """
    c = cfg

    def prefill_inner(
        params,
        cache: KVCache,
        tokens: jax.Array,
        start: jax.Array,
        valid_len: jax.Array,
    ):
        b, t = tokens.shape
        s = cache.seq_len
        x = _embed(params, tokens, _act_dtype(params))  # (B, T, D)
        pos = start[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # (B, T)

        unrolled = isinstance(params.wq, (tuple, list)) and not isinstance(
            params.wq, (QTensor, Q4Tensor)
        )
        layer_xs = (
            jnp.arange(c.n_layers, dtype=jnp.int32),
            params.rms_att,
            params.wq,
            params.wk,
            params.wv,
            params.wo,
            params.rms_ffn,
            params.w1,
            params.w2,
            params.w3,
        ) if not unrolled else None

        quantized_kv = cache.quantized

        def layer_body(
            x, kcache, vcache, ks_c, vs_c,
            l, rms_a, wq, wk, wv, wo, rms_f, w1, w2, w3,
        ):
            fused_qkv = wk is None or (isinstance(wk, tuple) and len(wk) == 0)
            # padded-weight layout (params.pad_kv_head_params): the QKV
            # weight already emits the cache's stored 8-aligned head count
            # and wo consumes the padded attention output — all the
            # runtime pad/slice special cases below collapse to no-ops
            kvh_c = kcache.shape[2]
            kv_mul = c.n_heads // c.n_kv_heads
            wpad = (
                fused_qkv and isinstance(wq, QTensor)
                and kvh_c != c.n_kv_heads
                and wq.q.shape[1] == (kvh_c * kv_mul + 2 * kvh_c) * c.head_size
            )
            nh_e = kvh_c * kv_mul if wpad else c.n_heads
            kvh_e = kvh_c if wpad else c.n_kv_heads
            d_e, kvd_e = nh_e * c.head_size, kvh_e * c.head_size
            if fused_qkv and _ENV_PREFILL_HEADS and isinstance(wq, QTensor):
                # head-split QKV emission (q8_matmul out_heads): the flat
                # (B, T, D+2KVD) qkv and its three lane-dim slices cost
                # ~9 GB/pass of layout relayouts at 7B (copy-shape HLO
                # histogram, BASELINE r4) — emit (B*T, NHT, HS) head rows
                # in the kernel epilogue and slice on the head dim instead
                qkv3 = _mm_norm_rope(
                    x, rms_a, wq, c.norm_eps, pos, d_e + kvd_e,
                    c.head_size, c.rope_theta, out_heads=True,
                )  # (B, T, NHT, HS)
                q = qkv3[:, :, :nh_e]
                k = qkv3[:, :, nh_e : nh_e + kvh_e]
                v = qkv3[:, :, nh_e + kvh_e :]
            elif fused_qkv:  # fused QKV (wq holds the concatenated weight)
                qkv = _mm_norm_rope(
                    x, rms_a, wq, c.norm_eps, pos, d_e + kvd_e,
                    c.head_size, c.rope_theta,
                )
                q = qkv[..., :d_e].reshape(b, t, nh_e, c.head_size)
                k = qkv[..., d_e : d_e + kvd_e].reshape(
                    b, t, kvh_e, c.head_size
                )
                v = qkv[..., d_e + kvd_e :].reshape(
                    b, t, kvh_e, c.head_size
                )
            else:
                q = _mm_norm_rope(
                    x, rms_a, wq, c.norm_eps, pos, c.dim, c.head_size,
                    c.rope_theta,
                ).reshape(b, t, c.n_heads, c.head_size)
                k = _mm_norm_rope(
                    x, rms_a, wk, c.norm_eps, pos, c.kv_dim, c.head_size,
                    c.rope_theta,
                ).reshape(b, t, c.n_kv_heads, c.head_size)
                v = _mm_norm(x, rms_a, wv, c.norm_eps).reshape(
                    b, t, c.n_kv_heads, c.head_size
                )

            if kvh_c != kvh_e:  # padded int8 cache, unpadded weights
                k = _pad_kv_heads(k, kvh_c, 2)
                v = _pad_kv_heads(v, kvh_c, 2)

            def scatter_seq(c_b, new_b, st, v):
                return scatter_kv_chunk(c_b, new_b, st, v, l=l, t=t, s=s)

            def scatter_scale(s_b, new_s, st, v):
                return scatter_scale_chunk(s_b, new_s, st, v, l=l, t=t, s=s)

            # chunk writers: one windowed RMW DMA per slot per layer beats
            # the XLA merge + dynamic-update-slice scatter by ~80 ms/step
            # at 7B b8 t511 (while + DUS chains, profile_step --mode
            # prefill); needs lane-aligned heads and window slack in S
            from hip_llama_tpu.ops.cache import _sublane_window

            sub_w = _sublane_window(kcache.dtype)
            pallas_w = (
                jax.default_backend() != "cpu"
                and c.head_size % 128 == 0
                and s % 128 == 0
                and t % 8 == 0  # rows DMA slices need tile-aligned T
                and s >= -(-t // sub_w) * sub_w + 2 * sub_w
                and (not quantized_kv or s >= -(-t // 128) * 128 + 256)
            )
            if quantized_kv:
                from hip_llama_tpu.ops.cache import (
                    kv_write_chunk,
                    quantize_kv_rows,
                    scale_write_chunk,
                )

                kq, ksc = quantize_kv_rows(k)  # (B,T,KVH,HS) int8, (B,T,KVH)
                vq, vsc = quantize_kv_rows(v)
                if pallas_w:
                    kcache = kv_write_chunk(kcache, kq, l, start, valid_len)
                    vcache = kv_write_chunk(vcache, vq, l, start, valid_len)
                    ks_c = scale_write_chunk(ks_c, ksc, l, start, valid_len)
                    vs_c = scale_write_chunk(vs_c, vsc, l, start, valid_len)
                else:
                    kcache = jax.vmap(scatter_seq)(kcache, kq, start, valid_len)
                    vcache = jax.vmap(scatter_seq)(vcache, vq, start, valid_len)
                    ks_c = jax.vmap(scatter_scale)(ks_c, ksc, start, valid_len)
                    vs_c = jax.vmap(scatter_scale)(vs_c, vsc, start, valid_len)
            elif pallas_w:
                from hip_llama_tpu.ops.cache import kv_write_chunk

                kcache = kv_write_chunk(kcache, k, l, start, valid_len)
                vcache = kv_write_chunk(vcache, v, l, start, valid_len)
            else:
                kcache = jax.vmap(scatter_seq)(kcache, k, start, valid_len)
                vcache = jax.vmap(scatter_seq)(vcache, v, start, valid_len)

            if attn_impl == "pallas":
                from hip_llama_tpu.ops.attention import attention_prefill_pallas

                if kvh_c != kvh_e:
                    # pad q kv-head-major to the stored head count; padded
                    # heads read zero rows (scale 1) and are sliced away
                    qp = jnp.pad(
                        q.reshape(b, t, kvh_e, kv_mul, c.head_size),
                        ((0, 0), (0, 0), (0, kvh_c - kvh_e),
                         (0, 0), (0, 0)),
                    ).reshape(b, t, kvh_c * kv_mul, c.head_size)
                else:
                    qp = q
                att4 = attention_prefill_pallas(
                    qp, kcache, vcache, l, start, valid_len,
                    ks_c if quantized_kv else None,
                    vs_c if quantized_kv else None,
                )
                if kvh_c != kvh_e:
                    att4 = att4.reshape(
                        b, t, kvh_c, kv_mul, c.head_size
                    )[:, :, :kvh_e].reshape(
                        b, t, kvh_e * kv_mul, c.head_size)
                if (
                    _ENV_PREFILL_XHEADS
                    and isinstance(wo, QTensor)
                    and c.head_size % 128 == 0
                ):
                    # wo consumes the T-major head-split attention output
                    # directly (ops/quant.py q8_matmul_xheads) — the
                    # (B,T,H,HS)->(B,T,D) relayout never materializes
                    x = _mm_res_heads(x, att4.astype(x.dtype), wo)
                    att_out = None
                else:
                    att_out = att4.reshape(b, t, d_e).astype(x.dtype)
            else:
                kc = lax.dynamic_index_in_dim(kcache, l, 1, keepdims=False)
                vc = lax.dynamic_index_in_dim(vcache, l, 1, keepdims=False)
                if kvh_c != kvh_e:
                    # XLA slices the padded cache back to logical heads
                    kc = kc[:, :kvh_e]
                    vc = vc[:, :kvh_e]

                qs = q.reshape(b, t, kvh_e, kv_mul, c.head_size)
                if not quantized_kv and jax.default_backend() == "cpu":
                    # see attention_decode_xla: no bf16 DotThunk on CPU
                    kc = kc.astype(jnp.float32)
                    vc = vc.astype(jnp.float32)
                    qs = qs.astype(jnp.float32)
                if quantized_kv:
                    # fp32 dequant (fallback/oracle path; see decode)
                    kc = kc.astype(jnp.float32)
                    vc = vc.astype(jnp.float32)
                    qs = qs.astype(jnp.float32)
                scores = jnp.einsum(
                    "btgmd,bgsd->btgms", qs, kc, preferred_element_type=jnp.float32
                ) / jnp.sqrt(jnp.float32(c.head_size))
                if quantized_kv:
                    ks_l = lax.dynamic_index_in_dim(ks_c, l, 1, keepdims=False)
                    scores = scores * ks_l[:, :kvh_e][:, None, :, None, :]
                s_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t, 1, 1, s), 4)
                mask = s_idx <= pos[:, :, None, None, None]
                scores = jnp.where(mask, scores, -jnp.inf)
                att = jax.nn.softmax(scores, axis=-1)
                if quantized_kv:
                    vs_l = lax.dynamic_index_in_dim(vs_c, l, 1, keepdims=False)
                    att = att * vs_l[:, :kvh_e][:, None, :, None, :]
                out = jnp.einsum(
                    "btgms,bgsd->btgmd",
                    att.astype(vc.dtype),
                    vc,
                    preferred_element_type=jnp.float32,
                )
                att_out = out.reshape(b, t, d_e).astype(x.dtype)

            if att_out is not None:  # None = wo already consumed x_heads
                x = _mm_res(x, att_out, wo)
            if w3 is None or (
                isinstance(w3, tuple) and len(w3) == 0
            ):  # fused W1/W3 (w1 holds the concatenated weight)
                # one-kernel FFN when eligible (small-row chunks); larger
                # prefill rows fall back to silu + residual-w2 internally
                x = _mm_ffn(x, rms_f, w1, w2, c.hidden_dim, c.norm_eps)
            else:
                h = jax.nn.silu(_mm_norm(x, rms_f, w1, c.norm_eps)) * _mm_norm(
                    x, rms_f, w3, c.norm_eps
                )
                x = _mm_res(x, h, w2)
            return x, kcache, vcache, ks_c, vs_c

        # scale planes ride through the loop as zero-size placeholders when
        # the cache is bf16/fp32 (lax.scan carries must be arrays)
        ks0 = cache.k_scale if quantized_kv else jnp.zeros((0,), jnp.float32)
        vs0 = cache.v_scale if quantized_kv else jnp.zeros((0,), jnp.float32)
        if unrolled:
            fused = len(params.wk) == 0
            x_c, kc_c, vc_c, ks_c, vs_c = x, cache.k, cache.v, ks0, vs0
            for l in range(c.n_layers):
                x_c, kc_c, vc_c, ks_c, vs_c = layer_body(
                    x_c, kc_c, vc_c, ks_c, vs_c, jnp.int32(l), params.rms_att[l],
                    params.wq[l],
                    None if fused else params.wk[l],
                    None if fused else params.wv[l],
                    params.wo[l],
                    params.rms_ffn[l],
                    params.w1[l],
                    params.w2[l],
                    None if fused else params.w3[l],
                )
            x, new_k, new_v, new_ks, new_vs = x_c, kc_c, vc_c, ks_c, vs_c
        else:
            def layer(carry, xs):
                return layer_body(*carry, *xs), None

            (x, new_k, new_v, new_ks, new_vs), _ = lax.scan(
                layer, (x, cache.k, cache.v, ks0, vs0), layer_xs
            )
        if last_only:
            # gather each slot's last valid row BEFORE the classifier
            # (valid_len=0 bystanders gather row 0; callers ignore them)
            idx = jnp.maximum(valid_len - 1, 0)
            x = x[jnp.arange(b), idx]  # (B, D)
        logits = _mm_norm(
            x, params.rms_final, params.wcls, c.norm_eps
        ).astype(jnp.float32)
        if quantized_kv:
            return logits, KVCache(new_k, new_v, new_ks, new_vs)
        return logits, KVCache(new_k, new_v)

    def prefill(params, cache, tokens, start, valid_len):
        with jax.default_matmul_precision(precision):
            return prefill_inner(params, cache, tokens, start, valid_len)

    return prefill


# ---------------------------------------------------------------------------
# on-device sampling


def make_logit_sampler(temperature: float, topp: float):
    """On-device sampler over (B, V) fp32 logits: argmax at temperature 0,
    else temperature + top-p nucleus + categorical (llama.cpp:309-350
    semantics; the nucleus keeps the smallest sorted-prob prefix whose mass
    exceeds topp). The warped distribution this samples from is exactly
    softmax(scaled logits) restricted to the kept set — the speculative
    verifier recomputes it host-side (engine/speculative.py _warp)."""

    def sample_logits(logits: jax.Array, key: jax.Array) -> jax.Array:
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / jnp.float32(temperature)
        if 0.0 < topp < 1.0:
            probs = jax.nn.softmax(scaled, axis=-1)
            sorted_p = jnp.sort(probs, axis=-1)[..., ::-1]
            csum = jnp.cumsum(sorted_p, axis=-1)
            # threshold prob: smallest kept probability
            keep = csum - sorted_p < topp
            thresh = jnp.min(
                jnp.where(keep, sorted_p, jnp.inf), axis=-1, keepdims=True
            )
            scaled = jnp.where(probs >= thresh, scaled, -jnp.inf)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    return sample_logits


def make_sampling_decode_step(
    cfg: ModelConfig,
    attn_impl: str = "xla",
    precision: str = "highest",
    temperature: float = 0.0,
    topp: float = 0.9,
):
    """Decode step that samples ON DEVICE and returns (next_token (B,) int32,
    cache).

    The host then fetches 4 bytes/slot instead of the full (B, V) logits —
    the reference pays a pinned-host logits transfer every token
    (thaDNN.cpp:75-76). Greedy (temperature=0) is bit-equivalent to the host
    sampler's argmax; stochastic sampling uses JAX's PRNG (jax.random.
    categorical over the top-p nucleus), NOT the reference's xorshift64*
    stream — use host sampling for golden-output parity runs."""
    step = make_decode_step(cfg, attn_impl=attn_impl, precision=precision)
    sample_logits = make_logit_sampler(temperature, topp)

    def sstep(params, cache: KVCache, tokens, pos, key):
        logits, cache = step(params, cache, tokens, pos)
        nxt = sample_logits(logits, key)
        return nxt, cache

    return sstep


def make_chunked_sampling_step(
    cfg: ModelConfig,
    n_steps: int,
    attn_impl: str = "xla",
    precision: str = "highest",
    temperature: float = 0.0,
    topp: float = 0.9,
    return_logits: bool = False,
):
    """Multi-step scheduling: decode `n_steps` tokens in ONE dispatch, each
    step sampling on device and feeding the next (chunk(params, cache,
    tokens, pos, key) -> (tokens (B, n_steps) int32, cache)).

    The host scheduler then processes the whole chunk: a slot that emits
    EOS mid-chunk keeps decoding garbage until the chunk ends — those
    tokens (and the cache rows they wrote) are simply discarded when the
    slot retires, so correctness is unaffected; the trade is a few wasted
    slot-steps per retirement against n_steps-1 saved host dispatches.
    Greedy (temperature=0) chunks are bit-equal to the single-step host
    loop; stochastic chunks use the JAX PRNG (see make_sampling_decode_step).
    The reference pays host dispatch + pinned-logits transfer every token
    (thaDNN.cpp:75-78, llama.cpp:1017-1049).

    With return_logits=True the chunk also returns the per-step fp32 logits
    (B, n_steps, V) — the speculative verifier needs the draft's proposal
    distribution q to compute rejection-sampling acceptance ratios."""
    step = make_decode_step(cfg, attn_impl=attn_impl, precision=precision)
    sample_logits = make_logit_sampler(temperature, topp)

    def chunk(params, cache: KVCache, tokens, pos, key):
        return run_sampling_chunk(
            lambda c, t, p: step(params, c, t, p), cache, tokens, pos, key,
            n_steps, sample_logits, return_logits,
        )

    return chunk


def run_sampling_chunk(step1, cache, tokens, pos, key, n_steps,
                       sample_logits, return_logits):
    """The shared scan body of the chunked sampling steps (contiguous and
    paged, models/paged.py): n_steps of step1(cache, tokens, pos) ->
    (logits, cache), each sampled on device and fed to the next. Returns
    (tokens (B, n_steps)[, logits (B, n_steps, V)], cache)."""

    def body(carry, i):
        cache, tokens, pos = carry
        logits, cache = step1(cache, tokens, pos)
        nxt = sample_logits(logits, jax.random.fold_in(key, i))
        out = (nxt, logits) if return_logits else nxt
        return (cache, nxt, pos + 1), out

    (cache, _, _), out = lax.scan(
        body, (cache, tokens, pos), jnp.arange(n_steps)
    )
    if return_logits:
        toks, logits = out
        # (n_steps, B, ...) -> (B, n_steps, ...)
        return jnp.transpose(toks), jnp.transpose(logits, (1, 0, 2)), cache
    return jnp.transpose(out), cache  # (B, n_steps)
