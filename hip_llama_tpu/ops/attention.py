"""Flash-style batched GQA decode attention as a Pallas TPU kernel.

This is the TPU-native replacement for the reference's 3-phase decode MHA
(reference: src/thaDNN/thaDNN_mha.cpp — separate QK^T / softmax / score·V
kernels over a ragged per-(batch,head,t) grid, include/thaDNN/thaDNN_mha.hpp:5-47).
On TPU the three phases collapse into ONE kernel with an online softmax, so
the (pos+1)-length score row never round-trips through HBM, and raggedness
(per-slot `pos`) is handled with a static grid + masking + index-map clamping
instead of a data-dependent grid.

Design (see /opt/skills/guides/boom_attention_tricks.md):
- grid (batch, kv_head, S/block_k); the KV-block axis is innermost and does
  the online-softmax reduction into VMEM scratch (m/l/acc).
- The FULL cache (B, L, KVH, S, HS) is an operand and the layer index is a
  scalar-prefetch argument consumed by the BlockSpec index maps — the kernel
  streams K/V tiles for layer `l` straight from the cache buffer in HBM.
  Slicing the layer outside the kernel would make XLA materialize a copy of
  the whole layer slice per step, doubling KV traffic.
- Per-slot `pos` is also scalar-prefetched: the index map CLAMPS the block
  index to the last live block, so trailing blocks re-visit the same tile
  (Pallas elides the repeated DMA) and their compute is skipped with
  `pl.when` — the TPU analog of the reference's ragged `Σ(pos[b]+1)` grid.
- The current token's K/V arrive as separate operands (the cache is updated
  once per step outside the layer scan, models/llama.py) and are folded in
  as a final online-softmax update.
- K/V tiles stay in the cache dtype on the MXU with fp32 accumulation;
  softmax stats are fp32 (m/l/acc scratch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# decode-attention tuning knobs (swept on hardware via bench.py — see
# ops/quant.py for why micro-benchmarks don't work through the tunnel)
_ENV_DECODE_BLOCK_K = int(os.environ.get("HIPLLAMA_ATTN_BLOCK_K", "0")) or None
_ENV_DECODE_TARGET_KB = int(os.environ.get("HIPLLAMA_ATTN_TARGET_KB", "512"))
# T-major prefill attention (q and output stay (B, T, H, HS) — no XLA
# transposes in/out of the kernel). Default ON: TTFT 550.7 vs 570.1 ms
# at 7B b8x512 (r5 on-chip A/B), bit-identical outputs
_ENV_PREFILL_TMAJ = os.environ.get("HIPLLAMA_PREFILL_TMAJ", "1") == "1"
# sub-128 head sizes: "xla" (measured default at 110m) or "pallas"
_ENV_DECODE_SUB128 = os.environ.get("HIPLLAMA_DECODE_SUB128", "xla")
# batch-folded decode grid: HIPLLAMA_ATTN_BB slots share one grid step (the
# kernel unrolls their per-slot math), so each step issues ONE bigger KV DMA
# covering BB slots instead of BB small ones — fewer grid steps, less
# per-step bookkeeping. Dead-block skipping then clamps on max(pos) over the
# BB-slot group rather than per slot. BB=batch == HIPLLAMA_ATTN_BFOLD=1
# (measured 4% slower at 7B b8 — full fold serializes too much in-kernel
# work per step; intermediate BB values trade the two costs).
_ENV_DECODE_BFOLD = os.environ.get("HIPLLAMA_ATTN_BFOLD", "")
# -1 = auto: BB=2 when the batch divides (measured r3, 7B int8-KV b8 128-step
# chain: BB=2 677-686 vs per-slot 668-673 tok/s across two days; BB=4
# regresses). HIPLLAMA_ATTN_BB=0/1 forces the per-slot grid, >=2 forces BB.
_ENV_DECODE_BB = int(os.environ.get("HIPLLAMA_ATTN_BB", "-1"))
# int8 KV decode: feed the int8 K/V tiles STRAIGHT to the MXU
# (int8 x int8 -> int32 dots) instead of converting every (G, BK, HS) tile
# to bf16 on the VPU. The big tiles do zero element-wise work; the
# quantization moves to the TINY tensors: q is rowwise-quantized to int8
# (absmax/127 per (g, m)) and the probability rows are quantized jointly
# with the folded v scales. Measured r3 (7B int8-KV b8 chain): the bf16
# converts were ~0.7 us/grid-step of critical-path VPU work.
_ENV_I8MXU = os.environ.get("HIPLLAMA_ATTN_I8MXU", "1") == "1"
# vectorized batch-group math (BB > 1 only): ONE batched dot / elementwise
# stream over the (BB, G, ...) tile instead of a static per-slot unroll —
# the serial in-kernel chain stops growing with BB (see _decode_kernel_bvec).
# Default OFF: measured r3 on-chip (7B int8-KV b8, 128-step chain) BVEC+BB8
# 694.1 / BVEC+BB4 685.9 vs unrolled BB2 695.8 — the grid-step bookkeeping
# the bigger groups remove is offset by the batched kernel's own overheads.
_ENV_BVEC = os.environ.get("HIPLLAMA_ATTN_BVEC", "0") == "1"
# dynamic-pipeline decode attention: ONE grid step per BB-slot group, with a
# manual double-buffered DMA loop over ONLY the live KV blocks (trip count =
# cdiv(maxpos, BK), a dynamic scalar). The static-grid kernel pays a Mosaic
# grid-step transition (~1.4 us measured at 7B) for every (group, block)
# including dead blocks past `pos`; here dead blocks cost nothing and live
# blocks pay only a DMA start/wait + the loop bookkeeping.
_ENV_DYN = os.environ.get("HIPLLAMA_ATTN_DYN", "0") == "1"


def _quant_rows_i8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rowwise (last-axis) absmax/127 int8 quantization; returns (qi, scale)
    with scale shaped like x[..., :1]."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) * (1.0 / 127.0)
    s = jnp.where(s == 0.0, 1.0, s)
    return jnp.round(x / s).astype(jnp.int8), s


def _pad_heads_grouped(x: jax.Array, kvh_l: int, kvh_c: int,
                       kv_mul: int) -> jax.Array:
    """Zero-pad kv-head-major head rows (B, kvh_l*kv_mul, HS) up to a
    cache's stored head count (B, kvh_c*kv_mul, HS) — the 8-padded int8
    cache layout of models/llama.py::kvh_storage."""
    if kvh_l == kvh_c:
        return x
    b, _, hs = x.shape
    x4 = x.reshape(b, kvh_l, kv_mul, hs)
    x4 = jnp.pad(x4, ((0, 0), (0, kvh_c - kvh_l), (0, 0), (0, 0)))
    return x4.reshape(b, kvh_c * kv_mul, hs)


def _decode_kernel(
    layer_ref,  # (1,) int32 scalar-prefetch: layer index
    pos_ref,  # (B,) int32 scalar-prefetch: per-slot position
    q_ref,  # (1, G, M, HS) — G kv-heads per grid step
    k_ref,  # (1, 1, G, BK, HS) block of the full K cache
    v_ref,
    *rest,  # [ks_ref, vs_ref (1,1,G,BK) if quantized,] kc, vc, o, m, l, acc
    block_k: int,
    n_blocks: int,
    scale: float,
    quantized: bool = False,
    i8mxu: bool = False,
):
    if quantized:
        ks_ref, vs_ref, kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    i = pl.program_id(2)
    pos = pos_ref[b]

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(i * block_k < pos)
    def _block():
        # normalize tile layouts (free singleton squeezes): contiguous KV
        # blocks are (1, 1, G, BK, HS), paged blocks are (1, G, 1, BK, HS)
        kt = k_ref[...].reshape(-1, k_ref.shape[-2], k_ref.shape[-1])
        # quantized: force DEFAULT precision — an inherited "highest" would
        # request fp32 contraction of the bf16-converted int8 tiles, which
        # Mosaic rejects (and int8 KV is already lossy)
        prec = jax.lax.Precision.DEFAULT if quantized else None
        if quantized and i8mxu:
            # int8 MXU path (default on TPU): the (G, BK, HS) K tile feeds
            # the MXU as int8 — no per-tile VPU convert. q is rowwise
            # int8-quantized instead (a (G, M, HS) tensor, ~100x smaller).
            qi, sq = _quant_rows_i8(q_ref[0].astype(jnp.float32))
            s_i = jax.lax.dot_general(
                qi, kt, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            s = s_i.astype(jnp.float32) * (sq * scale)  # (G,M,BK)*(G,M,1)
        else:
            if quantized:
                # int8 KV, bf16 MXU (HIPLLAMA_ATTN_I8MXU=0): fold the
                # per-row scales into the SMALL tensors — scores columns
                # (k scales) and probability columns (v scales) — instead
                # of dequantizing the (G, BK, HS) tiles.
                k = kt.astype(jnp.bfloat16)  # (G, BK, HS)
                q = q_ref[0].astype(jnp.bfloat16)
            else:
                k = kt  # (G, BK, HS)
                q = q_ref[0].astype(k.dtype)  # (G, M, HS) — match cache dtype
            s = (
                jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                * scale
            )  # (G, M, BK)
        if quantized:
            # ks block: contiguous (1, G, 1, BK) view of (B, L*KVH, 1, S);
            # paged (1, G, 1, 1, BK) view of (L, KVH, P, 1, PS) — both
            # squeeze to (G, BK)
            ks = ks_ref[...].reshape(-1, ks_ref.shape[-1])
            s = s * ks[:, None, :]  # (G, 1, BK) lane-aligned
        t_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * block_k
        s = jnp.where(t_idx < pos, s, MASK_VALUE)

        m_prev = m_scr[:, :, :1]  # (G, M, 1), all lanes equal
        l_prev = l_scr[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # (G, M, BK)
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)
        vt = v_ref[...].reshape(-1, v_ref.shape[-2], v_ref.shape[-1])
        if quantized and i8mxu:
            # fold the v scales into p, then rowwise-quantize (p * vs) so
            # the int8 V tile feeds the MXU directly. p <= 1 by softmax, so
            # the joint row absmax keeps full int8 headroom.
            vs = vs_ref[...].reshape(-1, vs_ref.shape[-1])
            pi, sp = _quant_rows_i8(p * vs[:, None, :])
            pv_i = jax.lax.dot_general(
                pi, vt, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            acc_scr[:] = acc_scr[:] * alpha + pv_i.astype(jnp.float32) * sp
        else:
            if quantized:
                v = vt.astype(jnp.bfloat16)  # (G, BK, HS)
                vs = vs_ref[...].reshape(-1, vs_ref.shape[-1])
                pv = (p * vs[:, None, :]).astype(jnp.bfloat16)
            else:
                v = vt  # (G, BK, HS)
                pv = p.astype(v.dtype)
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                pv, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )

    @pl.when(i == n_blocks - 1)
    def _final():
        # fold in the current token (always valid: history is 0..pos-1,
        # this token sits at `pos`), then normalize and store.
        q = q_ref[0]  # (G, M, HS)
        kc = kc_ref[0].astype(q.dtype)  # (G, 1, HS)
        vc = vc_ref[0].astype(jnp.float32)
        s_cur = (
            jax.lax.dot_general(
                q, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (G, M, 1)
        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_next = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_next)
        p_cur = jnp.exp(s_cur - m_next)  # (G, M, 1)
        l_next = alpha * l_prev + p_cur
        acc = acc_scr[:] * alpha + jax.lax.dot_general(
            p_cur, vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
        o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


def _decode_kernel_bfold(
    layer_ref,  # (1,) int32 scalar-prefetch
    pos_ref,  # (B,) int32 scalar-prefetch
    maxpos_ref,  # (B//BB,) int32 scalar-prefetch: per-group max(pos) clamp
    q_ref,  # (BB, G, M, HS); fused-QKV mode: (BB, G*M, HS) rows of qkv
    k_ref,  # (BB, 1, G, BK, HS) block of the full K cache
    v_ref,
    *rest,  # [ks_ref, vs_ref (BB, G, 1, BK) if quantized,] kc, vc, o, m, l, acc
    block_k: int,
    n_blocks: int,
    scale: float,
    quantized: bool = False,
    batch: int = 0,  # slots per grid step (BB)
    i8mxu: bool = False,
    flat_qo: bool = False,  # q/kc/vc/o are head-row views of the QKV tensor
):
    """_decode_kernel with a BB-slot batch group INSIDE the kernel (static
    unroll): the math per slot is identical; only the DMA granularity and
    grid shape change (see _ENV_DECODE_BB / _ENV_DECODE_BFOLD)."""
    if quantized:
        ks_ref, vs_ref, kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    g_n, m_n, hs_n = m_scr.shape[1], m_scr.shape[2], acc_scr.shape[3]

    def q_at(b):
        qb = q_ref[b]
        return qb.reshape(g_n, m_n, hs_n) if flat_qo else qb

    def kc_at(b):
        kb = kc_ref[b]
        return kb[:, None, :] if flat_qo else kb

    def vc_at(b):
        vb = vc_ref[b]
        return vb[:, None, :] if flat_qo else vb

    def o_store(b, val):
        o_ref[b] = val.reshape(g_n * m_n, hs_n) if flat_qo else val

    bi = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    prec = jax.lax.Precision.DEFAULT if quantized else None
    for b in range(batch):  # static unroll: per-slot scalar pos/masking
        pos = pos_ref[bi * batch + b]

        @pl.when(i * block_k < pos)
        def _block(b=b, pos=pos):
            kt = k_ref[b].reshape(-1, k_ref.shape[-2], k_ref.shape[-1])
            if quantized and i8mxu:
                # int8 MXU path: see _decode_kernel
                qi, sq = _quant_rows_i8(q_at(b).astype(jnp.float32))
                s_i = jax.lax.dot_general(
                    qi, kt, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )
                s = s_i.astype(jnp.float32) * (sq * scale)
            else:
                if quantized:
                    k = kt.astype(jnp.bfloat16)
                    q = q_at(b).astype(jnp.bfloat16)
                else:
                    k = kt
                    q = q_at(b).astype(k.dtype)
                s = (
                    jax.lax.dot_general(
                        q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    * scale
                )  # (G, M, BK)
            if quantized:
                ks = ks_ref[b].reshape(-1, ks_ref.shape[-1])
                s = s * ks[:, None, :]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * block_k
            s = jnp.where(t_idx < pos, s, MASK_VALUE)

            m_prev = m_scr[b, :, :, :1]
            l_prev = l_scr[b, :, :, :1]
            m_curr = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
            m_scr[b] = jnp.broadcast_to(m_next, m_scr.shape[1:])
            l_scr[b] = jnp.broadcast_to(l_next, l_scr.shape[1:])
            vt = v_ref[b].reshape(-1, v_ref.shape[-2], v_ref.shape[-1])
            if quantized and i8mxu:
                vs = vs_ref[b].reshape(-1, vs_ref.shape[-1])
                pi, sp = _quant_rows_i8(p * vs[:, None, :])
                pv_i = jax.lax.dot_general(
                    pi, vt, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )
                acc_scr[b] = acc_scr[b] * alpha + pv_i.astype(jnp.float32) * sp
            else:
                if quantized:
                    v = vt.astype(jnp.bfloat16)
                    vs = vs_ref[b].reshape(-1, vs_ref.shape[-1])
                    pv = (p * vs[:, None, :]).astype(jnp.bfloat16)
                else:
                    v = vt
                    pv = p.astype(v.dtype)
                acc_scr[b] = acc_scr[b] * alpha + jax.lax.dot_general(
                    pv, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                )

    @pl.when(i == n_blocks - 1)
    def _final():
        for b in range(batch):
            q = q_at(b)
            kc = kc_at(b).astype(q.dtype)
            vc = vc_at(b).astype(jnp.float32)
            s_cur = (
                jax.lax.dot_general(
                    q, kc, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_prev = m_scr[b, :, :, :1]
            l_prev = l_scr[b, :, :, :1]
            m_next = jnp.maximum(m_prev, s_cur)
            alpha = jnp.exp(m_prev - m_next)
            p_cur = jnp.exp(s_cur - m_next)
            l_next = alpha * l_prev + p_cur
            acc = acc_scr[b] * alpha + jax.lax.dot_general(
                p_cur, vc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
            o_store(b, (acc / l_safe).astype(o_ref.dtype))


def _decode_kernel_bvec(
    layer_ref,  # (1,) int32 scalar-prefetch
    pos_ref,  # (B,) int32 scalar-prefetch
    maxpos_ref,  # (B//BB,) int32 scalar-prefetch: per-group max(pos) clamp
    q_ref,  # (BB, G, M, HS)
    k_ref,  # (BB, 1, G, BK, HS) — one DMA covers the whole slot group
    v_ref,
    *rest,  # [ks_ref, vs_ref (BB, G, 1, BK) if quantized,] kc, vc, o, m, l, acc
    block_k: int,
    n_blocks: int,
    scale: float,
    quantized: bool = False,
    batch: int = 0,  # slots per grid step (BB)
    i8mxu: bool = False,
):
    """_decode_kernel_bfold with the per-slot math VECTORIZED over the BB
    axis instead of statically unrolled: the (BB, G, ...) tile feeds ONE
    batched dot / one elementwise stream, so the serial in-kernel chain no
    longer grows with BB (the unrolled variant lost at BB>=4 because BB
    copies of the softmax bookkeeping serialized). Per-slot raggedness is
    handled by a (BB, 1, BK) live mask instead of per-slot `pl.when` skips —
    dead compute is masked, not skipped, but the kernel is DMA-bound and the
    group's DMA is already clamped on max(pos) (bkv_map)."""
    if quantized:
        ks_ref, vs_ref, kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    bi = pl.program_id(0)
    i = pl.program_id(2)
    bb = batch
    g, m, hs = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    prec = jax.lax.Precision.DEFAULT if quantized else None

    @pl.when(i * block_k < maxpos_ref[bi])
    def _block():
        kt = k_ref[...].reshape(bb * g, block_k, hs)
        # per-slot live mask: history column t is live for slot b iff
        # t < pos[b] (concat of BB scalar-broadcast compares)
        t_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (1, m, block_k), 2)
            + i * block_k
        )
        mask = jnp.concatenate(
            [t_idx < pos_ref[bi * bb + b] for b in range(bb)], axis=0
        )  # (BB, M, BK)
        mask = jnp.broadcast_to(mask[:, None], (bb, g, m, block_k)).reshape(
            bb * g, m, block_k
        )
        if quantized and i8mxu:
            # int8 MXU path: see _decode_kernel
            qi, sq = _quant_rows_i8(
                q_ref[...].reshape(bb * g, m, hs).astype(jnp.float32)
            )
            s_i = jax.lax.dot_general(
                qi, kt, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            s = s_i.astype(jnp.float32) * (sq * scale)
        else:
            if quantized:
                k = kt.astype(jnp.bfloat16)
                q = q_ref[...].reshape(bb * g, m, hs).astype(jnp.bfloat16)
            else:
                k = kt
                q = q_ref[...].reshape(bb * g, m, hs).astype(k.dtype)
            s = (
                jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                * scale
            )  # (BB*G, M, BK)
        if quantized:
            ks = ks_ref[...].reshape(bb * g, ks_ref.shape[-1])
            s = s * ks[:, None, :]
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[...].reshape(bb * g, m, 128)[:, :, :1]
        l_prev = l_scr[...].reshape(bb * g, m, 128)[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        # a slot whose history ends before this block has an ALL-masked row:
        # there m_next == MASK_VALUE and exp(s - m_next) == 1, so zero the
        # dead columns explicitly (the unrolled kernels skip such slots with
        # pl.when instead)
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_scr[...] = jnp.broadcast_to(
            m_next, (bb * g, m, 128)
        ).reshape(m_scr.shape)
        l_scr[...] = jnp.broadcast_to(
            l_next, (bb * g, m, 128)
        ).reshape(l_scr.shape)
        vt = v_ref[...].reshape(bb * g, block_k, hs)
        acc_prev = acc_scr[...].reshape(bb * g, m, hs)
        if quantized and i8mxu:
            vs = vs_ref[...].reshape(bb * g, vs_ref.shape[-1])
            pi, sp = _quant_rows_i8(p * vs[:, None, :])
            pv_i = jax.lax.dot_general(
                pi, vt, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            acc = acc_prev * alpha + pv_i.astype(jnp.float32) * sp
        else:
            if quantized:
                v = vt.astype(jnp.bfloat16)
                vs = vs_ref[...].reshape(bb * g, vs_ref.shape[-1])
                pv = (p * vs[:, None, :]).astype(jnp.bfloat16)
            else:
                v = vt
                pv = p.astype(v.dtype)
            acc = acc_prev * alpha + jax.lax.dot_general(
                pv, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )
        acc_scr[...] = acc.reshape(acc_scr.shape)

    @pl.when(i == n_blocks - 1)
    def _final():
        q = q_ref[...].reshape(bb * g, m, hs)
        kc = kc_ref[...].reshape(bb * g, 1, hs).astype(q.dtype)
        vc = vc_ref[...].reshape(bb * g, 1, hs).astype(jnp.float32)
        s_cur = (
            jax.lax.dot_general(
                q, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (BB*G, M, 1)
        m_prev = m_scr[...].reshape(bb * g, m, 128)[:, :, :1]
        l_prev = l_scr[...].reshape(bb * g, m, 128)[:, :, :1]
        m_next = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_next)
        p_cur = jnp.exp(s_cur - m_next)
        l_next = alpha * l_prev + p_cur
        acc = acc_scr[...].reshape(bb * g, m, hs) * alpha + jax.lax.dot_general(
            p_cur, vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
        o_ref[...] = (acc / l_safe).reshape(o_ref.shape).astype(o_ref.dtype)


def _decode_kernel_dyn(
    layer_ref,  # (1,) int32 scalar-prefetch
    pos_ref,  # (B,) int32 scalar-prefetch
    maxpos_ref,  # (B//BB,) int32 scalar-prefetch: per-group max(pos)
    q_ref,  # (BB, G, M, HS) VMEM tile
    k_hbm,  # FULL (B, L, KVH, S, HS) cache, memory_space=ANY (HBM)
    v_hbm,
    *rest,  # [ks_hbm, vs_hbm (B, L, KVH, S),] kc, vc, o,
    # m, l, acc, k_buf, v_buf, [ks_buf, vs_buf,] t_scr, sems
    block_k: int,
    scale: float,
    quantized: bool = False,
    batch: int = 0,  # slots per grid step (BB)
    i8mxu: bool = False,
    n_groups_total: int = 1,
):
    """_decode_kernel_bfold with the KV-block axis moved INSIDE the kernel:
    one grid step per BB-slot group, and a manual double-buffered DMA loop
    whose trip count is the group's LIVE block count (cdiv(maxpos, BK), a
    dynamic scalar). The static grid ran a Mosaic grid-step transition for
    every (group, block) including blocks past `pos` (~1.4 us each measured
    at 7B — the dominant cost of the decode-attention residue, BASELINE.md);
    here dead blocks simply don't exist and the pipeline is flattened ACROSS
    groups (an SMEM tile counter persists over grid steps), so the only
    exposed DMA latency is the very first tile of the layer. The per-tile
    math is identical to _decode_kernel_bfold."""
    if quantized:
        (ks_hbm, vs_hbm, kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr,
         k_buf, v_buf, ks_buf, vs_buf, t_scr, sems) = rest
    else:
        (kc_ref, vc_ref, o_ref, m_scr, l_scr, acc_scr, k_buf, v_buf,
         t_scr, sems) = rest
    bi = pl.program_id(0)
    l = layer_ref[0]
    bb = batch
    n_live = (jnp.maximum(maxpos_ref[bi], 1) + block_k - 1) // block_k

    def copies(b, i, slot):
        # all DMAs for one (group, block) tile; b/i/slot may be dynamic
        b0 = b * bb
        cs = [
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(b0, bb), l, :, pl.ds(i * block_k, block_k), :],
                k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(b0, bb), l, :, pl.ds(i * block_k, block_k), :],
                v_buf.at[slot], sems.at[slot, 1]),
        ]
        if quantized:
            cs += [
                pltpu.make_async_copy(
                    ks_hbm.at[pl.ds(b0, bb), l, :, pl.ds(i * block_k, block_k)],
                    ks_buf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[pl.ds(b0, bb), l, :, pl.ds(i * block_k, block_k)],
                    vs_buf.at[slot], sems.at[slot, 3]),
            ]
        return cs

    @pl.when(bi == 0)
    def _warm():
        # flattened-pipeline warmup: the one exposed DMA per layer
        t_scr[0] = 0
        for c in copies(0, 0, 0):
            c.start()

    m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    prec = jax.lax.Precision.DEFAULT if quantized else None

    def body(i, _):
        t = t_scr[0]
        slot = jax.lax.rem(t, 2)
        last_in_group = i + 1 >= n_live
        # flattened next tile: (bi, i+1), or the NEXT group's block 0
        # (every group has n_live >= 1 — an all-masked first block is
        # self-correcting through the online-softmax alpha)
        nxt_b = jnp.where(last_in_group, jnp.minimum(bi + 1, n_groups_total - 1), bi)
        nxt_i = jnp.where(last_in_group, 0, i + 1)

        @pl.when(jnp.logical_not(last_in_group & (bi == n_groups_total - 1)))
        def _start_next():
            for c in copies(nxt_b, nxt_i, jax.lax.rem(t + 1, 2)):
                c.start()

        for c in copies(bi, i, slot):
            c.wait()

        for b in range(bb):  # static unroll: per-slot scalar pos/masking
            pos = pos_ref[bi * bb + b]

            @pl.when(i * block_k < pos)
            def _block(b=b, pos=pos):
                kt = k_buf[slot, b]  # (G, BK, HS)
                if quantized and i8mxu:
                    qi, sq = _quant_rows_i8(q_ref[b].astype(jnp.float32))
                    s_i = jax.lax.dot_general(
                        qi, kt, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                    s = s_i.astype(jnp.float32) * (sq * scale)
                else:
                    if quantized:
                        k = kt.astype(jnp.bfloat16)
                        q = q_ref[b].astype(jnp.bfloat16)
                    else:
                        k = kt
                        q = q_ref[b].astype(k.dtype)
                    s = (
                        jax.lax.dot_general(
                            q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32, precision=prec,
                        )
                        * scale
                    )  # (G, M, BK)
                if quantized:
                    s = s * ks_buf[slot, b][:, None, :]
                t_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
                    + i * block_k
                )
                s = jnp.where(t_idx < pos, s, MASK_VALUE)

                m_prev = m_scr[b, :, :, :1]
                l_prev = l_scr[b, :, :, :1]
                m_curr = jnp.max(s, axis=2, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
                m_scr[b] = jnp.broadcast_to(m_next, m_scr.shape[1:])
                l_scr[b] = jnp.broadcast_to(l_next, l_scr.shape[1:])
                vt = v_buf[slot, b]  # (G, BK, HS)
                if quantized and i8mxu:
                    vs = vs_buf[slot, b]  # (G, BK)
                    pi, sp = _quant_rows_i8(p * vs[:, None, :])
                    pv_i = jax.lax.dot_general(
                        pi, vt, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                    acc_scr[b] = acc_scr[b] * alpha + pv_i.astype(jnp.float32) * sp
                else:
                    if quantized:
                        v = vt.astype(jnp.bfloat16)
                        vs = vs_buf[slot, b]
                        pv = (p * vs[:, None, :]).astype(jnp.bfloat16)
                    else:
                        v = vt
                        pv = p.astype(v.dtype)
                    acc_scr[b] = acc_scr[b] * alpha + jax.lax.dot_general(
                        pv, v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32, precision=prec,
                    )

        t_scr[0] = t + 1
        return 0

    jax.lax.fori_loop(0, n_live, body, 0)

    # fold in the current token and store (same as _decode_kernel_bfold)
    for b in range(bb):
        q = q_ref[b]
        kc = kc_ref[b].astype(q.dtype)
        vc = vc_ref[b].astype(jnp.float32)
        s_cur = (
            jax.lax.dot_general(
                q, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m_prev = m_scr[b, :, :, :1]
        l_prev = l_scr[b, :, :, :1]
        m_next = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_next)
        p_cur = jnp.exp(s_cur - m_next)
        l_next = alpha * l_prev + p_cur
        acc = acc_scr[b] * alpha + jax.lax.dot_general(
            p_cur, vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
        o_ref[b] = (acc / l_safe).astype(o_ref.dtype)


def _decode_kernel_paged(layer_ref, pos_ref, pt_ref, *rest, **kw):
    # page table is consumed by the BlockSpec index maps only
    del pt_ref
    _decode_kernel(layer_ref, pos_ref, *rest, **kw)


def _prefill_kernel_paged(start_ref, valid_ref, layer_ref, pt_ref, *rest, **kw):
    del pt_ref
    _prefill_kernel(start_ref, valid_ref, layer_ref, *rest, **kw)


def _pick_block_k(s: int, target: int = 256) -> int:
    for bk in (target, 128, 64, 32, 16, 8):
        if bk <= s and s % bk == 0:
            return bk
    return s


def _prefill_kernel(
    start_ref,  # (B,) int32 scalar-prefetch: chunk start position per slot
    valid_ref,  # (B,) int32 scalar-prefetch: valid tokens in chunk per slot
    layer_ref,  # (1,) int32
    q_ref,  # (1, G, BT, M, HS) — G kv heads per grid step (head-batched)
    k_ref,  # contiguous: (1, 1, G, BK, HS); paged: (1, G, 1, BK, HS)
    v_ref,
    *rest,  # [ks_ref, vs_ref (G*BK scales) if quantized,] o_ref, m, l, acc
    block_t: int,
    block_k: int,
    n_k_blocks: int,
    scale: float,
    quantized: bool = False,
    kv_mul: int = 1,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    tq = pl.program_id(2)
    i = pl.program_id(3)
    start = start_ref[b]
    valid = valid_ref[b]
    hs = q_ref.shape[-1]
    g = q_ref.shape[1]
    rows = block_t * kv_mul  # q rows per head group

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # the last query row of this tile sits at cache position
    # start + min((tq+1)*BT, valid) - 1; KV blocks past it are all-masked.
    q_pos_max = start + jnp.minimum((tq + 1) * block_t, valid) - 1

    @pl.when(i * block_k <= q_pos_max)
    def _block():
        # normalize ref layouts: both contiguous and paged KV tiles reshape
        # to (G, BK, HS); quantized scale tiles to (G, BK)
        if quantized:
            k = k_ref[...].reshape(g, block_k, hs).astype(jnp.bfloat16)
            q = q_ref[0].reshape(g, rows, hs).astype(jnp.bfloat16)
        else:
            k = k_ref[...].reshape(g, block_k, hs)
            q = q_ref[0].reshape(g, rows, hs).astype(k.dtype)
        # see _decode_kernel: bf16 tiles must not inherit "highest" precision
        prec = jax.lax.Precision.DEFAULT if quantized else None
        s = (
            jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            )
            * scale
        )  # (G, ROWS, BK)
        if quantized:
            s = s * ks_ref[...].reshape(g, block_k)[:, None, :]
        t_row = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // kv_mul
            + tq * block_t
        )
        kv_col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * block_k
        # causal over the absolute positions; rows beyond `valid` are
        # bystanders whose output is discarded, but mask them anyway so
        # stale cache contents can't produce inf/nan that poisons the tile
        mask = (kv_col <= start + t_row) & (t_row < valid)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)
        if quantized:
            v = v_ref[...].reshape(g, block_k, hs).astype(jnp.bfloat16)
            pv = (p * vs_ref[...].reshape(g, block_k)[:, None, :]).astype(
                jnp.bfloat16
            )
        else:
            v = v_ref[...].reshape(g, block_k, hs)
            pv = p.astype(v.dtype)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            pv, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(i == n_k_blocks - 1)
    def _final():
        l = l_scr[:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).reshape(
            g, block_t, kv_mul, hs
        ).astype(o_ref.dtype)


def _prefill_kernel_tmaj(
    start_ref,  # (B,) int32 scalar-prefetch
    valid_ref,  # (B,) int32 scalar-prefetch
    layer_ref,  # (1,) int32
    q_ref,  # (1, BT, GW, HS) — T-major: heads on the SUBLANE dim, exactly
    #         the head-split QKV emission's layout (no XLA transpose)
    k_ref,  # (1, 1, G, BK, HS)
    v_ref,
    *rest,  # [ks_ref, vs_ref if quantized,] o_ref, m, l, acc
    block_t: int,
    block_k: int,
    n_k_blocks: int,
    scale: float,
    quantized: bool = False,
    kv_mul: int = 1,
):
    """T-major flash prefill: q tiles and the output stay in the
    (T, H, HS) layout the surrounding kernels produce/consume, killing
    the 2x ~67 MB/layer relayout copies of the head-major variant
    (BASELINE r4 prefill histogram). Per-head dots via static sublane
    slices — probed exact on-chip (tools/probe_xheads.py headslice)."""
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    tq = pl.program_id(2)
    i = pl.program_id(3)
    start = start_ref[b]
    valid = valid_ref[b]
    hs = q_ref.shape[-1]
    g_blk = k_ref.shape[2]
    gw = g_blk * kv_mul

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_pos_max = start + jnp.minimum((tq + 1) * block_t, valid) - 1

    @pl.when(i * block_k <= q_pos_max)
    def _block():
        prec = jax.lax.Precision.DEFAULT if quantized else None
        kt = k_ref[...].reshape(g_blk, block_k, hs)
        vt = v_ref[...].reshape(g_blk, block_k, hs)
        if quantized:
            kt = kt.astype(jnp.bfloat16)
            vt = vt.astype(jnp.bfloat16)
            kss = ks_ref[...].reshape(g_blk, block_k)
            vss = vs_ref[...].reshape(g_blk, block_k)
        # mask is head-independent: compute once per (t, k) tile
        t_row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_t, block_k), 0)
            + tq * block_t
        )
        kv_col = (
            jax.lax.broadcasted_iota(jnp.int32, (block_t, block_k), 1)
            + i * block_k
        )
        mask = (kv_col <= start + t_row) & (t_row < valid)

        for g in range(g_blk):
            k_g = kt[g]
            v_g = vt[g]
            for m in range(kv_mul):
                h = g * kv_mul + m
                q_h = q_ref[0, :, h].astype(k_g.dtype)  # (BT, HS)
                s = (
                    jax.lax.dot_general(
                        q_h, k_g, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    * scale
                )  # (BT, BK)
                if quantized:
                    s = s * kss[g][None, :]
                s = jnp.where(mask, s, MASK_VALUE)

                m_prev = m_scr[:, h, :1]
                l_prev = l_scr[:, h, :1]
                m_curr = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                m_scr[:, h] = jnp.broadcast_to(m_next, (block_t, 128))
                l_scr[:, h] = jnp.broadcast_to(l_next, (block_t, 128))
                if quantized:
                    pv = (p * vss[g][None, :]).astype(jnp.bfloat16)
                else:
                    pv = p.astype(v_g.dtype)
                acc_scr[:, h] = acc_scr[:, h] * alpha + jax.lax.dot_general(
                    pv, v_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

    @pl.when(i == n_k_blocks - 1)
    def _final():
        l = l_scr[:, :, :1]  # (BT, GW, 1)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)


def _pick_block_t(t: int, target: int = 128) -> int:
    for bt in (target, 128, 64, 32, 16, 8, 4, 2):
        if bt <= t and t % bt == 0:
            return bt
    return t


@functools.partial(jax.jit, static_argnames=("block_t", "block_k", "interpret"))
def attention_prefill_pallas(
    q: jax.Array,  # (B, T, H, HS) — rope'd queries for the chunk
    k_cache: jax.Array,  # (B, L, KVH, S, HS) — chunk rows ALREADY written
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    start: jax.Array,  # (B,) int32 — chunk start position per slot
    valid: jax.Array,  # (B,) int32 — valid tokens in the chunk per slot
    k_scale: jax.Array | None = None,  # (B, L, KVH, S) f32 — int8 KV cache
    v_scale: jax.Array | None = None,
    *,
    block_t: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash prefill attention over the (already updated) KV cache: causal
    within the chunk, full attention over the 0..start-1 history. Never
    materializes the (T, S) score matrix — the TTFT analog of the decode
    kernel (the reference has no prefill at all: it force-feeds prompts one
    token per step, llama.cpp:1030-1033)."""
    b, t, h, hs = q.shape
    _, n_layers, kvh, s, _ = k_cache.shape
    kv_mul = h // kvh
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bt = block_t or _pick_block_t(t, target=256)
    bk = block_k or _pick_block_k(s, target=512)
    # sanitize explicit overrides (env/tuning args): a block that does not
    # divide the array would silently FLOOR the grid and drop the tail from
    # attention — snap down to a legal divisor instead
    if t % bt or bt > t:
        bt = _pick_block_t(t, target=bt)
    if s % bk or bk > s:
        bk = _pick_block_k(s, target=bk)
    n_t_blocks = t // bt
    n_k_blocks = s // bk
    scale = 1.0 / (hs ** 0.5)
    # head-batch KV heads per grid step (same rationale as decode: un-batched
    # MHA prefill at 7B was 8192 grid steps of 16 KB DMAs — 6.1 ms/layer,
    # ~70x over the FLOPs roofline). Cap by scratch VMEM: G*BT*M*(2*128+HS)*4.
    # Caps sized so a 7B b8 t512 s1024 call runs ~128 grid steps/layer, not
    # 512 — the kernel was grid-overhead-bound (~4 us/step flat: 72 ->
    # ~30 ms/prefill from this change alone); ~13 MB of VMEM tiles is fine
    # on a 128 MB core (vmem_limit raised below).
    g_blk = 1
    rows = bt * kv_mul
    while (
        g_blk < kvh
        and kvh % (g_blk * 2) == 0
        and (2 * g_blk) * rows * (2 * 128 + hs) * 4 <= 8 * 2 ** 20
        and (2 * g_blk) * bk * hs * k_cache.dtype.itemsize <= 2 * 2 ** 20
    ):
        g_blk *= 2

    gw = g_blk * kv_mul
    t_major = (
        _ENV_PREFILL_TMAJ and gw % 8 == 0 and hs % 128 == 0 and h % gw == 0
    )
    if t_major:
        # q and the output stay (B, T, H, HS): head blocks ride the
        # sublane dim and the kernel does per-head dots/stores — the two
        # ~67 MB/layer XLA relayouts (q transpose in, output transpose
        # out) disappear from the graph
        layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

        def q_map_t(bi, g, tq, i, start_ref, valid_ref, layer_ref):
            return (bi, tq, g, 0)

        def kv_map_t(bi, g, tq, i, start_ref, valid_ref, layer_ref):
            q_pos_max = start_ref[bi] + jnp.minimum(
                (tq + 1) * bt, valid_ref[bi]) - 1
            last_live = jnp.maximum(q_pos_max, 0) // bk
            return (bi, layer_ref[0], g, jnp.minimum(i, last_live), 0)

        def scale_kv_map_t(bi, g, tq, i, start_ref, valid_ref, layer_ref):
            q_pos_max = start_ref[bi] + jnp.minimum(
                (tq + 1) * bt, valid_ref[bi]) - 1
            last_live = jnp.maximum(q_pos_max, 0) // bk
            return (bi, layer_ref[0] * (kvh // g_blk) + g, 0,
                    jnp.minimum(i, last_live))

        in_specs_t = [
            pl.BlockSpec((1, bt, gw, hs), q_map_t),
            pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map_t),
            pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map_t),
        ]
        operands_t = [q, k_cache, v_cache]
        if quantized:
            in_specs_t += [
                pl.BlockSpec((1, g_blk, 1, bk), scale_kv_map_t),
                pl.BlockSpec((1, g_blk, 1, bk), scale_kv_map_t),
            ]
            operands_t += [
                k_scale.reshape(b, n_layers * kvh, 1, s),
                v_scale.reshape(b, n_layers * kvh, 1, s),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, kvh // g_blk, n_t_blocks, n_k_blocks),
            in_specs=in_specs_t,
            out_specs=pl.BlockSpec((1, bt, gw, hs), q_map_t),
            scratch_shapes=[
                pltpu.VMEM((bt, gw, 128), jnp.float32),
                pltpu.VMEM((bt, gw, 128), jnp.float32),
                pltpu.VMEM((bt, gw, hs), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _prefill_kernel_tmaj, block_t=bt, block_k=bk,
            n_k_blocks=n_k_blocks, scale=scale, quantized=quantized,
            kv_mul=kv_mul,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, t, h, hs), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 2 ** 20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * t * h * s * hs,
                bytes_accessed=2 * b * kvh * s * hs
                * k_cache.dtype.itemsize * n_t_blocks
                + 2 * b * t * h * hs * q.dtype.itemsize,
                transcendentals=b * t * h * s,
            ),
            interpret=interpret,
        )(start, valid, layer_arr, *operands_t)

    # (B, T, KVH, M, HS) -> (B, KVH, T, M, HS): head-major tiles
    qs = q.reshape(b, t, kvh, kv_mul, hs).transpose(0, 2, 1, 3, 4)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    def q_map(bi, g, tq, i, start_ref, valid_ref, layer_ref):
        return (bi, g, tq, 0, 0)

    def kv_map(bi, g, tq, i, start_ref, valid_ref, layer_ref):
        # clamp: don't DMA blocks past the causal frontier of this q tile
        q_pos_max = start_ref[bi] + jnp.minimum((tq + 1) * bt, valid_ref[bi]) - 1
        last_live = jnp.maximum(q_pos_max, 0) // bk
        return (bi, layer_ref[0], g, jnp.minimum(i, last_live), 0)

    def scale_kv_map(bi, g, tq, i, start_ref, valid_ref, layer_ref):
        # scale plane viewed as (B, L*KVH, 1, S); dim-1 blocks of g_blk rows
        q_pos_max = start_ref[bi] + jnp.minimum((tq + 1) * bt, valid_ref[bi]) - 1
        last_live = jnp.maximum(q_pos_max, 0) // bk
        return (
            bi, layer_ref[0] * (kvh // g_blk) + g, 0, jnp.minimum(i, last_live)
        )

    in_specs = [
        pl.BlockSpec((1, g_blk, bt, kv_mul, hs), q_map),
        pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map),
        pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map),
    ]
    operands = [qs, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, g_blk, 1, bk), scale_kv_map),
            pl.BlockSpec((1, g_blk, 1, bk), scale_kv_map),
        ]
        operands += [
            k_scale.reshape(b, n_layers * kvh, 1, s),
            v_scale.reshape(b, n_layers * kvh, 1, s),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kvh // g_blk, n_t_blocks, n_k_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_blk, bt, kv_mul, hs), q_map),
        scratch_shapes=[
            pltpu.VMEM((g_blk, rows, 128), jnp.float32),
            pltpu.VMEM((g_blk, rows, 128), jnp.float32),
            pltpu.VMEM((g_blk, rows, hs), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, block_t=bt, block_k=bk, n_k_blocks=n_k_blocks, scale=scale,
        quantized=quantized, kv_mul=kv_mul,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, t, kv_mul, hs), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * h * s * hs,
            bytes_accessed=2 * b * kvh * s * hs * k_cache.dtype.itemsize * n_t_blocks
            + 2 * b * t * h * hs * q.dtype.itemsize,
            transcendentals=b * t * h * s,
        ),
        interpret=interpret,
    )(start, valid, layer_arr, *operands)
    # (B, KVH, T, M, HS) -> (B, T, H, HS)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t, h, hs)


@functools.partial(
    jax.jit, static_argnames=("block_k", "interpret")
)
def attention_decode_pallas(
    q: jax.Array,  # (B, H, HS)
    k_cache: jax.Array,  # (B, L, KVH, S, HS) — FULL cache, history only
    v_cache: jax.Array,  # (B, L, KVH, S, HS)
    layer: jax.Array,  # () int32
    pos: jax.Array,  # (B,) int32 — history is 0..pos-1
    k_cur: jax.Array,  # (B, KVH, HS)
    v_cur: jax.Array,  # (B, KVH, HS)
    k_scale: jax.Array | None = None,  # (B, L, KVH, S) f32 — int8 KV cache
    v_scale: jax.Array | None = None,
    *,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    b, h, hs = q.shape
    _, n_layers, kvh, s, _ = k_cache.shape
    kvh_l = k_cur.shape[1]  # logical head count; cache may be 8-padded
    if kvh_l != kvh:
        # padded int8 cache (models/llama.py::kvh_storage, 110m kvh=12->16):
        # pad q kv-head-major and the current rows with zeros (zero rows
        # carry scale 1 in the cache, so no NaNs), slice the output back
        kv_mul_l = h // kvh_l
        qp = _pad_heads_grouped(q, kvh_l, kvh, kv_mul_l)
        out = attention_decode_pallas(
            qp, k_cache, v_cache, layer, pos,
            _pad_heads_grouped(k_cur, kvh_l, kvh, 1),
            _pad_heads_grouped(v_cur, kvh_l, kvh, 1),
            k_scale, v_scale, block_k=block_k, interpret=interpret,
        )
        return out.reshape(b, kvh, kv_mul_l, hs)[:, :kvh_l].reshape(b, h, hs)
    kv_mul = h // kvh
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if (
        hs < 64 or (quantized and kvh % 8)
        or (hs % 128 and _ENV_DECODE_SUB128 != "pallas")
    ) and not interpret:
        # sub-lane head sizes (toy configs) hit Mosaic layout edge cases;
        # DIRECT calls with a non-8-aligned int8-KV scale plane hit the
        # "slice must be aligned to tiling (8)" DMA rule (model paths
        # instead allocate 8-padded caches — kvh_storage); and at hs=64
        # (stories110M) the per-slot Pallas grid measured 5290 tok/s vs
        # the XLA fused einsum's ~7130 at the dispatch-bound 110m scale —
        # the einsum is the measured default there
        # (HIPLLAMA_DECODE_SUB128=pallas engages the kernel anyway; it
        # compiles and is parity-tested on the 8-padded cache)
        from hip_llama_tpu.models.llama import attention_decode_xla

        return attention_decode_xla(
            q, k_cache, v_cache, layer, pos, k_cur, v_cur, k_scale, v_scale
        )
    bk = block_k or _ENV_DECODE_BLOCK_K or _pick_block_k(s, target=1024)
    if s % bk or bk > s:
        # sanitize overrides: a non-divisor block would FLOOR the grid and
        # silently drop the KV tail from attention
        bk = _pick_block_k(s, target=bk)
    if quantized and bk % 128 and bk != s:
        # the (.., 1, bk) scale tile needs a lane-dim multiple of 128
        bk = 128 if s % 128 == 0 else s
    n_blocks = s // bk
    scale = 1.0 / (hs ** 0.5)
    # batch KV heads per grid step so each step streams >=~512 KB (grid-step
    # overhead swamps tiny tiles at kv_mul=1: 7B MHA had 512 steps/layer)
    g_blk = 1
    target_bytes = _ENV_DECODE_TARGET_KB * 1024
    while (
        g_blk < kvh
        and kvh % (g_blk * 2) == 0
        and g_blk * bk * hs * k_cache.dtype.itemsize < target_bytes
    ):
        g_blk *= 2

    qs = q.reshape(b, kvh, kv_mul, hs)
    kc4 = k_cur.reshape(b, kvh, 1, hs)
    vc4 = v_cur.reshape(b, kvh, 1, hs)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    if _ENV_DECODE_BFOLD == "1":
        bb = b
    elif _ENV_DECODE_BB >= 0:
        bb = _ENV_DECODE_BB
    else:
        # auto default; the b % bb gate below skips odd batches. bb=4
        # (r4 sweep: 706.4 vs 702.9 at bb=2, 7B b8) — halves the grid
        # steps again over bb=2; bb=8 lost to serialized in-kernel unrolls
        bb = 4 if b % 4 == 0 else 2
    bb_dyn = max(bb, 1)
    if (
        _ENV_DYN
        and b % bb_dyn == 0
        and s % bk == 0
        and (not quantized or bk % 128 == 0)
        # two double-buffered (BB, KVH, BK, HS) K+V tiles must fit VMEM
        and 2 * 2 * bb_dyn * kvh * bk * hs * k_cache.dtype.itemsize
        <= 32 * 2 ** 20
    ):
        n_groups_total = b // bb_dyn
        maxpos = jnp.max(
            pos.reshape(n_groups_total, bb_dyn), axis=1
        ).astype(jnp.int32)

        def dq_map(bi, layer_ref, pos_ref, maxpos_ref):
            return (bi, 0, 0, 0)

        in_specs = [
            pl.BlockSpec((bb_dyn, kvh, kv_mul, hs), dq_map),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        operands = [qs, k_cache, v_cache]
        if quantized:
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ]
            operands += [k_scale, v_scale]
        in_specs += [
            pl.BlockSpec((bb_dyn, kvh, 1, hs), dq_map),
            pl.BlockSpec((bb_dyn, kvh, 1, hs), dq_map),
        ]
        operands += [kc4, vc4]
        scratch_shapes = [
            pltpu.VMEM((bb_dyn, kvh, kv_mul, 128), jnp.float32),
            pltpu.VMEM((bb_dyn, kvh, kv_mul, 128), jnp.float32),
            pltpu.VMEM((bb_dyn, kvh, kv_mul, hs), jnp.float32),
            pltpu.VMEM((2, bb_dyn, kvh, bk, hs), k_cache.dtype),
            pltpu.VMEM((2, bb_dyn, kvh, bk, hs), v_cache.dtype),
        ]
        n_sems = 2
        if quantized:
            scratch_shapes += [
                pltpu.VMEM((2, bb_dyn, kvh, bk), jnp.float32),
                pltpu.VMEM((2, bb_dyn, kvh, bk), jnp.float32),
            ]
            n_sems = 4
        scratch_shapes += [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, n_sems)),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups_total,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb_dyn, kvh, kv_mul, hs), dq_map),
            scratch_shapes=scratch_shapes,
        )
        kernel = functools.partial(
            _decode_kernel_dyn, block_k=bk, scale=scale,
            quantized=quantized, batch=bb_dyn,
            i8mxu=quantized and _ENV_I8MXU,
            n_groups_total=n_groups_total,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, kvh, kv_mul, hs), q.dtype),
            compiler_params=pltpu.CompilerParams(
                # scratch (tile counter, DMA buffers) carries across grid
                # steps — the grid is a sequential flattened pipeline
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2 ** 20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * hs,
                bytes_accessed=2 * b * kvh * s * hs * k_cache.dtype.itemsize
                + 2 * b * h * hs * q.dtype.itemsize,
                transcendentals=b * h * s,
            ),
            interpret=interpret,
        )(layer_arr, pos, maxpos, *operands)
        return out.reshape(b, h, hs)
    if bb > 1 and b % bb == 0:
        # batch-grouped grid: (batch-groups, head-groups, kv-blocks); tiles
        # carry BB slots, the kernel unrolls the per-slot math
        maxpos = jnp.max(
            pos.reshape(b // bb, bb), axis=1
        ).astype(jnp.int32)

        def bq_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
            return (bi, g, 0, 0)

        def bkv_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
            last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
            return (bi, layer_ref[0], g, jnp.minimum(i, last_live), 0)

        def bscale_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
            last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
            return (bi, layer_ref[0] * (kvh // g_blk) + g, 0,
                    jnp.minimum(i, last_live))

        in_specs = [
            pl.BlockSpec((bb, g_blk, kv_mul, hs), bq_map),
            pl.BlockSpec((bb, 1, g_blk, bk, hs), bkv_map),
            pl.BlockSpec((bb, 1, g_blk, bk, hs), bkv_map),
        ]
        operands = [qs, k_cache, v_cache]
        if quantized:
            in_specs += [
                pl.BlockSpec((bb, g_blk, 1, bk), bscale_map),
                pl.BlockSpec((bb, g_blk, 1, bk), bscale_map),
            ]
            operands += [
                k_scale.reshape(b, n_layers * kvh, 1, s),
                v_scale.reshape(b, n_layers * kvh, 1, s),
            ]
        in_specs += [
            pl.BlockSpec((bb, g_blk, 1, hs), bq_map),
            pl.BlockSpec((bb, g_blk, 1, hs), bq_map),
        ]
        operands += [kc4, vc4]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b // bb, kvh // g_blk, n_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, g_blk, kv_mul, hs), bq_map),
            scratch_shapes=[
                pltpu.VMEM((bb, g_blk, kv_mul, 128), jnp.float32),
                pltpu.VMEM((bb, g_blk, kv_mul, 128), jnp.float32),
                pltpu.VMEM((bb, g_blk, kv_mul, hs), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _decode_kernel_bvec if _ENV_BVEC else _decode_kernel_bfold,
            block_k=bk, n_blocks=n_blocks, scale=scale,
            quantized=quantized, batch=bb, i8mxu=quantized and _ENV_I8MXU,
        )
        kv_tile = bb * g_blk * bk * hs * k_cache.dtype.itemsize
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, kvh, kv_mul, hs), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                # double-buffered (BB, G, BK, HS) K+V tiles outgrow the
                # default scoped-VMEM budget at bb>=4 g=32 bk=128
                vmem_limit_bytes=min(8 * kv_tile + 8 * 2**20, 100 * 2**20),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * hs,
                bytes_accessed=2 * b * kvh * s * hs * k_cache.dtype.itemsize
                + 2 * b * h * hs * q.dtype.itemsize,
                transcendentals=b * h * s,
            ),
            interpret=interpret,
        )(layer_arr, pos, maxpos, *operands)
        return out.reshape(b, h, hs)

    def q_map(bi, g, i, layer_ref, pos_ref):
        return (bi, g, 0, 0)

    def kv_map(bi, g, i, layer_ref, pos_ref):
        # clamp to the last block containing live history; skipped blocks
        # re-fetch the same tile, which the pipeline elides.
        last_live = jnp.maximum(pos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0], g, jnp.minimum(i, last_live), 0)

    def cur_map(bi, g, i, layer_ref, pos_ref):
        return (bi, g, 0, 0)

    def scale_map(bi, g, i, layer_ref, pos_ref):
        # scale plane viewed as (B, L*KVH, 1, S); dim-1 blocks of g_blk rows
        last_live = jnp.maximum(pos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0] * (kvh // g_blk) + g, 0, jnp.minimum(i, last_live))

    in_specs = [
        pl.BlockSpec((1, g_blk, kv_mul, hs), q_map),
        pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map),
        pl.BlockSpec((1, 1, g_blk, bk, hs), kv_map),
    ]
    operands = [qs, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, g_blk, 1, bk), scale_map),
            pl.BlockSpec((1, g_blk, 1, bk), scale_map),
        ]
        operands += [
            k_scale.reshape(b, n_layers * kvh, 1, s),
            v_scale.reshape(b, n_layers * kvh, 1, s),
        ]
    in_specs += [
        pl.BlockSpec((1, g_blk, 1, hs), cur_map),
        pl.BlockSpec((1, g_blk, 1, hs), cur_map),
    ]
    operands += [kc4, vc4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvh // g_blk, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_blk, kv_mul, hs), q_map),
        scratch_shapes=[
            pltpu.VMEM((g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((g_blk, kv_mul, hs), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _decode_kernel, block_k=bk, n_blocks=n_blocks, scale=scale,
        quantized=quantized, i8mxu=quantized and _ENV_I8MXU,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, kv_mul, hs), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * hs,
            bytes_accessed=2 * b * kvh * s * hs * k_cache.dtype.itemsize
            + 2 * b * h * hs * q.dtype.itemsize,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(layer_arr, pos, *operands)
    return out.reshape(b, h, hs)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "block_k", "interpret")
)
def attention_decode_fused(
    qkv: jax.Array,  # (B, H + 2*KVH, HS) — head-split QKV projection rows
    k_cache: jax.Array,  # (B, L, KVH, S, HS) — FULL cache, history only
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    pos: jax.Array,  # (B,) int32
    k_scale: jax.Array | None = None,  # (B, L, KVH, S) f32 — int8 KV cache
    v_scale: jax.Array | None = None,
    *,
    n_heads: int,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention consuming the QKV projection in its head-split
    kernel-output layout (q8_matmul(out_heads=HS)): q = rows 0..H-1,
    k_cur = rows H..H+KVH-1, v_cur = the rest. The BlockSpec index maps
    address those head rows directly, so the per-layer q/k/v column slices
    and the (B, D) -> (B, H, HS) lane->sublane relayout reshapes between
    the projection and attention kernels disappear from the XLA graph.
    Returns (B, H, HS) — bit-identical to attention_decode_pallas on the
    equivalent sliced operands."""
    b, nht, hs = qkv.shape
    h = n_heads
    _, n_layers, kvh, s, _ = k_cache.shape
    if nht != h + 2 * kvh:
        # padded int8 cache (models/llama.py::kvh_storage): rebuild the
        # head-split qkv with zero-padded q/k/v head blocks so the index
        # maps line up with the stored head count, then slice the output
        kvh_l = (nht - h) // 2
        assert nht == h + 2 * kvh_l and kvh > kvh_l, (qkv.shape, n_heads, kvh)
        kv_mul_l = h // kvh_l
        qkv_p = jnp.concatenate([
            _pad_heads_grouped(qkv[:, :h], kvh_l, kvh, kv_mul_l),
            _pad_heads_grouped(qkv[:, h : h + kvh_l], kvh_l, kvh, 1),
            _pad_heads_grouped(qkv[:, h + kvh_l :], kvh_l, kvh, 1),
        ], axis=1)
        out = attention_decode_fused(
            qkv_p, k_cache, v_cache, layer, pos, k_scale, v_scale,
            n_heads=kvh * kv_mul_l, block_k=block_k, interpret=interpret,
        )
        return out.reshape(b, kvh, kv_mul_l, hs)[:, :kvh_l].reshape(b, h, hs)
    kv_mul = h // kvh
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        return attention_decode_pallas(
            qkv[:, :h], k_cache, v_cache, layer, pos,
            qkv[:, h : h + kvh], qkv[:, h + kvh :], k_scale, v_scale,
            block_k=block_k, interpret=interpret,
        )

    if (hs < 64 or hs % 128) and not interpret:
        # hs=64 (stories110M): the in-kernel (bb, g, hs)->(bb*g, 1, hs)
        # current-row shape cast is unsupported by Mosaic at 64-lane
        # vectors; the sliced attention_decode_pallas path compiles and
        # runs at hs=64 (probed on-chip r5), so decline to it
        return fallback()
    bk = block_k or _ENV_DECODE_BLOCK_K or _pick_block_k(s, target=1024)
    if s % bk or bk > s:
        bk = _pick_block_k(s, target=bk)
    if quantized and bk % 128 and bk != s:
        bk = 128 if s % 128 == 0 else s
    n_blocks = s // bk
    scale = 1.0 / (hs ** 0.5)
    g_blk = 1
    target_bytes = _ENV_DECODE_TARGET_KB * 1024
    while (
        g_blk < kvh
        and kvh % (g_blk * 2) == 0
        and g_blk * bk * hs * k_cache.dtype.itemsize < target_bytes
    ):
        g_blk *= 2
    if _ENV_DECODE_BFOLD == "1":
        bb = b
    elif _ENV_DECODE_BB >= 0:
        bb = _ENV_DECODE_BB
    else:
        bb = 2
    if bb < 2 or b % bb:
        # the fused path rides the batch-grouped kernel; per-slot batches
        # (b=1 generate) take the sliced path — identical math
        return fallback()
    if (g_blk * kv_mul) % 8 and (g_blk * kv_mul) != nht and not interpret:
        # Mosaic block legality: the head-row sub-blocks (bb, g_blk*kv_mul,
        # hs) need an 8-aligned (or full-array) sublane dim — 110m's
        # kvh=12 only admits g_blk 4; decline to the sliced path
        # (identical math)
        return fallback()

    maxpos = jnp.max(pos.reshape(b // bb, bb), axis=1).astype(jnp.int32)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    def q3_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
        return (bi, g, 0)

    def kc3_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
        return (bi, h // g_blk + g, 0)

    def vc3_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
        return (bi, (h + kvh) // g_blk + g, 0)

    def bkv_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
        last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0], g, jnp.minimum(i, last_live), 0)

    def bscale_map(bi, g, i, layer_ref, pos_ref, maxpos_ref):
        last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0] * (kvh // g_blk) + g,
                0, jnp.minimum(i, last_live))

    in_specs = [
        pl.BlockSpec((bb, g_blk * kv_mul, hs), q3_map),
        pl.BlockSpec((bb, 1, g_blk, bk, hs), bkv_map),
        pl.BlockSpec((bb, 1, g_blk, bk, hs), bkv_map),
    ]
    operands = [qkv, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((bb, g_blk, 1, bk), bscale_map),
            pl.BlockSpec((bb, g_blk, 1, bk), bscale_map),
        ]
        operands += [
            k_scale.reshape(b, n_layers * kvh, 1, s),
            v_scale.reshape(b, n_layers * kvh, 1, s),
        ]
    in_specs += [
        pl.BlockSpec((bb, g_blk, hs), kc3_map),
        pl.BlockSpec((bb, g_blk, hs), vc3_map),
    ]
    operands += [qkv, qkv]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b // bb, kvh // g_blk, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, g_blk * kv_mul, hs), q3_map),
        scratch_shapes=[
            pltpu.VMEM((bb, g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((bb, g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((bb, g_blk, kv_mul, hs), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_bfold, block_k=bk, n_blocks=n_blocks, scale=scale,
        quantized=quantized, batch=bb, i8mxu=quantized and _ENV_I8MXU,
        flat_qo=True,
    )
    kv_tile = bb * g_blk * bk * hs * k_cache.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hs), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=min(8 * kv_tile + 8 * 2**20, 100 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * hs,
            bytes_accessed=2 * b * kvh * s * hs * k_cache.dtype.itemsize
            + 2 * b * h * hs * qkv.dtype.itemsize,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(layer_arr, pos, maxpos, *operands)
    return out


# ---------------------------------------------------------------------------
# paged variants: same kernel bodies, page-table-indexed KV tiles.
# The physical KV pool is (L, KVH, P, page_size, HS); a per-slot page table
# (B, max_pages) maps logical KV blocks to physical pages. The BlockSpec
# index map does the gather — Pallas's pipeline turns each grid step's page
# lookup into the DMA descriptor (the TPU-native form of the reference's
# logicId_physicAddr_mapper, BatchManager.hpp:22-28).


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_decode_paged(
    q: jax.Array,  # (B, H, HS)
    k_pages: jax.Array,  # (L, KVH, P, PS, HS)
    v_pages: jax.Array,
    page_table: jax.Array,  # (B, MAX_PAGES) int32
    layer: jax.Array,  # () int32
    pos: jax.Array,  # (B,) int32
    k_cur: jax.Array,  # (B, KVH, HS)
    v_cur: jax.Array,
    k_scale: jax.Array | None = None,  # (L, KVH, P, PS) f32 — int8 KV
    v_scale: jax.Array | None = None,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    b, h, hs = q.shape
    n_layers, kvh, p, ps, _ = k_pages.shape
    kv_mul = h // kvh
    max_pages = page_table.shape[1]
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scale = 1.0 / (hs ** 0.5)

    qs = q.reshape(b, kvh, kv_mul, hs)
    kc4 = k_cur.reshape(b, kvh, 1, hs)
    vc4 = v_cur.reshape(b, kvh, 1, hs)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    # head-batch KV heads per grid step (same rationale as the contiguous
    # decode kernel: un-batched MHA left the grid overhead-bound on tiny
    # page tiles — b*kvh*max_pages steps of one (PS, HS) DMA each). Heads
    # share the slot's page table, so one step streams G head-slabs of the
    # SAME physical page.
    g_blk = 1
    target_bytes = _ENV_DECODE_TARGET_KB * 1024
    while (
        g_blk < kvh
        and kvh % (g_blk * 2) == 0
        and g_blk * ps * hs * k_pages.dtype.itemsize < target_bytes
    ):
        g_blk *= 2

    def q_map(bi, g, i, layer_ref, pos_ref, pt_ref):
        return (bi, g, 0, 0)

    def kv_map(bi, g, i, layer_ref, pos_ref, pt_ref):
        last_live = jnp.maximum(pos_ref[bi] - 1, 0) // ps
        page = pt_ref[bi, jnp.minimum(i, last_live)]
        return (layer_ref[0], g, page, 0, 0)

    def cur_map(bi, g, i, layer_ref, pos_ref, pt_ref):
        return (bi, g, 0, 0)

    def scale_map(bi, g, i, layer_ref, pos_ref, pt_ref):
        # scale plane viewed as (L, KVH, P, 1, PS)
        last_live = jnp.maximum(pos_ref[bi] - 1, 0) // ps
        page = pt_ref[bi, jnp.minimum(i, last_live)]
        return (layer_ref[0], g, page, 0, 0)

    in_specs = [
        pl.BlockSpec((1, g_blk, kv_mul, hs), q_map),
        pl.BlockSpec((1, g_blk, 1, ps, hs), kv_map),
        pl.BlockSpec((1, g_blk, 1, ps, hs), kv_map),
    ]
    operands = [qs, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, g_blk, 1, 1, ps), scale_map),
            pl.BlockSpec((1, g_blk, 1, 1, ps), scale_map),
        ]
        operands += [
            k_scale.reshape(n_layers, kvh, p, 1, ps),
            v_scale.reshape(n_layers, kvh, p, 1, ps),
        ]
    in_specs += [
        pl.BlockSpec((1, g_blk, 1, hs), cur_map),
        pl.BlockSpec((1, g_blk, 1, hs), cur_map),
    ]
    operands += [kc4, vc4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kvh // g_blk, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_blk, kv_mul, hs), q_map),
        scratch_shapes=[
            pltpu.VMEM((g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((g_blk, kv_mul, 128), jnp.float32),
            pltpu.VMEM((g_blk, kv_mul, hs), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_paged, block_k=ps, n_blocks=max_pages, scale=scale,
        quantized=quantized, i8mxu=quantized and _ENV_I8MXU,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, kv_mul, hs), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, pos, page_table, *operands)
    return out.reshape(b, h, hs)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def attention_prefill_paged(
    q: jax.Array,  # (B, T, H, HS)
    k_pages: jax.Array,  # (L, KVH, P, PS, HS) — chunk rows ALREADY written
    v_pages: jax.Array,
    page_table: jax.Array,  # (B, MAX_PAGES)
    layer: jax.Array,
    start: jax.Array,  # (B,)
    valid: jax.Array,  # (B,)
    k_scale: jax.Array | None = None,  # (L, KVH, P, PS) f32 — int8 KV
    v_scale: jax.Array | None = None,
    *,
    block_t: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    b, t, h, hs = q.shape
    n_layers, kvh, p, ps, _ = k_pages.shape
    kv_mul = h // kvh
    max_pages = page_table.shape[1]
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bt = block_t or _pick_block_t(t)
    n_t_blocks = t // bt
    scale = 1.0 / (hs ** 0.5)
    # head-batch like the contiguous prefill kernel (pages are per-slot, so
    # the same page serves every head of the group)
    g_blk = 1
    rows = bt * kv_mul
    while (
        g_blk < kvh
        and kvh % (g_blk * 2) == 0
        and (2 * g_blk) * rows * (2 * 128 + hs) * 4 <= 4 * 2 ** 20
        and (2 * g_blk) * ps * hs * k_pages.dtype.itemsize <= 512 * 1024
    ):
        g_blk *= 2

    qs = q.reshape(b, t, kvh, kv_mul, hs).transpose(0, 2, 1, 3, 4)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    def q_map(bi, g, tq, i, start_ref, valid_ref, layer_ref, pt_ref):
        return (bi, g, tq, 0, 0)

    def kv_map(bi, g, tq, i, start_ref, valid_ref, layer_ref, pt_ref):
        q_pos_max = start_ref[bi] + jnp.minimum((tq + 1) * bt, valid_ref[bi]) - 1
        last_live = jnp.maximum(q_pos_max, 0) // ps
        page = pt_ref[bi, jnp.minimum(i, last_live)]
        return (layer_ref[0], g, page, 0, 0)

    def scale_map(bi, g, tq, i, start_ref, valid_ref, layer_ref, pt_ref):
        # scale plane viewed as (L*KVH, P, 1, PS); dim-0 blocks of g_blk rows
        q_pos_max = start_ref[bi] + jnp.minimum((tq + 1) * bt, valid_ref[bi]) - 1
        last_live = jnp.maximum(q_pos_max, 0) // ps
        page = pt_ref[bi, jnp.minimum(i, last_live)]
        return (layer_ref[0] * (kvh // g_blk) + g, page, 0, 0)

    in_specs = [
        pl.BlockSpec((1, g_blk, bt, kv_mul, hs), q_map),
        pl.BlockSpec((1, g_blk, 1, ps, hs), kv_map),
        pl.BlockSpec((1, g_blk, 1, ps, hs), kv_map),
    ]
    operands = [qs, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((g_blk, 1, 1, ps), scale_map),
            pl.BlockSpec((g_blk, 1, 1, ps), scale_map),
        ]
        operands += [
            k_scale.reshape(n_layers * kvh, p, 1, ps),
            v_scale.reshape(n_layers * kvh, p, 1, ps),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, kvh // g_blk, n_t_blocks, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_blk, bt, kv_mul, hs), q_map),
        scratch_shapes=[
            pltpu.VMEM((g_blk, rows, 128), jnp.float32),
            pltpu.VMEM((g_blk, rows, 128), jnp.float32),
            pltpu.VMEM((g_blk, rows, hs), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel_paged, block_t=bt, block_k=ps, n_k_blocks=max_pages,
        scale=scale, quantized=quantized, kv_mul=kv_mul,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, t, kv_mul, hs), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=interpret,
    )(start, valid, layer_arr, page_table, *operands)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t, h, hs)
