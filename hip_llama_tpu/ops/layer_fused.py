"""Whole-layer fused Q8 decode kernel: QKV(+rmsnorm+RoPE) -> flash
attention -> Wo(+residual) -> FFN(+rmsnorm+SwiGLU+residual) in ONE Pallas
pipeline.

Why: at 7B int8 the decode step is weight-HBM-bound (BASELINE.md), and the
measured cost of a kernel BOUNDARY (pipeline drain + ramp + the first
operand tile fetched without overlap) is ~8 us — fusing w2 into the FFN
kernel removed one boundary per layer and gained exactly that. This kernel
removes the remaining three: the whole layer's weights (wqkv, wo, w1|w3,
w2) and its KV-cache tiles stream through a single pipeline, so every
phase's first tile is prefetched while the previous phase computes, and the
qkv/attention/h intermediates never leave VMEM.

Phase layout over a 1-D grid (7B shapes in brackets):
  A [12]: QKV column strips  — xn = rmsnorm(x, g1); strip = xn @ Wqkv[:, n]
          with the RoPE epilogue; head-split rows land in the qkv scratch.
  B [16]: decode attention   — (slot-group, kv-block) tiles against the
          full cache, per-slot pos masking + live clamping; identical math
          to ops/attention.py::_decode_kernel_bfold (int8 KV: i8mxu dots).
  C [8] : Wo column strips   — x2[:, n] = x[:, n] + att_flat @ Wo[:, n].
  D [43]: FFN hidden strips  — acc += (silu(xn2@W1[:,h]) * (xn2@W3[:,h]))
          @ W2[h, :]; xn2 = rmsnorm(x2, g2); acc seeded with x2
          (ops/quant.py::_q8_kernel_ffn inlined as a phase).

The per-phase math reuses the exact expressions of the standalone kernels
(`reshape` dequant, fp32 accumulators, same cast points), so the layer
output is bit-identical to the 4-kernel path it replaces.

Reference analog: one hipLaunchKernel sequence per layer
(/root/reference/src/thaDNN.cpp:40-72) — here the sequence IS one kernel.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# strip-width knobs (swept on hardware; the kernel pays a ~1 us fixed cost
# per grid step, so wider strips = fewer steps, bounded by VMEM residency)
_ENV_BNQ = int(os.environ.get("HIPLLAMA_LAYER_BNQ", "0"))
_ENV_BNC = int(os.environ.get("HIPLLAMA_LAYER_BNC", "0"))
_ENV_BND = int(os.environ.get("HIPLLAMA_LAYER_BND", "0"))
_ENV_BB = int(os.environ.get("HIPLLAMA_LAYER_BB", "0"))
_ENV_BK = int(os.environ.get("HIPLLAMA_LAYER_BK", "0"))
# trace-time engagement probe: prints once per traced call whether the
# fused layer kernel ENGAGES or DECLINES (and why-shape) — BASELINE.md's
# "prove it engages at 7B shapes" evidence without a profiler run
_ENV_DEBUG_FUSE = os.environ.get("HIPLLAMA_DEBUG_FUSE", "0") == "1"

from hip_llama_tpu.ops.attention import MASK_VALUE, _quant_rows_i8
from hip_llama_tpu.ops.quant import QTensor, _rope_rotate_cols


def _dq(q_ref, s_ref, ng, gs):
    """`reshape`-mode dequant of an int8 weight tile (same expression as
    ops/quant.py::_q8_kernel, so results are bit-identical)."""
    s = s_ref[...].reshape(ng, s_ref.shape[-1])
    w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(
        jnp.float32
    )
    bk, bn = w.shape
    w = w.reshape(ng, gs, bn) * s[:, None, :]
    return w.reshape(bk, bn).astype(jnp.bfloat16)


def _rmsnorm_rows_f32(x, g_ref, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    g = g_ref[...].reshape(1, g_ref.shape[-1]).astype(jnp.float32)
    return xf * jax.lax.rsqrt(ms + eps) * g


def _layer_kernel(
    # scalar prefetch
    layer_ref, pos_ref, maxpos_ref,
    # tensor operands
    x_ref,  # (B, D) activations in (also the Wo residual)
    qkv_q_ref, qkv_s_ref,  # Wqkv strip (D, BNQ) + (1, G0, BNQ)
    g1_ref,  # (1, D)
    posv_ref,  # (B, 1) f32 — pos as a VMEM vector (RoPE angles)
    k_ref, v_ref,  # (bb, 1, KVH, BK, HS) cache tiles
    *rest,
    # [ks_ref, vs_ref] if quantized, then:
    # wo_q, wo_s, w13a_q, w13a_s, w13b_q, w13b_s, w2_q, w2_s, g2,
    # x_out, kv_out,
    # xn_scr, qkv_scr, m_scr, l_scr, acc_scr, att_scr, x2_scr, xn2_scr,
    # ffn_scr
    cfg: dict,
):
    c = cfg
    quantized = c["quantized"]
    if quantized:
        (ks_ref, vs_ref, wo_q, wo_s, w13a_q, w13a_s, w13b_q, w13b_s,
         w2_q, w2_s, g2_ref, x_out, kv_out, xn_scr, qkv_scr, m_scr, l_scr,
         acc_scr, att_scr, x2_scr, xn2_scr, ffn_scr) = rest
    else:
        (wo_q, wo_s, w13a_q, w13a_s, w13b_q, w13b_s, w2_q, w2_s, g2_ref,
         x_out, kv_out, xn_scr, qkv_scr, m_scr, l_scr, acc_scr, att_scr,
         x2_scr, xn2_scr, ffn_scr) = rest
    t = pl.program_id(0)
    gs = c["gs"]
    hs = c["hs"]
    bb = c["bb"]
    na, nb, nc, nd = c["na"], c["nb"], c["nc"], c["nd"]
    nb_i = c["nb_i"]
    bnq, bnc, bnd = c["bnq"], c["bnc"], c["bnd"]
    h, kvh, kv_mul = c["h"], c["kvh"], c["kv_mul"]
    block_k = c["bk"]
    scale = 1.0 / (hs ** 0.5)
    i8mxu = c["i8mxu"]
    prec = jax.lax.Precision.DEFAULT if quantized else None

    # ---------------- phase A: QKV strips ----------------
    @pl.when(t == 0)
    def _norm1():
        xn_scr[:] = _rmsnorm_rows_f32(
            x_ref[:], g1_ref, c["eps"]
        ).astype(xn_scr.dtype)

    @pl.when(t < na)
    def _qkv():
        w = _dq(qkv_q_ref, qkv_s_ref, c["g0"], gs)  # (D, BNQ)
        acc = jnp.dot(xn_scr[:], w, preferred_element_type=jnp.float32)
        acc = _rope_rotate_cols(
            acc, posv_ref[:], t * bnq, c["rope_limit"], hs, c["theta"],
        )
        qkv_scr[:, pl.ds(t * (bnq // hs), bnq // hs), :] = acc.reshape(
            acc.shape[0], bnq // hs, hs
        ).astype(qkv_scr.dtype)

    @pl.when(t == na - 1)
    def _kv_rows_out():
        kv_out[...] = qkv_scr[:, pl.ds(h, 2 * kvh), :]

    # ---------------- phase B: attention ----------------
    a = t - na
    bi = a // nb_i
    i = a % nb_i
    in_b = (t >= na) & (t < na + nb)

    @pl.when(in_b & (i == 0))
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def q_at(b):
        sb = bi * bb + b
        # (KVH, M, HS) view of this slot's q head rows
        q = qkv_scr[pl.ds(sb, 1), pl.ds(0, h), :][0]
        return q.reshape(kvh, kv_mul, hs)

    for b in range(bb):  # static unroll, same as _decode_kernel_bfold
        @pl.when(in_b)
        def _block(b=b):
            sb = bi * bb + b
            pos = pos_ref[sb]

            @pl.when(i * block_k < pos)
            def _live():
                kt = k_ref[b].reshape(-1, k_ref.shape[-2], k_ref.shape[-1])
                if quantized and i8mxu:
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
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                        * scale
                    )
                if quantized:
                    ks = ks_ref[b].reshape(-1, ks_ref.shape[-1])
                    s = s * ks[:, None, :]
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
                vt = v_ref[b].reshape(-1, v_ref.shape[-2], v_ref.shape[-1])
                if quantized and i8mxu:
                    vs = vs_ref[b].reshape(-1, vs_ref.shape[-1])
                    pi, sp = _quant_rows_i8(p * vs[:, None, :])
                    pv_i = jax.lax.dot_general(
                        pi, vt, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                    acc_scr[b] = acc_scr[b] * alpha + (
                        pv_i.astype(jnp.float32) * sp
                    )
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

    @pl.when(in_b & (i == nb_i - 1))
    def _final():
        for b in range(bb):
            sb = bi * bb + b
            q = q_at(b)
            kc = qkv_scr[pl.ds(sb, 1), pl.ds(h, kvh), :][0][:, None, :]
            vc = qkv_scr[pl.ds(sb, 1), pl.ds(h + kvh, kvh), :][0][
                :, None, :
            ].astype(jnp.float32)
            s_cur = (
                jax.lax.dot_general(
                    q, kc.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
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
            att_scr[pl.ds(sb, 1)] = (
                (acc / l_safe).reshape(1, h, hs).astype(att_scr.dtype)
            )

    # ---------------- phase C: Wo strips ----------------
    @pl.when(t == na + nb)
    def _flatten_att():
        # (B, H, HS) -> (B, D) relayout, hidden under the Wo strip DMA
        xn2_scr[:] = att_scr[...].reshape(
            att_scr.shape[0], h * hs
        ).astype(xn2_scr.dtype)

    j = t - na - nb
    in_c = (t >= na + nb) & (t < na + nb + nc)

    @pl.when(in_c)
    def _wo():
        w = _dq(wo_q, wo_s, c["g0"], gs)  # (D, BNC)
        y = jnp.dot(xn2_scr[:], w, preferred_element_type=jnp.float32)
        # cast through the activation dtype — the same rounding point as
        # the standalone q8_matmul's output cast (bit-parity with the
        # 4-kernel path)
        x2_scr[:, pl.ds(j * bnc, bnc)] = (
            x_ref[:, pl.ds(j * bnc, bnc)].astype(jnp.float32) + y
        ).astype(x2_scr.dtype)

    # ---------------- phase D: FFN strips ----------------
    @pl.when(t == na + nb + nc)
    def _norm2():
        ffn_scr[:] = x2_scr[:].astype(jnp.float32)
        xn2_scr[:] = (
            _rmsnorm_rows_f32(x2_scr[:], g2_ref, c["eps"])
        ).astype(xn2_scr.dtype)

    in_d = t >= na + nb + nc

    @pl.when(in_d)
    def _ffn():
        xb = xn2_scr[:].astype(jnp.bfloat16)
        h1 = jnp.dot(xb, _dq(w13a_q, w13a_s, c["g0"], gs),
                     preferred_element_type=jnp.float32)
        h3 = jnp.dot(xb, _dq(w13b_q, w13b_s, c["g0"], gs),
                     preferred_element_type=jnp.float32)
        hb = (h1 * jax.nn.sigmoid(h1) * h3).astype(jnp.bfloat16)
        ffn_scr[:] += jnp.dot(hb, _dq(w2_q, w2_s, c["g2n"], gs),
                              preferred_element_type=jnp.float32)

    @pl.when(t == na + nb + nc + nd - 1)
    def _store():
        x_out[:] = ffn_scr[:].astype(x_out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "head_size", "hidden", "norm_eps", "theta",
                     "i8mxu", "bb", "block_k", "interpret"),
)
def q8_layer_fused(
    x: jax.Array,  # (B, D) bf16 activations
    wqkv: QTensor,  # (D, D + 2*KVD)
    wo: QTensor,  # (D, D)
    w13: QTensor,  # (D, 2*HID) concatenated W1 | W3
    w2: QTensor,  # (HID, D)
    g1: jax.Array,  # (D,) attention-norm weight
    g2: jax.Array,  # (D,) ffn-norm weight
    k_cache: jax.Array,  # (B, L, KVH, S, HS)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    pos: jax.Array,  # (B,) int32
    k_scale: jax.Array | None = None,  # (B, L, KVH, S) — int8 KV
    v_scale: jax.Array | None = None,
    *,
    n_heads: int,
    head_size: int,
    hidden: int,
    norm_eps: float = 1e-5,
    theta: float = 10000.0,
    i8mxu: bool = True,
    bb: int = 4,  # r4 sweep: 705.0 vs 702.9 at bb=2 (7B b8)
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """Run one full decoder layer for a decode step in ONE kernel.

    Returns (x_out (B, D), kv_rows (B, 2*KVH, HS)): the layer output and
    this step's raw K|V rows (for the cache commit, ops/cache.py::
    kv_commit_rows). Returns None when the shapes don't fit this kernel's
    constraints — the caller falls back to the 4-kernel path (bit-identical
    math either way)."""
    b, d = x.shape
    _, n_layers, kvh, s, hs = k_cache.shape
    h = n_heads
    kv_mul = h // kvh
    nqkv = wqkv.q.shape[1]
    gs = wqkv.group_size
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if _ENV_BB and b % _ENV_BB == 0:
        bb = _ENV_BB
    while bb > 1 and b % bb:
        bb //= 2  # shrink to a divisor instead of declining whole batches
    bk = block_k or _ENV_BK or (128 if s % 128 == 0 else s)
    if s % bk or bk % 128:
        bk = 128 if s % 128 == 0 else s
    bnq = _ENV_BNQ or 8 * hs
    if nqkv % bnq or bnq % (8 * hs):
        bnq = 8 * hs
    bnc = _ENV_BNC or (512 if d % 512 == 0 else (256 if d % 256 == 0 else d))
    if d % bnc or bnc % 128:
        bnc = 512 if d % 512 == 0 else (256 if d % 256 == 0 else d)
    bnd = _ENV_BND or 256
    if hidden % bnd or bnd % gs:
        bnd = 256
    while bnd > gs and hidden % bnd:
        bnd //= 2
    decline = (
        hs != head_size or hs % 128
        or d != h * hs
        or nqkv != d + 2 * kvh * hs
        or nqkv % bnq or d % bnc or hidden % bnd or bnd % gs
        or d % gs or s % bk or bk % 128
        or b % bb or bb < 1
        # in-kernel sublane slices of qkv_scr at offsets h / h+kvh must be
        # 8-aligned or Mosaic rejects the static slice (ADVICE r3)
        or h % 8 or kvh % 8
        or wo.q.shape != (d, d) or w13.q.shape != (d, 2 * hidden)
        or w2.q.shape != (hidden, d)
        or not (wo.group_size == w13.group_size == w2.group_size == gs)
        or b > 64
        or d * bnq > 16 * 2 ** 20  # double-buffered QKV strip residency
        or 3 * d * bnd > 40 * 2 ** 20  # w1+w3+w2 strip residency
    )
    if _ENV_DEBUG_FUSE:
        print(
            f"[layer_fused] {'DECLINE' if decline else 'ENGAGE'} "
            f"b={b} d={d} h={h} kvh={kvh} hs={hs} hidden={hidden} s={s} "
            f"gs={gs} bnq={bnq} bnc={bnc} bnd={bnd} bk={bk}",
            file=sys.stderr,
        )
    if decline:
        return None

    na = nqkv // bnq
    nb_i = s // bk
    nb = (b // bb) * nb_i
    nc = d // bnc
    nd = hidden // bnd
    grid_t = na + nb + nc + nd

    maxpos = jnp.max(pos.reshape(b // bb, bb), axis=1).astype(jnp.int32)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    g0 = d // gs  # K-groups of the D-contraction weights
    g2n = bnd // gs  # K-groups of a W2 row strip

    def qkv_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, jnp.minimum(t, na - 1))

    def qkv_s_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, 0, jnp.minimum(t, na - 1))

    def _attn_ab(t):
        a = jnp.clip(t - na, 0, nb - 1)
        return a // nb_i, a % nb_i

    def kv_map(t, layer_ref, pos_ref, maxpos_ref):
        bi, i = _attn_ab(t)
        last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0], 0, jnp.minimum(i, last_live), 0)

    def kv_scale_map(t, layer_ref, pos_ref, maxpos_ref):
        bi, i = _attn_ab(t)
        last_live = jnp.maximum(maxpos_ref[bi] - 1, 0) // bk
        return (bi, layer_ref[0], 0, jnp.minimum(i, last_live))

    def wo_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, jnp.clip(t - na - nb, 0, nc - 1))

    def wo_s_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, 0, jnp.clip(t - na - nb, 0, nc - 1))

    def w1_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, jnp.clip(t - na - nb - nc, 0, nd - 1))

    def w1_s_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, 0, jnp.clip(t - na - nb - nc, 0, nd - 1))

    def w3_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, hidden // bnd + jnp.clip(t - na - nb - nc, 0, nd - 1))

    def w3_s_map(t, layer_ref, pos_ref, maxpos_ref):
        return (
            0, 0, hidden // bnd + jnp.clip(t - na - nb - nc, 0, nd - 1)
        )

    def w2_map(t, layer_ref, pos_ref, maxpos_ref):
        return (jnp.clip(t - na - nb - nc, 0, nd - 1), 0)

    def w2_s_map(t, layer_ref, pos_ref, maxpos_ref):
        return (jnp.clip(t - na - nb - nc, 0, nd - 1), 0, 0)

    def full_map(t, layer_ref, pos_ref, maxpos_ref):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((b, d), full_map),  # x
        pl.BlockSpec((d, bnq), qkv_map),  # wqkv q
        pl.BlockSpec((1, g0, bnq), qkv_s_map),  # wqkv s
        pl.BlockSpec((1, d), full_map),  # g1
        pl.BlockSpec((b, 1), full_map),  # pos as f32 vector (RoPE)
        pl.BlockSpec((bb, 1, kvh, bk, hs), kv_map),  # k tile
        pl.BlockSpec((bb, 1, kvh, bk, hs), kv_map),  # v tile
    ]
    operands = [
        x, wqkv.q, wqkv.s.reshape(1, g0, nqkv), g1.reshape(1, d),
        pos.astype(jnp.float32).reshape(b, 1), k_cache, v_cache,
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((bb, 1, kvh, bk), kv_scale_map),
            pl.BlockSpec((bb, 1, kvh, bk), kv_scale_map),
        ]
        operands += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((d, bnc), wo_map),  # wo q
        pl.BlockSpec((1, g0, bnc), wo_s_map),  # wo s
        pl.BlockSpec((d, bnd), w1_map),  # w1 strip
        pl.BlockSpec((1, g0, bnd), w1_s_map),
        pl.BlockSpec((d, bnd), w3_map),  # w3 strip
        pl.BlockSpec((1, g0, bnd), w3_s_map),
        pl.BlockSpec((bnd, d), w2_map),  # w2 row strip
        pl.BlockSpec((1, g2n, d), w2_s_map),
        pl.BlockSpec((1, d), full_map),  # g2
    ]
    operands += [
        wo.q, wo.s.reshape(1, g0, d),
        w13.q, w13.s.reshape(1, g0, 2 * hidden),
        w13.q, w13.s.reshape(1, g0, 2 * hidden),
        w2.q, w2.s.reshape(hidden // bnd, g2n, d),
        g2.reshape(1, d),
    ]

    nht = h + 2 * kvh
    cfg = dict(
        quantized=quantized, gs=gs, hs=hs, bb=bb, na=na, nb=nb, nc=nc,
        nd=nd, nb_i=nb_i, bnq=bnq, bnc=bnc, bnd=bnd, h=h, kvh=kvh,
        kv_mul=kv_mul, bk=bk, i8mxu=quantized and i8mxu, eps=norm_eps,
        theta=theta, rope_limit=d + kvh * hs, g0=g0, g2n=g2n,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, d), full_map),  # x_out
            pl.BlockSpec((b, 2 * kvh, hs), lambda *a: (0, 0, 0)),  # kv rows
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), x.dtype),  # xn
            pltpu.VMEM((b, nht, hs), x.dtype),  # qkv head rows
            pltpu.VMEM((bb, kvh, kv_mul, 128), jnp.float32),  # m
            pltpu.VMEM((bb, kvh, kv_mul, 128), jnp.float32),  # l
            pltpu.VMEM((bb, kvh, kv_mul, hs), jnp.float32),  # attention acc
            pltpu.VMEM((b, h, hs), x.dtype),  # attention out
            pltpu.VMEM((b, d), x.dtype),  # x2 = x + att @ wo
            pltpu.VMEM((b, d), x.dtype),  # att_flat, then xn2
            pltpu.VMEM((b, d), jnp.float32),  # ffn accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_layer_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((b, 2 * kvh, hs), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * (nqkv + d + 3 * hidden)
            + 4 * b * h * s * hs,
            bytes_accessed=(d * (nqkv + d) + 3 * d * hidden)
            + 2 * b * kvh * s * hs * k_cache.dtype.itemsize,
            transcendentals=b * h * s + b * hidden,
        ),
        interpret=interpret,
    )(layer_arr, pos, maxpos, *operands)
    return out[0], out[1]
