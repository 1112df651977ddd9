"""Q8_0 weight-only quantized matmul as a fused Pallas TPU kernel.

Semantics follow the reference int8 engine (runq.c:317-342): weights are
symmetric int8 with one fp32 scale per `group_size` consecutive elements
along the contraction (input) dimension; the product is accumulated per
group, scaled, and summed in fp32. Unlike runq (which also quantizes
activations, runq.c:367), activations stay bf16/fp32 here — decode is
HBM-bandwidth-bound, so the win is streaming 1 byte/weight instead of 2;
keeping activations wide only improves quality (the ≤0.1 ppl Δ target in
BASELINE.md is vs runq's w8a8).

The kernel streams int8 weight tiles HBM→VMEM, dequantizes in VMEM
(VPU multiply by the per-group scale) and feeds the MXU — the TPU analog of
the reference's fused dequant+int8-matmul inner loop.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

# model-level tuning knobs (micro-benchmarks are unreliable through the
# tunneled device transport; sweep these via bench.py instead)
_ENV_BLOCK_N = int(os.environ.get("HIPLLAMA_Q8_BLOCK_N", "512"))
_ENV_BLOCK_K = int(os.environ.get("HIPLLAMA_Q8_BLOCK_K", "1024"))
_ENV_MODE = os.environ.get("HIPLLAMA_Q8_MODE", "reshape")
# whole-FFN kernel hidden-strip width (q8_matmul_ffn); 256 measured best
# round 3, re-sweepable on hardware
_ENV_FFN_BLOCK_N = int(os.environ.get("HIPLLAMA_FFN_BLOCK_N", "256"))
# reshape-mode dequant: split each tile into N independent dequant->dot
# half-chains (scheduler may overlap chain c+1's VPU dequant with chain
# c's MXU dot); 1 = single chain
_ENV_SPLIT = int(os.environ.get("HIPLLAMA_Q8_SPLIT", "1"))
# large-M (prefill) matmuls: m-innermost grid with dequant-once scratch
# (see _q8_kernel_minner). Default OFF: measured a 30 ms TTFT REGRESSION
# at 7B b8 x 512 (619.1 vs 589.4 ms, r4) — the m-outer grid's redundant
# per-m-block dequant is already hidden under the MXU work, while the
# m-inner variant serializes at tile boundaries (dequant blocks the first
# matmul of each (n, k) tile; the emit DMA waits inline). Kept for
# sweeps: HIPLLAMA_PREFILL_MINNER=1.
_ENV_PREFILL_MINNER = os.environ.get("HIPLLAMA_PREFILL_MINNER", "0") == "1"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QTensor(NamedTuple):
    """Quantized weight in matmul orientation: q (K, N) int8, s (K//gs, N) f32."""

    q: jax.Array
    s: jax.Array

    @property
    def group_size(self) -> int:
        return self.q.shape[-2] // self.s.shape[-2]


def q8_quantize_weights(w, group_size: int = 64) -> QTensor:
    """Quantize a (K, N) [or (L, K, N)] weight along K in groups (Q8_0).

    Matches quantize_q80 (train/export.py:46-70) applied per (group, column).
    """
    w = jnp.asarray(w, jnp.float32)
    k = w.shape[-2]
    assert k % group_size == 0, (w.shape, group_size)
    g = w.reshape(*w.shape[:-2], k // group_size, group_size, w.shape[-1])
    absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = absmax / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.round(g / scale).astype(jnp.int8).reshape(w.shape)
    return QTensor(q=q, s=scale[..., 0, :].astype(jnp.float32))


def q8_dequantize(qt: QTensor) -> jax.Array:
    gs = qt.group_size
    k, n = qt.q.shape[-2], qt.q.shape[-1]
    g = qt.q.astype(jnp.float32).reshape(*qt.q.shape[:-2], k // gs, gs, n)
    return (g * qt.s[..., :, None, :]).reshape(*qt.q.shape[:-2], k, n)


def q8_matmul_xla(x: jax.Array, qt: QTensor) -> jax.Array:
    """Reference implementation (materializes the dequantized tile): used as
    the oracle for the Pallas kernel and as the CPU fallback."""
    gs = qt.group_size
    k, n = qt.q.shape
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], k // gs, gs)
    wg = qt.q.reshape(k // gs, gs, n)
    # per-group partial dots, scaled then summed (runq.c:332-337)
    partial = jnp.einsum(
        "bgk,gkn->bgn", xg, wg.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return jnp.einsum("bgn,gn->bn", partial, qt.s).astype(x.dtype)


def _q8_kernel_layered(layer_ref, *rest, **kw):
    # the layer index is consumed by the BlockSpec index maps only
    del layer_ref
    _q8_kernel(*rest, **kw)


def _q8_kernel_norm(x_ref, q_ref, s_ref, g_ref, o_ref, acc_ref, *a8_scr,
                    **kw):
    # fused-rmsnorm variant: the norm weight is the 4th operand
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               **kw)


def _q8_kernel_res(x_ref, q_ref, s_ref, r_ref, o_ref, acc_ref, *a8_scr,
                   **kw):
    # fused-residual variant: o = residual + x @ W (epilogue add on the
    # fp32 accumulator; kills the standalone XLA residual-add op per layer)
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, r_ref=r_ref,
               **kw)


def _q8_kernel_norm_res(x_ref, q_ref, s_ref, g_ref, r_ref, o_ref, acc_ref,
                        *a8_scr, **kw):
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               r_ref=r_ref, **kw)


def _q8_kernel_rope(x_ref, q_ref, s_ref, p_ref, o_ref, acc_ref, *a8_scr,
                    **kw):
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, p_ref=p_ref,
               **kw)


def _q8_kernel_norm_rope(x_ref, q_ref, s_ref, g_ref, p_ref, o_ref, acc_ref,
                         *a8_scr, **kw):
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               p_ref=p_ref, **kw)


# in-kernel rope pairswap implementation: "roll" (two lane rotates + a
# parity select — 3 cheap VPU passes) or "perm" (the signed permutation
# MATMUL the epilogue shipped with — builds a (BN, BN) matrix per grid
# step). Both are exact (every partner element is a single negation).
# roll measured +4 tok/s at 7B b8 decode (710.4 vs 706.4 with ATTN_BB=4,
# r4 sweep) — default since round 4.
_ENV_ROPE_IMPL = os.environ.get("HIPLLAMA_ROPE_IMPL", "roll")


def _rope_rotate_cols(acc, pos_f32, col0, rot_limit: int, head_size: int,
                      theta: float):
    """RoPE over fp32 rows whose columns col0..col0+W-1 lie in a
    q|k|v-concatenated layout: rotate consecutive (even, odd) pairs of the
    first `rot_limit` columns (q and k segments; both are head_size-aligned
    so `col % head_size` is the in-head offset), pass the rest (v) through.
    Mirrors models/llama.py::rope bit-for-bit in fp32 — partner[2i] =
    -acc[2i+1], partner[2i+1] = acc[2i], block-local (pairs never straddle
    an even-width block)."""
    bn = acc.shape[-1]
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
    pair = ((col % head_size) // 2).astype(jnp.float32)
    freq = jnp.exp(pair * jnp.float32(-2.0 * math.log(theta) / head_size))
    ang = pos_f32 * freq  # (M, 1) * (1, BN)
    if _ENV_ROPE_IMPL == "roll":
        # lane-rotate pairswap: roll(-1) brings x[2i+1] to even lane 2i,
        # roll(+1) brings x[2i] to odd lane 2i+1; a lane-parity select +
        # sign flip assembles the signed partner. 3 VPU passes over (M, BN)
        # vs the perm matmul's per-step (BN, BN) matrix build.
        even = (jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) % 2) == 0
        partner = jnp.where(
            even, -jnp.roll(acc, -1, axis=-1), jnp.roll(acc, 1, axis=-1)
        )
    else:
        r_i = jax.lax.broadcasted_iota(jnp.int32, (bn, bn), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (bn, bn), 1)
        perm = jnp.where(
            (r_i % 2 == 0) & (c_i == r_i + 1), 1.0,
            jnp.where((r_i % 2 == 1) & (c_i == r_i - 1), -1.0, 0.0),
        ).astype(jnp.float32)
        partner = jnp.dot(acc, perm, preferred_element_type=jnp.float32)
    rot = acc * jnp.cos(ang) + partner * jnp.sin(ang)
    return jnp.where(col < rot_limit, rot, acc)


def _rope_rows_xla(y, pos, rot_limit: int, head_size: int, theta: float):
    """XLA fallback of the fused-rope epilogue: rotate the first rot_limit
    columns per head (same math as models/llama.py::rope), fp32 in/out."""
    b = y.shape[0]
    y = y.astype(jnp.float32)
    seg = y[:, :rot_limit].reshape(b, rot_limit // head_size, head_size)
    half = head_size // 2
    freq = 1.0 / (
        theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / head_size)
    )
    ang = pos.astype(jnp.float32)[:, None, None] * freq
    c = jnp.repeat(jnp.cos(ang), 2, -1)
    s = jnp.repeat(jnp.sin(ang), 2, -1)
    j = jnp.arange(head_size)
    perm = jnp.where(
        (j[:, None] % 2 == 0) & (j[None, :] == j[:, None] + 1), 1.0,
        jnp.where(
            (j[:, None] % 2 == 1) & (j[None, :] == j[:, None] - 1), -1.0, 0.0
        ),
    ).astype(jnp.float32)
    partner = jnp.einsum("bhd,de->bhe", seg, perm)
    rot = (seg * c + partner * s).reshape(b, rot_limit)
    return jnp.concatenate([rot, y[:, rot_limit:]], axis=1)


def _q8_kernel(
    x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, n_groups: int, gs: int,
    last_j: int,
    dequant_mode: str = "reshape", k_axis: int = 1, g_ref=None, r_ref=None,
    p_ref=None, rope_spec=None, norm_eps: float = 1e-5, out_heads: int = 0,
    x_heads_hs: int = 0,
):
    j = pl.program_id(k_axis)
    # n-block index, needed by the rope/head-split epilogues (hoisted:
    # program_id is unavailable inside pl.when bodies in interpret mode)
    ni = (
        pl.program_id(k_axis - 1)
        if (p_ref is not None or out_heads)
        else None
    )

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _normed_x():
        if g_ref is None:
            return x_ref[:]
        # fused rmsnorm prologue (requires block_k == K: the whole row is
        # resident). The norm weight rides the kernel's pipelined operand
        # fetch — as a standalone XLA op, each of the ~2L+1 norm vectors
        # cost a ~21 us HBM->VMEM copy stall per step (1.4 ms/step at 7B,
        # tools/profile_step.py). fp32 math then cast, exactly like
        # models/llama.py::rmsnorm (runq.c:383 keeps norms fp32 too).
        xf = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        g = g_ref[...].reshape(1, g_ref.shape[-1]).astype(jnp.float32)
        xn = xf * jax.lax.rsqrt(ms + norm_eps) * g
        return xn.astype(x_ref.dtype)

    if dequant_mode != "a8":
        x_val = _normed_x()

    # scales arrive pre-blocked as (..., K//BK, n_groups, N) so the
    # BlockSpec's group dim equals the array dim (legal tile, any n_groups);
    # collapse any leading layer/block singleton dims (free reshapes)
    s = s_ref[...].reshape(n_groups, s_ref.shape[-1])  # (n_groups, BN)
    if dequant_mode == "a8":
        # w8a8: the int8 weight tile feeds the MXU DIRECTLY — zero VPU
        # passes over the big (BK, BN) tile. Activations are quantized per
        # (row, K-group) exactly like the reference int8 engine
        # (runq.c:367: absmax/127 per group of gs along K), the per-group
        # int8xint8 dots accumulate in int32, and the fp32 rescale+sum
        # follows runq's grouped accumulation order (runq.c:332-337).
        # Mosaic can't lane-split (M, K) -> (M, G, gs), so the quantizer
        # transposes x once (K to sublanes; the (G, gs, M) split is then
        # layout-free) and stashes xi/sx in scratch on the FIRST n-block
        # step — later n-blocks reuse them. Requires block_k == K and
        # GEMV-like M (the wrapper gates both).
        xi_scr, sx_scr = a8_scr
        ni_a8 = pl.program_id(k_axis - 1)

        @pl.when(ni_a8 == 0)
        def _quant_x():
            xt = _normed_x().astype(jnp.float32).T  # (K, M)
            x3 = xt.reshape(n_groups, gs, xt.shape[-1])  # sublane split
            sx = jnp.max(jnp.abs(x3), axis=1, keepdims=True) * (1.0 / 127.0)
            sx = jnp.where(sx == 0.0, 1.0, sx)
            xi_scr[...] = jnp.round(x3 / sx).astype(jnp.int8)
            sx_scr[...] = sx

        wq = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # int8
        w3 = wq.reshape(n_groups, gs, wq.shape[-1])  # sublane split
        m_rows = xi_scr.shape[-1]
        bn_a8 = wq.shape[-1]
        # chunk the group-batched dot so the (G, M, BN) int32 partial stays
        # VMEM-sized at prefill row counts (G=64, M=256, BN=512 would be
        # 34 MB materialized at once; 8-group chunks cap it at ~4 MB)
        g_chunk = n_groups
        while g_chunk * m_rows * bn_a8 * 4 > 4 * 2 ** 20 and g_chunk % 2 == 0:
            g_chunk //= 2
        for g0 in range(0, n_groups, g_chunk):
            gc = min(g_chunk, n_groups - g0)
            partial = jax.lax.dot_general(
                xi_scr[g0:g0 + gc], w3[g0:g0 + gc],
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (gc, M, BN) int32
            ps = partial.astype(jnp.float32) * sx_scr[g0:g0 + gc].transpose(
                0, 2, 1)
            # expand_dims AFTER the static slice: a slice+newaxis getitem
            # lowers as a Mosaic gather and fails shape checking
            acc_ref[:] += jnp.sum(
                ps * jnp.expand_dims(s[g0:g0 + gc], 1), axis=0)
    elif dequant_mode == "group_dot":
        # scale AFTER the matmul: the weight tile costs ONE VPU pass
        # (int8->bf16); per-group partial dots run batched on the MXU and
        # the rescale touches only (n_groups, B, BN) — ~gs x less VPU work
        # than scaling the whole tile. Exactly runq's grouped accumulation
        # order (runq.c:332-337) with bf16 activations.
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.bfloat16)  # (BK, BN) — 1 VPU pass
        bk, bn = w.shape
        w3 = w.reshape(n_groups, gs, bn)  # sublane-split: layout-free
        # Mosaic can't lane-split (B, BK) -> (B, G, gs); transpose x once
        # (BK to sublanes) and the (G, gs, B) split is layout-free — same
        # trick as the a8 quantizer above
        x3 = x_val.astype(jnp.bfloat16).T.reshape(n_groups, gs, -1)
        partial = jax.lax.dot_general(
            x3, w3,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (n_groups, B, BN)
        acc_ref[:] += jnp.sum(partial * s[:, None, :], axis=0)
    elif dequant_mode == "bf16":
        # 2 VPU passes instead of 3: int8->bf16 is exact (int8 fits the
        # bf16 mantissa); the only extra error is the bf16 rounding of the
        # SCALE (~2^-9 relative), far below the Q8_0 quantization noise.
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.bfloat16)
        bk, bn = w.shape
        w = (w.reshape(n_groups, gs, bn) * s.astype(jnp.bfloat16)[:, None, :]).reshape(bk, bn)
        acc_ref[:] += jnp.dot(
            x_val.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )
    elif dequant_mode == "f32dot":
        # keep the fp32 dequant product but feed the MXU the fp32 tile
        # directly (DEFAULT precision splits it into bf16 passes) — saves
        # the explicit down-cast pass over the tile
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)
        bk, bn = w.shape
        w = w.reshape(n_groups, gs, bn) * s[:, None, :]
        acc_ref[:] += jax.lax.dot_general(
            x_val.astype(jnp.bfloat16), w.reshape(bk, bn),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    elif dequant_mode == "repeat":
        # expand scales across each group's sublanes (no relayout of the
        # big weight tile — the reshape variant physically re-tiles it twice)
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.bfloat16)  # (BK, BN)
        s_rep = pltpu.repeat(s.astype(jnp.bfloat16), gs, axis=0)  # (BK, BN)
        w = w * s_rep
        acc_ref[:] += jnp.dot(
            x_val.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )
    elif _ENV_SPLIT > 1 and q_ref.shape[-1] % (_ENV_SPLIT * 128) == 0:
        # split the tile into independent dequant->dot half-chains: the
        # VPU dequant of chain c+1 has no dependence on chain c's MXU dot,
        # so Mosaic's scheduler may overlap them (the single-chain form
        # serializes dequant with the dot it feeds)
        wq = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        bk, bn = wq.shape
        bnc = bn // _ENV_SPLIT
        xb = x_val.astype(jnp.bfloat16)
        for ci in range(_ENV_SPLIT):
            lo, hi = ci * bnc, (ci + 1) * bnc
            w = wq[:, lo:hi].astype(jnp.float32)
            w = w.reshape(n_groups, gs, bnc) * s[:, lo:hi][:, None, :]
            acc_ref[:, pl.ds(lo, bnc)] += jnp.dot(
                xb, w.reshape(bk, bnc).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    elif x_heads_hs:
        # HEAD-SPLIT x (M, GH, HS): consume the attention kernel's T-major
        # output directly — per-head dots against the dequantized tile's
        # sublane-split head rows (probed exact on-chip,
        # tools/probe_xheads.py `unroll`). Kills the (B,T,H,HS)->(B,T,D)
        # relayout between prefill attention and the wo matmul.
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)
        bk, bn = w.shape
        w = w.reshape(n_groups, gs, bn) * s[:, None, :]
        w3 = w.reshape(bk, bn).astype(jnp.bfloat16).reshape(
            bk // x_heads_hs, x_heads_hs, bn)
        for hh in range(bk // x_heads_hs):
            acc_ref[:] += jnp.dot(
                x_ref[:, hh].astype(jnp.bfloat16), w3[hh],
                preferred_element_type=jnp.float32,
            )
    else:
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)  # (BK, BN)
        bk, bn = w.shape
        w = w.reshape(n_groups, gs, bn) * s[:, None, :]
        w = w.reshape(bk, bn).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_val.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )

    @pl.when(j == last_j)
    def _():
        acc = acc_ref[:]
        bn = acc.shape[-1]
        if r_ref is not None:
            acc = acc + r_ref[:].astype(jnp.float32)
        if p_ref is not None:
            # fused RoPE epilogue (QKV projections): rotates on the fp32
            # accumulator before the output cast — kills the 2 standalone
            # rope ops per layer
            rot_limit, head_size, theta = rope_spec
            col0 = ni * bn
            acc = _rope_rotate_cols(
                acc, p_ref[:].astype(jnp.float32), col0, rot_limit,
                head_size, theta,
            )
        if out_heads:
            # head-split output: the (M, BN) accumulator stores as
            # (M, BN/HS, HS) head tiles into this n-block's sublane slice of
            # the FULL (M, N/HS, HS) out block (resident across n-steps) —
            # the lane->sublane relayout rides the weight-DMA-bound kernel
            # instead of costing a standalone XLA reshape op
            bnh = bn // out_heads
            o_ref[:, pl.ds(ni * bnh, bnh), :] = acc.reshape(
                acc.shape[0], bnh, out_heads
            ).astype(o_ref.dtype)
        else:
            o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_m", "interpret", "out_dtype"),
)
def q8_matmul_xheads(
    x3: jax.Array,  # (M, GH, HS) — head-split activations (T-major)
    qt: QTensor,  # (GH*HS, N)
    *,
    residual: jax.Array | None = None,  # (M, N)
    out_dtype=None,
    block_n: int = 512,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """x3 consumed in the attention kernel's T-major head-split layout:
    the (M, GH, HS) -> (M, D) relayout between prefill attention and the
    wo projection never exists in the XLA graph. Per-head dots inside the
    kernel (probed exact: tools/probe_xheads.py). Ineligible shapes
    flatten and take q8_matmul (bit-identical math, one extra reshape)."""
    m, gh, hs = x3.shape
    k = gh * hs
    out_dtype = out_dtype or x3.dtype
    n = qt.q.shape[-1]
    gs = qt.group_size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    bn = block_n
    while bn > 128 and n % bn:
        bn //= 2
    bm = min(block_m, m)
    eligible = (
        hs % 128 == 0
        and qt.q.shape[0] == k
        and k % gs == 0
        and n % bn == 0 and bn % 128 == 0
        and k * bn <= 8 * 2 ** 20  # single K block (whole-row strip)
        and (m % bm == 0 or m <= bm)
        and (gh % 8 == 0 or gh == x3.shape[1])
    )
    if not eligible:
        return q8_matmul(
            x3.reshape(m, k), qt, out_dtype=out_dtype, residual=residual,
            block_n=block_n, interpret=interpret,
        )
    pad_m = (-m) % bm
    if pad_m:
        x3 = jnp.pad(x3, ((0, pad_m), (0, 0), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    n_groups = k // gs
    s_blocked = qt.s.reshape(1, n_groups, n)
    grid = (mp // bm, n // bn, 1)
    in_specs = [
        pl.BlockSpec((bm, gh, hs), lambda mi, i, j: (mi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda mi, i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups, bn), lambda mi, i, j: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x3, qt.q, s_blocked]
    kernel_fn = _q8_kernel
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((bm, bn), lambda mi, i, j: (mi, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
        kernel_fn = _q8_kernel_res
    out = pl.pallas_call(
        functools.partial(
            kernel_fn, n_groups=n_groups, gs=gs, last_j=0, k_axis=2,
            x_heads_hs=hs,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mi, i, j: (mi, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=48 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=k * n + (k // gs) * n * 4 + mp * k * 2
            + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m] if pad_m else out


def _q8_kernel_silu(
    x_ref, q1_ref, s1_ref, q2_ref, s2_ref, o_ref, acc1_ref, acc2_ref,
    *a8_scr, n_groups: int, gs: int, last_j: int, k_axis: int = 2,
    g_ref=None, norm_eps: float = 1e-5, dequant_mode: str = "reshape",
):
    """Fused SwiGLU matmul: o = silu(x @ W1) * (x @ W3) with W1/W3 as two
    column views of the concatenated (K, 2H) Q8 weight. The gate product
    runs on the fp32 accumulators in-kernel, so the (B, 2H) h13
    intermediate (and its slice/convert/multiply XLA ops) never exists."""
    j = pl.program_id(k_axis)

    @pl.when(j == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    def _normed_x():
        if g_ref is None:
            return x_ref[:]
        xf = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        g = g_ref[...].reshape(1, g_ref.shape[-1]).astype(jnp.float32)
        return (xf * jax.lax.rsqrt(ms + norm_eps) * g).astype(x_ref.dtype)

    if dequant_mode == "a8":
        # w8a8 (see _q8_kernel): W1 and W3 share one activation
        # quantization, stashed in scratch on the first h-block step and
        # reused by the rest (transposed: Mosaic can't lane-split
        # (M, K) -> (M, G, gs), but the post-transpose sublane split is
        # layout-free).
        xi_scr, sx_scr = a8_scr
        ni_a8 = pl.program_id(k_axis - 1)

        @pl.when(ni_a8 == 0)
        def _quant_x():
            xt = _normed_x().astype(jnp.float32).T  # (K, M)
            x3 = xt.reshape(n_groups, gs, xt.shape[-1])
            sx = jnp.max(jnp.abs(x3), axis=1, keepdims=True) * (1.0 / 127.0)
            sx = jnp.where(sx == 0.0, 1.0, sx)
            xi_scr[...] = jnp.round(x3 / sx).astype(jnp.int8)
            sx_scr[...] = sx

        m_rows = xi_scr.shape[-1]

        def mm(q_ref, s_ref, acc_ref):
            s = s_ref[...].reshape(n_groups, s_ref.shape[-1])
            wq = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
            w3 = wq.reshape(n_groups, gs, wq.shape[-1])
            bn_a8 = wq.shape[-1]
            # group-chunked rescale (see _q8_kernel): VMEM-sized partials
            # at prefill row counts
            g_chunk = n_groups
            while (g_chunk * m_rows * bn_a8 * 4 > 4 * 2 ** 20
                   and g_chunk % 2 == 0):
                g_chunk //= 2
            for g0 in range(0, n_groups, g_chunk):
                gc = min(g_chunk, n_groups - g0)
                partial = jax.lax.dot_general(
                    xi_scr[g0:g0 + gc], w3[g0:g0 + gc],
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # (gc, M, BN) int32
                ps = partial.astype(jnp.float32) * sx_scr[
                    g0:g0 + gc].transpose(0, 2, 1)
                acc_ref[:] += jnp.sum(
                    ps * jnp.expand_dims(s[g0:g0 + gc], 1), axis=0)

        mm(q1_ref, s1_ref, acc1_ref)
        mm(q2_ref, s2_ref, acc2_ref)
    elif dequant_mode == "group_dot":
        xb = _normed_x().astype(jnp.bfloat16)
        acc1_ref[:] += _gd_mm(xb, q1_ref, s1_ref, n_groups, gs)
        acc2_ref[:] += _gd_mm(xb, q2_ref, s2_ref, n_groups, gs)
    else:
        xb = _normed_x().astype(jnp.bfloat16)

        def dq(q_ref, s_ref):
            s = s_ref[...].reshape(n_groups, s_ref.shape[-1])
            w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(jnp.float32)
            bk, bn = w.shape
            w = w.reshape(n_groups, gs, bn) * s[:, None, :]
            return w.reshape(bk, bn).astype(jnp.bfloat16)

        acc1_ref[:] += jnp.dot(xb, dq(q1_ref, s1_ref), preferred_element_type=jnp.float32)
        acc2_ref[:] += jnp.dot(xb, dq(q2_ref, s2_ref), preferred_element_type=jnp.float32)

    @pl.when(j == last_j)
    def _():
        h1 = acc1_ref[:]
        o_ref[:] = (h1 * jax.nn.sigmoid(h1) * acc2_ref[:]).astype(o_ref.dtype)


def q8_matmul_silu(
    x: jax.Array,
    qt: QTensor,  # (K, 2H) concatenated W1 | W3
    *,
    block_n: int = _ENV_BLOCK_N,
    block_k: int = _ENV_BLOCK_K,
    interpret: bool | None = None,
    out_dtype=None,
    norm_weight: jax.Array | None = None,
    norm_eps: float = 1e-5,
    dequant_mode: str = _ENV_MODE,
) -> jax.Array:
    """silu(x @ W1) * (x @ W3) -> (B, H) in one fused Q8 kernel (see
    _q8_kernel_silu). Falls back to q8_matmul + XLA silu when the shape
    isn't kernel-eligible (tiny/test configs)."""
    b, k = x.shape
    kq, n2 = qt.q.shape
    h = n2 // 2
    gs = qt.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        xx = _rmsnorm_rows(x, norm_weight, norm_eps) if norm_weight is not None else x
        h13 = q8_matmul(xx, qt, block_n=block_n, block_k=block_k,
                        interpret=interpret, out_dtype=out_dtype)
        return (jax.nn.silu(h13[:, :h].astype(jnp.float32))
                * h13[:, h:].astype(jnp.float32)).astype(out_dtype)

    bn = block_n
    while bn > 128 and h % bn:
        bn //= 2
    if h % bn:
        return fallback()
    # same blocking policy as q8_matmul
    if k % gs == 0 and k * bn <= 8 * 2 ** 20 and b * k * 2 <= 2 * 2 ** 20:
        bk = k
    else:
        bk = block_k
        while bk > gs and (k % bk or bk % gs):
            bk //= 2
        if k % bk or bk % gs:
            bk = gs if k % gs == 0 else k
    ok_x = bk % 128 == 0 or bk == k
    ok_w = (bk % 8 == 0 or bk == k) and bn % 128 == 0
    if not (ok_x and ok_w) and not interpret:
        return fallback()
    block_m = b
    pad_m = 0
    if dequant_mode == "a8":
        if (b > 64 and k % gs == 0 and k * bn <= 8 * 2 ** 20
                and k // gs <= 64):
            bk = k  # prefill w8a8 — see q8_matmul (group-chunked rescale)
        elif b > 64 or bk != k or (bk // gs) * b * bn * 4 > 4 * 2 ** 20:
            dequant_mode = "reshape"
    if b > 512:
        block_m = 512
        if dequant_mode == "a8":
            block_m = 256  # cap the x stash + int32 partial footprint
        if b % block_m:
            pad_m = block_m - b % block_m
            x = jnp.pad(x, ((0, pad_m), (0, 0)))
    bp = b + pad_m
    if norm_weight is not None and bk != k:
        x = _rmsnorm_rows(x, norm_weight, norm_eps)
        norm_weight = None
    n_groups = bk // gs
    if (
        _ENV_PREFILL_MINNER
        and bp > block_m
        and dequant_mode == "reshape"
        and norm_weight is None
        and bn % 128 == 0
        and bp * bn * 8 <= 24 * 2 ** 20  # two full-height accumulators
    ):
        # large-M path: m-inner grid + dequant-once (see _q8_kernel_minner)
        grid = (h // bn, k // bk, bp // block_m)
        s_blocked = qt.s.reshape(k // bk, n_groups, n2)
        n_off = h // bn
        in_specs = [
            pl.BlockSpec((block_m, bk), lambda i, j, m: (m, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, m: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, bn), lambda i, j, m: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, m: (j, i + n_off),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, bn), lambda i, j, m: (j, 0, i + n_off),
                         memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            functools.partial(
                _q8_kernel_silu_minner, n_groups=n_groups, gs=gs,
                last_j=grid[1] - 1, block_m=block_m,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((bp, h), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((bp // block_m, block_m, bn), jnp.float32),
                pltpu.VMEM((bp // block_m, block_m, bn), jnp.float32),
                pltpu.VMEM((bk, bn), jnp.bfloat16),
                pltpu.VMEM((bk, bn), jnp.bfloat16),
                pltpu.VMEM((block_m, bn), out_dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                has_side_effects=True,
                vmem_limit_bytes=64 * 2 ** 20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bp * k * h,
                bytes_accessed=k * n2 + (k // gs) * n2 * 4 + bp * k * 2
                + bp * h * 4,
                transcendentals=bp * h,
            ),
            interpret=interpret,
        )(x, qt.q, s_blocked, qt.q, s_blocked)
        return out[:b] if pad_m else out
    n_off = h // bn  # W3 column-block offset
    grid = (bp // block_m, h // bn, k // bk)
    s_blocked = qt.s.reshape(k // bk, n_groups, n2)

    in_specs = [
        pl.BlockSpec((block_m, bk), lambda m, i, j: (m, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda m, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups, bn), lambda m, i, j: (j, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda m, i, j: (j, i + n_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups, bn), lambda m, i, j: (j, 0, i + n_off),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, qt.q, s_blocked, qt.q, s_blocked]
    if norm_weight is not None:
        kernel = functools.partial(
            _q8_kernel_silu_norm, n_groups=n_groups, gs=gs, last_j=grid[2] - 1,
            norm_eps=norm_eps, dequant_mode=dequant_mode,
        )
        in_specs.append(
            pl.BlockSpec((1, bk), lambda m, i, j: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight.reshape(1, k))
    else:
        kernel = functools.partial(
            _q8_kernel_silu, n_groups=n_groups, gs=gs, last_j=grid[2] - 1,
            dequant_mode=dequant_mode,
        )
    scratch_shapes = [
        pltpu.VMEM((block_m, bn), jnp.float32),
        pltpu.VMEM((block_m, bn), jnp.float32),
    ]
    dim_sem = ("parallel", "parallel", "arbitrary")
    if dequant_mode == "a8":
        # see q8_matmul: stash reused across h-blocks -> sequential axis
        scratch_shapes += [
            pltpu.VMEM((n_groups, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups, 1, block_m), jnp.float32),
        ]
        dim_sem = ("parallel", "arbitrary", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, bn), lambda m, i, j: (m, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h), out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
            vmem_limit_bytes=(
                64 * 2 ** 20 if dequant_mode == "a8" and b > 64 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * k * h,
            bytes_accessed=k * n2 + (k // gs) * n2 * 4 + bp * k * 2 + bp * h * 4,
            transcendentals=bp * h,
        ),
        interpret=interpret,
    )(*operands)
    return out[:b] if pad_m else out


def _q8_kernel_silu_norm(x_ref, q1_ref, s1_ref, q2_ref, s2_ref, g_ref, o_ref,
                         acc1_ref, acc2_ref, *a8_scr, **kw):
    _q8_kernel_silu(
        x_ref, q1_ref, s1_ref, q2_ref, s2_ref, o_ref, acc1_ref, acc2_ref,
        *a8_scr, g_ref=g_ref, **kw
    )


q8_matmul_silu = jax.jit(
    q8_matmul_silu,
    static_argnames=("block_n", "block_k", "interpret", "out_dtype",
                     "norm_eps", "dequant_mode"),
)


def _gd_mm(xb, q_ref, s_ref, ng, gs):
    """group_dot matmul: scale AFTER per-group batched int8->bf16 dots —
    ONE VPU pass over the weight tile instead of three (see _q8_kernel's
    group_dot branch; exactly runq's grouped accumulation order)."""
    w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(
        jnp.bfloat16
    )
    bk, bn = w.shape
    s = s_ref[...].reshape(ng, s_ref.shape[-1])
    w3 = w.reshape(ng, gs, bn)
    # transpose x so the group split lands on sublanes (Mosaic rejects the
    # (B, BK) -> (B, G, gs) lane-split shape cast)
    x3 = xb.T.reshape(ng, gs, -1)
    partial = jax.lax.dot_general(
        x3, w3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (ng, B, BN)
    return jnp.sum(partial * s[:, None, :], axis=0)


def _q8_kernel_ffn(
    x_ref, q1_ref, s1_ref, q3_ref, s3_ref, q2_ref, s2_ref, g_ref, r_ref,
    o_ref, acc_ref, xn_scr, *, n_groups: int, n_groups2: int, gs: int,
    last_i: int, norm_eps: float, dequant_mode: str = "reshape",
):
    """Whole-FFN kernel: o = r + (silu(xn@W1) * (xn@W3)) @ W2 with
    xn = rmsnorm(x, g). Grid is the hidden dimension in `bn`-column strips;
    each step streams its W1/W3 column strips AND the matching W2 row strip,
    so all three FFN weights ride ONE kernel pipeline — the h intermediate
    never leaves VMEM and the per-layer w2 kernel boundary (pipeline
    drain/ramp + h HBM round-trip) disappears. This is the TPU analog of the
    reference's per-layer FFN sequence w1/w3 -> swiglu -> w2
    (thaDNN.cpp:62-70) collapsed into one launch."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # seed the output accumulator with the residual; stash the normed
        # activations once (reused by every hidden strip)
        acc_ref[:] = r_ref[:].astype(jnp.float32)
        xf = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        g = g_ref[...].reshape(1, g_ref.shape[-1]).astype(jnp.float32)
        xn_scr[:] = (xf * jax.lax.rsqrt(ms + norm_eps) * g).astype(
            xn_scr.dtype
        )

    def dq(q_ref, s_ref, ng):
        s = s_ref[...].reshape(ng, s_ref.shape[-1])
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(
            jnp.float32
        )
        bk, bn = w.shape
        w = w.reshape(ng, gs, bn) * s[:, None, :]
        return w.reshape(bk, bn).astype(jnp.bfloat16)

    xb = xn_scr[:].astype(jnp.bfloat16)
    if dequant_mode == "group_dot":
        h1 = _gd_mm(xb, q1_ref, s1_ref, n_groups, gs)
        h3 = _gd_mm(xb, q3_ref, s3_ref, n_groups, gs)
        hb = (h1 * jax.nn.sigmoid(h1) * h3).astype(jnp.bfloat16)
        acc_ref[:] += _gd_mm(hb, q2_ref, s2_ref, n_groups2, gs)
    else:
        h1 = jnp.dot(xb, dq(q1_ref, s1_ref, n_groups),
                     preferred_element_type=jnp.float32)
        h3 = jnp.dot(xb, dq(q3_ref, s3_ref, n_groups),
                     preferred_element_type=jnp.float32)
        # same cast point as the two-kernel path: silu gate on fp32, h bf16
        hb = (h1 * jax.nn.sigmoid(h1) * h3).astype(jnp.bfloat16)  # (B, BN)
        acc_ref[:] += jnp.dot(hb, dq(q2_ref, s2_ref, n_groups2),
                              preferred_element_type=jnp.float32)

    @pl.when(i == last_i)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "interpret", "out_dtype", "norm_eps",
                     "dequant_mode"),
)
def q8_matmul_ffn(
    x: jax.Array,  # (B, K)
    qt13: QTensor,  # (K, 2H) concatenated W1 | W3
    qt2: QTensor,  # (H, N) down projection
    residual: jax.Array,  # (B, N)
    norm_weight: jax.Array,  # (K,)
    *,
    norm_eps: float = 1e-5,
    block_n: int = _ENV_FFN_BLOCK_N,
    interpret: bool | None = None,
    out_dtype=None,
    dequant_mode: str = _ENV_MODE,
) -> jax.Array:
    """residual + FFN(rmsnorm(x)) in ONE fused Q8 kernel (see
    _q8_kernel_ffn). Decode-shaped calls only (small B, whole K row in
    VMEM); anything else falls back to the two-kernel path
    (q8_matmul_silu + q8_matmul with residual epilogue) — bit-identical to
    what the unfused layer body computed."""
    b, k = x.shape
    kq, n2 = qt13.q.shape
    h = n2 // 2
    h2, n = qt2.q.shape
    gs = qt13.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        hh = q8_matmul_silu(x, qt13, out_dtype=x.dtype,
                            norm_weight=norm_weight, norm_eps=norm_eps)
        return q8_matmul(hh, qt2, out_dtype=out_dtype, residual=residual)

    bn = block_n
    while bn > 128 and (h % bn or bn % gs):
        bn //= 2
    if (
        h2 != h or kq != k or n != residual.shape[-1]
        or qt2.group_size != gs
        or h % bn or bn % gs or bn % 128
        or k % gs
        or b > 256 or b * k * 4 > 2 * 2 ** 20  # x + xn stash resident
        or k * bn > 4 * 2 ** 20  # three double-buffered weight strips
        or (not interpret and (k % 8 or n % 128))  # Mosaic tile legality
    ):
        return fallback()

    n_groups = k // gs
    n_groups2 = bn // gs
    n_off = h // bn  # W3 column-strip offset inside qt13
    grid = (h // bn,)
    s13_blocked = qt13.s.reshape(1, n_groups, n2)
    s2_blocked = qt2.s.reshape(h // bn, n_groups2, n)

    in_specs = [
        pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups, bn), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i: (0, i + n_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups, bn), lambda i: (0, 0, i + n_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups2, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, qt13.q, s13_blocked, qt13.q, s13_blocked, qt2.q,
                s2_blocked, norm_weight.reshape(1, k), residual]
    kernel = functools.partial(
        _q8_kernel_ffn, n_groups=n_groups, n_groups2=n_groups2, gs=gs,
        last_i=grid[0] - 1, norm_eps=norm_eps,
        # only group_dot changes the in-kernel math; a8/repeat/bf16 keep
        # the reshape dequant here (this kernel's strips are decode-shaped)
        dequant_mode=(
            "group_dot" if dequant_mode == "group_dot" else "reshape"
        ),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((b, n), jnp.float32),
            pltpu.VMEM((b, k), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * 2 * h + 2 * b * h * n,
            bytes_accessed=k * n2 + h * n + (k // gs) * n2 * 4
            + (h // gs) * n * 4 + b * k * 2 + b * n * 6,
            transcendentals=b * h,
        ),
        interpret=interpret,
    )(*operands)


def _q8_kernel_minner(
    x_ref, q_ref, s_ref, *rest, n_groups: int, gs: int, last_j: int,
    m_blocks: int, block_m: int, rope_spec=None, has_res: bool,
    has_rope: bool,
):
    """Large-M (prefill) q8 matmul with the M axis INNERMOST: grid
    (n, k, m). The weight tile at (k, n) stays resident across all m
    steps, and its dequant runs ONCE into a bf16 scratch (at m == 0)
    instead of once per m-block — the m-outermost grid dequantized (and
    re-streamed) the full weight set m_blocks times, which throttled
    prefill matmuls to ~73% of MXU peak (VPU-bound; profile r4). The
    full-height accumulator lives in VMEM scratch, so there are NO
    output-block RMW round-trips (the round-1 m-inner attempt accumulated
    through the output and lost, BASELINE.md)."""
    if has_res and has_rope:
        r_ref, p_ref, o_hbm, acc_ref, dq_ref, stage_ref, sem = rest
    elif has_res:
        r_ref, o_hbm, acc_ref, dq_ref, stage_ref, sem = rest
        p_ref = None
    elif has_rope:
        p_ref, o_hbm, acc_ref, dq_ref, stage_ref, sem = rest
        r_ref = None
    else:
        o_hbm, acc_ref, dq_ref, stage_ref, sem = rest
        r_ref = p_ref = None
    ni = pl.program_id(0)
    j = pl.program_id(1)
    m = pl.program_id(2)
    bn = dq_ref.shape[-1]

    @pl.when(m == 0)
    def _dequant_once():
        s = s_ref[...].reshape(n_groups, s_ref.shape[-1])
        w = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1]).astype(
            jnp.float32
        )
        bk, _ = w.shape
        w = w.reshape(n_groups, gs, bn) * s[:, None, :]
        dq_ref[:] = w.reshape(bk, bn).astype(jnp.bfloat16)

    # acc is (m_blocks, block_m, bn): leading-axis indexing by the scalar
    # m (the fast pattern) — a dynamic SUBLANE slice of a 2-D (BP, BN)
    # accumulator went through Mosaic's slow dynamic-offset path
    @pl.when(j == 0)
    def _zero():
        acc_ref[m] = jnp.zeros_like(acc_ref[m])

    acc_ref[m] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), dq_ref[...],
        preferred_element_type=jnp.float32,
    )

    # output leaves via explicit DMA at the last K step: an out BlockSpec
    # revisited under the (n, k, m) grid would write the block back at
    # EVERY m transition (k_blocks redundant HBM writes per block)
    @pl.when(j == last_j)
    def _emit():
        acc = acc_ref[m]
        if r_ref is not None:
            acc = acc + r_ref[...].astype(jnp.float32)
        if p_ref is not None:
            rot_limit, head_size, theta = rope_spec
            acc = _rope_rotate_cols(
                acc, p_ref[...].astype(jnp.float32),
                ni * bn, rot_limit, head_size, theta,
            )
        stage_ref[:] = acc.astype(stage_ref.dtype)
        cp = pltpu.make_async_copy(
            stage_ref,
            o_hbm.at[pl.ds(m * block_m, block_m), pl.ds(ni * bn, bn)],
            sem,
        )
        cp.start()
        cp.wait()


def _q8_kernel_silu_minner(
    x_ref, q1_ref, s1_ref, q3_ref, s3_ref, *rest, n_groups: int, gs: int,
    last_j: int, block_m: int,
):
    """Large-M fused-SwiGLU with the m-inner grid + dequant-once scratch
    (see _q8_kernel_minner — same structure, two weight strips and the
    silu gate on the fp32 accumulators)."""
    o_hbm, acc1_ref, acc2_ref, dq1_ref, dq3_ref, stage_ref, sem = rest
    ni = pl.program_id(0)  # hoisted: unavailable inside pl.when (interpret)
    j = pl.program_id(1)
    m = pl.program_id(2)
    bn = dq1_ref.shape[-1]

    @pl.when(m == 0)
    def _dequant_once():
        for q_ref, s_ref, dq_ref in (
            (q1_ref, s1_ref, dq1_ref), (q3_ref, s3_ref, dq3_ref),
        ):
            s = s_ref[...].reshape(n_groups, s_ref.shape[-1])
            w = q_ref[...].reshape(
                q_ref.shape[-2], q_ref.shape[-1]
            ).astype(jnp.float32)
            bk, _ = w.shape
            w = w.reshape(n_groups, gs, bn) * s[:, None, :]
            dq_ref[:] = w.reshape(bk, bn).astype(jnp.bfloat16)

    @pl.when(j == 0)
    def _zero():
        acc1_ref[m] = jnp.zeros_like(acc1_ref[m])
        acc2_ref[m] = jnp.zeros_like(acc2_ref[m])

    xb = x_ref[...].astype(jnp.bfloat16)
    acc1_ref[m] += jnp.dot(xb, dq1_ref[...],
                           preferred_element_type=jnp.float32)
    acc2_ref[m] += jnp.dot(xb, dq3_ref[...],
                           preferred_element_type=jnp.float32)

    @pl.when(j == last_j)
    def _emit():
        h1 = acc1_ref[m]
        stage_ref[:] = (
            h1 * jax.nn.sigmoid(h1) * acc2_ref[m]
        ).astype(stage_ref.dtype)
        cp = pltpu.make_async_copy(
            stage_ref,
            o_hbm.at[pl.ds(m * block_m, block_m), pl.ds(ni * bn, bn)],
            sem,
        )
        cp.start()
        cp.wait()


def _q8_matmul_minner(
    x, qt, *, s_blocked_n: int, block_k: int, block_m: int, out_dtype,
    residual, rope_pos, rope_limit: int, rope_head: int, rope_theta: float,
    interpret: bool, b: int, pad_m: int,
):
    """pallas_call wrapper for _q8_kernel_minner (the large-M grid)."""
    k, n = qt.q.shape
    gs = qt.group_size
    bn = s_blocked_n
    bk = block_k
    bp = b + pad_m
    ng = bk // gs
    grid = (n // bn, k // bk, bp // block_m)
    s_blocked = qt.s.reshape(k // bk, ng, n)

    in_specs = [
        pl.BlockSpec((block_m, bk), lambda i, j, m: (m, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, m: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng, bn), lambda i, j, m: (j, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, qt.q, s_blocked]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((block_m, bn), lambda i, j, m: (m, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    if rope_pos is not None:
        if pad_m:
            rope_pos = jnp.pad(rope_pos, ((0, pad_m),))
        in_specs.append(
            pl.BlockSpec((block_m, 1), lambda i, j, m: (m, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(rope_pos.astype(jnp.float32).reshape(-1, 1))
    kernel = functools.partial(
        _q8_kernel_minner, n_groups=ng, gs=gs, last_j=grid[1] - 1,
        m_blocks=grid[2], block_m=block_m,
        rope_spec=(rope_limit, rope_head, rope_theta),
        has_res=residual is not None, has_rope=rope_pos is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=[
            # full-height accumulator, m-block-major for scalar indexing
            pltpu.VMEM((bp // block_m, block_m, bn), jnp.float32),
            pltpu.VMEM((bk, bn), jnp.bfloat16),  # dequanted weight tile
            pltpu.VMEM((block_m, bn), out_dtype),  # DMA staging
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            has_side_effects=True,
            vmem_limit_bytes=48 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * k * n,
            bytes_accessed=k * n + (k // gs) * n * 4 + bp * k * 2
            + bp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:b] if pad_m else out


def _rmsnorm_rows(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    """Same math as models/llama.py::rmsnorm (fp32 internally)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * g.astype(jnp.float32)).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_n", "block_k", "interpret", "out_dtype", "dequant_mode",
        "norm_eps", "rope_limit", "rope_head", "rope_theta", "out_heads",
    ),
)
def q8_matmul(
    x: jax.Array,
    qt: QTensor,
    *,
    block_n: int = _ENV_BLOCK_N,
    block_k: int = _ENV_BLOCK_K,
    interpret: bool | None = None,
    out_dtype=None,
    dequant_mode: str = _ENV_MODE,
    norm_weight: jax.Array | None = None,
    norm_eps: float = 1e-5,
    residual: jax.Array | None = None,
    rope_pos: jax.Array | None = None,
    rope_limit: int = 0,
    rope_head: int = 0,
    rope_theta: float = 10000.0,
    out_heads: int = 0,
) -> jax.Array:
    """x (B, K) @ dequant(q (K, N), s (K//gs, N)) -> (B, N).

    `out_heads=HS` returns (B, N//HS, HS) instead — the head-split layout
    the attention kernels consume — with the lane->sublane relayout done in
    the kernel epilogue (hidden under the weight stream) instead of as a
    standalone XLA reshape op (~1.6 us each, 3/layer in the decode step).

    Fused dequantization: int8 tiles are the only weight HBM traffic.
    `residual` (B, N) is added in the kernel epilogue on the fp32
    accumulator (o = residual + x @ W) — the decode step's two per-layer
    residual adds otherwise each cost a standalone XLA op dispatch.
    `rope_pos` (B,) enables the fused RoPE epilogue for QKV projections:
    the first `rope_limit` output columns (the q|k segments, head-aligned
    with head size `rope_head`) rotate by position before the cast —
    killing the 2 standalone rope ops per layer. Mutually exclusive with
    `residual`.
    """
    assert residual is None or rope_pos is None
    b, k = x.shape
    kq, n = qt.q.shape
    assert k == kq, (x.shape, qt.q.shape)
    gs = qt.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    while block_n > 128 and n % block_n:
        block_n //= 2
    if n % block_n:
        block_n = n
    # prefer ONE K block (no inner accumulator round-trips: 416 -> 519
    # tok/s at 7B) when the weight column strip fits comfortably in VMEM
    # and the x strip stays small (prefill calls come in with b up to B*T).
    # Only for the default `reshape` mode: `repeat`/`bf16` materialize an
    # extra (BK, BN) bf16 tile on the scoped-vmem stack and bust the 16 MiB
    # limit at (11008, 512) — observed on a real v5e. `group_dot` also
    # materializes its bf16 tile, but with the raised vmem_limit below it
    # fits (the mode was previously only ever measured under multi-K-block
    # accumulator round-trips, which buried its actual cost).
    if (
        dequant_mode in ("reshape", "a8", "group_dot", "bf16", "f32dot")
        and k % gs == 0
        # <= 8 MiB weight strip: for the tile-materializing modes
        # (group_dot/bf16/f32dot) the extra (BK, BN) bf16 tile doubles the
        # footprint, which fits exactly because the vmem_limit below is
        # raised to 16 MiB for them.
        and k * block_n <= 8 * 2 ** 20
        and b * k * 2 <= 2 * 2 ** 20
    ):
        block_k = k
    else:
        # shrink requested blocks to divisors of the problem (weights like
        # hidden_dim=11008 or vocab=32000 are not 512-aligned)
        while block_k > gs and (k % block_k or block_k % gs):
            block_k //= 2
        if k % block_k or block_k % gs:
            block_k = gs if k % gs == 0 else k
    assert k % block_k == 0 and block_k % gs == 0, (k, block_k, gs)
    assert n % block_n == 0, (n, block_n)
    # large-M callers (prefill: b = batch*chunk rows) get an M-block axis so
    # the x strip and the fp32 accumulator stay VMEM-sized. Row counts that
    # only admit tiny blocks get PADDED up to a 512 multiple instead: with
    # the m axis outermost, every m block re-streams the whole weight, so
    # e.g. 4088 rows at block_m=8 would read the weights 511x (a 511-token
    # chunked prefill measured 6.9 s/layer-pass vs 0.6 s at 4096 rows).
    block_m = b
    pad_m = 0
    if dequant_mode == "a8":
        if (b > 64 and k % gs == 0 and k * block_n <= 8 * 2 ** 20
                and k // gs <= 64):
            # prefill w8a8: int8 weight tiles feed the MXU directly at the
            # 2x int8 rate — prefill is FLOPs-bound, so this attacks the
            # 63%-of-MXU-peak dequant serialization (VERDICT r4 #1b).
            # block_k == K (the x stash covers the whole row, quantized
            # once per m-block at n-block 0); the kernel's group-chunked
            # rescale keeps the int32 partials VMEM-sized at any block_m.
            block_k = k
        elif (
            b > 64 or block_k != k
            or (block_k // gs) * b * block_n * 4 > 4 * 2 ** 20
        ):
            # remaining ineligible shapes (non-gs-aligned K, oversized
            # weight strips, deep-K rows like w2's 172 groups whose chunk
            # loop spills 113 MB of registers — measured r5) keep
            # dequant+MXU
            dequant_mode = "reshape"
    if b > 512:
        block_m = 512
        if out_heads:
            # the head-split out block (block_m, N/HS, HS) stays resident
            # across n-steps; at prefill row counts block_m=512 overflows
            # the 80 MB scoped-vmem stack (measured 94.1 MB at 7B QKV)
            block_m = 256
        if dequant_mode == "a8":
            # cap the x stash (K x block_m int8) + int32 partial footprint
            block_m = 256
        if b % block_m:
            pad_m = block_m - b % block_m
            x = jnp.pad(x, ((0, pad_m), (0, 0)))
            if residual is not None:
                residual = jnp.pad(residual, ((0, pad_m), (0, 0)))
    # Mosaic tile legality: last-two block dims must be (8, 128)-divisible or
    # equal to the full array dims. Tiny models (test configs) fail this —
    # fall back to the dense-dequant einsum, which is fine at those sizes.
    ok_x = block_k % 128 == 0 or block_k == k
    ok_w = (block_k % 8 == 0 or block_k == k) and (block_n % 128 == 0 or block_n == n)
    if out_heads and n % (8 * out_heads) == 0 and block_n % (8 * out_heads):
        # Mosaic proves dynamic sublane store offsets only in multiples of
        # 8: the per-n-block head-slice store needs block_n//HS % 8 == 0
        block_n = max(8 * out_heads, block_n - block_n % (8 * out_heads))
    if out_heads and (
        n % out_heads or block_n % out_heads
        or (block_n // out_heads) % 8
        # sub-128 head sizes: the in-kernel (M, BN) -> (M, BN/HS, HS)
        # head-split store is a lane split of sub-width vectors — Mosaic
        # "unsupported shape cast" (hit at 110m hs=64 with padded weights)
        or out_heads % 128
        # prefill w8a8 + head-split emission together bust the 128 MB
        # physical VMEM (the resident out block + the x stash measured
        # 139.5 MB at 7B QKV block_m=256) — flat emission for a8
        or (dequant_mode == "a8" and b > 512)
        # the rounding above can leave a NON-DIVISOR block_n (env-overridden
        # widths, e.g. 2560 -> 2048 with n=15360): a non-divisor block would
        # FLOOR the grid and silently drop the tail head slices — emit flat
        or n % block_n
    ):
        # head-split output needs head-aligned, 8-sublane-aligned column
        # blocks; otherwise emit flat and let the caller reshape
        # (bit-identical, one extra XLA op)
        y = q8_matmul(
            x[:b] if pad_m else x, qt, block_n=block_n, block_k=block_k,
            interpret=interpret, out_dtype=out_dtype,
            dequant_mode=dequant_mode, norm_weight=norm_weight,
            norm_eps=norm_eps,
            residual=residual[:b] if (pad_m and residual is not None) else residual,
            rope_pos=rope_pos, rope_limit=rope_limit, rope_head=rope_head,
            rope_theta=rope_theta,
        )
        return y.reshape(b, n // out_heads, out_heads)
    if not (ok_x and ok_w) and not interpret:
        if pad_m:
            x = x[:b]
            if residual is not None:
                residual = residual[:b]
            if rope_pos is not None:
                rope_pos = rope_pos[:b]
        if norm_weight is not None:
            x = _rmsnorm_rows(x, norm_weight, norm_eps)
        y = q8_matmul_xla(x, qt)
        if residual is not None:
            y = residual.astype(jnp.float32) + y
        if rope_pos is not None:
            y = _rope_rows_xla(y, rope_pos, rope_limit, rope_head, rope_theta)
        y = y.astype(out_dtype)
        return y.reshape(b, n // out_heads, out_heads) if out_heads else y
    if norm_weight is not None and block_k != k:
        # in-kernel rmsnorm needs the whole contraction row resident;
        # multi-K-block shapes normalize outside (XLA fuses it)
        x = _rmsnorm_rows(x, norm_weight, norm_eps)
        norm_weight = None
    bp = b + pad_m
    if (
        _ENV_PREFILL_MINNER
        and bp > block_m
        and dequant_mode == "reshape"
        and norm_weight is None
        and not out_heads
        and block_n % 128 == 0
        and bp * block_n * 4 <= 12 * 2 ** 20
    ):
        return _q8_matmul_minner(
            x, qt, s_blocked_n=block_n, block_k=block_k, block_m=block_m,
            out_dtype=out_dtype, residual=residual, rope_pos=rope_pos,
            rope_limit=rope_limit, rope_head=rope_head,
            rope_theta=rope_theta, interpret=interpret, b=b, pad_m=pad_m,
        )
    n_groups = block_k // gs
    grid = ((b + pad_m) // block_m, n // block_n, k // block_k)
    s_blocked = qt.s.reshape(k // block_k, n_groups, n)

    in_specs = [
        pl.BlockSpec(
            (block_m, block_k), lambda m, i, j: (m, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (block_k, block_n), lambda m, i, j: (j, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, n_groups, block_n), lambda m, i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x, qt.q, s_blocked]
    kw = dict(n_groups=n_groups, gs=gs, last_j=grid[2] - 1,
              dequant_mode=dequant_mode, k_axis=2, norm_eps=norm_eps,
              rope_spec=(rope_limit, rope_head, rope_theta),
              out_heads=out_heads)
    if norm_weight is not None:
        in_specs.append(
            pl.BlockSpec((1, block_k), lambda m, i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight.reshape(1, k))
    if residual is not None:
        # residual blocks track the OUTPUT block (m, i)
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda m, i, j: (m, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    if rope_pos is not None:
        if pad_m:
            rope_pos = jnp.pad(rope_pos, ((0, pad_m),))
        in_specs.append(
            pl.BlockSpec((block_m, 1), lambda m, i, j: (m, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(rope_pos.astype(jnp.float32).reshape(-1, 1))
    kernel = functools.partial(
        {
            (False, False, False): _q8_kernel,
            (True, False, False): _q8_kernel_norm,
            (False, True, False): _q8_kernel_res,
            (True, True, False): _q8_kernel_norm_res,
            (False, False, True): _q8_kernel_rope,
            (True, False, True): _q8_kernel_norm_rope,
        }[(norm_weight is not None, residual is not None,
           rope_pos is not None)],
        **kw,
    )
    scratch_shapes = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    dim_sem = ("parallel", "parallel", "arbitrary")
    if out_heads:
        dim_sem = ("parallel", "arbitrary", "arbitrary")
    if dequant_mode == "a8":
        # quantized-x stash, written at n-block 0 and reused by later
        # n-blocks — the n axis therefore carries a sequential dependence
        scratch_shapes += [
            pltpu.VMEM((n_groups, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups, 1, block_m), jnp.float32),
        ]
        dim_sem = ("parallel", "arbitrary", "arbitrary")
    if out_heads:
        # the n-axis revisits ONE full (M, N/HS, HS) out block (a few hundred
        # KB for QKV rows); each n-step writes its head-slice, the writeback
        # happens once — so the n axis must be "arbitrary", not "parallel"
        out_specs = pl.BlockSpec(
            (block_m, n // out_heads, out_heads),
            lambda m, i, j: (m, 0, 0), memory_space=pltpu.VMEM,
        )
        out_sds = jax.ShapeDtypeStruct(
            (b + pad_m, n // out_heads, out_heads), out_dtype
        )
    else:
        out_specs = pl.BlockSpec(
            (block_m, block_n), lambda m, i, j: (m, i), memory_space=pltpu.VMEM
        )
        out_sds = jax.ShapeDtypeStruct((b + pad_m, n), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_sds,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
            # group_dot/bf16/f32dot materialize the weight tile on the
            # scoped stack — give them headroom beyond the 16 MiB default.
            # Large-M out_heads (prefill head-split) keeps the whole
            # (block_m, N/HS, HS) out block resident and lands 128 KB over
            # the 80 MB default at 7B-QKV shapes — bump to 100 MB.
            vmem_limit_bytes=(
                64 * 2 ** 20
                if dequant_mode in ("group_dot", "bf16", "f32dot")
                or (dequant_mode == "a8" and b > 64 and not out_heads)
                else (100 * 2 ** 20 if out_heads and b > 512 else None)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b + pad_m) * k * n,
            bytes_accessed=k * n + (k // gs) * n * 4
            + (b + pad_m) * k * 2 + (b + pad_m) * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if pad_m:
        out = out[:b]
    return out


def _q8_kernel_layered_norm(layer_ref, x_ref, q_ref, s_ref, g_ref, o_ref,
                            acc_ref, *a8_scr, **kw):
    # layered + fused-rmsnorm: layer index feeds the index maps only; the
    # norm weight is the 4th tensor operand
    del layer_ref
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               **kw)


def _q8_kernel_layered_res(layer_ref, x_ref, q_ref, s_ref, r_ref, o_ref,
                           acc_ref, *a8_scr, **kw):
    del layer_ref
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, r_ref=r_ref,
               **kw)


def _q8_kernel_layered_norm_res(layer_ref, x_ref, q_ref, s_ref, g_ref, r_ref,
                                o_ref, acc_ref, *a8_scr, **kw):
    del layer_ref
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               r_ref=r_ref, **kw)


def _q8_kernel_layered_rope(layer_ref, x_ref, q_ref, s_ref, p_ref, o_ref,
                            acc_ref, *a8_scr, **kw):
    del layer_ref
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, p_ref=p_ref,
               **kw)


def _q8_kernel_layered_norm_rope(layer_ref, x_ref, q_ref, s_ref, g_ref, p_ref,
                                 o_ref, acc_ref, *a8_scr, **kw):
    del layer_ref
    _q8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *a8_scr, g_ref=g_ref,
               p_ref=p_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_n", "block_k", "interpret", "out_dtype", "dequant_mode",
        "norm_eps", "rope_limit", "rope_head", "rope_theta",
    ),
)
def q8_matmul_layered(
    x: jax.Array,
    qt: QTensor,  # STACKED: q (L, K, N), s (L, K//gs, N)
    layer: jax.Array,  # () int32
    *,
    block_n: int = _ENV_BLOCK_N,
    block_k: int = _ENV_BLOCK_K,
    interpret: bool | None = None,
    out_dtype=None,
    dequant_mode: str = _ENV_MODE,
    norm_weight: jax.Array | None = None,  # STACKED (L, K) f32
    norm_eps: float = 1e-5,
    residual: jax.Array | None = None,  # (B, N), added in the epilogue
    rope_pos: jax.Array | None = None,  # (B,): fused RoPE epilogue (QKV)
    rope_limit: int = 0,
    rope_head: int = 0,
    rope_theta: float = 10000.0,
) -> jax.Array:
    """x (B, K) @ dequant(q[layer]) -> (B, N), selecting the layer via a
    scalar-prefetched BlockSpec index (residual and rope epilogues are
    mutually exclusive, as in q8_matmul) — used inside the layer scan so XLA
    never materializes a per-layer copy of the int8 weights (a dynamic-slice
    feeding a pallas_call operand is a real copy: ~8.9 ms/step at 7B,
    measured with tools/profile_step.py). A further benefit vs the unrolled
    per-layer buffers: XLA's memory-space assignment promotes the per-layer
    weights into VMEM with async slice copies whose waits sit on the decode
    critical path (~2.2 ms/step at 7B); one stacked (L, K, N) array is too
    big to promote, so the kernel's own pipeline does all the streaming.

    norm_weight: stacked per-layer rmsnorm weights, applied to x in the
    kernel prologue (single-K-block shapes only; see q8_matmul)."""
    b, k = x.shape
    assert residual is None or rope_pos is None
    n_layers, kq, n = qt.q.shape
    if x.shape[0] > 512:
        # the layered kernel has no M-blocking (it exists for DECODE's small
        # row counts); large-row callers route through the 2-D kernel on the
        # sliced layer, which blocks and pads M itself
        ql = jax.lax.dynamic_index_in_dim(qt.q, layer, 0, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(qt.s, layer, 0, keepdims=False)
        nw = (
            None if norm_weight is None
            else jax.lax.dynamic_index_in_dim(norm_weight, layer, 0,
                                              keepdims=False)
        )
        return q8_matmul(
            x, QTensor(q=ql, s=sl), block_n=block_n, block_k=block_k,
            interpret=interpret, out_dtype=out_dtype,
            dequant_mode=dequant_mode, norm_weight=nw, norm_eps=norm_eps,
            residual=residual, rope_pos=rope_pos, rope_limit=rope_limit,
            rope_head=rope_head, rope_theta=rope_theta,
        )
    assert k == kq, (x.shape, qt.q.shape)
    gs = qt.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def norm_slice(xx):
        if norm_weight is None:
            return xx
        g = jax.lax.dynamic_index_in_dim(norm_weight, layer, 0, keepdims=False)
        return _rmsnorm_rows(xx, g, norm_eps)

    while block_n > 128 and n % block_n:
        block_n //= 2
    if n % block_n:
        block_n = n
    # single-K-block fast path (see q8_matmul): no accumulator round-trips,
    # and the whole row is resident so rmsnorm can fuse into the prologue
    if (
        dequant_mode in ("reshape", "a8")
        and k % gs == 0
        and k * block_n <= 8 * 2 ** 20
        and b * k * 2 <= 2 * 2 ** 20
    ):
        block_k = k
    else:
        while block_k > gs and (k % block_k or block_k % gs):
            block_k //= 2
        if k % block_k or block_k % gs:
            block_k = gs if k % gs == 0 else k
    ok_x = block_k % 128 == 0 or block_k == k
    ok_w = (block_k % 8 == 0 or block_k == k) and (block_n % 128 == 0 or block_n == n)
    if not (ok_x and ok_w) and not interpret:
        ql = jax.lax.dynamic_index_in_dim(qt.q, layer, 0, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(qt.s, layer, 0, keepdims=False)
        y = q8_matmul_xla(norm_slice(x), QTensor(q=ql, s=sl))
        if residual is not None:
            y = residual.astype(jnp.float32) + y
        if rope_pos is not None:
            y = _rope_rows_xla(y, rope_pos, rope_limit, rope_head, rope_theta)
        return y.astype(out_dtype)
    if dequant_mode == "a8" and (
        b > 64 or block_k != k
        or (block_k // gs) * b * block_n * 4 > 4 * 2 ** 20
    ):
        # see q8_matmul: a8 is a decode (GEMV) optimization
        dequant_mode = "reshape"
    fuse_norm = norm_weight is not None and block_k == k
    if norm_weight is not None and not fuse_norm:
        x = norm_slice(x)
    n_groups = block_k // gs
    grid = (n // block_n, k // block_k)
    s_blocked = qt.s.reshape(n_layers, k // block_k, n_groups, n)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((b, block_k), lambda i, j, lr: (0, j)),
        pl.BlockSpec((1, block_k, block_n), lambda i, j, lr: (lr[0], j, i)),
        pl.BlockSpec((1, 1, n_groups, block_n), lambda i, j, lr: (lr[0], j, 0, i)),
    ]
    operands = [x, qt.q, s_blocked]
    if fuse_norm:
        # (L, 1, K) view: the (1, 1, block_k) block's last-two dims equal
        # the array dims, satisfying Mosaic tile legality for any L
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda i, j, lr: (lr[0], 0, j))
        )
        operands.append(norm_weight.reshape(n_layers, 1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((b, block_n), lambda i, j, lr: (0, i)))
        operands.append(residual)
    if rope_pos is not None:
        in_specs.append(pl.BlockSpec((b, 1), lambda i, j, lr: (0, 0)))
        operands.append(rope_pos.astype(jnp.float32).reshape(-1, 1))
    kernel = functools.partial(
        {
            (False, False, False): _q8_kernel_layered,
            (True, False, False): _q8_kernel_layered_norm,
            (False, True, False): _q8_kernel_layered_res,
            (True, True, False): _q8_kernel_layered_norm_res,
            (False, False, True): _q8_kernel_layered_rope,
            (True, False, True): _q8_kernel_layered_norm_rope,
        }[(fuse_norm, residual is not None, rope_pos is not None)],
        n_groups=n_groups, gs=gs, last_j=grid[1] - 1,
        dequant_mode=dequant_mode, norm_eps=norm_eps,
        rope_spec=(rope_limit, rope_head, rope_theta),
    )

    scratch_shapes = [pltpu.VMEM((b, block_n), jnp.float32)]
    dim_sem = ("parallel", "arbitrary")
    if dequant_mode == "a8":
        # see q8_matmul: stash reused across n-blocks -> sequential n axis
        scratch_shapes += [
            pltpu.VMEM((n_groups, gs, b), jnp.int8),
            pltpu.VMEM((n_groups, 1, b), jnp.float32),
        ]
        dim_sem = ("arbitrary", "arbitrary")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, lr: (0, i)),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n + (k // gs) * n * 4 + b * k * 2 + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, *operands)
