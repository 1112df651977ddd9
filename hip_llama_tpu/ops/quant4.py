"""Q4_0-style int4 weight-only quantized matmul as fused Pallas TPU kernels.

BEYOND the reference: hip_llama.cpp's quantized engine stops at Q8_0
(runq.c:317-342). Decode on TPU is weight-HBM-bandwidth-bound (the q8
kernels already stream at ~98% of speed-of-light, BASELINE.md), so the one
remaining step-function win is streaming fewer bytes: int4 weights halve
the dominant traffic term.

Scheme (same group semantics as the Q8_0 path, ops/quant.py):
  - symmetric int4 per `group_size` consecutive elements along K:
    scale = absmax/7, q = clip(round(w/scale), -8, 7), stored as
    offset-binary nibbles (q+8 in [0, 15]).
  - HALF-SPLIT packing along K: byte[k', n] holds the nibble of original
    row k' (low) and row k' + K/2 (high), k' < K/2. Unpacking therefore
    yields two CONTIGUOUS (K/2, N) tiles — no sublane interleave/relayout,
    which TPUs cannot do cheaply — and the kernel feeds the MXU two dots
    (x[:, :K/2] @ W_lo + x[:, K/2:] @ W_hi) into one fp32 accumulator.
  - scales stay fp32 (K/gs, N); group boundaries never straddle the half
    split (requires (K/2) % group_size == 0, true for all Llama dims).

Activations stay bf16 exactly as in the q8 path: the win is bandwidth, and
wide activations only help quality.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hip_llama_tpu.ops.quant import _rmsnorm_rows

# 256 beats 512 by +16% at 7B decode (727 vs 627 tok/s, r5 on-chip sweep:
# narrower n-strips shrink the unpack+dequant intermediates the VPU must
# produce per MXU dot, improving the overlap); 1024/128 and the bf16/a8
# dequant variants all measured worse (BASELINE.md r5)
_ENV_BLOCK_N = int(os.environ.get("HIPLLAMA_Q4_BLOCK_N", "256"))
_ENV_BLOCK_K = int(os.environ.get("HIPLLAMA_Q4_BLOCK_K", "1024"))
# "dequant" = unpack + f32 dequant + bf16 MXU (exact vs the group scales);
# "a8" = w4a8: nibbles expand straight to int8 and feed int8xint8 MXU dots,
# activations quantized per (row, K-group) — runq-style w8a8 semantics with
# 4-bit weights. Default from the round-5 on-chip A/B (see BASELINE.md).
_ENV_Q4_MODE = os.environ.get("HIPLLAMA_Q4_MODE", "dequant")


class Q4Tensor(NamedTuple):
    """int4 weight in matmul orientation.

    q: (…, K/2, N) int8 — packed nibbles, half-split along K (byte k' =
       row k' low nibble | row k'+K/2 high nibble, offset-binary q+8).
    s: (…, K//gs, N) f32 — per-(group, column) scales.
    """

    q: jax.Array
    s: jax.Array

    @property
    def k_dim(self) -> int:
        return 2 * self.q.shape[-2]

    @property
    def group_size(self) -> int:
        return self.k_dim // self.s.shape[-2]


def _pack_nibbles(nib_lo: jax.Array, nib_hi: jax.Array) -> jax.Array:
    """Two uint4-valued int32 arrays -> int8 bytes (two's-complement view)."""
    packed = nib_lo | (nib_hi << 4)  # 0..255
    return (((packed + 128) & 255) - 128).astype(jnp.int8)


def q4_quantize_weights(w, group_size: int = 32) -> Q4Tensor:
    """Quantize a (K, N) [or (L, K, N)] weight along K in groups (Q4_0-like,
    symmetric absmax/7, codes clipped to [-8, 7], stored offset-binary)."""
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape[-2], w.shape[-1]
    assert k % 2 == 0 and (k // 2) % group_size == 0, (w.shape, group_size)
    lead = w.shape[:-2]
    g = w.reshape(*lead, k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = absmax / 7.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(g / scale), -8, 7).astype(jnp.int32)
    nib = (q + 8).reshape(*lead, k, n)  # 0..15
    packed = _pack_nibbles(nib[..., : k // 2, :], nib[..., k // 2 :, :])
    return Q4Tensor(q=packed, s=scale[..., 0, :].astype(jnp.float32))


def q4_unpack(t: Q4Tensor) -> jax.Array:
    """Packed bytes -> signed int4 codes (…, K, N) as int32."""
    p = t.q.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = ((p >> 4) & 15) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def q4_dequantize(t: Q4Tensor) -> jax.Array:
    gs = t.group_size
    k, n = t.k_dim, t.q.shape[-1]
    codes = q4_unpack(t).astype(jnp.float32)
    g = codes.reshape(*t.q.shape[:-2], k // gs, gs, n)
    return (g * t.s[..., :, None, :]).reshape(*t.q.shape[:-2], k, n)


def q4_matmul_xla(x: jax.Array, t: Q4Tensor) -> jax.Array:
    """Oracle / CPU fallback: per-group partial dots in fp32 (the kernel
    scales weights pre-dot in fp32 then casts bf16; tolerances in the tests
    cover the cast difference)."""
    gs = t.group_size
    k, n = t.k_dim, t.q.shape[-1]
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], k // gs, gs)
    wg = q4_unpack(t).astype(jnp.float32).reshape(k // gs, gs, n)
    partial = jnp.einsum("bgk,gkn->bgn", xg, wg, preferred_element_type=jnp.float32)
    return jnp.einsum("bgn,gn->bn", partial, t.s).astype(x.dtype)


def _dequant_tile(p, s_ref, n_groups_h: int, gs: int, half: str,
                  mode: str = "dequant"):
    """Unpack one nibble plane of a packed (BKH, BN) int32 tile and apply
    its per-group scales -> bf16 (BKH, BN). mode="bf16" does the scale
    multiply at bf16 width (int4 codes are exact in bf16; only the scale
    rounds) — one fewer full-width VPU pass than the f32 chain."""
    bkh, bn = p.shape
    codes = ((p & 15) if half == "lo" else ((p >> 4) & 15)) - 8
    if mode == "bf16":
        s = s_ref[...].reshape(n_groups_h, bn).astype(jnp.bfloat16)
        w = codes.astype(jnp.bfloat16).reshape(n_groups_h, gs, bn) * s[:, None, :]
        return w.reshape(bkh, bn)
    s = s_ref[...].reshape(n_groups_h, bn)
    w = codes.astype(jnp.float32).reshape(n_groups_h, gs, bn) * s[:, None, :]
    return w.reshape(bkh, bn).astype(jnp.bfloat16)


def _a8_quant_half(x_f32, n_groups_h: int, gs: int):
    """Per-(row, K-group) absmax/127 int8 quantization of one x half —
    transposed so the group split is a layout-free sublane reshape (see
    ops/quant.py::_q8_kernel a8). Returns ((G, gs, M) int8, (G, 1, M) f32)."""
    xt = x_f32.T  # (KH, M)
    x3 = xt.reshape(n_groups_h, gs, xt.shape[-1])
    sx = jnp.max(jnp.abs(x3), axis=1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.where(sx == 0.0, 1.0, sx)
    return jnp.round(x3 / sx).astype(jnp.int8), sx


def _a8_plane_dot(p, s_ref, xi_scr, sx_scr, acc_ref, n_groups_h: int,
                  gs: int, half: str):
    """w4a8: expand one nibble plane straight to int8 (codes -8..7 are
    exact in int8 — NO f32 dequant pass over the tile) and run per-group
    int8 x int8 MXU dots; the fp32 rescale touches only the (gc, M, BN)
    partials. This is the VERDICT r4 #4 fix: the measured killer of the
    int4 path was the unpack+f32-dequant VPU chain, not the bytes."""
    bkh, bn = p.shape
    codes = (((p & 15) if half == "lo" else ((p >> 4) & 15)) - 8).astype(
        jnp.int8)
    w3 = codes.reshape(n_groups_h, gs, bn)
    s = s_ref[...].reshape(n_groups_h, bn)
    m_rows = xi_scr.shape[-1]
    g_chunk = n_groups_h
    while g_chunk * m_rows * bn * 4 > 4 * 2 ** 20 and g_chunk % 2 == 0:
        g_chunk //= 2
    for g0 in range(0, n_groups_h, g_chunk):
        gc = min(g_chunk, n_groups_h - g0)
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


def _q4_norm_rows(x_lo_ref, x_hi_ref, g_ref, norm_eps: float):
    """Fused rmsnorm over the full row resident as two half blocks."""
    kh = x_lo_ref.shape[-1]
    xf_lo = x_lo_ref[:].astype(jnp.float32)
    xf_hi = x_hi_ref[:].astype(jnp.float32)
    ms = (
        jnp.sum(xf_lo * xf_lo, axis=-1, keepdims=True)
        + jnp.sum(xf_hi * xf_hi, axis=-1, keepdims=True)
    ) / (2 * kh)
    r = jax.lax.rsqrt(ms + norm_eps)
    g = g_ref[...].reshape(1, 2 * kh).astype(jnp.float32)
    x_lo = (xf_lo * r * g[:, :kh]).astype(jnp.bfloat16)
    x_hi = (xf_hi * r * g[:, kh:]).astype(jnp.bfloat16)
    return x_lo, x_hi


def _q4_kernel(
    x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
    *a8_scr, n_groups_h: int, gs: int, last_j: int, k_axis: int = 2,
    g_ref=None, r_ref=None, p_ref=None, rope_spec=None,
    norm_eps: float = 1e-5, dequant_mode: str = "dequant",
):
    j = pl.program_id(k_axis)
    # hoisted: program_id is unavailable inside pl.when bodies in interpret
    ni = pl.program_id(k_axis - 1) if p_ref is not None else None

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if g_ref is not None:
        x_lo, x_hi = _q4_norm_rows(x_lo_ref, x_hi_ref, g_ref, norm_eps)
    else:
        x_lo = x_lo_ref[:].astype(jnp.bfloat16)
        x_hi = x_hi_ref[:].astype(jnp.bfloat16)

    p = qp_ref[...].reshape(qp_ref.shape[-2], qp_ref.shape[-1]).astype(jnp.int32)
    if dequant_mode == "a8":
        xi_lo_scr, sx_lo_scr, xi_hi_scr, sx_hi_scr = a8_scr
        ni_a8 = pl.program_id(k_axis - 1)

        @pl.when(ni_a8 == 0)
        def _quant_x():
            il, sl = _a8_quant_half(x_lo.astype(jnp.float32), n_groups_h, gs)
            xi_lo_scr[...] = il
            sx_lo_scr[...] = sl
            ih, sh = _a8_quant_half(x_hi.astype(jnp.float32), n_groups_h, gs)
            xi_hi_scr[...] = ih
            sx_hi_scr[...] = sh

        _a8_plane_dot(p, s_lo_ref, xi_lo_scr, sx_lo_scr, acc_ref,
                      n_groups_h, gs, "lo")
        _a8_plane_dot(p, s_hi_ref, xi_hi_scr, sx_hi_scr, acc_ref,
                      n_groups_h, gs, "hi")
    else:
        acc_ref[:] += jnp.dot(
            x_lo, _dequant_tile(p, s_lo_ref, n_groups_h, gs, "lo",
                                mode=dequant_mode),
            preferred_element_type=jnp.float32,
        ) + jnp.dot(
            x_hi, _dequant_tile(p, s_hi_ref, n_groups_h, gs, "hi",
                                mode=dequant_mode),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == last_j)
    def _():
        acc = acc_ref[:]
        if r_ref is not None:
            acc = acc + r_ref[:].astype(jnp.float32)
        if p_ref is not None:
            from hip_llama_tpu.ops.quant import _rope_rotate_cols

            rot_limit, head_size, theta = rope_spec
            acc = _rope_rotate_cols(
                acc, p_ref[:].astype(jnp.float32),
                ni * o_ref.shape[-1], rot_limit, head_size, theta,
            )
        o_ref[:] = acc.astype(o_ref.dtype)


def _q4_kernel_norm(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, g_ref,
                    o_ref, acc_ref, *a8_scr, **kw):
    _q4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *a8_scr, g_ref=g_ref, **kw)


def _q4_kernel_res(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, r_ref,
                   o_ref, acc_ref, *a8_scr, **kw):
    # fused residual epilogue: o = residual + x @ W (see ops/quant.py)
    _q4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *a8_scr, r_ref=r_ref, **kw)


def _q4_kernel_norm_res(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, g_ref,
                        r_ref, o_ref, acc_ref, *a8_scr, **kw):
    _q4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *a8_scr, g_ref=g_ref, r_ref=r_ref, **kw)


def _q4_kernel_rope(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, p_ref,
                    o_ref, acc_ref, *a8_scr, **kw):
    _q4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *a8_scr, p_ref=p_ref, **kw)


def _q4_kernel_norm_rope(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref,
                         g_ref, p_ref, o_ref, acc_ref, *a8_scr, **kw):
    _q4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *a8_scr, g_ref=g_ref, p_ref=p_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_k", "interpret", "out_dtype",
                     "norm_eps", "rope_limit", "rope_head", "rope_theta",
                     "dequant_mode"),
)
def q4_matmul(
    x: jax.Array,
    t: Q4Tensor,
    *,
    block_n: int = _ENV_BLOCK_N,
    block_k: int = _ENV_BLOCK_K,
    interpret: bool | None = None,
    out_dtype=None,
    norm_weight: jax.Array | None = None,
    norm_eps: float = 1e-5,
    residual: jax.Array | None = None,
    rope_pos: jax.Array | None = None,
    rope_limit: int = 0,
    rope_head: int = 0,
    rope_theta: float = 10000.0,
    dequant_mode: str | None = None,
) -> jax.Array:
    """x (B, K) @ dequant(int4 t) -> (B, N). Packed nibbles are the only
    weight HBM traffic (~0.5 B/weight + scales vs the q8 path's ~1.06).
    `residual` (B, N) is added in the epilogue; `rope_pos` enables the
    fused RoPE epilogue for QKV projections (see ops/quant.py)."""
    assert residual is None or rope_pos is None
    dequant_mode = dequant_mode or _ENV_Q4_MODE
    b, k = x.shape
    assert k == t.k_dim, (x.shape, t.q.shape)
    n = t.q.shape[-1]
    kh = k // 2
    gs = t.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    while block_n > 128 and n % block_n:
        block_n //= 2
    if n % block_n:
        block_n = n
    # single-K-block fast path (see q8_matmul): guard on the UNPACKED tile
    # footprint. The nibble unpack materializes an extra (K, BN)-scale
    # intermediate on the scoped-VMEM stack that q8 doesn't have, so the
    # budget is HALF q8's 8 MB — measured: k=11008 x bn=512 (w2) blew the
    # 16 MB scoped limit by 1.5 MB on a real v5e under the q8-equal budget
    if kh % gs == 0 and k * block_n <= 4 * 2 ** 20 and b * k * 2 <= 2 * 2 ** 20:
        bkh = kh  # packed rows per block
    else:
        bkh = block_k // 2
        while bkh > gs and (kh % bkh or bkh % gs):
            bkh //= 2
        if kh % bkh or bkh % gs:
            bkh = gs if kh % gs == 0 else kh
    # x blocks are (M, bkh) over a (b, 2*kh) array — bkh can never equal
    # the array dim, so only lane alignment makes the tile legal
    ok_x = bkh % 128 == 0
    ok_w = (bkh % 8 == 0 or bkh == kh) and (block_n % 128 == 0 or block_n == n)
    if not (ok_x and ok_w) and not interpret:
        if norm_weight is not None:
            x = _rmsnorm_rows(x, norm_weight, norm_eps)
        y = q4_matmul_xla(x, t)
        if residual is not None:
            y = residual.astype(jnp.float32) + y
        if rope_pos is not None:
            from hip_llama_tpu.ops.quant import _rope_rows_xla

            y = _rope_rows_xla(y, rope_pos, rope_limit, rope_head, rope_theta)
        return y.astype(out_dtype)

    if dequant_mode == "a8" and (bkh != kh or kh % gs):
        # the x stash covers the whole row halves (quantized once per
        # m-block at n-block 0) — multi-K-block shapes keep dequant
        dequant_mode = "dequant"
    block_m = b
    pad_m = 0
    if b > 512:
        block_m = 512
        if dequant_mode == "a8":
            block_m = 256  # cap the stash + int32 partial footprint
        if b % block_m:
            pad_m = block_m - b % block_m
            x = jnp.pad(x, ((0, pad_m), (0, 0)))
            if residual is not None:
                residual = jnp.pad(residual, ((0, pad_m), (0, 0)))
            if rope_pos is not None:
                rope_pos = jnp.pad(rope_pos, ((0, pad_m),))
    bp = b + pad_m
    if norm_weight is not None and bkh != kh:
        x = _rmsnorm_rows(x, norm_weight, norm_eps)
        norm_weight = None

    n_groups_h = bkh // gs
    nhb = kh // bkh  # packed K blocks per half
    grid = (bp // block_m, n // block_n, nhb)
    s_blocked = t.s.reshape(2 * nhb, n_groups_h, n)

    in_specs = [
        # x low half block j, x high half block j + nhb
        pl.BlockSpec((block_m, bkh), lambda m, i, j: (m, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, bkh), lambda m, i, j: (m, j + nhb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bkh, block_n), lambda m, i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, block_n), lambda m, i, j: (j, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, block_n), lambda m, i, j: (j + nhb, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, x, t.q, s_blocked, s_blocked]
    if norm_weight is not None:
        in_specs.append(
            pl.BlockSpec((1, k), lambda m, i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight.reshape(1, k))
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda m, i, j: (m, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    if rope_pos is not None:
        in_specs.append(
            pl.BlockSpec((block_m, 1), lambda m, i, j: (m, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(rope_pos.astype(jnp.float32).reshape(-1, 1))
    kernel = functools.partial(
        {
            (False, False, False): _q4_kernel,
            (True, False, False): _q4_kernel_norm,
            (False, True, False): _q4_kernel_res,
            (True, True, False): _q4_kernel_norm_res,
            (False, False, True): _q4_kernel_rope,
            (True, False, True): _q4_kernel_norm_rope,
        }[(norm_weight is not None, residual is not None,
           rope_pos is not None)],
        n_groups_h=n_groups_h, gs=gs, last_j=grid[2] - 1, norm_eps=norm_eps,
        rope_spec=(rope_limit, rope_head, rope_theta),
        dequant_mode=dequant_mode,
    )
    scratch_shapes = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    dim_sem = ("parallel", "parallel", "arbitrary")
    if dequant_mode == "a8":
        # quantized-x stash per half, written at n-block 0 and reused by
        # later n-blocks — the n axis carries a sequential dependence
        scratch_shapes += [
            pltpu.VMEM((n_groups_h, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups_h, 1, block_m), jnp.float32),
            pltpu.VMEM((n_groups_h, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups_h, 1, block_m), jnp.float32),
        ]
        dim_sem = ("parallel", "arbitrary", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, i, j: (m, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
            vmem_limit_bytes=(
                64 * 2 ** 20 if dequant_mode == "a8" and b > 64 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * k * n,
            bytes_accessed=kh * n + (k // gs) * n * 4 + bp * k * 2 + bp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:b] if pad_m else out


def _q4_kernel_silu(
    x_lo_ref, x_hi_ref, qp1_ref, s1_lo_ref, s1_hi_ref, qp2_ref, s2_lo_ref,
    s2_hi_ref, o_ref, acc1_ref, acc2_ref, *a8_scr,
    n_groups_h: int, gs: int, last_j: int, k_axis: int = 2, g_ref=None,
    norm_eps: float = 1e-5, dequant_mode: str = "dequant",
):
    """Fused SwiGLU: o = silu(x @ W1) * (x @ W3), W1/W3 as two column views
    of the concatenated (K, 2H) int4 weight; gate product on the fp32
    accumulators in-kernel (mirror of ops/quant.py::_q8_kernel_silu)."""
    j = pl.program_id(k_axis)

    @pl.when(j == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    if g_ref is not None:
        x_lo, x_hi = _q4_norm_rows(x_lo_ref, x_hi_ref, g_ref, norm_eps)
    else:
        x_lo = x_lo_ref[:].astype(jnp.bfloat16)
        x_hi = x_hi_ref[:].astype(jnp.bfloat16)

    if dequant_mode == "a8":
        xi_lo_scr, sx_lo_scr, xi_hi_scr, sx_hi_scr = a8_scr
        ni_a8 = pl.program_id(k_axis - 1)

        @pl.when(ni_a8 == 0)
        def _quant_x():
            il, sl = _a8_quant_half(x_lo.astype(jnp.float32), n_groups_h, gs)
            xi_lo_scr[...] = il
            sx_lo_scr[...] = sl
            ih, sh = _a8_quant_half(x_hi.astype(jnp.float32), n_groups_h, gs)
            xi_hi_scr[...] = ih
            sx_hi_scr[...] = sh

    for qp_ref, s_lo_ref, s_hi_ref, acc_ref in (
        (qp1_ref, s1_lo_ref, s1_hi_ref, acc1_ref),
        (qp2_ref, s2_lo_ref, s2_hi_ref, acc2_ref),
    ):
        p = qp_ref[...].reshape(qp_ref.shape[-2], qp_ref.shape[-1]).astype(jnp.int32)
        if dequant_mode == "a8":
            _a8_plane_dot(p, s_lo_ref, xi_lo_scr, sx_lo_scr, acc_ref,
                          n_groups_h, gs, "lo")
            _a8_plane_dot(p, s_hi_ref, xi_hi_scr, sx_hi_scr, acc_ref,
                          n_groups_h, gs, "hi")
            continue
        acc_ref[:] += jnp.dot(
            x_lo, _dequant_tile(p, s_lo_ref, n_groups_h, gs, "lo",
                                mode=dequant_mode),
            preferred_element_type=jnp.float32,
        ) + jnp.dot(
            x_hi, _dequant_tile(p, s_hi_ref, n_groups_h, gs, "hi",
                                mode=dequant_mode),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == last_j)
    def _():
        h1 = acc1_ref[:]
        o_ref[:] = (h1 * jax.nn.sigmoid(h1) * acc2_ref[:]).astype(o_ref.dtype)


def _q4_kernel_silu_norm(x_lo_ref, x_hi_ref, qp1_ref, s1_lo_ref, s1_hi_ref,
                         qp2_ref, s2_lo_ref, s2_hi_ref, g_ref, o_ref,
                         acc1_ref, acc2_ref, *a8_scr, **kw):
    _q4_kernel_silu(x_lo_ref, x_hi_ref, qp1_ref, s1_lo_ref, s1_hi_ref,
                    qp2_ref, s2_lo_ref, s2_hi_ref, o_ref, acc1_ref, acc2_ref,
                    *a8_scr, g_ref=g_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_k", "interpret", "out_dtype",
                     "norm_eps", "dequant_mode"),
)
def q4_matmul_silu(
    x: jax.Array,
    t: Q4Tensor,  # (K, 2H) concatenated W1 | W3
    *,
    block_n: int = _ENV_BLOCK_N,
    block_k: int = _ENV_BLOCK_K,
    interpret: bool | None = None,
    out_dtype=None,
    norm_weight: jax.Array | None = None,
    norm_eps: float = 1e-5,
    dequant_mode: str | None = None,
) -> jax.Array:
    """silu(x @ W1) * (x @ W3) -> (B, H) in one fused int4 kernel."""
    dequant_mode = dequant_mode or _ENV_Q4_MODE
    b, k = x.shape
    assert k == t.k_dim, (x.shape, t.q.shape)
    n2 = t.q.shape[-1]
    h = n2 // 2
    kh = k // 2
    gs = t.group_size
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        xx = _rmsnorm_rows(x, norm_weight, norm_eps) if norm_weight is not None else x
        h13 = q4_matmul(xx, t, block_n=block_n, block_k=block_k,
                        interpret=interpret, out_dtype=out_dtype)
        return (jax.nn.silu(h13[:, :h].astype(jnp.float32))
                * h13[:, h:].astype(jnp.float32)).astype(out_dtype)

    bn = block_n
    while bn > 128 and h % bn:
        bn //= 2
    if h % bn:
        return fallback()
    if kh % gs == 0 and k * bn <= 4 * 2 ** 20 and b * k * 2 <= 2 * 2 ** 20:  # see q4_matmul: half q8's budget (unpack intermediate)
        bkh = kh
    else:
        bkh = block_k // 2
        while bkh > gs and (kh % bkh or bkh % gs):
            bkh //= 2
        if kh % bkh or bkh % gs:
            bkh = gs if kh % gs == 0 else kh
    # x blocks are (M, bkh) over a (b, 2*kh) array — bkh can never equal
    # the array dim, so only lane alignment makes the tile legal
    ok_x = bkh % 128 == 0
    ok_w = (bkh % 8 == 0 or bkh == kh) and bn % 128 == 0
    if not (ok_x and ok_w) and not interpret:
        return fallback()

    if dequant_mode == "a8" and (bkh != kh or kh % gs):
        dequant_mode = "dequant"  # see q4_matmul: stash needs one K block
    block_m = b
    pad_m = 0
    if b > 512:
        block_m = 512
        if dequant_mode == "a8":
            block_m = 256
        if b % block_m:
            pad_m = block_m - b % block_m
            x = jnp.pad(x, ((0, pad_m), (0, 0)))
    bp = b + pad_m
    if norm_weight is not None and bkh != kh:
        x = _rmsnorm_rows(x, norm_weight, norm_eps)
        norm_weight = None

    n_groups_h = bkh // gs
    nhb = kh // bkh
    n_off = h // bn  # W3 column-block offset
    grid = (bp // block_m, h // bn, nhb)
    s_blocked = t.s.reshape(2 * nhb, n_groups_h, n2)

    in_specs = [
        pl.BlockSpec((block_m, bkh), lambda m, i, j: (m, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, bkh), lambda m, i, j: (m, j + nhb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bkh, bn), lambda m, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, bn), lambda m, i, j: (j, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, bn), lambda m, i, j: (j + nhb, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bkh, bn), lambda m, i, j: (j, i + n_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, bn), lambda m, i, j: (j, 0, i + n_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_groups_h, bn), lambda m, i, j: (j + nhb, 0, i + n_off),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, x, t.q, s_blocked, s_blocked, t.q, s_blocked, s_blocked]
    if norm_weight is not None:
        kernel = functools.partial(
            _q4_kernel_silu_norm, n_groups_h=n_groups_h, gs=gs,
            last_j=grid[2] - 1, norm_eps=norm_eps,
            dequant_mode=dequant_mode,
        )
        in_specs.append(
            pl.BlockSpec((1, k), lambda m, i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight.reshape(1, k))
    else:
        kernel = functools.partial(
            _q4_kernel_silu, n_groups_h=n_groups_h, gs=gs, last_j=grid[2] - 1,
            dequant_mode=dequant_mode,
        )
    scratch_shapes = [
        pltpu.VMEM((block_m, bn), jnp.float32),
        pltpu.VMEM((block_m, bn), jnp.float32),
    ]
    dim_sem = ("parallel", "parallel", "arbitrary")
    if dequant_mode == "a8":
        scratch_shapes += [
            pltpu.VMEM((n_groups_h, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups_h, 1, block_m), jnp.float32),
            pltpu.VMEM((n_groups_h, gs, block_m), jnp.int8),
            pltpu.VMEM((n_groups_h, 1, block_m), jnp.float32),
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
            bytes_accessed=kh * n2 + (k // gs) * n2 * 4 + bp * k * 2 + bp * h * 4,
            transcendentals=bp * h,
        ),
        interpret=interpret,
    )(*operands)
    return out[:b] if pad_m else out
