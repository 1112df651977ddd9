"""Mosaic feasibility probe: can a Pallas kernel contract a HEAD-SPLIT
activation tile (M, GH, HS) against a flat weight tile (GH*HS, BN) with a
single multi-dimensional dot_general — i.e., consume the attention
kernel's head-split output layout directly and kill the (B,T,H,HS)->
(B,T,D) relayout between attention and the wo matmul (VERDICT r5 prefill
item)? Falls back to an unrolled per-head dot sum if the fused form is
rejected. Run on the real chip: python tools/probe_xheads.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, o_ref, *, variant: str):
    m, gh, hs = x_ref.shape
    bn = w_ref.shape[-1]
    x = x_ref[...].astype(jnp.bfloat16)
    w3 = w_ref[...].reshape(gh, hs, bn).astype(jnp.bfloat16)
    if variant == "multi":
        o_ref[...] = jax.lax.dot_general(
            x, w3, (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
    else:  # per-head unrolled dots
        acc = jnp.zeros((m, bn), jnp.float32)
        for h in range(gh):
            acc += jax.lax.dot_general(
                x[:, h], w3[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = acc.astype(o_ref.dtype)


def run(variant: str, m=256, gh=8, hs=128, bn=512):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, gh, hs)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((gh * hs, bn)) * 0.05, jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((m, bn), jnp.float32),
    )(x, w)
    want = (
        x.reshape(m, gh * hs).astype(jnp.float32)
        @ w.astype(jnp.float32)
    )
    d = float(jnp.max(jnp.abs(out - want)))
    rel = d / float(jnp.max(jnp.abs(want)))
    return d, rel


def _attn_kernel(q_ref, k_ref, o_ref, *, variant: str):
    """T-major attention layouts: q tile arrives as (BT, GH, HS) — the
    head-split QKV emission's natural layout — instead of the current
    kernel's head-major (GH, BT, HS) which costs a 67 MB XLA transpose
    per layer each way (BASELINE r4 prefill histogram)."""
    bt, gh, hs = q_ref.shape
    _, bk, _ = k_ref.shape
    q = q_ref[...].astype(jnp.bfloat16)
    k = k_ref[...].astype(jnp.bfloat16)
    if variant == "battn":
        # batched dot with the batch dim in the lhs SUBLANE position
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((1,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (GH, BT, BK)
        o_ref[...] = jnp.moveaxis(s, 0, 1).astype(o_ref.dtype)
    else:  # per-head static sublane slices + stores
        for h in range(gh):
            s_h = jax.lax.dot_general(
                q[:, h], k[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BT, BK)
            o_ref[:, h] = s_h.astype(o_ref.dtype)


def run_attn(variant: str, bt=256, gh=8, hs=128, bk=512):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((bt, gh, hs)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((gh, bk, hs)), jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((bt, gh, bk), jnp.float32),
    )(q, k)
    want = jnp.einsum(
        "tgd,gkd->tgk", q.astype(jnp.float32), k.astype(jnp.float32))
    d = float(jnp.max(jnp.abs(out - want)))
    rel = d / float(jnp.max(jnp.abs(want)))
    return d, rel


if __name__ == "__main__":
    for variant in ("multi", "unroll"):
        try:
            d, rel = run(variant)
            print(f"{variant}: OK  max abs {d:.4f} rel {rel:.4f}")
        except Exception as e:
            print(f"{variant}: FAIL {str(e)[:200]}")
    for variant in ("battn", "headslice"):
        try:
            d, rel = run_attn(variant)
            print(f"{variant}: OK  max abs {d:.4f} rel {rel:.4f}")
        except Exception as e:
            print(f"{variant}: FAIL {str(e)[:200]}")
