#!/usr/bin/env python
"""On-chip kernel self-test: run every Pallas kernel against its XLA/numpy
oracle ON THE REAL TPU (the pytest suite runs kernels in interpret mode on
CPU, which cannot catch Mosaic lowering bugs — unaligned dynamic slices,
non-32-bit rotates, VMEM budget violations all surfaced only on hardware).

Usage: python tools/tpu_selftest.py          # ~2-4 min incl. compiles
Exit code 0 = all kernels within tolerance of their oracles.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, got, want, atol, rtol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want) - (atol + rtol * np.abs(want))
    bad = int((err > 0).sum())
    status = "ok" if bad == 0 else f"FAIL ({bad} elements over tolerance)"
    print(f"  {name:48s} max|d|={np.abs(got-want).max():9.4f}  {status}")
    if bad:
        FAILURES.append(name)


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    from hip_llama_tpu.ops.quant import (
        q8_matmul,
        q8_matmul_layered,
        q8_matmul_silu,
        q8_matmul_xla,
        q8_quantize_weights,
        _rmsnorm_rows,
    )

    print("q8 matmul family (vs fp32 dequant oracle)")
    for b, k, n in [(8, 4096, 512), (8, 11008, 4096), (4088, 4096, 512)]:
        x = jnp.asarray(rng.normal(size=(b, k)) * 0.05, jnp.bfloat16)
        qt = q8_quantize_weights(rng.normal(size=(k, n)) * 0.02, group_size=64)
        got = q8_matmul(x, qt)
        want = q8_matmul_xla(x, qt)
        check(f"q8_matmul b={b} k={k} n={n}", got, want, 0.05, 0.05)

    print("q8 fused-norm / fused-silu")
    x = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(4096,)) * 0.2 + 1.0, jnp.float32)
    qt = q8_quantize_weights(rng.normal(size=(4096, 512)) * 0.02, group_size=64)
    got = q8_matmul(x, qt, norm_weight=g)
    want = q8_matmul_xla(_rmsnorm_rows(x, g, 1e-5), qt)
    check("q8_matmul norm_weight", got, want, 0.05, 0.05)
    qt2 = q8_quantize_weights(rng.normal(size=(4096, 2 * 512)) * 0.02, group_size=64)
    got = q8_matmul_silu(x, qt2, norm_weight=g).astype(jnp.float32)
    h13 = q8_matmul(x, qt2, norm_weight=g).astype(jnp.float32)
    want = jax.nn.silu(h13[:, :512]) * h13[:, 512:]
    check("q8_matmul_silu norm_weight", got, want, 0.05, 0.05)

    print("q8 layered (stacked weights)")
    qts = q8_quantize_weights(
        rng.normal(size=(3, 4096, 512)) * 0.02, group_size=64
    )
    gs_stacked = jnp.asarray(rng.normal(size=(3, 4096)) * 0.2 + 1.0, jnp.float32)
    from hip_llama_tpu.ops.quant import QTensor

    got = q8_matmul_layered(x, qts, jnp.int32(1), norm_weight=gs_stacked)
    want = q8_matmul_xla(
        _rmsnorm_rows(x, gs_stacked[1], 1e-5), QTensor(q=qts.q[1], s=qts.s[1])
    )
    check("q8_matmul_layered norm_weight l=1", got, want, 0.05, 0.05)

    print("attention (pallas vs xla)")
    from hip_llama_tpu.models.llama import attention_decode_xla
    from hip_llama_tpu.ops.attention import (
        attention_decode_pallas,
        attention_prefill_pallas,
    )

    B, L, KVH, S, HS, H = 4, 2, 8, 512, 128, 8
    q = jnp.asarray(rng.normal(size=(B, H, HS)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, L, KVH, S, HS)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, L, KVH, S, HS)), jnp.bfloat16)
    pos = jnp.asarray([0, 3, 200, 511], jnp.int32)
    kcur = jnp.asarray(rng.normal(size=(B, KVH, HS)), jnp.bfloat16)
    vcur = jnp.asarray(rng.normal(size=(B, KVH, HS)), jnp.bfloat16)
    got = attention_decode_pallas(q, kc, vc, jnp.int32(1), pos, kcur, vcur)
    want = attention_decode_xla(q, kc, vc, jnp.int32(1), pos, kcur, vcur)
    check("attention_decode ragged pos", got, want, 0.05, 0.05)

    T = 128
    qp = jnp.asarray(rng.normal(size=(B, T, H, HS)), jnp.bfloat16)
    start = jnp.asarray([0, 64, 256, 384], jnp.int32)
    valid = jnp.asarray([T, T, 17, 0], jnp.int32)
    got = attention_prefill_pallas(qp, kc, vc, jnp.int32(0), start, valid)
    # xla oracle: per-slot full-score masked softmax
    kv_mul = H // KVH
    qs = qp.reshape(B, T, KVH, kv_mul, HS).astype(jnp.float32)
    kcf = kc[:, 0].astype(jnp.float32)
    vcf = vc[:, 0].astype(jnp.float32)
    posm = start[:, None] + jnp.arange(T)[None, :]
    sc = jnp.einsum("btgmd,bgsd->btgms", qs, kcf) / np.sqrt(HS)
    sidx = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 4)
    mask = sidx <= posm[:, :, None, None, None]
    att = jax.nn.softmax(jnp.where(mask, sc, -jnp.inf), axis=-1)
    want = jnp.einsum("btgms,bgsd->btgmd", att, vcf).reshape(B, T, H, HS)
    tmask = (jnp.arange(T)[None, :] < valid[:, None])[..., None, None]
    check(
        "attention_prefill (live rows)",
        jnp.where(tmask, got.astype(jnp.float32), 0.0),
        jnp.where(tmask, want, 0.0),
        0.05, 0.05,
    )

    print("KV writers")
    from hip_llama_tpu.ops.cache import (
        kv_write_chunk,
        kv_write_rows,
        scale_write_chunk,
        scale_write_rows,
    )

    cache = jnp.asarray(rng.normal(size=(B, L, KVH, S, HS)), jnp.bfloat16)
    rows = jnp.asarray(rng.normal(size=(L, B, KVH, HS)), jnp.bfloat16)
    got = kv_write_rows(cache.copy(), rows, pos)
    want = np.asarray(cache, np.float32)
    rt = np.asarray(jnp.moveaxis(rows, 1, 0), np.float32)
    for i in range(B):
        want[i, :, :, int(pos[i])] = rt[i]
    check("kv_write_rows", got, jnp.asarray(want, jnp.bfloat16), 1e-2, 1e-2)

    crows = jnp.asarray(rng.normal(size=(B, 96, KVH, HS)), jnp.bfloat16)
    cstart = jnp.asarray([0, 37, S - 96, 100], jnp.int32)
    cvalid = jnp.asarray([96, 51, 96, 0], jnp.int32)
    got = kv_write_chunk(cache.copy(), crows, jnp.int32(1), cstart, cvalid)
    want = np.asarray(cache, np.float32)
    cr = np.asarray(crows, np.float32)
    for i in range(B):
        for j in range(int(cvalid[i])):
            want[i, 1, :, int(cstart[i]) + j] = cr[i, j]
    check("kv_write_chunk", got, jnp.asarray(want, jnp.bfloat16), 1e-2, 1e-2)

    sc0 = jnp.asarray(rng.normal(size=(B, L, KVH, S)), jnp.float32)
    srows = jnp.asarray(rng.normal(size=(L, B, KVH)), jnp.float32)
    got = scale_write_rows(sc0.copy(), srows, pos)
    want = np.array(sc0, np.float32)
    st = np.asarray(jnp.moveaxis(srows, 1, 0))
    for i in range(B):
        want[i, :, :, int(pos[i])] = st[i]
    check("scale_write_rows", got, want, 1e-6, 0)

    csrows = jnp.asarray(rng.normal(size=(B, 96, KVH)), jnp.float32)
    got = scale_write_chunk(sc0.copy(), csrows, jnp.int32(0), cstart, cvalid)
    want = np.array(sc0, np.float32)
    cs = np.asarray(csrows)
    for i in range(B):
        for j in range(int(cvalid[i])):
            want[i, 0, :, int(cstart[i]) + j] = cs[i, j]
    check("scale_write_chunk", got, want, 1e-6, 0)

    print()
    if FAILURES:
        print("FAILED:", ", ".join(FAILURES))
        return 1
    print("ALL KERNELS OK on", jax.default_backend())
    return 0


if __name__ == "__main__":
    sys.exit(main())
