#!/usr/bin/env python
"""Micro-benchmark for the fused Q8_0 dequant+matmul kernel: effective HBM
bandwidth vs speed-of-light on the 7B weight shapes (the per-kernel roofline
discipline the reference ran through rocprof, scripts/profile/GUIDELINE.md)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.ops.quant import QTensor, q8_matmul

HBM_BW = 819e9  # v5e


def bench_shape(b, k, n, gs=64, steps=24, repeat=16, variant="q8", **kw):
    """Times a lax.scan over `steps` STACKED weights — the model's real
    pattern (fresh weight tensor per iteration => true HBM streaming, no
    cache reuse, loop compiled once). The scan is repeated `repeat` times
    inside ONE jit call via fori_loop so device time dwarfs the tunneled
    transport's ~30 ms per-dispatch RPC latency."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, k), jnp.bfloat16)
    q = jax.random.randint(
        jax.random.fold_in(key, 1), (steps, k, n), -127, 128, jnp.int8
    )
    s = jnp.full((steps, k // gs, n), 1e-2, jnp.float32)
    wb = (q.astype(jnp.bfloat16) * 1e-2) if variant == "xla_bf16" else None

    def many(x, xs):
        def body(carry, wl):
            if variant == "xla_bf16":
                y = jnp.dot(carry, wl, preferred_element_type=jnp.float32)
            else:
                y = q8_matmul(carry, QTensor(q=wl[0], s=wl[1]), **kw)
            # keep carry shape (B, K): fold y back in via a cheap projection
            upd = y[:, : min(k, n)].astype(jnp.bfloat16)
            carry = carry.at[:, : upd.shape[1]].add(upd * 1e-6)
            return carry, ()

        def once(r, carry):
            out, _ = jax.lax.scan(body, carry, xs)
            return out

        return jax.lax.fori_loop(0, repeat, once, x)

    xs = wb if variant == "xla_bf16" else (q, s)
    f = jax.jit(many)
    np.asarray(f(x, xs))  # compile + sync
    t0 = time.perf_counter()
    np.asarray(f(x, xs))
    dt = (time.perf_counter() - t0) / (steps * repeat)
    wbytes = k * n * (2 if variant == "xla_bf16" else 1)
    bytes_moved = wbytes + (k // gs) * n * 4 + b * k * 2 + b * n * 2
    bw = bytes_moved / dt
    sol = bytes_moved / HBM_BW
    print(
        f"[{variant:9s}] ({b},{k})x({k},{n}): {dt*1e6:8.1f} us  "
        f"eff-BW {bw/1e9:6.1f} GB/s  ({bw/HBM_BW*100:5.1f}% of SoL, SoL {sol*1e6:.0f} us)"
    )
    return dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--block_n", type=int, default=512)
    ap.add_argument("--block_k", type=int, default=1024)
    ap.add_argument("--variants", default="xla_bf16,reshape,repeat")
    ap.add_argument("--shapes", default="4096x4096,11008x4096")
    args = ap.parse_args()
    b = args.batch
    print(f"batch={b} block_n={args.block_n} block_k={args.block_k}")
    for shape in args.shapes.split(","):
        k, n = map(int, shape.split("x"))
        for v in args.variants.split(","):
            kw = dict(block_n=args.block_n, block_k=args.block_k)
            if v in ("reshape", "repeat"):
                kw["dequant_mode"] = v
                bench_shape(b, k, n, variant=v, **kw)
            else:
                bench_shape(b, k, n, variant=v)
