#!/usr/bin/env python
"""Micro-benchmark for the Pallas decode-attention kernel: effective HBM
bandwidth vs the clamped speed-of-light at a given decode position.

Uses the fori_loop-repeat pattern (see bench_q8_kernel.py) so device time
dwarfs the tunneled transport's per-dispatch RPC latency.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--kvh", type=int, default=32)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--hs", type=int, default=128)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--pos", type=int, default=260)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--block_k", type=int, default=0)
    ap.add_argument("--target_kb", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=8)
    args = ap.parse_args()

    if args.target_kb:
        os.environ["HIPLLAMA_ATTN_TARGET_KB"] = str(args.target_kb)
    from hip_llama_tpu.ops.attention import attention_decode_pallas

    b, l, kvh, h, hs, s = (
        args.batch, args.layers, args.kvh, args.heads, args.hs, args.window
    )
    key = jax.random.PRNGKey(0)
    kdt = jnp.int8 if args.kv == "int8" else jnp.bfloat16
    if args.kv == "int8":
        kc = jax.random.randint(key, (b, l, kvh, s, hs), -127, 128, jnp.int8)
        vc = jax.random.randint(jax.random.fold_in(key, 1), (b, l, kvh, s, hs), -127, 128, jnp.int8)
        ks = jnp.full((b, l, kvh, s), 0.01, jnp.float32)
        vs = jnp.full((b, l, kvh, s), 0.01, jnp.float32)
    else:
        kc = jax.random.normal(key, (b, l, kvh, s, hs), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 1), (b, l, kvh, s, hs), jnp.bfloat16)
        ks = vs = None
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, h, hs), jnp.bfloat16)
    kcur = jax.random.normal(jax.random.fold_in(key, 3), (b, kvh, hs), jnp.bfloat16)
    vcur = jax.random.normal(jax.random.fold_in(key, 4), (b, kvh, hs), jnp.bfloat16)
    pos = jnp.full((b,), args.pos, jnp.int32)
    bk = args.block_k or None

    def many(q, kc, vc, ks, vs):
        def one_layer(li, acc):
            o = attention_decode_pallas(
                acc, kc, vc, li % l, pos, kcur, vcur, ks, vs, block_k=bk
            )
            return (acc + o * 1e-6).astype(acc.dtype)

        return jax.lax.fori_loop(0, l * args.repeat, one_layer, q)

    f = jax.jit(many)
    np.asarray(f(q, kc, vc, ks, vs))
    t0 = time.perf_counter()
    np.asarray(f(q, kc, vc, ks, vs))
    dt = (time.perf_counter() - t0) / (l * args.repeat)

    blk = bk or 128
    fetched = min(s, -(-max(args.pos, 1) // blk) * blk)  # block-clamped rows
    kv_bytes = 2 * b * kvh * fetched * hs * jnp.dtype(kdt).itemsize
    if args.kv == "int8":
        kv_bytes += 2 * b * kvh * fetched * 4
    sol = kv_bytes / HBM_BW
    print(
        f"[{args.kv}] pos={args.pos}/{s} blk={blk}: {dt*1e6:7.1f} us/layer  "
        f"SoL {sol*1e6:5.1f} us  ({sol/dt*100:5.1f}% of SoL)"
    )


if __name__ == "__main__":
    main()
