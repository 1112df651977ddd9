#!/usr/bin/env python
"""Measure the effect of XLA TPU memory-space-assignment (MSA) flags on the
unrolled q8 decode step.

Round-2 profiling found ~2.1 ms/step (of a 12.8 ms step at 7B b8) spent in
`slice-start/done` async copies: MSA promotes whole per-layer weight buffers
(e.g. the 50 MB int8 QKV operand) into VMEM ahead of the Pallas calls. A
weight streamed exactly once per step gains nothing from VMEM residency —
the copy *is* an extra HBM read serialized on the critical path.

XLA_FLAGS can't carry xla_tpu_* flags here (the local client's flag parser
fatals on names it doesn't know), but per-program `compiler_options` travel
with the computation to the backend compiler — so the fix is appliable from
bench.py / run.py per-jit.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import CONFIGS, rand_qparams_unrolled_on_device
from hip_llama_tpu.models import init_kv_cache, make_decode_step

CANDIDATES = {
    "baseline": None,
    "inefficient_ratio": {"xla_tpu_msa_inefficient_use_to_copy_ratio": "1000.0"},
    "copy_bw_0.1": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"},
    "no_prefetch": {"xla_msa_max_outstanding_prefetches": "0"},
    "vf_no_prefetch": {"xla_vf_vmem_max_outstanding_prefetches": "0"},
    "overlap_ratio": {"xla_msa_min_overlap_to_async_copy_ratio": "100.0"},
    "vf_overlap_ratio": {"xla_vf_vmem_min_overlap_to_async_copy_ratio": "100.0"},
    "copy_bw_0.02": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.02"},
    "copy_bw_0.3": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.3"},
    "bw_plus_nopf": {
        "xla_tpu_async_copy_bandwidth_scaling_factor": "0.1",
        "xla_msa_max_outstanding_prefetches": "0",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args()

    cfg = CONFIGS[args.model]
    b = args.batch
    params = rand_qparams_unrolled_on_device(cfg)
    step_fn = make_decode_step(cfg, attn_impl="pallas", precision="default")

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(1,))
    def chain(params, cache, tokens, pos_start, n):
        def body(i, carry):
            cache, tokens = carry
            logits, cache = step_fn(
                params, cache, tokens, jnp.full((b,), pos_start + i, jnp.int32)
            )
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32))

        cache, tokens = jax.lax.fori_loop(0, n, body, (cache, tokens))
        return cache, tokens

    tokens = jnp.zeros((b,), jnp.int32)
    names = args.only.split(",") if args.only else list(CANDIDATES)
    lowered = chain.lower(
        params, init_kv_cache(cfg, b, dtype=jnp.bfloat16, seq_len=args.window,
                              quantized=True),
        tokens, jnp.int32(args.window // 2), args.steps,
    )
    for name in names:
        opts = CANDIDATES[name]
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"{name:20s} COMPILE FAILED: {type(e).__name__}: {str(e)[:150]}")
            continue
        t_compile = time.perf_counter() - t0
        # fresh (donatable) cache per run
        cache = init_kv_cache(cfg, b, dtype=jnp.bfloat16, seq_len=args.window,
                              quantized=True)
        cache, out = compiled(params, cache, tokens, jnp.int32(args.window // 2))
        np.asarray(out)
        best = None
        for _ in range(3):
            cache2 = init_kv_cache(cfg, b, dtype=jnp.bfloat16,
                                   seq_len=args.window, quantized=True)
            t0 = time.perf_counter()
            cache2, out = compiled(params, cache2, tokens, jnp.int32(args.window // 2))
            np.asarray(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            del cache2
        tok_s = b * args.steps / best
        print(f"{name:20s} {tok_s:8.1f} tok/s   "
              f"{best / args.steps * 1000:6.3f} ms/step   compile {t_compile:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
