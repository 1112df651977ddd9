#!/usr/bin/env python
"""Capture a JAX profiler trace of N decode steps and print the top ops by
device time (the TPU counterpart of the reference's rocprof --stats run,
scripts/profile/GUIDELINE.md:1)."""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--quant", default=None, choices=[None, "q8"])
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    ap.add_argument("--layout", default="unrolled", choices=["unrolled", "stacked"])
    ap.add_argument("--mode", default="decode",
                    choices=["decode", "prefill", "chain", "paged_chunk",
                             "chunk"])
    ap.add_argument("--chunk-steps", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=512)
    args = ap.parse_args()

    from bench import (
        CONFIGS,
        rand_params_on_device,
        rand_qparams_on_device,
        rand_qparams_stacked_fused_on_device,
        rand_qparams_unrolled_on_device,
    )
    from hip_llama_tpu.models import init_kv_cache, make_decode_step

    cfg = CONFIGS[args.model]
    if args.mode == "paged_chunk":
        params = None  # the paged branch builds its own stacked params
    elif args.quant == "q8" and args.layout == "stacked":
        params = rand_qparams_stacked_fused_on_device(cfg)
    elif args.quant == "q8":
        params = rand_qparams_unrolled_on_device(cfg)
    else:
        params = rand_params_on_device(cfg, jnp.bfloat16)
    cache = init_kv_cache(
        cfg, args.batch, dtype=jnp.bfloat16, seq_len=args.window,
        quantized=(args.kv == "int8"),
    )
    if args.mode == "prefill":
        from hip_llama_tpu.models.llama import make_prefill

        t = min(args.prompt_len, args.window - 1)
        from hip_llama_tpu.xla_tuning import decode_compiler_options

        prefill = jax.jit(
            make_prefill(cfg, attn_impl=args.attn, precision="default"),
            donate_argnums=(1,), compiler_options=decode_compiler_options(),
        )
        toks2 = jnp.zeros((args.batch, t), jnp.int32)
        start = jnp.zeros((args.batch,), jnp.int32)
        valid = jnp.full((args.batch,), t, jnp.int32)
        logits, cache = prefill(params, cache, toks2, start, valid)
        np.asarray(logits)
        jax.profiler.start_trace(args.outdir)
        for _ in range(args.steps):
            logits, cache = prefill(params, cache, toks2, start, valid)
        np.asarray(logits)
        jax.profiler.stop_trace()
    elif args.mode in ("paged_chunk", "chunk"):
        # the serve-mode chunked sampling dispatch, paged or contiguous —
        # the per-op decomposition behind the r4 "--paged --chunk 4 gives
        # back 28%" gap (VERDICT r4 #5)
        from hip_llama_tpu.xla_tuning import decode_compiler_options

        b = args.batch
        key = jax.random.PRNGKey(0)
        if args.mode == "paged_chunk":
            from hip_llama_tpu.models.paged import (
                init_paged_kv_cache,
                make_paged_chunked_sampling_step,
            )

            cache = None  # free the contiguous cache allocated above
            params = rand_qparams_on_device(cfg)  # paged scans stacked
            page_size = 128
            ppslot = args.window // page_size
            pcache = init_paged_kv_cache(
                cfg, b * ppslot + 1, page_size, dtype=jnp.bfloat16,
                quantized=(args.kv == "int8"),
            )
            # linear page table; page 0 is the trash page
            table = jnp.asarray(
                [[s * ppslot + 1 + i for i in range(ppslot)]
                 for s in range(b)], jnp.int32)
            chunk = jax.jit(
                make_paged_chunked_sampling_step(
                    cfg, args.chunk_steps, precision="default"),
                donate_argnums=(1,), compiler_options=decode_compiler_options(),
            )

            def run(c):
                toks, c = chunk(
                    params, c, table,
                    jnp.zeros((b,), jnp.int32),
                    jnp.full((b,), args.window // 2, jnp.int32), key)
                return toks, c
        else:
            from hip_llama_tpu.models.llama import make_chunked_sampling_step

            pcache = cache
            chunk = jax.jit(
                make_chunked_sampling_step(
                    cfg, args.chunk_steps, attn_impl=args.attn,
                    precision="default"),
                donate_argnums=(1,), compiler_options=decode_compiler_options(),
            )

            def run(c):
                toks, c = chunk(
                    params, c, jnp.zeros((b,), jnp.int32),
                    jnp.full((b,), args.window // 2, jnp.int32), key)
                return toks, c

        toks, pcache = run(pcache)
        np.asarray(toks)
        jax.profiler.start_trace(args.outdir)
        for _ in range(args.steps):
            toks, pcache = run(pcache)
        np.asarray(toks)
        jax.profiler.stop_trace()
        args.steps = args.steps * args.chunk_steps  # per-DECODE-step stats
    elif args.mode == "chain":
        # the bench.py device-loop serving config: one jitted greedy chain
        # (argmax feeds the next step) — profiles the while-loop overhead the
        # per-step mode cannot see
        import functools

        from hip_llama_tpu.xla_tuning import decode_compiler_options

        step_fn = make_decode_step(cfg, attn_impl=args.attn, precision="default")
        b = args.batch

        @functools.partial(
            jax.jit, static_argnums=(4,), donate_argnums=(1,),
            compiler_options=decode_compiler_options(),
        )
        def chain(params, cache, tokens, pos_start, n):
            def body(i, carry):
                cache, tokens = carry
                logits, cache = step_fn(
                    params, cache, tokens,
                    jnp.full((b,), pos_start + i, jnp.int32),
                )
                return (cache, jnp.argmax(logits, -1).astype(jnp.int32))

            cache, tokens = jax.lax.fori_loop(0, n, body, (cache, tokens))
            return cache, tokens

        tokens = jnp.zeros((b,), jnp.int32)
        pos0 = args.window // 2
        cache, out = chain(params, cache, tokens, jnp.int32(pos0), args.steps)
        np.asarray(out)
        cache2 = init_kv_cache(
            cfg, b, dtype=jnp.bfloat16, seq_len=args.window,
            quantized=(args.kv == "int8"),
        )
        jax.profiler.start_trace(args.outdir)
        cache2, out = chain(params, cache2, tokens, jnp.int32(pos0), args.steps)
        np.asarray(out)
        jax.profiler.stop_trace()
    else:
        from hip_llama_tpu.xla_tuning import decode_compiler_options

        step = jax.jit(
            make_decode_step(cfg, attn_impl=args.attn, precision="default"),
            donate_argnums=(1,), compiler_options=decode_compiler_options(),
        )
        toks = jnp.zeros((args.batch,), jnp.int32)
        pos0 = args.window // 2
        logits, cache = step(params, cache, toks, jnp.full((args.batch,), pos0, jnp.int32))
        np.asarray(logits)

        jax.profiler.start_trace(args.outdir)
        for i in range(args.steps):
            logits, cache = step(
                params, cache, toks, jnp.full((args.batch,), pos0 + 1 + i, jnp.int32)
            )
        np.asarray(logits)
        jax.profiler.stop_trace()

    # parse the trace: sum device-op durations by name
    traces = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace files found under", args.outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    # device lanes: pid names containing "TPU" / "/device:"
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "Chip" in name or "device" in name.lower():
                dev_pids.add(ev["pid"])
    tot = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            tot[ev.get("name", "?")] += ev.get("dur", 0)
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device-op time: {total/1e3:.2f} ms over {args.steps} steps")
    for name, dur in items[:25]:
        print(f"{dur/1e3:9.2f} ms  {dur/total*100:5.1f}%  {name[:100]}")
    # grouped by op family (strip the trailing .<uid>): the whole budget at
    # a glance, with per-step and per-call averages
    fam = defaultdict(lambda: [0.0, 0])
    for name, dur in tot.items():
        base = name.rsplit(".", 1)[0] if name.rsplit(".", 1)[-1].isdigit() else name
        fam[base][0] += dur
        fam[base][1] += 1
    print("\n-- by op family (per step) --")
    for base, (dur, cnt) in sorted(fam.items(), key=lambda kv: -kv[1][0]):
        print(
            f"{dur/1e3/args.steps:9.3f} ms/step  {dur/total*100:5.1f}%  "
            f"x{cnt:<4d} {base[:80]}"
        )


if __name__ == "__main__":
    main()
