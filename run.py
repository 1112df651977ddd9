#!/usr/bin/env python
"""CLI with the reference's flag contract (src/llama.cpp:1490-1639):

  python run.py <checkpoint> [options]
  python run.py model.bin -n 256 -i "Once upon a time"
  python run.py model.bin -m test -f <input_file> -o <output_file>

Options (single-dash single-letter, like the reference):
  -t <float>  temperature (default 1.0)
  -p <float>  top-p (default 0.9)
  -s <int>    RNG seed (default time)
  -n <int>    steps (default 256; 0 = max_seq_len)
  -i <str>    prompt
  -z <str>    tokenizer path (default ./assets/tokenizer.bin)
  -m <str>    mode: generate|chat|test (default generate)
  -y <str>    system prompt (chat mode)
  -f <str>    input file (test mode)
  -o <str>    output file (test mode)
  -b <int>    batch size (default 1; test mode continuous-batching slots)
Extra (framework-specific, double-dash):
  --dtype float32|bfloat16   param/compute dtype (default bfloat16)
  --attn xla|pallas          decode attention impl (default pallas)
  --no-prefill               force-feed prompts one token/step (parity mode)
  --tp N                     tensor-parallel size over available devices
  --pp N [--micro M]         pipeline-parallel serving: N layer stages, M
                             in-flight GPipe microbatches (M divides -b;
                             dense params only)
  --sp N                     sequence-parallel serving: KV cache sharded
                             along the sequence dim, cross-chip online-
                             softmax combine (dense params only)
  --rope-theta F             RoPE base override (.bin headers can't carry
                             it; Llama-3-era models use 500000/1e6)
  --replicas N               test mode: N independent engine replicas over N
                             devices pulling from one shared request queue
                             (the reference's DP serving topology,
                             llama.cpp:919-983)
  --quant q8|q4              quantize fp32 weights to Q8_0 / int4 on the fly
                             (v2 checkpoints use the fused int8 path already)
  --dequant                  force a v2 checkpoint through the dense path
  --paged [page_size]        paged KV cache (block-table allocator; HBM
                             scales with tokens in flight, not slots x seq)
  --prefix-cache             automatic prefix caching (requires --paged):
                             identical prompt prefixes share KV pages,
                             skipping their prefill entirely
  --kv int8                  int8 KV cache with per-row scales (halves
                             attention HBM traffic; ~1% logit noise)
  --chunk N                  multi-step scheduling: decode N tokens per
                             dispatch with on-device sampling (greedy is
                             bit-equal to host argmax; stochastic uses the
                             JAX PRNG). Slots retiring mid-chunk waste the
                             chunk tail; saves N-1 host dispatches/chunk
  --device-sampling          sample on the TPU (4 bytes/slot fetched per
                             step instead of the full logits; greedy is
                             bit-equal to host argmax, stochastic uses the
                             JAX PRNG, not the reference RNG stream)
  --layout unrolled|stacked  q8 weight layout (stacked: much faster compile,
                             ~1%% decode cost)
  --spec K [--draft path]    speculative decoding: a draft model (or
                             prompt-lookup n-gram matching if no --draft)
                             proposes K tokens, the target verifies them in
                             one chunked prefill (-t 0 reproduces the greedy
                             stream, -t > 0 uses distribution-preserving
                             rejection sampling). In -m test mode, slots
                             speculate via prompt lookup, or via one
                             batched draft-model chain per round with
                             --draft; batch-verified in one prefill
  --stream [kv]              weight streaming for models bigger than HBM
                             (per-layer host->device, the 70B path); add
                             'kv' to also keep the KV cache in host RAM.
                             Works in generate AND -m test (batched corpus
                             serving); streams fp32/bf16 (v0/v1), int8 (v2)
                             checkpoints, or --quant q8 host-quantized int8
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from hip_llama_tpu.chat import chat as chat_mode
from hip_llama_tpu.engine import InferenceEngine, read_inputfile, write_outputfile
from hip_llama_tpu.io.checkpoint import load_checkpoint, LlamaWeights
from hip_llama_tpu.models.params import params_from_weights, params_from_quant_dequant
from hip_llama_tpu.sampler import Sampler
from hip_llama_tpu.tokenizer import Tokenizer


def error_usage():
    print(__doc__, file=sys.stderr)
    sys.exit(1)


def main(argv: list[str]) -> int:
    total_start = time.perf_counter()
    if len(argv) < 2:
        error_usage()
    checkpoint_path = argv[1]
    temperature, topp, steps, batch = 1.0, 0.9, 256, 1
    rng_seed = 0
    prompt = None
    tokenizer_path = "./assets/tokenizer.bin"
    mode = "generate"
    system_prompt = None
    input_filename = output_filename = None
    dtype_name, attn_impl, use_prefill, tp = "bfloat16", "pallas", True, 1
    pp, pp_micro, sp = 1, 1, 1
    rope_theta = None
    quant, dequant = None, False
    paged, page_size = False, 128
    device_sampling = False
    stream, stream_kv = False, False
    stop_on_eos = True
    kv_quant = False
    chunk_steps = 1
    layout = "unrolled"
    spec_k, draft_path = 0, None
    prefix_cache = False
    replicas = 1

    i = 2
    while i < len(argv):
        a = argv[i]
        if a == "--no-prefill":
            use_prefill = False
            i += 1
            continue
        if a == "--dequant":
            dequant = True
            i += 1
            continue
        if a == "--paged":
            paged = True
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                page_size = int(argv[i + 1])
                i += 1
            i += 1
            continue
        if a == "--device-sampling":
            device_sampling = True
            i += 1
            continue
        if a == "--no-eos-stop":
            # run.cc CPU-engine parity: test mode stops on BOS only, EOS is
            # printed and generation continues (run.cc:1075-1077) — needed
            # to reproduce the committed reference goldens byte-for-byte
            stop_on_eos = False
            i += 1
            continue
        if a == "--prefix-cache":
            prefix_cache = True
            i += 1
            continue
        if a == "--layout":
            if i + 1 >= len(argv):
                print("--layout needs a value", file=sys.stderr)
                return 1
            layout = argv[i + 1]
            assert layout in ("unrolled", "stacked"), layout
            i += 2
            continue
        if a == "--replicas":
            if i + 1 >= len(argv) or not argv[i + 1].isdigit():
                print("--replicas needs a count", file=sys.stderr)
                return 1
            replicas = int(argv[i + 1])
            i += 2
            continue
        if a == "--spec":
            if i + 1 >= len(argv) or not argv[i + 1].isdigit():
                print("--spec needs an int", file=sys.stderr)
                return 1
            spec_k = int(argv[i + 1])
            i += 2
            continue
        if a == "--draft":
            if i + 1 >= len(argv):
                print("--draft needs a path", file=sys.stderr)
                return 1
            draft_path = argv[i + 1]
            i += 2
            continue
        if a == "--kv":
            if i + 1 >= len(argv) or argv[i + 1] != "int8":
                print("--kv supports: int8", file=sys.stderr)
                return 1
            kv_quant = True
            i += 2
            continue
        if a == "--chunk":
            if i + 1 >= len(argv) or not argv[i + 1].isdigit():
                print("--chunk needs an int", file=sys.stderr)
                return 1
            chunk_steps = int(argv[i + 1])
            i += 2
            continue
        if a == "--stream":
            stream = True
            if i + 1 < len(argv) and argv[i + 1] == "kv":
                stream_kv = True
                i += 1
            i += 1
            continue
        if i + 1 >= len(argv) or not a.startswith("-"):
            error_usage()
        v = argv[i + 1]
        if a == "-t":
            temperature = float(v)
        elif a == "-p":
            topp = float(v)
        elif a == "-s":
            rng_seed = int(v)
        elif a == "-n":
            steps = int(v)
        elif a == "-i":
            prompt = v
        elif a == "-z":
            tokenizer_path = v
        elif a == "-m":
            mode = v
        elif a == "-y":
            system_prompt = v
        elif a == "-f":
            input_filename = v
        elif a == "-o":
            output_filename = v
        elif a == "-b":
            batch = int(v)
        elif a == "--dtype":
            dtype_name = v
        elif a == "--attn":
            attn_impl = v
        elif a == "--tp":
            tp = int(v)
        elif a == "--pp":
            pp = int(v)
        elif a == "--sp":
            sp = int(v)
        elif a == "--rope-theta":
            rope_theta = float(v)
        elif a == "--micro":
            pp_micro = int(v)
        elif a == "--quant":
            quant = v
        else:
            error_usage()
        i += 2

    if rng_seed <= 0:
        rng_seed = int(time.time())
    if mode == "generate" and spec_k > 0 and paged:
        # speculative verify prefills at arbitrary (non-page-aligned) starts,
        # and at batch=1 generate the contiguous cache is strictly better
        # anyway (paging exists to share a pool across many slots) — fall
        # back rather than erroring
        print(
            "note: --spec uses the contiguous KV cache; ignoring --paged"
            + (" and --prefix-cache" if prefix_cache else ""),
            file=sys.stderr,
        )
        paged = prefix_cache = False
    if mode == "test" and spec_k > 0:
        if paged:
            print(
                "note: --spec uses the contiguous KV cache; ignoring --paged"
                + (" and --prefix-cache" if prefix_cache else ""),
                file=sys.stderr,
            )
            paged = prefix_cache = False
        if chunk_steps > 1 or device_sampling:
            print(
                "note: --spec is its own dispatch schedule; ignoring "
                "--chunk/--device-sampling",
                file=sys.stderr,
            )
            chunk_steps, device_sampling = 1, False
    if prefix_cache and not paged:
        print("note: --prefix-cache implies --paged", file=sys.stderr)
        paged = True
    if (pp > 1 or sp > 1) and paged:
        # the engine's paged branch would route _do_step to the cfg-built
        # paged step, ignoring the pp/sp custom step's staged/sharded params
        print(
            "note: --pp/--sp serve with the contiguous KV cache; ignoring "
            "--paged" + (" and --prefix-cache" if prefix_cache else ""),
            file=sys.stderr,
        )
        paged = prefix_cache = False
    if sp > 1 and spec_k > 0 and mode == "test":
        # the sp step has no prefill path; speculation needs one
        print("note: --sp has no prefill path; ignoring --spec", file=sys.stderr)
        spec_k = 0
    if device_sampling and paged:
        print(
            "note: --device-sampling drives the contiguous cache; ignoring "
            "it with --paged",
            file=sys.stderr,
        )
        device_sampling = False
    if mode == "chat" and paged:
        # the chat loop drives the contiguous decode step directly (one
        # growing conversation, batch 1 — paging has nothing to share)
        print(
            "note: chat mode uses the contiguous KV cache; ignoring --paged"
            + (" and --prefix-cache" if prefix_cache else ""),
            file=sys.stderr,
        )
        paged = prefix_cache = False
    temperature = max(temperature, 0.0)
    if topp < 0.0 or topp > 1.0:
        topp = 0.9
    steps = max(steps, 0)

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    cfg, weights = load_checkpoint(checkpoint_path)
    if rope_theta is not None:
        # the llama2.c .bin headers can't carry the RoPE base; override for
        # Llama-3-era exports (HF-dir loads pick it up from config.json)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, rope_theta=rope_theta)

    from hip_llama_tpu.io.checkpoint import Q4Weights

    host_fns = None
    if stream:
        # weight-streaming path (models > HBM): weights stay host-resident,
        # one layer on device at a time (the 70B mode, thaDNN.cpp:83-189).
        # Serves generate AND -m test (batched continuous batching through
        # the streaming step — the reference's test_70B, llama.cpp:1085).
        # fp32/bf16 (v0/v1), Q8_0 (v2, int8 stream = 1/4 the reference's
        # fp32 H2D bytes), and host-side --quant q8 of an fp32 file.
        from hip_llama_tpu.io.checkpoint import QuantWeights
        from hip_llama_tpu.models.streaming import (
            host_params_from_weights,
            host_qparams_from_quant_weights,
            host_quantize_params,
            make_streaming_engine_fns,
        )

        if mode == "chat":
            print("--stream supports generate and test modes", file=sys.stderr)
            return 1
        if isinstance(weights, Q4Weights):
            print("--stream supports fp32 (v0/v1) and Q8_0 (v2) checkpoints",
                  file=sys.stderr)
            return 1
        if quant == "q4":
            # only q8 host-quantization is supported on the streaming path;
            # fall back to it rather than silently streaming 4x the H2D bytes
            print("note: --stream has no q4 host layers; using --quant q8 "
                  "(int8 host quantization) instead", file=sys.stderr)
            quant = "q8"
        if kv_quant:
            # the streaming KV stays in the compute dtype: attention HBM
            # traffic is not the streaming bottleneck (the weight H2D is)
            print("note: --stream keeps the KV cache in the compute dtype; "
                  "ignoring --kv int8", file=sys.stderr)
            kv_quant = False
        for flag, name in ((paged, "--paged"), (prefix_cache, "--prefix-cache"),
                           (chunk_steps > 1, "--chunk"),
                           (device_sampling, "--device-sampling"),
                           (spec_k > 0, "--spec"),
                           (tp > 1, "--tp"), (pp > 1, "--pp"), (sp > 1, "--sp")):
            if flag:
                print(f"note: {name} drives the resident jitted step; "
                      "ignoring it with --stream", file=sys.stderr)
        paged = prefix_cache = device_sampling = False
        chunk_steps, spec_k, tp, pp, sp = 1, 0, 1, 1, 1
        if isinstance(weights, QuantWeights):
            params = host_qparams_from_quant_weights(cfg, weights)
            dtype = jnp.bfloat16
        elif quant == "q8":
            params = host_quantize_params(cfg, weights)
            dtype = jnp.bfloat16
        else:
            params = host_params_from_weights(weights, dtype=dtype)
        host_fns = make_streaming_engine_fns(
            cfg, dtype=dtype, kv_host=stream_kv, attn_impl=attn_impl,
        )
    elif isinstance(weights, LlamaWeights):
        if quant == "q8":
            from hip_llama_tpu.models.params import quantize_params_q8

            params = quantize_params_q8(cfg, weights)
        elif quant == "q4":
            from hip_llama_tpu.models.params import quantize_params_q4

            params = quantize_params_q4(cfg, weights)
        else:
            params = params_from_weights(weights, dtype=dtype)
    elif isinstance(weights, Q4Weights):
        if dequant:
            from hip_llama_tpu.models.params import params_from_q4_dequant

            params = params_from_q4_dequant(cfg, weights, dtype=dtype)
        else:
            from hip_llama_tpu.models.params import qparams_from_q4_weights

            params = qparams_from_q4_weights(cfg, weights)
    elif dequant:
        params = params_from_quant_dequant(cfg, weights, dtype=dtype)
    else:
        from hip_llama_tpu.models.params import qparams_from_quant_weights

        params = qparams_from_quant_weights(cfg, weights)
    if hasattr(params, "tok_emb_q") and tp <= 1 and paged:
        # paged steps iterate unrolled per-layer buffers since round 5
        # (the stacked scan's weight-slice copies cost a measured
        # 8.9 ms/step at 7B — the bulk of the paged serve deficit).
        # fuse=False: the paged prefill consumes separate wq/wk/wv.
        from hip_llama_tpu.models.params import unstack_quant_params

        if layout == "unrolled" and type(params.wq).__name__ != "Q4Tensor":
            params = unstack_quant_params(params, fuse=False)
    if hasattr(params, "tok_emb_q") and tp <= 1 and not paged:
        if (
            layout == "stacked"
            and type(getattr(params, "wq", None)).__name__ == "Q4Tensor"
        ):
            # the stacked-fused decode path drives q8_matmul_layered, which
            # has no int4 counterpart — fused Q4 params would fall through
            # to the generic scan and crash at the first dispatch
            print(
                "note: --layout stacked supports int8 only; using unrolled "
                "for int4",
                file=sys.stderr,
            )
            layout = "unrolled"
        if layout == "stacked":
            # stacked (L, K, N) arrays + layered kernels: decode parity
            # with unrolled (~565 vs 571 tok/s at 7B) and a far smaller
            # HLO — compiles in a fraction of the time
            from hip_llama_tpu.models.params import fuse_stacked_quant_params

            params = fuse_stacked_quant_params(params)
        else:
            # unrolled per-layer weight buffers (the measured-fastest
            # decode config). The paged step is a lax.scan over stacked
            # layer weights, so paged keeps the stacked layout.
            from hip_llama_tpu.models.params import (
                pad_kv_head_params,
                unstack_quant_params,
            )

            params = unstack_quant_params(params)
            if kv_quant and cfg.n_kv_heads % 8:
                # emit the int8-KV cache's 8-padded head count straight
                # from the QKV weights (zero per-step pad/slice ops)
                params = pad_kv_head_params(params, cfg)
    print(
        f"---------Model Information----------\n"
        f"dim: {cfg.dim}\nhidden_dim: {cfg.hidden_dim}\nn_layers: {cfg.n_layers}\n"
        f"n_heads: {cfg.n_heads}\nn_kv_heads: {cfg.n_kv_heads}\n"
        f"vocab_size: {cfg.vocab_size}\nseq_len: {cfg.seq_len}\n"
        f"------------------------------------"
    )
    if steps == 0 or steps > cfg.seq_len:
        steps = cfg.seq_len

    tokenizer = Tokenizer.from_file(tokenizer_path, cfg.vocab_size)

    shardings = None
    custom_step = custom_prefill = cache_sharding = None
    is_quant = hasattr(params, "tok_emb_q")
    if (
        mode == "generate" and spec_k > 0
        and (sp > 1 or pp > 1 or (tp > 1 and is_quant))
    ):
        # speculative_generate drives its own dense prefill on the target's
        # params — staged (--pp), sp-custom-step, and shard_map int8-TP
        # engines can't serve that path
        print(
            "note: --spec needs the plain prefill path; ignoring it with "
            "--sp/--pp/int8 --tp",
            file=sys.stderr,
        )
        spec_k = 0
    if tp > 1 and is_quant:
        # int8 + TP: the fused kernels aren't pjit-auto-partitionable, so
        # run the explicit-SPMD shard_map step (parallel/tp.py)
        from hip_llama_tpu.parallel import make_mesh
        from hip_llama_tpu.parallel.tp import make_tp_decode_step, tp_shardings

        mesh = make_mesh(tp=tp)
        p_sh, cache_sharding = tp_shardings(params, mesh, kv_quant=kv_quant)
        params = jax.device_put(params, p_sh)
        prec = "highest" if dtype == jnp.float32 else "default"
        custom_step = make_tp_decode_step(
            cfg, mesh, params, attn_impl=attn_impl, precision=prec,
            kv_quant=kv_quant,
        )
        from hip_llama_tpu.parallel.tp import make_tp_prefill

        custom_prefill = make_tp_prefill(
            cfg, mesh, params, attn_impl=attn_impl, precision=prec,
            kv_quant=kv_quant,
        )
    elif tp > 1:
        from hip_llama_tpu.parallel import make_mesh, make_shardings, shard_params

        mesh = make_mesh(tp=tp)
        shardings = make_shardings(cfg, mesh, kv_quant=kv_quant)
        params = shard_params(params, shardings)
    elif pp > 1:
        # pipeline-parallel serving: layer-range stages over a ("pp",) mesh,
        # GPipe microbatch ticks inside one shard_map step (the reference's
        # test_pipeline_parallelism, llama.cpp:1280-1485, re-designed: its 4
        # host threads + per-device locks become n_micro in-flight
        # microbatches ticked by ppermute)
        import numpy as np
        from jax.sharding import Mesh

        from hip_llama_tpu.parallel.pipeline import (
            make_pp_decode_step,
            make_pp_prefill,
            pp_shardings,
            stage_params,
        )

        if is_quant:
            print("--pp supports dense (fp32/bf16) params only", file=sys.stderr)
            return 1
        if cfg.n_layers % pp or batch % pp_micro:
            print(
                f"--pp {pp} needs n_layers divisible by stages and -b "
                f"divisible by --micro {pp_micro}",
                file=sys.stderr,
            )
            return 1
        mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
        p_sh, cache_sharding = pp_shardings(cfg, mesh)
        params = jax.device_put(stage_params(params, pp), p_sh)
        custom_step = make_pp_decode_step(
            cfg, mesh, n_micro=pp_micro,
            precision="highest" if dtype == jnp.float32 else "default",
        )
        custom_prefill = make_pp_prefill(
            cfg, mesh, n_micro=pp_micro,
            precision="highest" if dtype == jnp.float32 else "default",
        )
    elif sp > 1:
        # sequence-parallel serving: KV cache sharded along the sequence
        # dim, cross-chip online-softmax combine (BEYOND reference — its
        # long-context axis was host KV-swap, thaDNN.cpp:285-290)
        import numpy as np
        from jax.sharding import Mesh

        from hip_llama_tpu.parallel.sp import make_sp_decode_step, sp_shardings

        if is_quant:
            print("--sp supports dense (fp32/bf16) params only", file=sys.stderr)
            return 1
        mesh = Mesh(np.array(jax.devices()[:sp]), ("sp",))
        p_sh, cache_sharding = sp_shardings(cfg, mesh)
        params = jax.device_put(params, p_sh)
        custom_step = make_sp_decode_step(
            cfg, mesh,
            precision="highest" if dtype == jnp.float32 else "default",
        )

    h_step = h_prefill = h_cache = None
    if host_fns is not None:
        h_step, h_prefill, h_cache = host_fns
        if not use_prefill:
            h_prefill = None
    engine = InferenceEngine(
        cfg,
        params,
        tokenizer,
        batch_size=batch,
        attn_impl=attn_impl,
        use_prefill=use_prefill,
        precision="highest" if dtype == jnp.float32 else "default",
        cache_dtype=dtype if host_fns is not None else None,
        host_step=h_step,
        host_prefill=h_prefill,
        cache_factory=h_cache,
        shardings=shardings,
        paged=paged,
        page_size=page_size,
        custom_step=custom_step,
        custom_prefill=custom_prefill,
        cache_sharding=cache_sharding,
        device_sampling=device_sampling,
        ds_temperature=temperature,
        ds_topp=topp,
        ds_seed=rng_seed,
        kv_quant=kv_quant,
        chunk_steps=chunk_steps,
        prefix_cache=prefix_cache,
        spec_lookup=spec_k if mode == "test" else 0,
    )

    def load_draft_engine(path, batch_n):
        d_cfg, d_weights = load_checkpoint(path)
        if isinstance(d_weights, Q4Weights):
            from hip_llama_tpu.models.params import qparams_from_q4_weights

            d_params = qparams_from_q4_weights(d_cfg, d_weights)
        elif not isinstance(d_weights, LlamaWeights):
            from hip_llama_tpu.models.params import qparams_from_quant_weights

            d_params = qparams_from_quant_weights(d_cfg, d_weights)
        else:
            d_params = params_from_weights(d_weights, dtype=dtype)
        return InferenceEngine(
            d_cfg, d_params, tokenizer, batch_size=batch_n,
            attn_impl=attn_impl,
            precision="highest" if dtype == jnp.float32 else "default",
            use_prefill=use_prefill,
        )

    if mode == "generate" and spec_k > 0:
        # speculative decoding: greedy prefix-match at temperature 0,
        # distribution-preserving rejection sampling at temperature > 0.
        # Without --draft, proposals come from prompt-lookup (n-grams).
        from hip_llama_tpu.engine.speculative import speculative_generate

        draft_engine = load_draft_engine(draft_path, 1) if draft_path else None
        res, spec_stats = speculative_generate(
            engine, draft_engine, prompt, steps, k=spec_k, echo=True,
            temperature=temperature, topp=topp, seed=rng_seed,
        )
        print()
        print(
            f"speculative: k={spec_k}, rounds={spec_stats.rounds}, "
            f"acceptance={spec_stats.acceptance:.2f}",
            file=sys.stderr,
        )
        if res.n_gen_tokens > 0:
            print(
                f"achieved tok/s: {res.tok_per_s:.2f}, ttft: {res.ttft_s*1000:.1f} ms",
                file=sys.stderr,
            )
    elif mode == "generate":
        sampler = Sampler(cfg.vocab_size, temperature, topp, rng_seed)
        res = engine.generate(prompt, steps, sampler, echo=True)
        print()
        if res.n_gen_tokens > 0:
            print(
                f"achieved tok/s: {res.tok_per_s:.2f}, ttft: {res.ttft_s*1000:.1f} ms",
                file=sys.stderr,
            )
    elif mode == "chat":
        chat_mode(engine, prompt, system_prompt, steps, temperature, topp, rng_seed)
    elif mode == "test":
        if input_filename is None or output_filename is None:
            error_usage()
        requests = read_inputfile(input_filename)
        samplers = None
        if temperature == 0.0:
            # extension: -t 0 in test mode serves the corpus GREEDILY —
            # byte-stable across hosts/thread counts (the reference's own
            # byte-exact tier is greedy, test_all.py; its test mode
            # hardcodes temp-1.0 samplers whose draws flip on last-ulp
            # logit differences between environments)
            samplers = [
                Sampler(cfg.vocab_size, 0.0) for _ in requests.prompts
            ]
        draft_engine = (
            load_draft_engine(draft_path, batch)
            if spec_k > 0 and draft_path else None
        )
        if replicas > 1:
            # multi-replica shared-queue serving (llama.cpp:919-983): N
            # independent engines over N devices, one request queue. Modes
            # that already span the mesh (tp/pp/sp/stream) or need a draft
            # keep the single-engine path.
            blocked = [
                (tp > 1, "--tp"), (pp > 1, "--pp"), (sp > 1, "--sp"),
                (stream, "--stream"), (draft_engine is not None, "--draft"),
                (spec_k > 0, "--spec"),
            ]
            bad = [f for cond, f in blocked if cond]
            n_dev = len(jax.devices())
            if bad:
                print(f"note: --replicas is incompatible with "
                      f"{'/'.join(bad)}; serving with 1 engine",
                      file=sys.stderr)
                replicas = 1
            elif n_dev < replicas:
                print(f"note: --replicas {replicas} > {n_dev} devices; "
                      f"clamping", file=sys.stderr)
                replicas = n_dev

        start = time.perf_counter()
        stats: dict = {}
        if replicas > 1:
            from hip_llama_tpu.engine.engine import serve_replicated

            devs = jax.devices()[:replicas]
            engine.device = devs[0]
            rep_engines = [engine]
            for r in range(1, replicas):
                with jax.default_device(devs[r]):
                    params_r = jax.device_put(params, devs[r])
                    rep_engines.append(InferenceEngine(
                        cfg, params_r, tokenizer, batch_size=batch,
                        attn_impl=attn_impl, use_prefill=use_prefill,
                        precision="highest" if dtype == jnp.float32
                        else "default",
                        paged=paged, page_size=page_size,
                        device_sampling=device_sampling,
                        ds_temperature=temperature, ds_topp=topp,
                        ds_seed=rng_seed, kv_quant=kv_quant,
                        chunk_steps=chunk_steps, prefix_cache=prefix_cache,
                        device=devs[r],
                    ))
            num_gen_tokens = serve_replicated(
                rep_engines, requests, steps=cfg.seq_len, stats=stats,
                stop_on_eos=stop_on_eos, samplers=samplers,
            )
        else:
            num_gen_tokens = engine.serve(
                requests, steps=cfg.seq_len, verbose=True, stats=stats,
                draft=draft_engine, stop_on_eos=stop_on_eos,
                samplers=samplers,
            )
        end = time.perf_counter()
        print(f"Total achieved token: {num_gen_tokens}")
        print(
            f"elapsed time(s): {end-start:.6f}, "
            f"achieved throughput(tok/s): {num_gen_tokens/(end-start):.6f}"
        )
        if stats.get("ttft_p50_s") is not None:
            mx = stats.get("ttft_max_s")
            print(
                f"ttft p50: {stats['ttft_p50_s']*1000:.1f} ms, "
                f"p95: {stats['ttft_p95_s']*1000:.1f} ms"
                + (f", max: {mx*1000:.1f} ms" if mx is not None else ""),
                file=sys.stderr,
            )
        if stats.get("spec_proposed"):
            print(
                f"speculative: k={spec_k}, proposed={stats['spec_proposed']}, "
                f"acceptance={stats['spec_accepted']/stats['spec_proposed']:.2f}",
                file=sys.stderr,
            )
        if stats.get("prefix_hit_tokens"):
            print(
                f"prefix cache: {stats['prefix_hit_tokens']} prompt tokens "
                "served from shared pages",
                file=sys.stderr,
            )
        write_outputfile(output_filename, requests)
    else:
        print(f"unknown mode: {mode}", file=sys.stderr)
        error_usage()

    print(f"total elapsed time(s): {time.perf_counter()-total_start:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
