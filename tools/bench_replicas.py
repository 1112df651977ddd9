"""A/B: multi-replica shared-queue serving vs one lockstep engine on a
SKEWED-length corpus (VERDICT r4 missing #1 'Done' criterion).

Runs on the fake CPU mesh (no multi-chip hardware in this environment):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/bench_replicas.py [--replicas 2] [--batch 2]

Topology under test: N independent engines over N devices pulling from
ONE shared queue (the reference's per-GPU replicas + `omp critical`,
llama.cpp:919-983) vs a single engine with N*batch lockstep slots. Under
skewed prompt lengths the lockstep engine's prefill dispatches serialize
the whole batch behind the longest prompt's chunks; replicas overlap
them. CPU-thread wall numbers are indicative (GIL + interpret-mode
kernels), not chip-grade — the test asserts byte-identical outputs and
reports the throughput ratio."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hip_llama_tpu.config import ModelConfig  # noqa: E402
from hip_llama_tpu.engine import InferenceEngine, Requests  # noqa: E402
from hip_llama_tpu.engine.engine import serve_replicated  # noqa: E402
from hip_llama_tpu.io.checkpoint import random_weights  # noqa: E402
from hip_llama_tpu.models import params_from_weights  # noqa: E402
from hip_llama_tpu.sampler import Sampler  # noqa: E402
from hip_llama_tpu.tokenizer import Tokenizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=48)
    a = ap.parse_args()

    cfg = ModelConfig(dim=64, hidden_dim=172, n_layers=4, n_heads=8,
                      n_kv_heads=4, vocab_size=512, seq_len=256)
    params = params_from_weights(random_weights(cfg, seed=11),
                                 dtype=jnp.float32)
    # self-contained byte-level tokenizer (same recipe as tests/conftest)
    vocab = [b"<unk>", b"<s>", b"</s>"]
    scores = [0.0, 0.0, 0.0]
    for i in range(256):
        vocab.append(f"<0x{i:02X}>".encode())
        scores.append(-1e6)
    while len(vocab) < cfg.vocab_size:
        vocab.append(f"<extra_{len(vocab)}>".encode())
        scores.append(-1e6)
    tok = Tokenizer(vocab, scores)

    # skewed corpus: a few very long prompts among many short ones
    short = ["hi there", "ok", "go on", "yes", "maybe so", "why not"]
    long_p = ["the quick brown fox jumps over the lazy dog " * 4]
    prompts = (short * 2 + long_p * 2 + short)[: 6 * a.replicas + 2]

    def greedy(n):
        return [Sampler(cfg.vocab_size, temperature=0.0) for _ in range(n)]

    # lockstep single engine, replicas*batch slots
    reqs1 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    eng1 = InferenceEngine(cfg, params, tok,
                           batch_size=a.replicas * a.batch)
    st1: dict = {}
    t0 = time.perf_counter()
    n1 = eng1.serve(reqs1, steps=a.steps, samplers=greedy(len(prompts)),
                    stats=st1)
    t_single = time.perf_counter() - t0

    # N replicas x batch slots, shared queue
    devs = jax.devices()[: a.replicas]
    engines = []
    for d in devs:
        with jax.default_device(d):
            p = jax.device_put(params, d)
            engines.append(InferenceEngine(cfg, p, tok, batch_size=a.batch,
                                           device=d))
    reqs2 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    stats: dict = {}
    t0 = time.perf_counter()
    n2 = serve_replicated(engines, reqs2, steps=a.steps, stats=stats,
                          samplers=greedy(len(prompts)))
    t_rep = time.perf_counter() - t0

    identical = list(reqs1.generations) == list(reqs2.generations)
    # slot-step utilization: tokens emitted per (scheduler iteration x
    # slot). Wall time on SHARED-CORE fake devices penalizes concurrency
    # (all replicas fight for the same CPU), so utilization is the
    # topology-level number that transfers to real chips: under skew the
    # lockstep batch burns slot-steps idling behind the longest request,
    # replicas refill from the shared queue.
    ss1 = st1.get("slot_steps", 1)
    ss2 = sum(st.get("slot_steps", 1) for st in stats["per_replica"])
    import json
    print(json.dumps({
        "metric": f"replicas{a.replicas}x{a.batch}_vs_lockstep"
                  f"{a.replicas * a.batch}_skewed",
        "lockstep_tok_s": round(n1 / t_single, 2),
        "replicas_tok_s": round(n2 / t_rep, 2),
        "wall_ratio_shared_core": round((n2 / t_rep) / (n1 / t_single), 3),
        "lockstep_tok_per_slot_step": round(n1 / ss1, 3),
        "replicas_tok_per_slot_step": round(n2 / ss2, 3),
        "utilization_ratio": round((n2 / ss2) / (n1 / ss1), 3),
        "outputs_byte_identical": identical,
        "per_replica_tokens": stats.get("per_replica_tokens"),
        "n_requests": len(prompts),
    }))
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
