"""Worker for the 2-process jax.distributed smoke test.

Each process runs THIS program (multi-controller SPMD): wire up via
parallel/multihost.initialize(), build the ("dp", "tp") global_mesh over
both processes' devices, run ONE sharded decode step with each process
feeding its local dp-shard of the batch, and assert logits parity against
a process-local single-device oracle. This is the honest TPU-less analog
of the reference's real 4-GPU SLURM validation
(/root/reference/scripts/eval/gen_jobs.sh:7): the wiring
(coordinator handshake, cross-process mesh, DCN-modeled collectives)
actually executes, on the CPU backend with 4 forced devices per process.

Invoked by tests/test_multihost.py::test_two_process_distributed_smoke with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hip_llama_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        process_local_batch,
    )

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == 4 * args.num_processes, jax.device_count()

    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.models import (
        init_kv_cache,
        make_decode_step,
        params_from_weights,
    )
    from hip_llama_tpu.parallel import make_shardings, shard_params

    cfg = ModelConfig(
        dim=64, hidden_dim=172, n_layers=3, n_heads=8, n_kv_heads=4,
        vocab_size=512, seq_len=64,
    )
    # identical weights in every process (multi-controller: same program,
    # same data); seed fixed so the oracle matches across processes
    weights = random_weights(cfg, seed=7)

    # tp confined to each process's 4 local devices, dp across processes —
    # the collective layout the BASELINE 2-host target prescribes
    mesh = global_mesh(tp=4)
    assert mesh.devices.shape == (args.num_processes, 4), mesh.devices.shape

    shardings = make_shardings(cfg, mesh)
    params = shard_params(
        params_from_weights(weights, dtype=jnp.float32), shardings
    )

    global_batch = 4 * args.num_processes
    b_local = process_local_batch(global_batch)
    assert b_local == 4

    # each process feeds its own dp-shard of the token/pos arrays
    tokens_local = (
        np.arange(b_local, dtype=np.int32)
        + args.process_id * b_local
    ) % cfg.vocab_size
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp")
    )
    tokens = jax.make_array_from_process_local_data(
        batch_sharding, tokens_local, (global_batch,)
    )
    pos = jax.make_array_from_process_local_data(
        batch_sharding, np.zeros((b_local,), np.int32), (global_batch,)
    )
    cache = jax.device_put(
        init_kv_cache(cfg, global_batch), shardings.cache
    )

    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()
    )
    step = jax.jit(
        make_decode_step(cfg),
        in_shardings=(shardings.params, shardings.cache,
                      batch_sharding, batch_sharding),
        out_shardings=(replicated, shardings.cache),
        donate_argnums=(1,),
    )
    logits, cache = step(params, cache, tokens, pos)
    logits.block_until_ready()
    got = np.asarray(logits)  # replicated -> addressable everywhere

    # process-local single-device oracle over the FULL global batch
    tokens_all = np.arange(global_batch, dtype=np.int32) % cfg.vocab_size
    with jax.default_device(jax.local_devices()[0]):
        params1 = params_from_weights(weights, dtype=jnp.float32)
        cache1 = init_kv_cache(cfg, global_batch)
        want, _ = jax.jit(make_decode_step(cfg))(
            params1, cache1, jnp.asarray(tokens_all),
            jnp.zeros((global_batch,), jnp.int32),
        )
    np.testing.assert_allclose(
        got, np.asarray(want), atol=1e-4, rtol=1e-3
    )
    print(f"OK process {args.process_id}: parity over "
          f"{args.num_processes}-process mesh {mesh.devices.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
