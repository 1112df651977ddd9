"""Multi-host (DCN) initialization and mesh construction.

The reference never crossed a host boundary at inference time (its DP
scheduler fans out OS threads on one node, llama.cpp:919-925; training used
torch DDP/NCCL, train/train.py:95). The TPU-native multi-host story:

- every host runs THE SAME program (multi-controller SPMD);
- `jax.distributed.initialize()` wires the hosts (env-driven on Cloud TPU:
  coordinator address/num processes come from the TPU metadata);
- `global_mesh()` lays ("dp", "tp") over all devices with tp confined to
  one host's chips whenever possible, so the per-layer all-reduces ride ICI
  and only data-parallel gradient/throughput aggregation crosses DCN
  (scaling-book recipe);
- batches are per-host shards: each host feeds its local slice via
  `jax.make_array_from_process_local_data`.

Single-host meshes fall out of the same code path (initialize() is a no-op
when world_size == 1), so the serving/training stack doesn't branch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up multi-controller JAX. No-op for single-process runs."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # tolerate only the benign cases (already initialized, or a
        # single-process env without a coordinator). A job that EXPLICITLY
        # asked for multiple processes but failed to wire them must not
        # silently degrade into N divergent single-host runs.
        if num_processes is not None and num_processes > 1 and (
            jax.process_count() < num_processes
        ):
            raise


def global_mesh(tp: int | None = None) -> Mesh:
    """("dp", "tp") mesh over ALL processes' devices; tp defaults to the
    per-host chip count so tensor-parallel collectives stay on ICI."""
    devs = np.array(jax.devices())
    if tp is None:
        tp = max(1, jax.local_device_count())
    tp = min(tp, len(devs))
    while len(devs) % tp:
        tp -= 1
    return Mesh(devs.reshape(len(devs) // tp, tp), axis_names=("dp", "tp"))


def process_local_batch(global_batch: int) -> int:
    """Per-host slice of a global batch (each host feeds its own shard)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
