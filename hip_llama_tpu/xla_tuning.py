"""Per-program XLA compiler options for the TPU serving path.

Measured on a real v5e chip (tools/msa_experiment.py, 7B INT8 b=8 decode,
unrolled layout): XLA's memory-space-assignment promotes whole per-layer
weight buffers (e.g. the 50 MB int8 QKV operand) into VMEM ahead of the
Pallas kernels — ~2.1 ms/step of sliced async copies on a 12.8 ms step
(profile: `slice-start/done` pairs, 1.56 GB/step of duplicate weight
traffic). A weight streamed exactly once per step gains nothing from VMEM
residency.

XLA_FLAGS cannot carry xla_tpu_* flags in this environment (the local
client's flag parser fatals on names only the TPU backend knows), but
per-program `compiler_options` travel with the computation:

| option                                            | 7B int8 b8 tok/s |
|---|---|
| (none)                                            | 563.5 |
| xla_tpu_msa_inefficient_use_to_copy_ratio=1000    | 570.5 |
| xla_msa_max_outstanding_prefetches=0              | 579.9 |
| xla_msa_min_overlap_to_async_copy_ratio=100       | 582.7 |
| async_copy_bandwidth_scaling_factor=0.02          | 596.0 |
| async_copy_bandwidth_scaling_factor=0.1 + nopf    | 605.4 |
| async_copy_bandwidth_scaling_factor=0.1           | 614.2 |

Scaling the modeled async-copy bandwidth down by 10x makes MSA see weight
prefetches as expensive, so it keeps only the ones it can actually overlap.

Override with HIPLLAMA_XLA_OPTS:
  HIPLLAMA_XLA_OPTS=off            disable (plain compile)
  HIPLLAMA_XLA_OPTS=k=v,k2=v2      custom option set
"""

from __future__ import annotations

import os

import jax

_BEST = {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"}


def decode_compiler_options() -> dict | None:
    """Compiler options for decode/serve programs; None on CPU (the flags
    are TPU-backend-only) or when disabled via HIPLLAMA_XLA_OPTS=off."""
    env = os.environ.get("HIPLLAMA_XLA_OPTS")
    if env == "off":
        return None
    if jax.default_backend() != "tpu":
        # xla_tpu_* options are TPU-backend-only; any other backend
        # (cpu, gpu, ...) would reject them as unknown flags.
        return None
    if env:
        opts = {}
        for kv in env.split(","):
            if "=" not in kv:
                raise ValueError(
                    f"HIPLLAMA_XLA_OPTS entry {kv!r} is not of the form key=value "
                    f"(full value: {env!r}; use 'off' to disable tuning)"
                )
            k, v = kv.split("=", 1)
            opts[k] = v
        return opts
    return dict(_BEST)
