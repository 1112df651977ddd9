"""hip_llama_tpu — a TPU-native (JAX/XLA/Pallas) Llama-2 inference framework.

A ground-up re-design of the capabilities of tienpm/hip_llama.cpp (a HIP/ROCm
multi-GPU batched Llama-2 inference engine) for TPU hardware:

- compute path: one jitted, sharded decode step (JAX/XLA) with Pallas kernels
  for the ops XLA cannot fuse well (batched ragged decode attention over the
  KV cache, fused Q8_0 dequant-matmul),
- scale-out: tensor/data sharding over a `jax.sharding.Mesh` (ICI collectives
  emitted by XLA) instead of the reference's explicit hipMemcpy pipelines,
- host layer: tokenizer / samplers / continuous-batching scheduler matching
  the reference's observable behavior (reference: src/llama.cpp).
"""

from hip_llama_tpu.config import ModelConfig

__version__ = "0.1.0"

__all__ = ["ModelConfig", "__version__"]
