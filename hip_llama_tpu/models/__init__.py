from hip_llama_tpu.models.params import LlamaParams, params_from_weights
from hip_llama_tpu.models.llama import (
    init_kv_cache,
    make_decode_step,
    make_prefill,
)

__all__ = [
    "LlamaParams",
    "params_from_weights",
    "init_kv_cache",
    "make_decode_step",
    "make_prefill",
]
