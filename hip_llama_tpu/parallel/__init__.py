from hip_llama_tpu.parallel.sharding import (
    Shardings,
    make_mesh,
    make_shardings,
    shard_params,
)

__all__ = ["Shardings", "make_mesh", "make_shardings", "shard_params"]
