from hip_llama_tpu.parallel.multihost import (
    global_mesh,
    initialize,
    process_local_batch,
)
from hip_llama_tpu.parallel.sharding import (
    Shardings,
    make_mesh,
    make_shardings,
    shard_params,
)

__all__ = [
    "Shardings",
    "global_mesh",
    "initialize",
    "make_mesh",
    "make_shardings",
    "process_local_batch",
    "shard_params",
]
