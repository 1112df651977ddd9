"""Mesh + sharding layout: the TPU-native replacement for the reference's
explicit multi-GPU data movement.

Where the reference moves bytes by hand (pipeline hand-off via D2D memcpy,
thaDNN.cpp:267-270; pinned-host staging for weights/KV, thaDNN.cpp:123-134;
RCCL never linked, hip_helper.hpp:13-21), here the layout is *declared*:
weights and KV are annotated with `NamedSharding`s over a ("dp", "tp") mesh
and XLA emits the all-reduces/all-gathers over ICI inside the jitted step.

Tensor-parallel layout (Megatron-style, the idiomatic TPU replacement for
the reference's layer-range pipeline parallelism — SURVEY.md §2.3):
- wq/wk/wv and w1/w3 shard their OUTPUT dim (heads / ffn hidden) on "tp":
  column-parallel, no comms in.
- wo and w2 shard their INPUT dim on "tp": row-parallel, one psum after
  each (XLA inserts it).
- KV cache shards its head dim on "tp" and batch on "dp".
- wcls shards the vocab dim; the logits all-gather is the only full-vocab
  collective.

Constraint: tp must divide n_kv_heads (KV heads are not replicated).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.models.llama import KVCache
from hip_llama_tpu.models.params import LlamaParams


class Shardings(NamedTuple):
    mesh: Mesh
    params: LlamaParams  # of NamedSharding
    cache: KVCache  # of NamedSharding
    tokens: NamedSharding  # (B,) int32
    logits: NamedSharding  # (B, V)


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tp * dp > len(devices):
        raise ValueError(f"tp*dp={tp*dp} exceeds {len(devices)} devices")
    grid = np.array(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def make_shardings(
    cfg: ModelConfig, mesh: Mesh, shard_batch: bool = True, kv_quant: bool = False
) -> Shardings:
    tp = mesh.shape["tp"]
    if cfg.n_kv_heads % tp != 0:
        raise ValueError(f"tp={tp} must divide n_kv_heads={cfg.n_kv_heads}")

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    dp_axis = "dp" if shard_batch else None
    params = LlamaParams(
        tok_emb=ns(None, None),
        rms_att=ns(None, None),
        wq=ns(None, None, "tp"),
        wk=ns(None, None, "tp"),
        wv=ns(None, None, "tp"),
        wo=ns(None, "tp", None),
        rms_ffn=ns(None, None),
        w1=ns(None, None, "tp"),
        w2=ns(None, "tp", None),
        w3=ns(None, None, "tp"),
        rms_final=ns(None),
        wcls=ns(None, "tp"),
    )
    # (B, L, KVH, S, HS): batch on dp, kv heads on tp
    if kv_quant:
        # int8 cache: scale planes (B, L, KVH, S) shard like the cache
        cache = KVCache(
            k=ns(dp_axis, None, "tp", None, None),
            v=ns(dp_axis, None, "tp", None, None),
            k_scale=ns(dp_axis, None, "tp", None),
            v_scale=ns(dp_axis, None, "tp", None),
        )
    else:
        cache = KVCache(
            k=ns(dp_axis, None, "tp", None, None),
            v=ns(dp_axis, None, "tp", None, None),
        )
    return Shardings(
        mesh=mesh,
        params=params,
        cache=cache,
        tokens=ns(dp_axis),
        logits=ns(dp_axis, None),
    )


def shard_params(params: LlamaParams, shardings: Shardings) -> LlamaParams:
    """Place (possibly host-resident) params onto the mesh with the TP layout."""
    return jax.tree.map(jax.device_put, params, shardings.params)
