"""parallel/multihost.py: mesh/batch math on the faked 8-device CPU mesh,
plus a sharded forward over the global_mesh — the single-process slice of
the multi-controller story (initialize() is a no-op at world size 1; the
mesh/batch helpers are the same code multi-host runs)."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.parallel.multihost import (
    global_mesh,
    initialize,
    process_local_batch,
)


def test_initialize_single_process_noop():
    initialize(num_processes=1)  # must not raise or wire anything
    assert jax.process_count() == 1


def test_initialize_multiprocess_failure_raises():
    """An explicit multi-process request that can't wire must raise, not
    silently degrade into divergent single-host runs."""
    with pytest.raises(Exception):
        initialize(
            coordinator_address="127.0.0.1:1",  # nothing listening
            num_processes=2, process_id=0,
        )


def test_global_mesh_shape_default_tp():
    mesh = global_mesh()
    assert mesh.axis_names == ("dp", "tp")
    # single process: tp = local device count = 8, dp = 1
    assert mesh.devices.shape == (1, 8)


def test_global_mesh_explicit_tp():
    mesh = global_mesh(tp=4)
    assert mesh.devices.shape == (2, 4)
    # non-divisor tp falls back to the largest divisor
    mesh3 = global_mesh(tp=3)
    assert mesh3.devices.shape[0] * mesh3.devices.shape[1] == 8
    assert 8 % mesh3.devices.shape[1] == 0


def test_process_local_batch():
    # single process: the local slice IS the global batch
    assert process_local_batch(32) == 32
    assert process_local_batch(7) == 7


def test_two_process_distributed_smoke():
    """ACTUALLY wire two processes with jax.distributed (localhost
    coordinator, Gloo cross-process collectives on the CPU backend): each
    worker builds the (2, 4) dp/tp global_mesh, feeds its local dp-shard,
    runs one sharded decode step, and asserts logits parity vs a
    single-device oracle (tests/multihost_worker.py). The honest TPU-less
    analog of the reference's real 4-GPU SLURM validation
    (/root/reference/scripts/eval/gen_jobs.sh:7)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    env.update(
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK process {i}" in out, out


def test_sharded_forward_on_global_mesh(tiny_cfg, tiny_weights):
    """The dp/tp mesh from global_mesh drives the same sharded decode step
    the 2-host BASELINE target uses (parallel/sharding.py shardings)."""
    from hip_llama_tpu.models import (
        init_kv_cache, make_decode_step, params_from_weights,
    )
    from hip_llama_tpu.parallel import make_shardings, shard_params

    cfg = tiny_cfg
    mesh = global_mesh(tp=4)
    shardings = make_shardings(cfg, mesh)
    params = shard_params(params_from_weights(tiny_weights, dtype=jnp.float32), shardings)
    b = process_local_batch(4)
    cache = jax.device_put(init_kv_cache(cfg, b), shardings.cache)
    step = jax.jit(
        make_decode_step(cfg),
        in_shardings=(shardings.params, shardings.cache, None, None),
        out_shardings=(None, shardings.cache),
        donate_argnums=(1,),
    )
    logits, cache = step(
        params, cache, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32)
    )
    # parity vs the unsharded single-device step
    step1 = jax.jit(make_decode_step(cfg))
    params1 = params_from_weights(tiny_weights, dtype=jnp.float32)
    cache1 = init_kv_cache(cfg, b)
    want, _ = step1(
        params1, cache1, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want), atol=1e-4, rtol=1e-3
    )
