"""Run run.py on the CPU backend (with the fake multi-device mesh if
XLA_FLAGS=--xla_force_host_platform_device_count=N is set).

The dev image's sitecustomize pins JAX_PLATFORMS=axon at import time, so
the env var alone cannot select CPU — the backend must be switched via
jax.config AFTER import (same trick as tests/conftest.py).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/cpurun.py <run.py args...>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import run  # noqa: E402

if __name__ == "__main__":
    sys.exit(run.main(["run.py"] + sys.argv[1:]))
