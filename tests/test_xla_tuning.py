"""hip_llama_tpu/xla_tuning.py: option selection and env overrides.
(The flag VALUES are validated on hardware — tools/msa_experiment.py sweep,
BASELINE.md; here we pin the selection logic: CPU -> None, off -> None,
custom k=v parsing.)"""

import jax
import pytest

from hip_llama_tpu import xla_tuning


def test_cpu_backend_returns_none(monkeypatch):
    # the test env IS the CPU backend (conftest)
    assert jax.default_backend() == "cpu"
    monkeypatch.delenv("HIPLLAMA_XLA_OPTS", raising=False)
    assert xla_tuning.decode_compiler_options() is None


def test_off_returns_none(monkeypatch):
    monkeypatch.setenv("HIPLLAMA_XLA_OPTS", "off")
    assert xla_tuning.decode_compiler_options() is None


def test_custom_options_parse(monkeypatch):
    monkeypatch.setenv("HIPLLAMA_XLA_OPTS", "a=1,b=x=y")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert xla_tuning.decode_compiler_options() == {"a": "1", "b": "x=y"}


def test_non_tpu_backend_returns_none(monkeypatch):
    # xla_tpu_* options would be unknown flags on any non-TPU backend
    monkeypatch.delenv("HIPLLAMA_XLA_OPTS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
    assert xla_tuning.decode_compiler_options() is None


def test_malformed_env_raises_clearly(monkeypatch):
    monkeypatch.setenv("HIPLLAMA_XLA_OPTS", "a=1,oops")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="oops.*key=value"):
        xla_tuning.decode_compiler_options()


def test_default_on_tpu(monkeypatch):
    monkeypatch.delenv("HIPLLAMA_XLA_OPTS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    opts = xla_tuning.decode_compiler_options()
    assert opts == {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"}
    opts["mutated"] = "1"  # callers get a copy, not the module constant
    assert "mutated" not in xla_tuning.decode_compiler_options()
