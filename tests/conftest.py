"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the TPU tunnel env (axon) is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# compile-time knobs: the full model step is a ~25k-instruction module and
# XLA:CPU's LLVM tail is superlinear in it; these cut whole-suite compile
# wall ~2x at identical numerics (scheduling/codegen only). CPU tests only —
# bench.py and the TPU path never see these flags.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend and sets
# jax_platforms="axon,cpu" — override AFTER import so unit tests run on the
# local CPU backend (fast, deterministic), not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # f64 available for oracle tests

# Persistent compilation cache across test processes/runs: jax 0.9's cache
# serializer handles this suite's executables (round-2's jaxlib segfaulted;
# re-validated on 0.9 — cold 65s step compile, warm 10s). cice_tpu/__init__
# sets a topology-namespaced cache dir on import; the suite now uses it
# (round 2 exported CICE_TPU_NO_JIT_CACHE=1 here) so shared configs
# compile once per suite, not once per test.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    return jax.devices()
