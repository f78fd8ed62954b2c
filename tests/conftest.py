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

# NO persistent compilation cache under pytest: re-validated on jax 0.9
# (round 3) — a full-suite run still ABORTS in cache deserialization
# (get_executable_and_time SIGABRT, reproduced at
# test_io_hdf5::test_driver_continue_from_hdf5 after ~50 green tests; the
# cpu_aot_loader machine-feature-mismatch warnings are the tell). The
# whole suite runs in one process, so the in-process jit cache
# (driver._model_step_jit) already dedupes recompiles; the on-disk cache
# only ever helped across processes and is kept for CLI/bench entries.
os.environ["CICE_TPU_NO_JIT_CACHE"] = "1"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    return jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_accumulation():
    """Drop jit caches at module boundaries: XLA:CPU aborts (SIGABRT in
    backend_compile_and_load) after ~140 accumulated whole-model
    compilations in one process (reproduced twice at the same suite
    position; the same test passes alone and in short prefixes). Bounding
    live executables keeps a full-suite run inside one process viable;
    within-module jit sharing (the expensive model_step reuse) is
    preserved."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
