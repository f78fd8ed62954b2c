"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the TPU tunnel env (axon) is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend and sets
# jax_platforms="axon,cpu" — override AFTER import so unit tests run on the
# local CPU backend (fast, deterministic), not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # f64 available for oracle tests
# NO persistent compilation cache under pytest: serializing some of this
# suite's executables segfaults jaxlib's cache writer (observed twice in
# put_executable_and_time / get_executable_and_time). In-process jit
# sharing (driver._model_step_jit) covers the expensive recompiles; the
# CLI/driver keep the on-disk cache where it is stable.
os.environ["CICE_TPU_NO_JIT_CACHE"] = "1"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    return jax.devices()
