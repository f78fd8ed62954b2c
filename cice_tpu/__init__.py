"""cice_tpu — a TPU-native sea-ice modeling framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
CICE-Consortium/CICE v6 (EVP/rEVP/EAP/VP dynamics, incremental-remapping
transport, ridging, Icepack-equivalent column physics, forcing, history,
restart, diagnostics), built for TPU meshes: global-array state sharded with
`jax.sharding`, functional stepping under `jit`, Pallas kernels on the hot
stencils.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache for every entry point (CLI, bench,
# driver): whole-model-step compiles at production grid sizes take minutes
# on CPU; caching them across processes is what keeps suites inside a CI
# budget. Opt out with CICE_TPU_NO_JIT_CACHE=1; redirect with
# JAX_COMPILATION_CACHE_DIR (which jax itself honors).
# Some PJRT plugins (e.g. the axon TPU tunnel) register themselves even when
# JAX_PLATFORMS requests another backend; mirror the env var into the config
# knob so `JAX_PLATFORMS=cpu python -m cice_tpu ...` is actually honored.
if _os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

if not _os.environ.get("CICE_TPU_NO_JIT_CACHE"):
    if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # namespace by requested backend/topology: executables serialized
        # under one PJRT client topology must never be deserialized under
        # another (observed: segfault in get_executable_and_time)
        import re as _re
        _tag = _os.environ.get("JAX_PLATFORMS", "auto").replace(",", "-")
        _m = _re.search(r"host_platform_device_count=(\d+)",
                        _os.environ.get("XLA_FLAGS", ""))
        _tag += f"_d{_m.group(1) if _m else 1}"
        _jax.config.update("jax_compilation_cache_dir",
                           f"/tmp/jax_cache/{_tag}")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Config, box2001_config, gx3_config
from .calendar import Calendar
from .core.grid import Grid, make_grid, rectgrid, latlon_grid, grid_average_X2Y
from .core.halo import BC

__version__ = "0.1.0"
