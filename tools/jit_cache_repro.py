#!/usr/bin/env python
"""Minimal repro driver for the persistent-compilation-cache SIGABRT.

Round-3 observation (tests/conftest.py): with the on-disk jit cache
enabled, a full pytest run ABORTS inside cache DESERIALIZATION
(`get_executable_and_time`, cpu_aot_loader machine-feature-mismatch
warnings are the tell) after ~50 green tests on XLA:CPU; one-shot
CLI/bench runs are stable. This script tries to reduce that to a
two-process repro:

  phase write: compile N distinct model-step variants with the cache on
  phase read : fresh process recompiles the same variants (cache hits)

Usage: python tools/jit_cache_repro.py [n_variants]
Exit code 0 = no crash (cache healthy here); non-zero = reproduced.
Run it on the failing jaxlib to attach a stack to an upstream issue.
"""

import os
import subprocess
import sys
import tempfile

CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp
from cice_tpu.config import Config
from cice_tpu.model.driver import Model
from cice_tpu.model.forcing import get_forcing
from cice_tpu.model.step import model_step

n = int(sys.argv[2])
for i in range(n):
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16 + 8 * (i % 3), "grid.ny_global": 16,
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 10 + i, "thermo.nit": 2})
    m = Model(cfg)
    fc = get_forcing(cfg, m.grid, 0.0, 1.0, m.state.aice, m.forcing)
    out = jax.jit(lambda s, f, m=m, cfg=cfg: model_step(
        m.static, m.grid, s, f, cfg.setup.dt)[0].aice)(m.state, fc)
    jax.block_until_ready(out)
    print(f"variant {i} ok", flush=True)
print("phase done")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cache = tempfile.mkdtemp(prefix="jitcache_repro_")
    here = os.path.abspath(__file__)
    env = dict(os.environ)
    env.pop("CICE_TPU_NO_JIT_CACHE", None)
    for phase in ("write", "read"):
        r = subprocess.run([sys.executable, "-c",
                            f"__file__ = {here!r}\n" + CHILD, cache, str(n)],
                           env=env)
        print(f"phase {phase}: rc={r.returncode}")
        if r.returncode != 0:
            print(f"REPRODUCED in phase {phase} (rc {r.returncode}); "
                  f"cache dir kept at {cache}")
            return r.returncode
    entries = sum(len(fs) for _, _, fs in os.walk(cache))
    print(f"no crash; cache entries: {entries}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
