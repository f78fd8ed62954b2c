#!/usr/bin/env python
"""Benchmark: EVP dynamics throughput at gx1 scale on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: grid-point·subcycles per second of the full B-grid EVP dynamics step
(stress + momentum + halo semantics) at gx1 size (ny=384, nx=320) with
ndte=120 — the north-star metric from BASELINE.json / SURVEY.md §6.

vs_baseline: ratio against a reference-proxy throughput for the same work.
The reference publishes no absolute numbers (BASELINE.md); its perf_suite
anchor is machine-relative. We anchor on the documented gx1 anchor
configuration magnitude: 32 Fortran ranks at ~O(1) s per dynamics step
⇒ ~1.5e7 pt·sub/s per 32-core node (derived from the perf_suite anchor
shape: 320*384*120 ≈ 1.47e7 pt·sub per step at ~1 s/step).
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params
from cice_tpu.columns.ridging import ice_strength
from cice_tpu.dynamics.evp import evp_solve

REF_PROXY_PTSUB_PER_S = 1.47e7   # see module docstring


def main():
    ny, nx = 384, 320            # gx1 dimensions (320x384 in CICE notation)
    ndte = 120
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": ndte, "dynamics.coriolis": "latitude",
    })
    grid = rectgrid(nx, ny, kmt_type="none", dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros(grid.shape, jnp.float32)
    aice = jnp.clip(0.5 + 0.5 * jax.random.uniform(key, grid.shape), 0.0, 1.0)
    vice = aice * 2.0
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=z + 0.1, strairyT=z + 0.05,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength(jnp.stack([aice / 5] * 5), jnp.stack([vice / 5] * 5),
                            aice, vice, cfg.dynamics)
    z3 = jnp.zeros((4,) + grid.shape, jnp.float32)

    solve = jax.jit(lambda pr, st, u0, v0: evp_solve(
        grid, p, pr, st, z3, z3, z3, uocn=u0, vocn=v0))

    def run_once():
        out = solve(prep, strength, z, z)
        jax.block_until_ready(out[0])
        return out

    # warmup/compile
    run_once()
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run_once()
    dt_s = (time.perf_counter() - t0) / n_rep

    ptsub = ny * nx * ndte / dt_s
    result = {
        "metric": "evp_gx1_gridpoint_subcycles_per_s",
        "value": round(ptsub, 1),
        "unit": "pt*subcycle/s",
        "vs_baseline": round(ptsub / REF_PROXY_PTSUB_PER_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
