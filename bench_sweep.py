#!/usr/bin/env python
"""Sweep the fused EVP Pallas kernel (tile_y, k_fuse) vs the XLA loop on the
current backend. Dev tool feeding the defaults in kernels/evp_pallas.py."""

import json
import sys
import time

import jax
import jax.numpy as jnp

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params
from cice_tpu.columns.ridging import ice_strength
from cice_tpu.dynamics.evp import evp_solve
from cice_tpu.kernels.evp_pallas import evp_solve_fused


def setup(ny=384, nx=320, ndte=120):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": ndte, "dynamics.coriolis": "latitude"})
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
    return grid, p, prep, strength, z3, z


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / n


def main():
    ny, nx, ndte = 384, 320, 120
    grid, p, prep, strength, z3, z = setup(ny, nx, ndte)
    work = ny * nx * ndte

    xla = jax.jit(lambda pr, st: evp_solve(grid, p, pr, st, z3, z3, z3,
                                           uocn=z, vocn=z))
    dt = timeit(xla, prep, strength)
    print(json.dumps({"path": "xla", "ms": round(dt * 1e3, 2),
                      "Mptsub_s": round(work / dt / 1e6, 1)}))

    for k_fuse in (4, 8, 15, 24, 30):
        for tile_y in (16, 32, 64, 128, 192):
            try:
                fused = jax.jit(lambda pr, st, kf=k_fuse, ty=tile_y:
                                evp_solve_fused(grid, p, pr, st, z3, z3, z3,
                                                uocn=z, vocn=z, k_fuse=kf,
                                                tile_y=ty))
                dt = timeit(fused, prep, strength)
                print(json.dumps({"path": "pallas", "k": k_fuse,
                                  "tile_y": tile_y,
                                  "ms": round(dt * 1e3, 2),
                                  "Mptsub_s": round(work / dt / 1e6, 1)}))
            except Exception as e:
                print(json.dumps({"path": "pallas", "k": k_fuse,
                                  "tile_y": tile_y,
                                  "error": str(e)[:200]}))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
