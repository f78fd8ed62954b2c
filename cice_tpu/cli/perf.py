"""Performance suite: the perf_suite.ts analogue (SURVEY §6).

The reference perf suite (configuration/scripts/tests/perf_suite.ts) sweeps
block sizes at one task, then MPI strong scaling, then thread scaling, and
compares the TimeLoop/Dynamics timers against a pinned anchor run. Under XLA
there are no blocks or threads to sweep; the analogous axes are

  sizes  — grid-size sweep at one device (the block-size sweep analogue:
           measures how kernel/dispatch overheads amortize with tile size),
  strong — fixed gx1-sized grid across growing ("Y","X") device meshes,
  weak   — fixed per-device tile across growing meshes (BASELINE.json's
           >90% weak-scaling-efficiency target).

Each row times the full B-grid EVP dynamics solve (stress + momentum +
halo semantics, ndte subcycles) — the scaling-critical hot loop (SURVEY
§3.3) — and prints one JSON line; scaling rows add parallel efficiency
against the 1-device anchor. On a CPU backend the harness exercises the
sharded compilation path (collective-permute halos) rather than real ICI
bandwidth; run on a pod slice for hardware numbers.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _setup(ny, nx, ndte, dtype=jnp.float32):
    from ..config import Config
    from ..core.grid import rectgrid
    from ..dynamics.common import dyn_prep, evp_params
    from ..columns.ridging import ice_strength

    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": ndte, "dynamics.coriolis": "latitude"})
    grid = rectgrid(nx, ny, kmt_type="none", dtype=dtype)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros(grid.shape, dtype)
    aice = jnp.clip(0.5 + 0.5 * jax.random.uniform(key, grid.shape,
                                                   dtype=dtype), 0.0, 1.0)
    vice = aice * 2.0
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=z + 0.1, strairyT=z + 0.05,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength(jnp.stack([aice / 5] * 5),
                            jnp.stack([vice / 5] * 5), aice, vice,
                            cfg.dynamics)
    z3 = jnp.zeros((4,) + grid.shape, dtype)
    return grid, p, prep, strength, z3, z


def evp_throughput(ny, nx, ndte=120, mesh=None, n_rep=5, algo="gspmd",
                   wide_k=8):
    """Grid-point·subcycles/s of the EVP solve; optionally sharded over an
    existing ("Y","X") mesh. algo='gspmd' runs the global-array code (XLA
    inserts one collective-permute per subcycle); algo='wide_halo' runs the
    explicit shard_map solver (parallel/evp_wide.py: one exchange per
    wide_k subcycles — the maskhalo/bundling analogue axis of the reference
    perf suite)."""
    from ..dynamics.evp import evp_solve
    from ..parallel.evp_wide import evp_solve_wide
    from ..parallel.mesh import shard_state

    grid, p, prep, strength, z3, z = _setup(ny, nx, ndte)
    if mesh is not None:
        grid = shard_state(mesh, grid)
        prep = shard_state(mesh, prep)
        strength, z3, z = shard_state(mesh, (strength, z3, z))
    if algo == "wide_halo" and mesh is not None:
        solve = jax.jit(lambda pr, st, u0, v0: evp_solve_wide(
            grid, p, pr, st, z3, z3, z3, uocn=u0, vocn=v0, mesh=mesh,
            k_fuse=wide_k))
    else:
        solve = jax.jit(lambda pr, st, u0, v0: evp_solve(
            grid, p, pr, st, z3, z3, z3, uocn=u0, vocn=v0))

    def run():
        out = solve(prep, strength, z, z)
        jax.block_until_ready(out[0])

    run()                                 # compile
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return ny * nx * ndte / best, best


def run_perf(sizes=((192, 160), (384, 320), (768, 640)), ndte=120,
             mesh_devices=(1, 2, 4, 8), weak_tile=(192, 160), out=print,
             virtual=False):
    """Run the three sweeps; returns the list of result rows. With
    virtual=True (or when the attached backend has fewer devices than the
    sweep asks for) the scaling sweeps re-initialize JAX with a forced
    N-device CPU backend — compilation-path validation, not hardware
    bandwidth."""
    from ..parallel.mesh import make_mesh
    want = max(mesh_devices)
    if virtual or len(jax.devices()) < want:
        from jax.extend import backend as _backend
        _backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", int(want))
        jax.config.update("jax_platforms", "cpu")
    rows = []

    def emit(row):
        rows.append(row)
        out(json.dumps(row))

    for ny, nx in sizes:
        tput, t = evp_throughput(ny, nx, ndte)
        emit({"sweep": "sizes", "grid": f"{ny}x{nx}", "devices": 1,
              "ndte": ndte, "s_per_dynstep": round(t, 4),
              "Mptsub_s": round(tput / 1e6, 1)})

    ndev_avail = len(jax.devices())
    anchor = None
    ny, nx = sizes[min(1, len(sizes) - 1)]
    for n in [d for d in mesh_devices if d <= ndev_avail]:
        mesh = make_mesh(devices=jax.devices()[:n])
        for algo in (("gspmd",) if n == 1 else ("gspmd", "wide_halo")):
            tput, t = evp_throughput(ny, nx, ndte, mesh=mesh, algo=algo)
            anchor = anchor or tput          # 1-device GSPMD anchor
            emit({"sweep": "strong", "algo": algo, "grid": f"{ny}x{nx}",
                  "devices": n, "mesh": "x".join(map(str, mesh.devices.shape)),
                  "s_per_dynstep": round(t, 4),
                  "Mptsub_s": round(tput / 1e6, 1),
                  "efficiency": round(tput / (anchor * n), 3)})

    ty, tx = weak_tile
    anchor = None
    for n in [d for d in mesh_devices if d <= ndev_avail]:
        mesh = make_mesh(devices=jax.devices()[:n])
        my, mx = mesh.devices.shape
        for algo in (("gspmd",) if n == 1 else ("gspmd", "wide_halo")):
            tput, t = evp_throughput(ty * my, tx * mx, ndte, mesh=mesh,
                                     algo=algo)
            anchor = anchor or tput
            emit({"sweep": "weak", "algo": algo,
                  "grid": f"{ty * my}x{tx * mx}", "devices": n,
                  "mesh": f"{my}x{mx}", "s_per_dynstep": round(t, 4),
                  "Mptsub_s": round(tput / 1e6, 1),
                  "efficiency": round(tput / (anchor * n), 3)})
    return rows
