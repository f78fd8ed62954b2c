"""Ice/ocean restoring (nudging) — regional-boundary and SST relaxation.

Equivalent of cicecore/cicedyn/infrastructure/ice_restoring.F90
(`ice_restoring_init`, `restore_ice`/`restore_cells` interior nudging of
the ice state toward stored target fields in a zone along open boundaries
— the framework for regional/nested runs, ug_implementation.rst:455-510)
and the SST restoring of `ice_forcing` ocean data (`trestore` days,
forcing_nml `restore_ice`/`restore_ocn`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def boundary_zone_weight(grid, width: int = 3) -> jnp.ndarray:
    """Weight field: 1 at open (non-cyclic) domain boundaries decaying
    linearly to 0 over `width` cells (restore_cells semantics)."""
    ny, nx = grid.shape
    w = np.zeros((ny, nx))
    ramp = np.linspace(1.0, 0.0, width + 1)[:-1]
    if grid.bc.ns in ("open", "closed"):
        for k in range(width):
            w[k, :] = np.maximum(w[k, :], ramp[k])
            w[ny - 1 - k, :] = np.maximum(w[ny - 1 - k, :], ramp[k])
    if grid.bc.ew in ("open", "closed"):
        for k in range(width):
            w[:, k] = np.maximum(w[:, k], ramp[k])
            w[:, nx - 1 - k] = np.maximum(w[:, nx - 1 - k], ramp[k])
    return jnp.asarray(w * np.asarray(grid.hm))


def make_restore_target(cfg, state):
    """Boundary-restore data (ice_HaloRestore_init, ice_restoring.F90:79):
    the full category state + every tracer. Default source is the run's
    initial state; a stored snapshot (restart format, any backend) plugs in
    via forcing.ice_data_file — the regional/nested-run flow where the
    boundary data comes from a parent run's output."""
    src = state
    path = getattr(cfg.forcing, "ice_data_file", "")
    if path:
        from ..io.restart import read_restart
        src, _ = read_restart(path, state)
    return dict(aicen=src.aicen, vicen=src.vicen, vsnon=src.vsnon,
                trcrn={k: v for k, v in src.trcrn.items()})


def restore_ice(cfg, grid, state, target, dt: float, zone=None):
    """Relax the full boundary-zone ice state toward `target`
    (ice_HaloRestore, ice_restoring.F90:319): aicen/vicen/vsnon and ALL
    tracers nudge with timescale trestore days; trestore=0 replaces the
    zone outright each step (the reference's ctime==0 branch). `target`
    may be the legacy (aicen, vicen, vsnon) triple or the full dict from
    make_restore_target."""
    if zone is None:
        zone = boundary_zone_weight(grid)
    if isinstance(target, (tuple, list)):
        target = dict(aicen=target[0], vicen=target[1], vsnon=target[2],
                      trcrn={})
    tres = cfg.forcing.trestore
    if tres <= 0:
        c = zone[None] * 1.0            # outright replacement in the zone
    else:
        tau = tres * 86400.0
        c = jnp.clip(dt / tau, 0.0, 1.0) * zone[None]
    nudge = lambda cur, tgt: cur + c * (tgt - cur)
    trcrn = dict(state.trcrn)
    for k, tgt in target["trcrn"].items():
        cur = trcrn[k]
        cc = c if cur.ndim == 3 else c[:, None]     # (ncat,L,ny,nx) tracers
        trcrn[k] = cur + cc * (tgt - cur)
    return state.replace(
        aicen=nudge(state.aicen, target["aicen"]),
        vicen=nudge(state.vicen, target["vicen"]),
        vsnon=nudge(state.vsnon, target["vsnon"]),
        trcrn=trcrn)


def restore_sst(cfg, state, sst_data, dt: float):
    """Global SST relaxation toward the data SST (reference ocean
    restoring in get_forcing_ocn; trestore days; trestore=0 -> replace)."""
    if cfg.forcing.trestore <= 0:
        return state.replace(sst=sst_data)
    tau = cfg.forcing.trestore * 86400.0
    c = jnp.clip(dt / tau, 0.0, 1.0)
    return state.replace(sst=state.sst + c * (sst_data - state.sst))
