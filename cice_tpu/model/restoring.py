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


def restore_ice(cfg, grid, state, target, dt: float, zone=None):
    """Relax aicen/vicen/vsnon toward `target` (a (aicen, vicen, vsnon)
    triple) inside the boundary zone with timescale trestore days."""
    if zone is None:
        zone = boundary_zone_weight(grid)
    tau = max(cfg.forcing.trestore, 1e-6) * 86400.0
    c = jnp.clip(dt / tau, 0.0, 1.0) * zone[None]
    ta, tv, ts = target
    return state.replace(
        aicen=state.aicen + c * (ta - state.aicen),
        vicen=state.vicen + c * (tv - state.vicen),
        vsnon=state.vsnon + c * (ts - state.vsnon))


def restore_sst(cfg, state, sst_data, dt: float):
    """Global SST relaxation toward the data SST (reference ocean
    restoring in get_forcing_ocn; trestore days; trestore=0 -> replace)."""
    if cfg.forcing.trestore <= 0:
        return state.replace(sst=sst_data)
    tau = cfg.forcing.trestore * 86400.0
    c = jnp.clip(dt / tau, 0.0, 1.0)
    return state.replace(sst=state.sst + c * (sst_data - state.sst))
