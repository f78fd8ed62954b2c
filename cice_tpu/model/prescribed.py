"""Prescribed-ice mode: force ice concentration from data, thermo-only.

Equivalent of drivers/nuopc/cmeps/ice_prescribed_mod.F90 (CESM "prescribed
ice" for AMIP-style runs): a monthly ice-coverage dataset (or the coupler)
supplies cell ice fraction; the model places that area in the category
holding a prescribed climatological thickness (2 m NH / 1 m SH), keeps
thermodynamics running (fluxes to the atmosphere are computed normally),
and disables dynamics/ridging/transport (the reference sets
`prescribed_ice` and skips step_dyn_* in CICE_RunMod).

Usage: set `setup.prescribed_ice=True`; the driver calls
`prescribe_ice_state` after forcing each step with aice_data from the
`ice_cov` forcing stream (or any (ny, nx) array).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..core.grid import Grid
from .state import State

HIN_NH = 2.0     # prescribed ice thickness, northern hemisphere (m)
HIN_SH = 1.0     # southern hemisphere (m)
HSN_FRAC = 0.2   # snow depth as fraction of ice thickness


def prescribe_ice_state(cfg, grid: Grid, state: State, aice_data,
                        hin_max) -> State:
    """Overwrite the ITD state so cell concentration matches `aice_data`.

    The prescribed area goes to the single category whose bounds contain
    the hemispheric climatological thickness (reference
    ice_prescribed_mod.F90 `ice_prescribed_phys`); enthalpy/temperature
    tracers are retained where ice persists and initialized cold where ice
    appears.
    """
    ncat = cfg.domain.ncat
    aice_data = jnp.clip(jnp.asarray(aice_data, state.aicen.dtype), 0.0, 1.0)
    aice_data = aice_data * grid.hm

    hin = jnp.where(grid.TLAT > 0.0, HIN_NH, HIN_SH)
    bounds = np.asarray(hin_max)          # (ncat+1,) category bounds
    # one-hot category selector for the prescribed thickness
    sel = []
    for n in range(ncat):
        lo, hi = float(bounds[n]), float(bounds[n + 1])
        sel.append((hin >= lo) & (hin < hi))
    sel = jnp.stack(sel)                   # (ncat, ny, nx) bool, one true

    aicen = jnp.where(sel, aice_data[None], 0.0)
    vicen = aicen * hin[None]
    vsnon = jnp.where(hin[None] > cst.puny, aicen * hin[None] * HSN_FRAC, 0.0)

    # keep thermodynamic tracers where the category already had ice; where
    # ice appears from data, start it at freezing with cold-ice enthalpy
    trcrn = dict(state.trcrn)
    newice = (aicen > cst.puny) & ~(state.aicen > cst.puny)
    Tf = -1.8
    trcrn["Tsfcn"] = jnp.where(newice, Tf, trcrn["Tsfcn"])
    qcold_i = -cst.rhoi * cst.Lfresh
    qcold_s = -cst.rhos * cst.Lfresh
    trcrn["qice"] = jnp.where(newice[:, None], qcold_i, trcrn["qice"])
    trcrn["qsno"] = jnp.where(newice[:, None], qcold_s, trcrn["qsno"])
    if "sice" in trcrn:
        trcrn["sice"] = jnp.where(newice[:, None], 5.0, trcrn["sice"])

    return state.replace(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                         uvel=jnp.zeros_like(state.uvel),
                         vvel=jnp.zeros_like(state.vvel))
