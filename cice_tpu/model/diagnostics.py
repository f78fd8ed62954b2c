"""Runtime diagnostics: hemispheric totals, conservation, stability checks.

TPU-native analogue of cicecore/cicedyn/analysis/ice_diagnostics.F90
(`runtime_diags`:115 — area/extent/volume/KE sums per hemisphere printed every
diagfreq; `check_umax` instability warning; `diagnostic_abort`). Sums are
single fused jnp reductions (lowering to psum trees on a mesh); the dict of
scalars is the machine-readable equivalent of the reference's log block that
`comparelog.csh` diffs — our regression tests compare these dicts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid
from .state import State


def runtime_diags(grid: Grid, state: State) -> Dict[str, jnp.ndarray]:
    """Global & hemispheric diagnostics (all scalars, device-resident)."""
    aice = state.aice
    vice = state.vice
    vsno = state.vsno
    tarea = grid.tarea * grid.hm
    nh = grid.TLAT > 0.0
    sh = ~nh

    def hemi(field, mask):
        return jnp.sum(field * tarea * mask)

    ext_mask = aice > 0.15  # ice extent definition (15% concentration)
    # kinetic energy proxy: 0.5 * integral of |u|^2 dA at U points
    uarea = grid.uarea * grid.uvm
    ke = 0.5 * jnp.sum((state.uvel ** 2 + state.vvel ** 2) * uarea)

    d = {
        "area_nh": hemi(aice, nh), "area_sh": hemi(aice, sh),
        "extent_nh": hemi(ext_mask.astype(aice.dtype), nh),
        "extent_sh": hemi(ext_mask.astype(aice.dtype), sh),
        "volume_nh": hemi(vice, nh), "volume_sh": hemi(vice, sh),
        "snow_nh": hemi(vsno, nh), "snow_sh": hemi(vsno, sh),
        "ke": ke,
        "umax": jnp.max(jnp.sqrt(state.uvel ** 2 + state.vvel ** 2)),
        "aice_max": jnp.max(aice),
        "hmax": jnp.max(jnp.where(aice > cst.puny,
                                  vice / jnp.maximum(aice, cst.puny), 0.0)),
        "sst_mean": jnp.sum(state.sst * tarea) / jnp.maximum(jnp.sum(tarea), 1.0),
    }
    return d


def total_energy(grid: Grid, state: State) -> jnp.ndarray:
    """Total ice+snow enthalpy (J) — conservation oracle
    (reference conserv_check global sums)."""
    qice = state.trcrn["qice"]          # (ncat, nilyr, ny, nx)
    qsno = state.trcrn["qsno"]
    nilyr = qice.shape[1]
    nslyr = qsno.shape[1]
    w = grid.tarea * grid.hm
    e_ice = jnp.sum(qice.mean(axis=1) * state.vicen, axis=0)
    e_sno = jnp.sum(qsno.mean(axis=1) * state.vsnon, axis=0)
    return jnp.sum((e_ice + e_sno) * w)


def total_water_mass(grid: Grid, state: State) -> jnp.ndarray:
    """Total ice+snow water mass (kg) — fresh-water conservation oracle."""
    w = grid.tarea * grid.hm
    return jnp.sum((cst.rhoi * state.vice + cst.rhos * state.vsno) * w)


def check_state(state: State, umax_stab: float = 1.0) -> Dict[str, jnp.ndarray]:
    """NaN/instability watchdog (reference check_umax + diagnostic_abort
    philosophy, SURVEY.md §5.3): cheap device-side flags the driver can poll
    to trigger early checkpoint + abort."""
    umax = jnp.max(jnp.sqrt(state.uvel ** 2 + state.vvel ** 2))
    bad = (~jnp.isfinite(state.aicen).all()) | (~jnp.isfinite(state.vicen).all()) \
        | (~jnp.isfinite(state.uvel).all()) | (~jnp.isfinite(state.sst).all())
    return {"umax": umax, "unstable": umax > umax_stab, "nonfinite": bad}
