"""Brine height tracer (tr_brine): dynamic brine surface inside the ice.

Equivalent of the reference's hbrine subsystem: `icepack_init_hbrine` /
`update_hbrine` consumed through `icepack_intfc` (call sites enumerated in
SURVEY.md §2.9; tracer `fbri` listed in the trcrn inventory, init in
`shared/ice_init_column.F90` `init_hbrine`, restart group `restart_hbrine`
in `shared/ice_restart_column.F90`, diagnostics `hbrine_diags` in
`analysis/ice_diagnostics_bgc.F90`). The science follows the published
brine-height model (Jeffery, Hunke & Elliott 2011, JGR): the brine surface
`hbr` (measured upward from the ice bottom) is carried as the ratio tracer
`fbri = hbr/hin` (volume-dependent, so transport conserves brine volume),
and evolves by

  1. growth/melt pre-adjustment: bottom congelation adds fully to `hbr`
     (new ice entrains brine at its formation porosity); bottom melt removes
     ice *below* the brine surface; top melt adds a meltwater fraction.
  2. Darcy exchange with the ocean toward the hydrostatic sea level
     `h_ocn = (rhoi*hin + rhos*hsn) / rhow` through the ice permeability
     `perm = 3e-8 * phi_min^3` (cubic law on the minimum liquid fraction,
     the bottleneck layer):  dhbr/dt = -perm*rhow*g*(hbr-h_ocn)/(mu*hbr).

All dense over (ncat, ny, nx); no per-point branching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst
from .mushy import liquid_fraction

GRAVIT = 9.80665        # m/s^2
VISC_DYN = 1.79e-3      # dynamic viscosity of brine (kg/m/s)
PERM_SCALE = 3.0e-8     # permeability prefactor (m^2), Golden et al. 2007
PHI_SNOW = 0.5          # snow porosity seen by flooding brine
FBRI_INIT = 1.0         # new ice forms fully brine-filled (fbri = 1)
FBRI_MIN = 0.1
FBRI_MAX = 1.2          # brine may flood above the ice surface into snow


class HbrineOut(NamedTuple):
    fbri: jnp.ndarray       # updated brine-height fraction (ncat, ny, nx)
    hbri: jnp.ndarray       # cell-mean brine height (ny, nx) diagnostic
    darcy_V: jnp.ndarray    # Darcy velocity, +up (ncat, ny, nx) (m/s)


def update_hbrine(dt, *, aicen, vicen, vsnon, fbri, qice, sice,
                  meltb, meltt, congel, frazil_n=None):
    """Advance the brine-height tracer one step.

    qice/sice: (ncat, nilyr, ny, nx) enthalpy & bulk salinity (for the
    liquid-fraction permeability); meltb/meltt/congel: per-category
    thickness changes this step (m, >=0).
    """
    mask = aicen > cst.puny
    am = jnp.maximum(aicen, cst.puny)
    hin = jnp.where(mask, vicen / am, 0.0)
    hsn = jnp.where(mask, vsnon / am, 0.0)

    hbr = jnp.clip(fbri, FBRI_MIN, FBRI_MAX) * hin

    # --- 1. growth/melt pre-adjustment ---------------------------------
    # bottom growth raises the column (brine surface rides up with the new
    # porous ice); bottom melt removes ice below the brine surface 1:1;
    # top melt percolates a fraction of meltwater into the brine network.
    hbr = hbr + congel - meltb + 0.5 * meltt
    if frazil_n is not None:
        hbr = hbr + frazil_n

    # --- 2. permeability from the bottleneck liquid fraction ------------
    from .mushy import temperature_mush
    nilyr = qice.shape[1]
    phi_min = None
    for k in range(nilyr):
        Sk = jnp.maximum(sice[:, k], cst.puny)
        Tk = temperature_mush(qice[:, k], Sk)
        phik = jnp.clip(liquid_fraction(jnp.minimum(Tk, -cst.puny), Sk),
                        0.0, 1.0)
        phi_min = phik if phi_min is None else jnp.minimum(phi_min, phik)
    perm = PERM_SCALE * phi_min ** 3

    # --- 3. Darcy relaxation toward hydrostatic sea level ---------------
    h_ocn = (cst.rhoi * hin + cst.rhos * hsn) / cst.rhow
    hbr_safe = jnp.maximum(hbr, cst.puny)
    darcy_V = -perm * cst.rhow * GRAVIT * (hbr - h_ocn) / (
        VISC_DYN * hbr_safe)
    # implicit-in-the-gap update (unconditionally stable relaxation):
    # dhbr/dt = -K (hbr - h_ocn), K = perm*rhow*g/(mu*hbr)
    K = perm * cst.rhow * GRAVIT / (VISC_DYN * hbr_safe)
    hbr = h_ocn + (hbr - h_ocn) * jnp.exp(-K * dt)

    hin_safe = jnp.maximum(hin, cst.puny)
    fbri_new = jnp.clip(hbr / hin_safe, FBRI_MIN, FBRI_MAX)
    fbri_new = jnp.where(mask, fbri_new, 0.0)
    # newly formed ice starts at fbri = 1
    newice = (~(fbri > cst.puny)) & mask
    fbri_new = jnp.where(newice, FBRI_INIT, fbri_new)

    hbri = jnp.sum(jnp.where(mask, aicen * fbri_new * hin, 0.0), axis=0)
    return HbrineOut(fbri=fbri_new, hbri=hbri,
                     darcy_V=jnp.where(mask, darcy_V, 0.0))
