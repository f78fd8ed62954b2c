"""Biogeochemistry: skeletal-layer (bottom-layer) ice algae + nutrients.

Equivalent of the reference's BGC coupling surface (`icepack_biogeochemistry`
call in ice_step_mod.F90:1634-1782, `init_zbgc`/`input_zbgc` zbgc_nml in
shared/ice_init_column.F90, forcing defaults ice_forcing_bgc.F90). The
reference offers two BGC frameworks: the vertically-resolved `z_tracers`
brine-network model and the simpler skeletal-layer model (`skl_bgc`) where
biology lives in the bottom ~3 cm of the ice. This module implements the
skeletal-layer model from the published science (Jin et al. 2006; Deal et
al. 2011): algal growth limited by light and nitrate with temperature
dependence, linear mortality/grazing, nutrient uptake/remineralization,
and ice-ocean exchange through a molecular-sublayer piston velocity.

Tracers per category (ny, nx): bgc_N (algal N, mmol N/m^2 of skeletal
layer), bgc_Nit (nitrate, mmol N/m^3 in the skeletal layer).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst

SK_L = 0.03            # skeletal layer thickness (m)
CHLABS = 0.03          # light attenuation per algal biomass (1/(mmol/m^2)-ish)


class BgcOut(NamedTuple):
    bgc_N: jnp.ndarray
    bgc_Nit: jnp.ndarray
    flux_NO3_ocn: jnp.ndarray   # net nitrate flux to ocean (mmol/m^2/s)
    grow_net: jnp.ndarray       # net specific growth (1/s) diagnostic


def step_bgc_skl(cfg_bgc, dt, *, aicen, vicen, bgc_N, bgc_Nit, fswthru,
                 Tbot, meltb, congel, nit_ocn):
    """One skeletal-layer BGC step, dense over (ncat, ny, nx).

    fswthru: SW reaching the ice bottom (W/m^2, cell-mean); Tbot (degC);
    meltb/congel: bottom melt/growth this step (m); nit_ocn: mixed-layer
    nitrate (mmol/m^3).
    """
    mask = aicen > cst.puny

    # --- light & nutrient limitation ------------------------------------
    # PAR at the skeletal layer ~ 0.45 * fswthru; self-shading by biomass
    par = 0.45 * jnp.maximum(fswthru, 0.0) * jnp.exp(-CHLABS * bgc_N)
    L_lim = par / (par + cfg_bgc.chlabs_par_half)
    N_lim = bgc_Nit / (bgc_Nit + cfg_bgc.K_Nit)
    # temperature dependence (Eppley-like, anchored at Tbot<=0)
    Tfac = jnp.exp(0.0633 * jnp.minimum(Tbot, 0.0))

    mu = cfg_bgc.mu_max / cst.secday * jnp.minimum(L_lim, N_lim) * Tfac
    grow = mu * bgc_N * dt                                # mmol N/m^2
    # nutrient supply limit: cannot take more N than the layer holds
    grow = jnp.minimum(grow, 0.9 * bgc_Nit * SK_L)

    # --- losses: grazing + mortality, fraction remineralized in place ---
    loss = (cfg_bgc.fr_graze + cfg_bgc.mort_pre) / cst.secday * bgc_N * dt
    loss = jnp.minimum(loss, bgc_N + grow)
    remin = cfg_bgc.fr_resp * loss

    N_new = bgc_N + grow - loss
    Nit_new = bgc_Nit + (remin - grow) / SK_L

    # --- bottom melt releases biomass; growth dilutes nutrients ---------
    frel = jnp.clip(meltb / SK_L, 0.0, 1.0)
    released = frel * N_new
    N_new = N_new - released

    # --- ice-ocean nutrient exchange (molecular sublayer piston) --------
    pv = cfg_bgc.pv0 / cst.secday                         # m/s
    dNit = pv * (nit_ocn - Nit_new) * dt / SK_L
    Nit_new = Nit_new + dNit

    N_new = jnp.where(mask, jnp.maximum(N_new, 0.0), 0.0)
    Nit_new = jnp.where(mask, jnp.maximum(Nit_new, 0.0),
                        jnp.broadcast_to(nit_ocn, bgc_Nit.shape))
    flux = jnp.sum(jnp.where(mask, aicen * (released - dNit * SK_L), 0.0),
                   axis=0) / dt
    return BgcOut(bgc_N=N_new, bgc_Nit=Nit_new, flux_NO3_ocn=flux,
                  grow_net=jnp.where(mask, mu, 0.0))
