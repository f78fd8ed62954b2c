"""Slab ocean mixed layer.

Equivalent of the Icepack `icepack_ocn_mixed_layer` surface (call site
ice_step_mod.F90:1485-1630 `ocean_mixed_layer`): evolve SST from the net
surface heat fluxes over a slab of depth hmix, compute the freezing/melting
potential frzmlt, and the ocean-side turbulent fluxes over open water.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as cst
from .atmo import atmo_boundary_layer

FRZMLT_MAX = 1000.0   # bound on freezing/melting potential (W/m^2)


def freezing_temperature(sss, option: str = "mushy"):
    """Tf(SSS) (degC). 'minus1p8': constant; 'linear_salt': -depressT*S;
    'mushy': liquidus (linear approximation of the mushy liquidus)."""
    if option == "minus1p8":
        return jnp.full_like(sss, -1.8)
    if option == "linear_salt":
        return -cst.depressT * sss
    if option == "constant":
        return jnp.full_like(sss, -1.8)
    # 'mushy': the piecewise-linear mushy liquidus (ktherm=2 consistent)
    from .mushy import liquidus_temperature
    return liquidus_temperature(sss)


def ocean_mixed_layer(dt, *, sst, Tf, hmix, qdp, frzmlt_old,
                      aice, fhocn_ice, fswthru_ice, fresh_unused,
                      flw, swvdr, swvdf, swidr, swidf,
                      potT, Qa, rhoa, wind, uatm, vatm, zlvl):
    """Advance the slab-ocean SST and compute frzmlt (W/m^2).

    fhocn_ice: net heat from ice to ocean (cell mean); fswthru_ice: SW
    through ice into the ocean. Open-water fluxes computed with the
    similarity scheme over water.
    """
    # open-water turbulent + radiative fluxes
    co = atmo_boundary_layer(sst, potT, uatm, vatm, wind, zlvl, Qa, rhoa,
                             over="ocn")
    TsfK = sst + cst.Tffresh
    from .atmo import saturated_specific_humidity_ocn
    qsfc = saturated_specific_humidity_ocn(TsfK, rhoa)
    fsens_ocn = co.shcoef * (potT - TsfK)
    flat_ocn = co.lhcoef * (Qa - qsfc)
    flwout_ocn = -cst.stefan_boltzmann * TsfK ** 4
    swabs_ocn = ((swvdr + swidr) * (1.0 - cst.albocn) +
                 (swvdf + swidf) * (1.0 - cst.albocn))
    fq_ow = fsens_ocn + flat_ocn + flwout_ocn + flw + swabs_ocn

    aice0 = jnp.clip(1.0 - aice, 0.0, 1.0)
    fnet = aice0 * fq_ow + fhocn_ice + fswthru_ice + qdp

    cph = cst.cprho * jnp.maximum(hmix, 1.0)
    sst_new = sst + fnet * dt / cph

    # freezing/melting potential: energy to bring the slab to Tf in one step
    frzmlt = (Tf - sst_new) * cph / dt
    frzmlt = jnp.clip(frzmlt, -FRZMLT_MAX, FRZMLT_MAX)
    # when freezing, reset SST to Tf (the latent heat comes from new ice)
    sst_new = jnp.maximum(sst_new, Tf)
    return sst_new, frzmlt
