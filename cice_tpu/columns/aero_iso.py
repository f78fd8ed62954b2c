"""Aerosol and water-isotope tracers in snow and ice.

Equivalent of the Icepack aerosol/isotope pack the reference consumes
(`icepack_aerosol`/`icepack_isotope` inside icepack_step_therm1;
tracer_nml `tr_aero`/`tr_iso`, n_aero/n_iso in ice_domain_size;
deposition defaults `faero_default`/`fiso_default` in
cicecore/cicedyn/general/ice_forcing_bgc.F90:726). Icepack source not
vendored; written from the documented behavior: atmospheric deposition
into the snow/ice surface, layer-resolved storage (surface + interior
strata for both snow and ice), meltwater scavenging to the ocean with
per-species scavenging ratios, and snow-to-ice transfer on snow-ice
formation.

Tracer layout (matching the registry in model/state.py):
  aerosno (ncat, 2*n_aero, ny, nx)  — kg/m^2 in [snow SSL, snow int] per species
  aeroice (ncat, 2*n_aero, ny, nx)  — kg/m^2 in [ice SSL, ice int]
  isosno / isoice (ncat, n_iso, ny, nx) — kg/m^2 water-isotope mass
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as cst

# scavenging ratios per aerosol species (fraction of layer burden removed
# per unit fractional melt; icepack kscav defaults: BC, BC, dust x4)
KSCAV = (0.03, 0.20, 0.02, 0.02, 0.01, 0.01)

# default deposition rates (kg/m^2/s) for standalone runs
# (faero_default ice_forcing_bgc.F90)
FAERO_DEFAULT = (1.0e-12, 1.0e-13, 1.0e-11)

# isotope fractionation factors at deposition (HDO, H218O vs H216O)
ALPHA_DEP = (1.0, 0.98, 0.985)


def step_aerosols(cfg, dt, *, aicen, vicen, vsnon, aerosno, aeroice,
                  melts, meltt, snoice, fsnow, faero_atm=None):
    """One aerosol step for all species/categories. melts/meltt: snow/ice
    melt (m); snoice: snow-ice formation (m). Returns (aerosno, aeroice,
    faero_ocn) with faero_ocn (n_aero, ny, nx) flux to ocean (kg/m^2/s)."""
    n_aero = cfg.domain.n_aero
    if n_aero == 0:
        return aerosno, aeroice, jnp.zeros((0,) + aicen.shape[1:])
    mask = aicen > cst.puny
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    hi = jnp.where(mask, vicen / jnp.maximum(aicen, cst.puny), 0.0)

    sn = aerosno
    ic = aeroice
    faero_ocn = []
    for a in range(n_aero):
        dep = (faero_atm[a] if faero_atm is not None
               else FAERO_DEFAULT[min(a, len(FAERO_DEFAULT) - 1)])
        kscav = KSCAV[min(a, len(KSCAV) - 1)]
        i_ssl, i_int = 2 * a, 2 * a + 1
        # deposition into the snow SSL (bare ice: into ice SSL)
        has_snow = hs > cst.puny
        dsn = jnp.where(mask & has_snow, dep * dt, 0.0)
        dic = jnp.where(mask & ~has_snow, dep * dt, 0.0)
        sn_ssl = sn[:, i_ssl] + dsn
        ic_ssl = ic[:, i_ssl] + dic
        sn_int = sn[:, i_int]
        ic_int = ic[:, i_int]
        # meltwater scavenging: fractional melt of snow / top ice removes
        # kscav * burden fraction to the ocean
        fmelt_s = jnp.clip(melts / jnp.maximum(hs, 0.05), 0.0, 1.0)
        fmelt_i = jnp.clip(meltt / jnp.maximum(hi, 0.05), 0.0, 1.0)
        rm_s = kscav * fmelt_s * (sn_ssl + sn_int)
        rm_i = kscav * fmelt_i * (ic_ssl + ic_int)
        tot_s = jnp.maximum(sn_ssl + sn_int, cst.puny)
        sn_ssl = sn_ssl - rm_s * sn_ssl / tot_s
        sn_int = sn_int - rm_s * sn_int / tot_s
        tot_i = jnp.maximum(ic_ssl + ic_int, cst.puny)
        ic_ssl = ic_ssl - rm_i * ic_ssl / tot_i
        ic_int = ic_int - rm_i * ic_int / tot_i
        # snow-ice formation transfers snow interior burden into ice SSL
        fsi = jnp.clip(snoice / jnp.maximum(hs, 0.05), 0.0, 1.0)
        xfer = fsi * sn_int
        sn_int = sn_int - xfer
        ic_ssl = ic_ssl + xfer
        sn = sn.at[:, i_ssl].set(jnp.where(mask, sn_ssl, sn[:, i_ssl]))
        sn = sn.at[:, i_int].set(jnp.where(mask, sn_int, sn[:, i_int]))
        ic = ic.at[:, i_ssl].set(jnp.where(mask, ic_ssl, ic[:, i_ssl]))
        ic = ic.at[:, i_int].set(jnp.where(mask, ic_int, ic[:, i_int]))
        faero_ocn.append(jnp.sum(jnp.where(mask, aicen * (rm_s + rm_i),
                                           0.0), axis=0) / dt)
    return sn, ic, jnp.stack(faero_ocn)


def step_isotopes(cfg, dt, *, aicen, vsnon, isosno, isoice, fsnow, melts,
                  snoice, Qref_iso=None, fiso_atm=None):
    """Water-isotope budget: snowfall deposition (with species
    fractionation; or coupler-imported per-species rates `fiso_atm` —
    Faxa_snow_wiso, ice_import_export.F90:757-762), melt release to the
    ocean, snow-ice transfer.  Returns (isosno, isoice, fiso_ocn)."""
    n_iso = cfg.domain.n_iso
    if n_iso == 0:
        return isosno, isoice, jnp.zeros((0,) + aicen.shape[1:])
    mask = aicen > cst.puny
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    sn = isosno
    ic = isoice
    fiso_ocn = []
    for k in range(n_iso):
        alpha = ALPHA_DEP[min(k, len(ALPHA_DEP) - 1)]
        if fiso_atm is not None and fiso_atm.shape[0] > k:
            dep = jnp.where(mask, fiso_atm[k] * dt, 0.0)
        else:
            dep = jnp.where(mask, alpha * fsnow * dt, 0.0)
        s = sn[:, k] + dep
        i = ic[:, k]
        fmelt_s = jnp.clip(melts / jnp.maximum(hs, 0.05), 0.0, 1.0)
        rel = fmelt_s * s
        s = s - rel
        fsi = jnp.clip(snoice / jnp.maximum(hs, 0.05), 0.0, 1.0)
        xfer = fsi * s
        s = s - xfer
        i = i + xfer
        sn = sn.at[:, k].set(jnp.where(mask, s, sn[:, k]))
        ic = ic.at[:, k].set(jnp.where(mask, i, ic[:, k]))
        fiso_ocn.append(jnp.sum(jnp.where(mask, aicen * rel, 0.0),
                                axis=0) / dt)
    return sn, ic, jnp.stack(fiso_ocn)
