"""ITD-coupled thermodynamics: frazil new-ice formation, lateral melt.

Equivalent of the Icepack `icepack_step_therm2` surface the reference calls
per grid point (ice_step_mod.F90:639-772): new ice growth in open water from
the freezing/melting potential, lateral melt, then the linear ITD remap /
rebin / cleanup (cice_tpu.columns.itd). Written from the published science
(Bitz et al. 2001 ITD model; Steele 1992 lateral melt) — the icepack source
is not vendored in the reference checkout.

Dense over (ncat, ny, nx); category loops unrolled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst
from .itd import cleanup_itd, linear_itd_remap, rebin, vicen_safe_h
from .thermo_vertical import bl99_salinity, enthalpy_ice, enthalpy_snow, melting_temps


class Therm2Out(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    trcrn: dict
    frazil: jnp.ndarray     # new frazil ice thickness formed (m)
    frz_onset: jnp.ndarray
    freshn_frazil: jnp.ndarray   # frazil part of freshn (update_ocn_f gating)
    fsaltn_frazil: jnp.ndarray
    fhocn: jnp.ndarray      # additional heat to ocean (W/m^2)
    freshn: jnp.ndarray     # additional fresh water (kg/m^2/s)
    fsaltn: jnp.ndarray     # additional salt (kg/m^2/s)
    meltl: jnp.ndarray      # lateral melt (m)
    dpnd_melt: jnp.ndarray  # pond water lost with laterally-melted ice (m
                            # per cell area; reference dpnd_melt,
                            # ice_history_pond.F90:572)


def add_new_ice(aicen, vicen, vsnon, trcrn, *, frzmlt, Tf, dt, hin_max,
                nilyr, registry, sss=None, sal_ref=None):
    """Frazil ice formation in open water (icepack add_new_ice semantics).

    frzmlt > 0 (W/m^2) freezes new ice of thickness >= hfrazilmin in the
    thinnest category, with enthalpy of new ice at the freezing temperature
    and initial salinity profile.  `trcrn` may be the tracer dict or the
    packed (ncat, NT, ny, nx) stack (therm2 packed chain) — category-0
    named rows are updated through the flat layout either way.
    """
    aice = jnp.sum(aicen, axis=0)
    aice0 = jnp.clip(1.0 - aice, 0.0, 1.0)

    # energy available for freezing (J/m^2): positive frzmlt only
    efrz = jnp.maximum(frzmlt, 0.0) * dt
    # enthalpy of new frazil ice (J/m^3) at Tf with reduced salinity
    salin = bl99_salinity(nilyr)
    Tm_mean = float(melting_temps(salin).mean())
    qfrz = enthalpy_ice(jnp.minimum(Tf, Tm_mean - 0.5), Tm_mean)
    # volume of new ice per unit cell area
    vfrz = efrz / jnp.maximum(-qfrz, 1.0)

    # thickness if spread over open water, floored at hfrazilmin
    ai0 = jnp.maximum(aice0, cst.puny)
    hnew = jnp.maximum(vfrz / ai0, cst.hfrazilmin)
    anew = jnp.minimum(vfrz / hnew, aice0)
    anew = jnp.where(vfrz > cst.puny, anew, 0.0)
    vnew = anew * hnew

    # merge into category 1 (reference: new ice goes to the thinnest cat)
    a0, v0 = aicen[0], vicen[0]
    atot = a0 + anew
    # merge tracers for category 1: area-weighted Tsfc etc.
    wa_old = jnp.where(atot > cst.puny, a0 / jnp.maximum(atot, cst.puny), 1.0)
    wa_new = 1.0 - wa_old
    vtot = v0 + vnew
    wv_old = jnp.where(vtot > cst.puny, v0 / jnp.maximum(vtot, cst.puny), 1.0)
    wv_new = 1.0 - wv_old

    packed_in = not isinstance(trcrn, dict)
    if packed_in:
        # work on the (NT, ny, nx) category-0 ROW, write it back once —
        # per-name updates on the full (ncat, NT, ny, nx) stack would
        # re-materialize the whole buffer per dynamic-update-slice
        from .itd import name_offsets
        off = name_offsets(registry)
        row0 = trcrn[0]

        def get0(name):
            o, n = off[name]
            sl = row0[o:o + n]
            return sl if n > 1 else sl[0]
        has = off.__contains__
    else:
        trcrn = dict(trcrn)
        row0 = None

        def get0(name):
            return trcrn[name][0]
        has = trcrn.__contains__

    def set0(name, val0):
        nonlocal trcrn, row0
        if not has(name):
            return
        if packed_in:
            o, n = off[name]
            v = val0 if getattr(val0, "ndim", 2) == 3 else val0[None]
            row0 = row0.at[o:o + n].set(v)
        else:
            trcrn[name] = trcrn[name].at[0].set(val0)

    t = get0("Tsfcn")
    set0("Tsfcn", t * wa_old + Tf * wa_new)
    q0 = get0("qice")
    set0("qice", q0 * wv_old[None] + qfrz * wv_new[None])
    s0 = get0("sice")
    prof = jnp.asarray(salin, s0.dtype)[:, None, None] * jnp.ones_like(s0)
    set0("sice", s0 * wv_old[None] + prof * wv_new[None])
    if has("FY"):
        set0("FY", get0("FY") * wa_old + 1.0 * wa_new)
    if has("alvl"):
        set0("alvl", get0("alvl") * wa_old + 1.0 * wa_new)  # level ice
    if has("vlvl"):
        set0("vlvl", get0("vlvl") * wv_old + 1.0 * wv_new)
    # iage: new ice has age 0 -> weighted dilution happens automatically
    if has("iage"):
        set0("iage", get0("iage") * wv_old)
    if has("fbri"):
        set0("fbri", get0("fbri") * wv_old + 1.0 * wv_new)  # brine-full

    if packed_in:
        trcrn = trcrn.at[0].set(row0)
    aicen = aicen.at[0].set(atot)
    vicen = vicen.at[0].set(vtot)

    frazil = vnew
    # salt removed from the ocean by freezing (negative fsalt)
    S_frz = float(salin.mean()) if sal_ref is None else sal_ref
    fsaltn = -cst.rhoi * vnew * S_frz * 1e-3 / dt
    freshn = -cst.rhoi * vnew / dt
    return aicen, vicen, trcrn, frazil, freshn, fsaltn


def lateral_melt(aicen, vicen, vsnon, trcrn, *, frzmlt, Tbot, sst, Tf, dt,
                 registry, floediam=300.0, alpha=0.66, sal_ref=None):
    """Lateral melt of floe edges (icepack lateral_melt, Steele 1992).

    melt rate wlat = m1 * (sst - Tf)^m2 (Maykut & Perovich 1987),
    rside = fraction of floe perimeter melted = wlat*dt*pi/(alpha*floediam).
    Only active when frzmlt < 0 (melting potential).
    """
    m1, m2 = 1.6e-6, 1.36
    deltaT = jnp.maximum(sst - Tf, 0.0)
    wlat = m1 * deltaT ** m2
    rside = jnp.clip(wlat * dt * jnp.pi / (alpha * floediam), 0.0, 1.0)
    rside = jnp.where(frzmlt < 0.0, rside, 0.0)

    # energy from melting laterally: heat to ocean is negative of the
    # enthalpy of the removed ice/snow
    dt_i = 1.0 / dt
    vice_rm = jnp.sum(vicen, axis=0) * rside
    vsno_rm = jnp.sum(vsnon, axis=0) * rside
    if isinstance(trcrn, dict):
        qice = trcrn["qice"]        # (ncat, nilyr, ny, nx)
        qsno = trcrn["qsno"]
    else:                           # packed (ncat, NT, ny, nx) stack
        from .itd import name_offsets
        off = name_offsets(registry)
        o, n = off["qice"]
        qice = trcrn[:, o:o + n]
        o, n = off["qsno"]
        qsno = trcrn[:, o:o + n]
    nilyr = qice.shape[1]
    nslyr = qsno.shape[1]
    eice = jnp.sum(qice.mean(axis=1) * vicen, axis=0) * rside   # J/m^2 (<0)
    esno = jnp.sum(qsno.mean(axis=1) * vsnon, axis=0) * rside
    fhocn = (eice + esno) * dt_i                 # heat flux used for melting (<0)
    freshn = (cst.rhoi * vice_rm + cst.rhos * vsno_rm) * dt_i
    salin = bl99_salinity(nilyr)
    S_lat = float(salin.mean()) if sal_ref is None else sal_ref
    fsaltn = cst.rhoi * vice_rm * S_lat * 1e-3 * dt_i

    factor = 1.0 - rside
    aicen = aicen * factor[None]
    vicen = vicen * factor[None]
    vsnon = vsnon * factor[None]
    meltl = vice_rm
    return aicen, vicen, vsnon, meltl, fhocn, freshn, fsaltn


def step_therm2(cfg, grid, aicen, vicen, vsnon, trcrn, *, hicen_old,
                frzmlt, Tf, sst, dt, hin_max, registry) -> Therm2Out:
    """Lateral melt + frazil + ITD remap/rebin/cleanup
    (reference step_therm2 ice_step_mod.F90:639).

    The whole chain runs on ONE packed (ncat, NT, ny, nx) tracer stack —
    round 5: the per-stage pack/unpack cycles were ~40% of the phase's
    HBM traffic (tools/therm_roofline.py)."""
    from .itd import name_offsets, pack_tracers, unpack_tracers
    nilyr = cfg.domain.nilyr

    off = name_offsets(registry)
    trp = pack_tracers(trcrn, registry)

    # ITD linear remap restoring category bounds after vertical growth/melt
    if cfg.thermo.kitd == 1:
        hicen_new = vicen_safe_h(vicen, aicen)
        aicen, vicen, vsnon, trp = linear_itd_remap(
            aicen, vicen, vsnon, trp, hin_max, hicen_old, hicen_new,
            registry)
    aicen, vicen, vsnon, trp = rebin(aicen, vicen, vsnon, trp, hin_max,
                                     registry)

    # salt fluxes at ice_ref_salinity under saltflux_option='constant'
    # (the default; 'prognostic' uses the bl99/mushy salinity profile)
    sal_ref = (cfg.thermo.ice_ref_salinity
               if cfg.thermo.saltflux_option == "constant" else None)
    # pond water riding on the laterally-melted area drains to the ocean
    if "apnd" in off and "hpnd" in off:
        apnd0 = trp[:, off["apnd"][0]]
        hpnd0 = trp[:, off["hpnd"][0]]
        pond_vol0 = jnp.sum(aicen * jnp.clip(apnd0, 0.0, 1.0)
                            * jnp.maximum(hpnd0, 0.0), axis=0)
    else:
        apnd0 = hpnd0 = pond_vol0 = None

    aicen, vicen, vsnon, meltl, fhocn_l, fresh_l, fsalt_l = lateral_melt(
        aicen, vicen, vsnon, trp, frzmlt=frzmlt, Tbot=Tf, sst=sst, Tf=Tf,
        dt=dt, registry=registry, sal_ref=sal_ref)
    if pond_vol0 is not None:
        pond_vol1 = jnp.sum(aicen * jnp.clip(apnd0, 0.0, 1.0)
                            * jnp.maximum(hpnd0, 0.0), axis=0)
        dpnd_melt = jnp.maximum(pond_vol0 - pond_vol1, 0.0)
    else:
        dpnd_melt = jnp.zeros_like(meltl)

    aicen, vicen, trp, frazil, fresh_f, fsalt_f = add_new_ice(
        aicen, vicen, vsnon, trp, frzmlt=frzmlt, Tf=Tf, dt=dt,
        hin_max=hin_max, nilyr=nilyr, registry=registry, sal_ref=sal_ref)

    aicen, vicen, vsnon, trp = rebin(aicen, vicen, vsnon, trp, hin_max,
                                     registry)
    aicen, vicen, vsnon, trp, fclean = cleanup_itd(
        aicen, vicen, vsnon, trp, registry, dt=dt,
        sal_ref=(sal_ref if sal_ref is not None
                 else cfg.thermo.ice_ref_salinity))
    trcrn = unpack_tracers(trp, registry)

    frz_onset = jnp.where(frazil > 0.0, 1.0, 0.0)
    return Therm2Out(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                     frazil=frazil, frz_onset=frz_onset,
                     fhocn=fhocn_l + fclean["fhocn"],
                     freshn=fresh_l + fresh_f + fclean["fresh"],
                     fsaltn=fsalt_l + fsalt_f + fclean["fsalt"], meltl=meltl,
                     freshn_frazil=fresh_f, fsaltn_frazil=fsalt_f,
                     dpnd_melt=dpnd_melt)
