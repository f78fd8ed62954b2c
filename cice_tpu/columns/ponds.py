"""Melt pond schemes (all three reference pond tracer families).

Equivalent of the Icepack pond surface the reference consumes
(tracer_nml `tr_pond_lvl / tr_pond_topo / tr_pond_sealvl`,
`ponds_nml` in configuration/scripts/ice_in, call site inside
icepack_step_therm1 — see SURVEY.md §2.9; restart fields in
cicecore/shared/ice_restart_column.F90 `restart_pond_lvl` etc.).
The Icepack source is not vendored in the reference repo, so these are
written from the published science: Hunke, Hebert & Lecomte (2013)
level-ice ponds, the CESM bucket scheme (Holland et al. 2012), and the
topographic scheme (Flocco & Feltham 2007) in its bucket-limit form.

Pond tracer state per category (all `(ncat, ny, nx)`, dense, masked):
  apnd — pond area as a fraction of the pond-bearing ice area
         (level-ice area for the lvl scheme, category area otherwise)
  hpnd — mean pond depth over the pond area (m)
  ipnd — refrozen pond lid thickness (m)

Everything is a pure function suitable for tracing inside the jitted
model step; no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst

TP_FRZ = -2.0          # pond refreezing onset temperature Tp (degC)
KICE_LID = 2.03        # conductivity of the refrozen lid (W/m/K, fresh ice)
DPSCALE_REF = 1.0e-3   # reference drainage scale (s^-1 at hp=1m head)


class PondOut(NamedTuple):
    apnd: jnp.ndarray
    hpnd: jnp.ndarray
    ipnd: jnp.ndarray
    # diagnostics (per category)
    apeff: jnp.ndarray      # pond fraction exposed to radiation (category area)
    dpnd_flush: jnp.ndarray  # freshwater flushed to ocean this step (m)
    # pond water budget terms (reference f_dpnd_* history fields; m of water
    # per category area per step). None where a scheme has no such term.
    dpnd_initial: jnp.ndarray | None = None  # meltwater collected
    dpnd_expon: jnp.ndarray | None = None    # exponential above-sea-level drain
    dpnd_freebd: jnp.ndarray | None = None   # immediate negative-freeboard drain
    dpnd_dlid: jnp.ndarray | None = None     # water frozen into the lid


def _lid_growth(frzpnd: str, ipnd, Tsf, dt):
    """Refrozen-lid thickening for cold surfaces.

    'hlid': Stefan growth d(h^2)/dt = 2 k (Tp-Tsf) / (rhoi Lf);
    'cesm' handled by the caller as exponential volume decay.
    Returns (ipnd_new, dlid) with dlid = ipnd_new - ipnd signed: positive
    growth consumes pond water, negative (warm-surface melt-back) returns
    lid water to the pond — the caller moves apnd*dlid*rhoi/rhofresh of
    liquid so the pond reservoir (liquid + lid water-equivalent) only
    changes through real sources/sinks."""
    cold = Tsf < TP_FRZ
    stefan = jnp.sqrt(jnp.maximum(
        ipnd * ipnd + 2.0 * KICE_LID * jnp.maximum(TP_FRZ - Tsf, 0.0) * dt /
        (cst.rhoi * cst.Lfresh), 0.0))
    ipnd_new = jnp.where(cold, stefan, jnp.maximum(ipnd - 0.01 * dt / cst.secday, 0.0))
    del frzpnd
    return ipnd_new, ipnd_new - ipnd


def compute_ponds_lvl(cfg_ponds, dt, *, aicen, vicen, vsnon, alvl, apnd, hpnd,
                      ipnd, Tsf, meltt, melts, frain, aice):
    """Level-ice pond evolution (Hunke et al. 2013, tr_pond_lvl).

    meltt/melts: ice/snow melt this step (m, per category); frain rain
    rate (kg/m^2/s). Ponds collect a runoff fraction `rfrac` of surface
    meltwater onto the level-ice portion of each category, with depth
    tied to area (hpnd = pndaspect*apnd), Darcy-like drainage through
    permeable ice, and a refrozen lid (frzpnd='hlid' Stefan / 'cesm'
    exponential).
    """
    mask = (aicen > cst.puny) & (alvl * aicen > 0.01)
    alvl_frac = jnp.clip(alvl, 0.0, 1.0)

    # pond volume per unit level-ice area (m)
    volp = apnd * hpnd

    # --- meltwater collection ------------------------------------------
    # runoff fraction grows with total ice concentration (r = rmin + (rmax-rmin)*aice)
    rfrac = cfg_ponds.rfracmin + (cfg_ponds.rfracmax - cfg_ponds.rfracmin) * \
        jnp.clip(aice, 0.0, 1.0)
    # melt water mass over the category / rhofresh, concentrated onto level ice
    dvol = rfrac * (cst.rhoi * meltt + cst.rhos * melts +
                    frain * dt * apnd * alvl_frac) / cst.rhofresh
    dvol = jnp.where(mask, dvol / jnp.maximum(alvl_frac, cst.puny), 0.0)
    volp = volp + dvol

    # --- refreezing -----------------------------------------------------
    cold = Tsf < TP_FRZ
    if cfg_ponds.frzpnd == "cesm":
        # exponential volume decay when the surface is cold
        shrink = jnp.exp(0.01 * (Tsf - TP_FRZ) * dt / cst.secday)
        volp = jnp.where(cold, volp * jnp.clip(shrink, 0.0, 1.0), volp)
        ipnd_new = jnp.zeros_like(ipnd)
        dlid = jnp.zeros_like(ipnd)
    else:  # 'hlid' Stefan lid: freezes pond water under the pond area
        ipnd_new, dlid_s = _lid_growth(cfg_ponds.frzpnd, ipnd, Tsf, dt)
        dlid = jnp.maximum(dlid_s, 0.0)
        volp = jnp.maximum(volp - apnd * dlid_s * cst.rhoi / cst.rhofresh,
                           0.0)

    # --- drainage (Darcy through warm permeable ice; head ~ hpnd) -------
    hi = jnp.where(aicen > cst.puny, vicen / jnp.maximum(aicen, cst.puny), 0.0)
    warm = Tsf > -0.5                    # highly permeable near melting
    # fractional loss dpscale per day of pond volume through warm ice
    drain_frac = jnp.minimum(cfg_ponds.dpscale / DPSCALE_REF *
                             1.0e-3 * dt / cst.secday, 1.0)
    flush = jnp.where(warm, volp * drain_frac, 0.0)
    volp = volp - flush

    # --- geometry: hpnd = pndaspect * apnd ------------------------------
    aspect = cfg_ponds.pndaspect
    apnd_new = jnp.sqrt(jnp.maximum(volp, 0.0) / aspect)
    apnd_new = jnp.clip(apnd_new, 0.0, 1.0)
    hpnd_new = aspect * apnd_new
    # depth capped at 90% of category mean ice thickness (hydrostatic limit)
    hcap = 0.9 * hi
    over = hpnd_new > hcap
    hpnd_new = jnp.minimum(hpnd_new, hcap)
    apnd_new = jnp.where(
        over & (hpnd_new > cst.puny),
        jnp.clip(volp / jnp.maximum(hpnd_new, cst.puny), 0.0, 1.0), apnd_new)

    apnd_new = jnp.where(mask, apnd_new, 0.0)
    hpnd_new = jnp.where(mask, hpnd_new, 0.0)
    ipnd_new = jnp.where(mask, ipnd_new, 0.0)

    # --- radiative exposure (snow hides shallow ponds: hs0/hs1 ramp) ----
    hs = jnp.where(aicen > cst.puny, vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    snow_hide = jnp.clip(1.0 - hs / jnp.maximum(cfg_ponds.hs1, cst.puny),
                         0.0, 1.0)
    # lid hides the pond once thicker than hp1
    lid_hide = jnp.clip(1.0 - ipnd_new / jnp.maximum(10.0 * cfg_ponds.hp1,
                                                     cst.puny), 0.0, 1.0)
    apeff = apnd_new * alvl_frac * snow_hide * lid_hide

    return PondOut(apnd=apnd_new, hpnd=hpnd_new, ipnd=ipnd_new, apeff=apeff,
                   dpnd_flush=jnp.where(mask, flush, 0.0),
                   dpnd_initial=jnp.where(mask, dvol, 0.0),
                   dpnd_dlid=jnp.where(mask,
                                       dlid * cst.rhoi / cst.rhofresh, 0.0))


def compute_ponds_sealvl(cfg_ponds, dt, *, aicen, vicen, vsnon, apnd, hpnd,
                         ipnd, Tsf, meltt, melts, frain, aice):
    """Sea-level ponds (tr_pond_sealvl; namelist `apnd_sl`,
    `tscale_pnd_drain` — ug_case_settings.rst:490,626, set_nml.pondsealvl).

    Ponds are hydrostatically connected to the ocean: the pond surface
    relaxes to sea level. Meltwater collects at the equilibrium pond
    fraction `apnd_sl` of the category area; water standing above sea
    level drains exponentially on the macroscopic timescale
    `tscale_pnd_drain` (days); water that would push the ice surface
    below sea level (negative freeboard) drains immediately; a refrozen
    lid grows per `frzpnd`. Diagnostics mirror the reference history
    fields dpnd_initial/dpnd_expon/dpnd_freebd/dpnd_flush/dpnd_dlid.
    """
    mask = aicen > cst.puny
    hi = jnp.where(mask, vicen / jnp.maximum(aicen, cst.puny), 0.0)
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, cst.puny), 0.0)

    volp = apnd * hpnd                          # m of water per category area

    # --- meltwater collection (rfrac of surface melt + rain on ponds) ---
    rfrac = cfg_ponds.rfracmin + (cfg_ponds.rfracmax - cfg_ponds.rfracmin) * \
        jnp.clip(aice, 0.0, 1.0)
    dvol_in = rfrac * (cst.rhoi * meltt + cst.rhos * melts +
                       frain * dt * apnd) / cst.rhofresh
    dvol_in = jnp.where(mask, dvol_in, 0.0)
    volp = volp + dvol_in

    # --- refrozen lid (displaces pond water) -----------------------------
    if cfg_ponds.frzpnd == "cesm":
        cold = Tsf < TP_FRZ
        shrink = jnp.exp(0.01 * (Tsf - TP_FRZ) * dt / cst.secday)
        volp = jnp.where(cold, volp * jnp.clip(shrink, 0.0, 1.0), volp)
        ipnd_new = jnp.zeros_like(ipnd)
        dlid = jnp.zeros_like(ipnd)
    else:
        ipnd_new, dlid_s = _lid_growth(cfg_ponds.frzpnd, ipnd, Tsf, dt)
        dlid = jnp.maximum(dlid_s, 0.0)
        volp = jnp.maximum(volp - apnd * dlid_s * cst.rhoi / cst.rhofresh,
                           0.0)

    # --- equilibrium geometry: pond fraction relaxes to apnd_sl ----------
    a_sl = cfg_ponds.apnd_sl
    apnd_new = jnp.where(volp > cst.puny, a_sl, 0.0)
    hpnd_new = jnp.where(volp > cst.puny,
                         volp / jnp.maximum(apnd_new, cst.puny), 0.0)

    # --- sea-level drainage ----------------------------------------------
    # ice freeboard below the pond-free surface (snow load included)
    freebd = jnp.maximum(hi * (cst.rhow - cst.rhoi) / cst.rhow -
                         hs * cst.rhos / cst.rhow, 0.0)
    # (a) water above sea level: exponential drain, timescale tscale (days)
    tau = jnp.maximum(cfg_ponds.tscale_pnd_drain, 1e-3) * cst.secday
    above = jnp.maximum(hpnd_new - freebd, 0.0) * apnd_new
    dpnd_expon = above * (1.0 - jnp.exp(-dt / tau))
    volp = jnp.maximum(volp - dpnd_expon, 0.0)
    # (b) hydrostatic flooding guard: pond mass may not push the surface
    # below sea level — excess drains immediately
    vol_max = jnp.maximum(
        (cst.rhow * hi - cst.rhoi * hi - cst.rhos * hs) / cst.rhofresh, 0.0)
    dpnd_freebd = jnp.maximum(volp - vol_max, 0.0)
    volp = volp - dpnd_freebd

    hpnd_new = jnp.where(apnd_new > cst.puny,
                         volp / jnp.maximum(apnd_new, cst.puny), 0.0)
    flush = dpnd_expon + dpnd_freebd

    apnd_new = jnp.where(mask, apnd_new, 0.0)
    hpnd_new = jnp.where(mask, hpnd_new, 0.0)
    ipnd_new = jnp.where(mask, ipnd_new, 0.0)

    # --- radiative exposure (same snow/lid masking as the other schemes) -
    snow_hide = jnp.clip(1.0 - hs / jnp.maximum(cfg_ponds.hs1, cst.puny),
                         0.0, 1.0)
    lid_hide = jnp.clip(1.0 - ipnd_new / jnp.maximum(10.0 * cfg_ponds.hp1,
                                                     cst.puny), 0.0, 1.0)
    apeff = apnd_new * snow_hide * lid_hide

    return PondOut(apnd=apnd_new, hpnd=hpnd_new, ipnd=ipnd_new, apeff=apeff,
                   dpnd_flush=jnp.where(mask, flush, 0.0),
                   dpnd_initial=jnp.where(mask, dvol_in, 0.0),
                   dpnd_expon=jnp.where(mask, dpnd_expon, 0.0),
                   dpnd_freebd=jnp.where(mask, dpnd_freebd, 0.0),
                   dpnd_dlid=jnp.where(mask,
                                       dlid * cst.rhoi / cst.rhofresh, 0.0))


def compute_ponds_topo(cfg_ponds, dt, *, aicen, vicen, vsnon, apnd, hpnd,
                       ipnd, Tsf, meltt, melts, frain, aice):
    """Topographic ponds (Flocco & Feltham 2007) in bucket-limit form
    (tr_pond_topo / the CESM bucket when alvl is absent): ponds cover the
    whole category area with a fixed aspect growth, water above sea level
    drains instantly."""
    mask = aicen > cst.puny
    volp = apnd * hpnd

    rfrac = cfg_ponds.rfracmin + (cfg_ponds.rfracmax - cfg_ponds.rfracmin) * \
        jnp.clip(aice, 0.0, 1.0)
    dvol = rfrac * (cst.rhoi * meltt + cst.rhos * melts +
                    frain * dt * apnd) / cst.rhofresh
    volp = volp + jnp.where(mask, dvol, 0.0)

    cold = Tsf < TP_FRZ
    shrink = jnp.exp(0.01 * (Tsf - TP_FRZ) * dt / cst.secday)
    volp = jnp.where(cold, volp * jnp.clip(shrink, 0.0, 1.0), volp)

    # hydrostatic drainage: pond surface cannot rise above sea level;
    # freeboard of the ice (m above sea level)
    hi = jnp.where(mask, vicen / jnp.maximum(aicen, cst.puny), 0.0)
    hs = jnp.where(mask, vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    freeboard = jnp.maximum(
        hi - (cst.rhoi * hi + cst.rhos * hs) / cst.rhow, 0.0)
    vol_max = 0.9 * freeboard + 0.0 * hi  # bucket capacity ~ freeboard
    flush = jnp.maximum(volp - vol_max, 0.0)
    volp = volp - flush

    # refrozen lid exchanges water with the pond under the pond area
    ipnd_new, dlid_s = _lid_growth("hlid", ipnd, Tsf, dt)
    volp = jnp.maximum(volp - apnd * dlid_s * cst.rhoi / cst.rhofresh, 0.0)

    apnd_new = jnp.clip(jnp.sqrt(jnp.maximum(volp, 0.0) /
                                 cfg_ponds.pndaspect), 0.0, 1.0)
    hpnd_new = cfg_ponds.pndaspect * apnd_new

    apnd_new = jnp.where(mask, apnd_new, 0.0)
    hpnd_new = jnp.where(mask, hpnd_new, 0.0)
    ipnd_new = jnp.where(mask, ipnd_new, 0.0)
    hs_hide = jnp.clip(1.0 - hs / jnp.maximum(cfg_ponds.hs1, cst.puny), 0.0, 1.0)
    return PondOut(apnd=apnd_new, hpnd=hpnd_new, ipnd=ipnd_new,
                   apeff=apnd_new * hs_hide,
                   dpnd_flush=jnp.where(mask, flush, 0.0),
                   dpnd_initial=jnp.where(mask, dvol, 0.0),
                   dpnd_freebd=jnp.where(mask, flush, 0.0),
                   dpnd_dlid=jnp.where(
                       mask, jnp.maximum(dlid_s, 0.0) *
                       cst.rhoi / cst.rhofresh, 0.0))


def step_ponds(cfg, dt, *, aicen, vicen, vsnon, trcrn, Tsf, meltt, melts,
               frain, aice, return_diag: bool = False):
    """Dispatch on the active pond scheme; updates trcrn in place (dict
    copy) and returns (trcrn, apeff, flush) where apeff is the per-category
    radiatively-exposed pond fraction used by dEdd shortwave. With
    return_diag=True a 4th element carries the per-category pond water
    budget terms (dpnd_* reference history fields; zeros where a scheme
    has no such term)."""
    t = cfg.tracers
    if not (t.tr_pond_lvl or t.tr_pond_topo or t.tr_pond_sealvl):
        zero = jnp.zeros_like(aicen)
        if return_diag:
            diag = {k: zero for k in ("dpnd_flush", "dpnd_initial",
                                      "dpnd_expon", "dpnd_freebd",
                                      "dpnd_dlid")}
            return trcrn, zero, zero, diag
        return trcrn, zero, zero
    trcrn = dict(trcrn)
    common = dict(aicen=aicen, vicen=vicen, vsnon=vsnon,
                  apnd=trcrn["apnd"], hpnd=trcrn["hpnd"], ipnd=trcrn["ipnd"],
                  Tsf=Tsf, meltt=meltt, melts=melts, frain=frain, aice=aice)
    if t.tr_pond_lvl and "alvl" in trcrn:
        out = compute_ponds_lvl(cfg.ponds, dt, alvl=trcrn["alvl"], **common)
    elif t.tr_pond_sealvl:
        out = compute_ponds_sealvl(cfg.ponds, dt, **common)
    else:
        out = compute_ponds_topo(cfg.ponds, dt, **common)
    trcrn["apnd"] = out.apnd
    trcrn["hpnd"] = out.hpnd
    trcrn["ipnd"] = out.ipnd
    if return_diag:
        zero = jnp.zeros_like(aicen)
        diag = {k: (getattr(out, k) if getattr(out, k) is not None else zero)
                for k in ("dpnd_flush", "dpnd_initial", "dpnd_expon",
                          "dpnd_freebd", "dpnd_dlid")}
        return trcrn, out.apeff, out.dpnd_flush, diag
    return trcrn, out.apeff, out.dpnd_flush


def pond_reservoir_mass(trcrn, aicen, lvl: bool):
    """Pond water mass per unit cell area (kg/m^2): liquid plus refrozen
    lid (water-equivalent), with the lvl scheme's level-ice-area
    normalization (apnd/hpnd are fractions of the alvl*aicen area for
    tr_pond_lvl; of aicen otherwise).

    This is THE pond-reservoir definition shared by the coupler fresh-flux
    assembly (model/step.py) and the freshwater budget closure
    (model/diagnostics.py hemispheric_budgets) — using one formula in both
    places makes the budget identity exact by construction, mirroring the
    reference's fpond bookkeeping (ice_flux.F90 fpond; Icepack pond volume
    dpnd accounting)."""
    if "apnd" not in trcrn or "hpnd" not in trcrn:
        return jnp.zeros(aicen.shape[1:], aicen.dtype)
    norm = jnp.clip(trcrn["alvl"], 0.0, 1.0) \
        if (lvl and "alvl" in trcrn) else jnp.ones_like(aicen)
    apnd = trcrn["apnd"]
    liquid = cst.rhofresh * apnd * trcrn["hpnd"]
    lid = cst.rhoi * apnd * trcrn["ipnd"] if "ipnd" in trcrn \
        else jnp.zeros_like(apnd)
    return jnp.sum(aicen * norm * (liquid + lid), axis=0)


def pond_exposure(cfg, *, aicen, vsnon, trcrn):
    """Radiatively-exposed pond fraction (per category area) from the
    current tracer state — used by dEdd shortwave at the top of the step,
    before the pond update (reference: apeffn computed in step_radiation)."""
    t = cfg.tracers
    if "apnd" not in trcrn:
        return jnp.zeros_like(aicen)
    apnd, ipnd = trcrn["apnd"], trcrn["ipnd"]
    hs = jnp.where(aicen > cst.puny,
                   vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    snow_hide = jnp.clip(1.0 - hs / jnp.maximum(cfg.ponds.hs1, cst.puny),
                         0.0, 1.0)
    lid_hide = jnp.clip(1.0 - ipnd / jnp.maximum(10.0 * cfg.ponds.hp1,
                                                 cst.puny), 0.0, 1.0)
    alvl_frac = jnp.clip(trcrn.get("alvl", jnp.ones_like(apnd)), 0.0, 1.0) \
        if t.tr_pond_lvl else jnp.ones_like(apnd)
    return jnp.clip(apnd * alvl_frac * snow_hide * lid_hide, 0.0, 1.0)
