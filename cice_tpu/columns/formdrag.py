"""Form drag from sails, keels, floe edges and melt ponds — Tsamados et al.
(2014, JPO 44) as used by Icepack's `neutral_drag_coeffs` (icepack_atmo;
enabled by the `formdrag` namelist, history group ice_history_drag.F90,
SURVEY §2.5).

The neutral 10-m atmospheric drag `Cdn_atm` and ice-ocean drag `Cdn_ocn`
are decomposed into skin friction plus form contributions:

  Cdn_atm = Cd_skin + Cd_rdg (sails) + Cd_floe (floe edges) + Cd_pond
  Cdn_ocn = Cw_skin + Cw_keel (keels) + Cw_floe (submerged floe edges)

Geometry from the level-ice tracers (alvl/vlvl): ridged area/volume
ardg=(1-alvl)·aice, vrdg=(1-vlvl)·vice; triangular sails of slope angle
alpha give sail height Hs = 2(vrdg/ardg)/(1-porosity) and spacing
Ds = 2·Hs·aice/(tan(alpha)·ardg); keels scale by Hk = hkoverhr·Hs,
Dk = dkoverdr·Ds. Freeboard/draft from hydrostatic balance. Each obstacle
contributes ½·c·S²·(H/D)·(ln(H/z0)/ln(zref/z0))²·aice with the
Hanssen-Bauer & Gjessing sheltering S = 1 - exp(-sl·D/H). Constants follow
the paper (csa/cra/cfa/cpa, sl=0.18, Lfloe=300 m or the FSD mean floe
size, Lpond scale). Totals are clamped to the physical range the reference
enforces (camax/cwmax-style caps).

All pure elementwise jnp — runs on the aggregate (ny, nx) state.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple

import jax.numpy as jnp

from .. import constants as cst

# Tsamados et al. (2014) table of constants
CSA = 0.0005          # skin drag, atmosphere
CSW = 0.002           # skin drag, ocean
CRA = 0.2             # local form drag, sails
CRW = 0.2             # local form drag, keels
CFA = 0.2             # local form drag, floe edges (atm)
CFW = 0.3             # local form drag, floe edges (ocn)
CPA = 0.2             # local form drag, pond edges
SL = 0.18             # sheltering attenuation (Hanssen-Bauer & Gjessing)
ALPHA_R = math.radians(45.0)   # sail slope
ALPHA_K = math.radians(45.0)   # keel slope
PHI_R = 0.8           # sail porosity
PHI_K = 0.8           # keel porosity
HKOVERHR = 4.0        # keel-to-sail height ratio
DKOVERDR = 1.0        # keel-to-sail spacing ratio
LFLOE_CONST = 300.0   # floe length without FSD (m)
LPOND = 50.0          # pond length scale (m)
Z0_ICE = 0.0005       # ice surface roughness, atm side (m)
Z0_WAT = 0.0032       # roughness, ocean side (m)
ZREF = 10.0           # atm reference height (m)
ZREF_W = 5.0          # ocn reference depth (m)
CAMAX = 0.02          # cap on Cdn_atm (reference camax)
CWMAX = 0.06          # cap on Cdn_ocn
HS_MIN, HS_MAX = 0.2, 10.0     # sail height clamp (m)


class DragCoeffs(NamedTuple):
    Cdn_atm: jnp.ndarray
    Cdn_ocn: jnp.ndarray
    Cdn_atm_skin: jnp.ndarray
    Cdn_atm_rdg: jnp.ndarray
    Cdn_atm_floe: jnp.ndarray
    Cdn_atm_pond: jnp.ndarray
    Cdn_ocn_skin: jnp.ndarray
    Cdn_ocn_keel: jnp.ndarray
    Cdn_ocn_floe: jnp.ndarray
    hfreebd: jnp.ndarray
    hdraft: jnp.ndarray
    hridge: jnp.ndarray
    distrdg: jnp.ndarray
    hkeel: jnp.ndarray
    dkeel: jnp.ndarray
    lfloe: jnp.ndarray
    dfloe: jnp.ndarray


def _logfac(H, z0):
    """(ln(H/z0)/ln(zref/z0))² attenuation of the local drag, clipped to
    the H>z0 regime."""
    num = jnp.log(jnp.maximum(H, z0 * 1.01) / z0)
    den = math.log(ZREF / z0)
    return (num / den) ** 2


def neutral_drag_coeffs(*, aice, vice, vsno, alvl=None, vlvl=None,
                        apnd=None, hpnd=None, lfloe=None,
                        puny: float = 1e-11) -> DragCoeffs:
    """Aggregate-state form drag decomposition (neutral_drag_coeffs parity).

    alvl/vlvl are the aggregate level-ice area/volume fractions (per unit
    ice); apnd the pond fraction (per unit ice area); lfloe an optional
    (ny, nx) mean floe length from the FSD.
    """
    icemask = aice > puny
    ai = jnp.maximum(aice, puny)
    hi = vice / ai
    hs = vsno / ai

    # hydrostatic freeboard/draft (Icepack: hdraft, hfreebd)
    hdraft = (cst.rhoi * hi + cst.rhos * hs) / cst.rhow
    hfreebd = jnp.clip(hi + hs - hdraft, 0.0, None)

    # ridge geometry from level-ice tracers
    alvl = jnp.ones_like(aice) if alvl is None else alvl
    vlvl = jnp.ones_like(aice) if vlvl is None else vlvl
    ardg_frac = jnp.clip(1.0 - alvl, 0.0, 1.0)           # per unit ice area
    vrdg = jnp.clip(1.0 - vlvl, 0.0, 1.0) * vice         # per grid area
    ardg = ardg_frac * aice
    hrdg_mean = vrdg / jnp.maximum(ardg, puny)           # mean ridged thickness
    Hs = jnp.clip(2.0 * hrdg_mean / (1.0 - PHI_R), HS_MIN, HS_MAX)
    have_rdg = ardg > puny
    Ds = jnp.where(have_rdg,
                   2.0 * Hs * ai / (math.tan(ALPHA_R) *
                                    jnp.maximum(ardg, puny)),
                   1e8)
    Hk = HKOVERHR * Hs
    Dk = DKOVERDR * Ds

    # floe geometry
    if lfloe is None:
        lfloe = jnp.full_like(aice, LFLOE_CONST)
    # spacing between floes from open-water fraction (Tsamados eq. 26)
    dfloe = lfloe / jnp.sqrt(jnp.maximum(aice, puny))

    # sheltering functions
    Sc_r = (1.0 - jnp.exp(-SL * Ds / jnp.maximum(Hs, puny)))
    Sc_k = (1.0 - jnp.exp(-SL * Dk / jnp.maximum(Hk, puny)))
    Sc_f = (1.0 - jnp.exp(-SL * dfloe / jnp.maximum(hfreebd, puny)))

    # --- atmosphere ------------------------------------------------------
    cd_skin_a = CSA * aice
    cd_rdg = jnp.where(have_rdg & icemask,
                       0.5 * CRA * Sc_r ** 2 * (Hs / Ds) * aice
                       * _logfac(Hs, Z0_ICE), 0.0)
    cd_floe = jnp.where(icemask,
                        0.5 * CFA * Sc_f ** 2 * (hfreebd / dfloe) * aice
                        * _logfac(hfreebd, Z0_ICE), 0.0)
    if apnd is None:
        cd_pond = jnp.zeros_like(aice)
    else:
        hp = jnp.zeros_like(aice) if hpnd is None else hpnd
        cd_pond = jnp.where(icemask,
                            0.5 * CPA * jnp.sqrt(jnp.clip(apnd, 0.0, 1.0))
                            * (jnp.clip(hp, 0.0, 1.0) / LPOND) * aice
                            * _logfac(jnp.maximum(hp, Z0_ICE * 2), Z0_ICE),
                            0.0)
    Cdn_atm = jnp.clip(cd_skin_a + cd_rdg + cd_floe + cd_pond, 0.0, CAMAX)

    # --- ocean -----------------------------------------------------------
    cw_skin = CSW * aice
    cw_keel = jnp.where(have_rdg & icemask,
                        0.5 * CRW * Sc_k ** 2 * (Hk / Dk) * aice
                        * _logfac(Hk, Z0_WAT), 0.0)
    cw_floe = jnp.where(icemask,
                        0.5 * CFW * Sc_f ** 2 * (hdraft / dfloe) * aice
                        * _logfac(hdraft, Z0_WAT), 0.0)
    Cdn_ocn = jnp.clip(cw_skin + cw_keel + cw_floe, 0.0, CWMAX)
    # keep the classic constant where there is no ice information at all
    Cdn_ocn = jnp.where(icemask, jnp.maximum(Cdn_ocn, 1e-4), cst.dragio)
    Cdn_atm = jnp.where(icemask, jnp.maximum(Cdn_atm, 1e-4), CSA)

    return DragCoeffs(
        Cdn_atm=Cdn_atm, Cdn_ocn=Cdn_ocn,
        Cdn_atm_skin=cd_skin_a, Cdn_atm_rdg=cd_rdg, Cdn_atm_floe=cd_floe,
        Cdn_atm_pond=cd_pond, Cdn_ocn_skin=cw_skin, Cdn_ocn_keel=cw_keel,
        Cdn_ocn_floe=cw_floe, hfreebd=hfreebd, hdraft=hdraft,
        hridge=jnp.where(have_rdg, Hs, 0.0),
        distrdg=jnp.where(have_rdg, Ds, 0.0),
        hkeel=jnp.where(have_rdg, Hk, 0.0),
        dkeel=jnp.where(have_rdg, Dk, 0.0),
        lfloe=lfloe, dfloe=dfloe)


def drag_from_state(state, cfg) -> DragCoeffs:
    """Convenience wrapper computing the decomposition from a model State
    (aggregate tracers weighted by category area)."""
    ai = jnp.maximum(state.aice, 1e-11)
    trc = state.trcrn

    def agg(name):
        if name not in trc:
            return None
        return jnp.sum(trc[name] * state.aicen, axis=0) / ai

    lf = None
    if "fsd" in trc and getattr(cfg.tracers, "tr_fsd", False):
        from .fsd import fsd_bounds
        _, _, mid = fsd_bounds(cfg.domain.nfsd)
        r = jnp.asarray(mid)
        f = jnp.sum(trc["fsd"] * state.aicen[:, None], axis=0) / ai
        lf = 2.0 * jnp.sum(f * r[:, None, None], axis=0) \
            / jnp.maximum(jnp.sum(f, axis=0), 1e-11)
        lf = jnp.clip(lf, 8.0, 3.0e4)
    return neutral_drag_coeffs(
        aice=state.aice, vice=state.vice, vsno=state.vsno,
        alvl=agg("alvl"), vlvl=agg("vlvl"), apnd=agg("apnd"),
        hpnd=agg("hpnd"), lfloe=lf)
