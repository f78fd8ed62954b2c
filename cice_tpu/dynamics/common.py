"""Shared dynamics machinery: preparation, momentum stepping, viscosities.

TPU-native re-implementation of cicecore/cicedyn/dynamics/ice_dyn_shared.F90
(dyn_prep1:496, dyn_prep2:593, stepu:847, strain_rates:2083,
visc_replpress:2446, seabed_stress_factor_LKD:1386). The reference compresses
active cells into index lists and loops; here every kernel is a dense masked
stencil over the global (ny, nx) array — the TPU-native form (VPU lanes want
dense regular work; `jnp.where` replaces `indxUi/indxUj` gather lists).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid, grid_average_X2Y
from ..core.halo import shift
from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_NECORNER,
                         FIELD_TYPE_SCALAR, FIELD_TYPE_VECTOR)


# ---------------------------------------------------------------------------
# EVP relaxation parameters (set_evp_parameters, ice_dyn_shared.F90:453-485)
# ---------------------------------------------------------------------------

class EvpParams(NamedTuple):
    arlx1i: float
    brlx: float
    denom1: float
    revp: float
    e_factor: float
    epp2i: float
    deltaminEVP: float
    capping: float
    Ktens: float
    ndte: int


def evp_params(cfg_dyn, dt: float) -> EvpParams:
    e_factor = cfg_dyn.e_yieldcurve ** 2 / cfg_dyn.e_plasticpot ** 4
    epp2i = 1.0 / cfg_dyn.e_plasticpot ** 2
    capping = 1.0 if cfg_dyn.capping_method == "max" else 0.0
    if cfg_dyn.revised_evp:
        revp = 1.0
        denom1 = 1.0
        arlx1i = 1.0 / cfg_dyn.arlx
        brlx = cfg_dyn.brlx
    else:
        revp = 0.0
        arlx = 2.0 * cfg_dyn.elasticDamp * float(cfg_dyn.ndte)
        arlx1i = 1.0 / arlx
        brlx = float(cfg_dyn.ndte)
        denom1 = 1.0 / (1.0 + arlx1i)
    return EvpParams(arlx1i=arlx1i, brlx=brlx, denom1=denom1, revp=revp,
                     e_factor=e_factor, epp2i=epp2i,
                     deltaminEVP=cfg_dyn.deltaminEVP, capping=capping,
                     Ktens=cfg_dyn.Ktens, ndte=cfg_dyn.ndte)


# ---------------------------------------------------------------------------
# ice strength (icepack_ice_strength; Hibler 79 / Rothrock 75)
# ---------------------------------------------------------------------------

def ice_strength_hibler(aice, vice, Pstar=cst.Pstar, Cstar=cst.Cstar):
    """P = P* h exp(-C*(1-A)) — Hibler (1979), kstrength=0."""
    return Pstar * vice * jnp.exp(-Cstar * (1.0 - aice))


# ---------------------------------------------------------------------------
# dynamics preparation (dyn_prep1 + dyn_prep2, dense)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DynPrep:
    iceTmask: jnp.ndarray      # bool (ny,nx): ice present near T-cell
    iceUmask: jnp.ndarray      # bool: active momentum points
    aiU: jnp.ndarray           # ice fraction at U
    umassdti: jnp.ndarray      # U-cell mass / dt (kg/m^2/s)
    fm: jnp.ndarray            # coriolis * mass (kg/s)
    waterx: jnp.ndarray        # rotated ocean current for drag
    watery: jnp.ndarray
    forcex: jnp.ndarray        # wind stress + ssh tilt (N/m^2)
    forcey: jnp.ndarray
    uvel_init: jnp.ndarray
    vvel_init: jnp.ndarray
    uvel: jnp.ndarray          # velocity after new-ice init / masking
    vvel: jnp.ndarray
    Cw: jnp.ndarray            # ocean drag coefficient at U
    TbU: jnp.ndarray           # seabed stress factor (N/m^2)


def dyn_prep(grid: Grid, cfg_dyn, dt: float, *,
             aice, vice, vsno, aiceU_prev_mask,
             uvel, vvel, strairxT, strairyT, uocn_T, vocn_T,
             ss_tltx_T, ss_tlty_T, Cw_in=None) -> DynPrep:
    """Compute time-invariant (per dynamics step) momentum-equation inputs.

    All inputs at T points except uvel/vvel (U). Interpolations to U use
    grid_average_X2Y 'S' semantics as the reference does at the top of evp()
    (ice_dyn_evp.F90:~420-700).
    """
    bc = grid.bc
    tmask = grid.tmask
    umask = grid.umask

    # dyn_prep1: T-cell mass and extended ice mask
    tmass = jnp.where(tmask, cst.rhoi * vice + cst.rhos * vsno, 0.0)
    tmphm = tmask & (aice > 1e-11) & (tmass > 1e-10)   # dyn_area_min/dyn_mass_min
    sh = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)
    near = tmphm
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if dj == 0 and di == 0:
                continue
            # f32 (not int) so the tripole fold's ghost-row averaging never
            # scatters a float into an int buffer
            near = near | (sh(tmphm.astype(jnp.float32), dj, di) > 0.5)
    iceTmask = near & tmask

    # T->U state averages ('S': masked area-weighted)
    aiU = grid_average_X2Y("S", aice, "T", "U", grid)
    umass = grid_average_X2Y("S", tmass, "T", "U", grid)
    uocn = grid_average_X2Y("S", uocn_T, "T", "U", grid)
    vocn = grid_average_X2Y("S", vocn_T, "T", "U", grid)
    strairx = grid_average_X2Y("F", strairxT, "T", "U", grid)
    strairy = grid_average_X2Y("F", strairyT, "T", "U", grid)
    ss_tltx = grid_average_X2Y("S", ss_tltx_T, "T", "U", grid)
    ss_tlty = grid_average_X2Y("S", ss_tlty_T, "T", "U", grid)

    # dyn_prep2
    iceUmask = umask & (aiU > 1e-11) & (umass > 1e-10)
    newice = iceUmask & ~aiceU_prev_mask
    uvel = jnp.where(newice, uocn, uvel)
    vvel = jnp.where(newice, vocn, vvel)
    uvel = jnp.where(iceUmask, uvel, 0.0)
    vvel = jnp.where(iceUmask, vvel, 0.0)

    umassdti = jnp.where(iceUmask, umass / dt, 0.0)
    fcor = grid.fcor("U", cfg_dyn.coriolis)
    fm = jnp.where(iceUmask, fcor * umass, 0.0)
    sgn = jnp.sign(jnp.where(fm == 0, 1.0, fm))
    waterx = jnp.where(iceUmask, uocn * cst.cosw - vocn * cst.sinw * sgn, 0.0)
    watery = jnp.where(iceUmask, vocn * cst.cosw + uocn * cst.sinw * sgn, 0.0)

    if cfg_dyn.ssh_stress == "geostrophic":
        strtltx = -fm * vocn
        strtlty = fm * uocn
    else:  # 'coupled'
        strtltx = -cst.gravit * umass * ss_tltx
        strtlty = -cst.gravit * umass * ss_tlty
    forcex = jnp.where(iceUmask, strairx + strtltx, 0.0)
    forcey = jnp.where(iceUmask, strairy + strtlty, 0.0)

    # ice-ocean drag: constant dragio, or the Tsamados form-drag Cdn_ocn at
    # U points when formdrag is on (columns/formdrag.py)
    Cw = jnp.full_like(aiU, cst.dragio) if Cw_in is None else Cw_in

    # seabed stress factor (LKD; ice_dyn_shared.F90:1386)
    if cfg_dyn.seabed_stress:
        TbU = seabed_stress_LKD(grid, cfg_dyn, aice, vice, iceUmask)
    else:
        TbU = jnp.zeros_like(aiU)

    return DynPrep(iceTmask=iceTmask, iceUmask=iceUmask, aiU=aiU,
                   umassdti=umassdti, fm=fm, waterx=waterx, watery=watery,
                   forcex=forcex, forcey=forcey,
                   uvel_init=uvel, vvel_init=vvel, uvel=uvel, vvel=vvel,
                   Cw=Cw, TbU=TbU)


def seabed_stress_LKD(grid: Grid, cfg_dyn, aice, vice, iceUmask):
    """Lemieux et al. landfast-ice seabed stress factor at U points."""
    bc = grid.bc
    sh = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)
    # U-point min water depth / max ice over the 4 surrounding T cells
    offs = [(0, 0), (0, 1), (1, 0), (1, 1)]
    hw4 = [sh(grid.bathymetry, dj, di) for dj, di in offs]
    # treat land neighbors (depth 0) as infinitely deep for the min
    hwu = jnp.min(jnp.stack([jnp.where(h > 0, h, 1e30) for h in hw4]), axis=0)
    au = jnp.max(jnp.stack([sh(aice, dj, di) for dj, di in offs]), axis=0)
    hu = jnp.max(jnp.stack([sh(vice, dj, di) for dj, di in offs]), axis=0)
    docalc = (hwu < cfg_dyn.threshold_hw) & iceUmask
    hcu = au * hwu / cfg_dyn.k1
    TbU = cfg_dyn.k2 * jnp.maximum(0.0, hu - hcu) * jnp.exp(-cfg_dyn.alphab * (1.0 - au))
    return jnp.where(docalc, TbU, 0.0)


# ---------------------------------------------------------------------------
# viscosities + replacement pressure (visc_replpress, ice_dyn_shared.F90:2446)
# ---------------------------------------------------------------------------

def visc_replpress(strength, DminArea, Delta, p: EvpParams):
    # p.capping is a trace-time Python float (0 or 1 from capping_method):
    # specialize to ONE division per call — visc_replpress runs at 4 corners
    # per subcycle, so this halves the EVP hot loop's divide count
    # the 1e-30 floor is inert on real cells (DminArea = deltamin*tarea > 0
    # everywhere, land included); it stops 0/0 NaNs on the zero-padded ghost
    # ring of the wide-halo tiles, where C-grid viscosity averaging would
    # leak them into interior cells
    if p.capping == 1.0:
        tmp = strength / jnp.maximum(jnp.maximum(Delta, DminArea), 1e-30)
    elif p.capping == 0.0:
        tmp = strength / jnp.maximum(Delta + DminArea, 1e-30)
    else:
        tmp = (p.capping * (strength /
                            jnp.maximum(jnp.maximum(Delta, DminArea), 1e-30)) +
               (1.0 - p.capping) * (strength /
                                    jnp.maximum(Delta + DminArea, 1e-30)))
    zetax2 = (1.0 + p.Ktens) * tmp
    rep_prs = (1.0 - p.Ktens) * tmp * Delta
    etax2 = p.epp2i * zetax2
    return zetax2, etax2, rep_prs


# ---------------------------------------------------------------------------
# B-grid momentum step (stepu, ice_dyn_shared.F90:847)
# ---------------------------------------------------------------------------

RHEO_AREA_MIN = 1.0e-3   # reference rheo_area_min (ice_dyn_shared.F90:67)


def stepu_dense(uvel, vvel, strintx, strinty, prep: DynPrep, p: EvpParams,
                uocn, vocn):
    """Momentum update given the internal stress divergence."""
    uold, vold = uvel, vvel
    vrel = prep.aiU * cst.rhow * prep.Cw * jnp.sqrt((uocn - uold) ** 2 +
                                                    (vocn - vold) ** 2)
    taux = vrel * prep.waterx
    tauy = vrel * prep.watery
    Cb = prep.TbU / (jnp.sqrt(uold ** 2 + vold ** 2) + cst.u0)
    cca = (p.brlx + p.revp) * prep.umassdti + vrel * cst.cosw + Cb
    sgn = jnp.sign(jnp.where(prep.fm == 0, 1.0, prep.fm))
    ccb = prep.fm + sgn * vrel * cst.sinw
    ab2 = cca * cca + ccb * ccb
    # rheology cutoff (reference rheo_area_min, ice_dyn_shared.F90:67 —
    # its rheofact zeroes the internal-stress divergence where
    # aiU <= 1e-3): a near-massless fringe point pushed by its icy
    # neighbors' stress has cca ~ umassdti ~ 0 and integrates to km/s
    # velocities; without stress it relaxes to the local drift balance.
    # The reference wires this through the C/CD solvers; we apply it to
    # the B grid as well (delta: fringe robustness, PARITY.md)
    rf = (prep.aiU > RHEO_AREA_MIN).astype(uold.dtype)
    cc1 = rf * strintx + prep.forcex + taux + \
        prep.umassdti * (p.brlx * uold + p.revp * prep.uvel_init)
    cc2 = rf * strinty + prep.forcey + tauy + \
        prep.umassdti * (p.brlx * vold + p.revp * prep.vvel_init)
    ab2 = jnp.where(prep.iceUmask, ab2, 1.0)
    rab2 = 1.0 / ab2          # one divide for the 2x2 solve, not two
    unew = jnp.where(prep.iceUmask, (cca * cc1 + ccb * cc2) * rab2, 0.0)
    vnew = jnp.where(prep.iceUmask, (cca * cc2 - ccb * cc1) * rab2, 0.0)
    taubx = -unew * Cb
    tauby = -vnew * Cb
    return unew, vnew, taubx, tauby


# ---------------------------------------------------------------------------
# deformation diagnostics (deformations, ice_dyn_shared.F90:1756)
# ---------------------------------------------------------------------------

def deformations_B(grid: Grid, uvel, vvel, p: EvpParams, dt_dyn: float):
    """divu, shear, Delta at T points from corner strain rates (B grid)."""
    sr = strain_rates_B(grid, uvel, vvel, p)
    tarear = grid.tarear
    divu = 0.25 * (sr.divune + sr.divunw + sr.divuse + sr.divusw) * tarear
    tension = 0.25 * (sr.tensionne + sr.tensionnw + sr.tensionse + sr.tensionsw) * tarear
    shearing = 0.25 * (sr.shearne + sr.shearnw + sr.shearse + sr.shearsw) * tarear
    shear = jnp.sqrt(tension ** 2 + shearing ** 2)
    Delta = 0.25 * (sr.Deltane + sr.Deltanw + sr.Deltase + sr.Deltasw) * tarear
    return divu, shear, Delta


class StrainRates(NamedTuple):
    divune: jnp.ndarray
    divunw: jnp.ndarray
    divuse: jnp.ndarray
    divusw: jnp.ndarray
    tensionne: jnp.ndarray
    tensionnw: jnp.ndarray
    tensionse: jnp.ndarray
    tensionsw: jnp.ndarray
    shearne: jnp.ndarray
    shearnw: jnp.ndarray
    shearse: jnp.ndarray
    shearsw: jnp.ndarray
    Deltane: jnp.ndarray
    Deltanw: jnp.ndarray
    Deltase: jnp.ndarray
    Deltasw: jnp.ndarray


def strain_rates_B(grid: Grid, uvel, vvel, p: EvpParams) -> StrainRates:
    """Bilinear corner strain rates * area (m^2/s) at each T cell
    (reference strain_rates ice_dyn_shared.F90:2083; NE/NW/SW/SE corners).

    uvel/vvel are U-point (NE-corner) fields; the stencil needs the W, S and
    SW corner values, i.e. shifts by -1 in i and/or j with vector-type
    tripole sign handling.
    """
    bc = grid.bc
    shu = partial(shift, bc=bc, loc=FIELD_LOC_NECORNER, ftype=FIELD_TYPE_VECTOR)
    u, v = uvel, vvel
    uw, vw = shu(u, 0, -1), shu(v, 0, -1)
    us, vs = shu(u, -1, 0), shu(v, -1, 0)
    usw, vsw = shu(u, -1, -1), shu(v, -1, -1)

    cyp, cxp, cym, cxm = grid.cyp, grid.cxp, grid.cym, grid.cxm
    dxT, dyT = grid.dxT, grid.dyT

    divune = cyp * u - dyT * uw + cxp * v - dxT * vs
    divunw = cym * uw + dyT * u + cxp * vw - dxT * vsw
    divusw = cym * usw + dyT * us + cxm * vsw + dxT * vw
    divuse = cyp * us - dyT * usw + cxm * vs + dxT * v

    tensionne = -cym * u - dyT * uw + cxm * v + dxT * vs
    tensionnw = -cyp * uw + dyT * u + cxm * vw + dxT * vsw
    tensionsw = -cyp * usw + dyT * us + cxp * vsw - dxT * vw
    tensionse = -cym * us - dyT * usw + cxp * vs - dxT * v

    shearne = -cym * v - dyT * vw - cxm * u - dxT * us
    shearnw = -cyp * vw + dyT * v - cxm * uw - dxT * usw
    shearsw = -cyp * vsw + dyT * vs - cxp * usw + dxT * uw
    shearse = -cym * vs - dyT * vsw - cxp * us + dxT * u

    ef = p.e_factor
    Deltane = jnp.sqrt(divune ** 2 + ef * (tensionne ** 2 + shearne ** 2))
    Deltanw = jnp.sqrt(divunw ** 2 + ef * (tensionnw ** 2 + shearnw ** 2))
    Deltasw = jnp.sqrt(divusw ** 2 + ef * (tensionsw ** 2 + shearsw ** 2))
    Deltase = jnp.sqrt(divuse ** 2 + ef * (tensionse ** 2 + shearse ** 2))

    return StrainRates(divune, divunw, divuse, divusw,
                       tensionne, tensionnw, tensionse, tensionsw,
                       shearne, shearnw, shearse, shearsw,
                       Deltane, Deltanw, Deltase, Deltasw)
