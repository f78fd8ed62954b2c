"""C-grid EVP dynamics solver.

TPU-native re-implementation of the C-grid path of
cicecore/cicedyn/dynamics/ice_dyn_evp.F90 (loop :938-1101, `stressC_T`:1758,
`stressC_U`:1898, `div_stress_{Ex,Ny}`:2195-2416) and ice_dyn_shared.F90
(`strain_rates_Tdtsd`:2171, `strain_rates_U`:2319, `stepu_C`/`stepv_C`) —
Bouillon et al. (2013), Kimmritz et al. (2016).

Prognostic velocities live on faces: uvelE (x-vel at E points) and vvelN
(y-vel at N points); stresses sigma_p/sigma_m at T points and sigma_12 at U
points. The subcycle loop is one `lax.fori_loop`; the reference's 5 halo
exchanges per iteration become XLA collective-permutes of the shifted edge
slabs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid, grid_average_X2Y
from ..core.halo import shift
from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_EFACE, FIELD_LOC_NFACE,
                         FIELD_LOC_NECORNER, FIELD_TYPE_SCALAR,
                         FIELD_TYPE_VECTOR)
from .common import EvpParams, visc_replpress


def _shT(f, dj, di, bc):
    return shift(f, dj, di, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)


def _shE(f, dj, di, bc, vec=True):
    return shift(f, dj, di, bc=bc, loc=FIELD_LOC_EFACE,
                 ftype=FIELD_TYPE_VECTOR if vec else FIELD_TYPE_SCALAR)


def _shN(f, dj, di, bc, vec=True):
    return shift(f, dj, di, bc=bc, loc=FIELD_LOC_NFACE,
                 ftype=FIELD_TYPE_VECTOR if vec else FIELD_TYPE_SCALAR)


def _shU(f, dj, di, bc, vec=False):
    return shift(f, dj, di, bc=bc, loc=FIELD_LOC_NECORNER,
                 ftype=FIELD_TYPE_VECTOR if vec else FIELD_TYPE_SCALAR)


def strain_rates_T_c(grid: Grid, uvelE, vvelN):
    """divT, tensionT (× area) from face velocities
    (strain_rates_Tdt, ice_dyn_shared.F90:2297)."""
    bc = grid.bc
    uE_w = _shE(uvelE, 0, -1, bc)
    vN_s = _shN(vvelN, -1, 0, bc)
    dyE_w = _shT(grid.dyE, 0, -1, bc)
    dxN_s = _shT(grid.dxN, -1, 0, bc)
    divT = (grid.dyE * uvelE - dyE_w * uE_w +
            grid.dxN * vvelN - dxN_s * vN_s)
    # all metric divisors max-guarded: real metrics are never 0, but the
    # wide-halo path (parallel/evp_wide.py) evaluates this on zero-padded
    # tiles where unguarded divides would mint NaNs in the ghost ring
    tensionT = (grid.dyT ** 2 * (uvelE / jnp.maximum(grid.dyE, 1.0) -
                                 uE_w / jnp.maximum(dyE_w, 1.0)) -
                grid.dxT ** 2 * (vvelN / jnp.maximum(grid.dxN, 1.0) -
                                 vN_s / jnp.maximum(dxN_s, 1.0)))
    return divT, tensionT


def strain_rates_U_c(grid: Grid, uvelE, vvelE, uvelN, vvelN, uvelU, vvelU):
    """divergU, tensionU, shearU, DeltaU (× area) at U points with one-sided
    masked boundary closures (strain_rates_U, ice_dyn_shared.F90:2319)."""
    bc = grid.bc
    npm, epm = grid.npm, grid.epm
    dxN, dyE, dxE, dyN, dxU, dyU = (grid.dxN, grid.dyE, grid.dxE, grid.dyN,
                                    grid.dxU, grid.dyU)
    # neighbor values (i+1 in x for N-point fields; j+1 in y for E-point)
    uN_e = _shN(uvelN, 0, 1, bc)
    vN_e = _shN(vvelN, 0, 1, bc)
    uE_n = _shE(uvelE, 1, 0, bc)
    vE_n = _shE(vvelE, 1, 0, bc)
    npm_e = _shU(npm, 0, 1, bc)
    epm_n = _shU(epm, 1, 0, bc)
    dxN_e = _shT(dxN, 0, 1, bc)
    dyE_n = _shT(dyE, 1, 0, bc)
    ratiodxN = -dxN_e / jnp.maximum(dxN, 1.0)
    ratiodxNr = -dxN / jnp.maximum(dxN_e, 1.0)
    ratiodyE = -dyE_n / jnp.maximum(dyE, 1.0)
    ratiodyEr = -dyE / jnp.maximum(dyE_n, 1.0)

    def bc_pair(f, f_nbr, m, m_nbr, ratio, ratio_r):
        """(value at i+1, value at i) with masked one-sided reflection."""
        f_p = f_nbr * m_nbr + (m - m_nbr) * m * ratio * f
        f_0 = f * m + (m_nbr - m) * m_nbr * ratio_r * f_nbr
        return f_p, f_0

    uNip1j, uNij = bc_pair(uvelN, uN_e, npm, npm_e, ratiodxN, ratiodxNr)
    vEijp1, vEij = bc_pair(vvelE, vE_n, epm, epm_n, ratiodyE, ratiodyEr)
    uEijp1, uEij = bc_pair(uvelE, uE_n, epm, epm_n, ratiodyE, ratiodyEr)
    vNip1j, vNij = bc_pair(vvelN, vN_e, npm, npm_e, ratiodxN, ratiodxNr)

    dyN_e = _shT(dyN, 0, 1, bc)
    dxE_n = _shT(dxE, 1, 0, bc)
    divergU = (dyU * (uNip1j - uNij) + uvelU * (dyN_e - dyN) +
               dxU * (vEijp1 - vEij) + vvelU * (dxE_n - dxE))
    tensionU = (dyU * (uNip1j - uNij) - uvelU * (dyN_e - dyN) -
                dxU * (vEijp1 - vEij) + vvelU * (dxE_n - dxE))
    shearU = (dxU * (uEijp1 - uEij) - uvelU * (dxE_n - dxE) +
              dyU * (vNip1j - vNij) - vvelU * (dyN_e - dyN))
    return divergU, tensionU, shearU


class CPrep(NamedTuple):
    """Momentum-equation inputs at E and N points."""
    iceTmask: jnp.ndarray
    iceEmask: jnp.ndarray
    iceNmask: jnp.ndarray
    aiE: jnp.ndarray
    aiN: jnp.ndarray
    emassdti: jnp.ndarray
    nmassdti: jnp.ndarray
    fmE: jnp.ndarray
    fmN: jnp.ndarray
    waterxE: jnp.ndarray
    wateryN: jnp.ndarray
    forcexE: jnp.ndarray
    forceyN: jnp.ndarray
    uocnE: jnp.ndarray
    vocnE: jnp.ndarray
    uocnN: jnp.ndarray
    vocnN: jnp.ndarray
    uvelE_init: jnp.ndarray
    vvelN_init: jnp.ndarray
    TbE: jnp.ndarray
    TbN: jnp.ndarray
    Cw: jnp.ndarray


def dyn_prep_c(grid: Grid, cfg_dyn, dt: float, *, aice, vice, vsno,
               uvelE, vvelN, strairxT, strairyT, uocn_T, vocn_T) -> CPrep:
    """T→E/N interpolation of mass, forcing & currents (the C-grid section
    at the top of evp(), ice_dyn_evp.F90)."""
    tmass = cst.rhoi * vice + cst.rhos * vsno
    tmphm = grid.tmask & (aice > 1e-11) & (tmass > 1e-10)
    bc = grid.bc
    near = tmphm
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if dj or di:
                near = near | (_shT(tmphm.astype(jnp.float32), dj, di,
                                    bc) > 0.5)
    iceTmask = near & grid.tmask

    def toE(f, kind="S"):
        return grid_average_X2Y(kind, f, "T", "E", grid)

    def toN(f, kind="S"):
        return grid_average_X2Y(kind, f, "T", "N", grid)

    aiE, aiN = toE(aice), toN(aice)
    emass, nmass = toE(tmass), toN(tmass)
    uocnE, vocnE = toE(uocn_T), toE(vocn_T)
    uocnN, vocnN = toN(uocn_T), toN(vocn_T)
    strairxE = toE(strairxT, "F")
    strairyN = toN(strairyT, "F")

    iceEmask = (grid.epm > 0.5) & (aiE > 1e-11) & (emass > 1e-10)
    iceNmask = (grid.npm > 0.5) & (aiN > 1e-11) & (nmass > 1e-10)

    emassdti = jnp.where(iceEmask, emass / dt, 0.0)
    nmassdti = jnp.where(iceNmask, nmass / dt, 0.0)
    latE = 0.5 * (grid.TLAT + _shT(grid.TLAT, 0, 1, bc))
    latN = 0.5 * (grid.TLAT + _shT(grid.TLAT, 1, 0, bc))
    if cfg_dyn.coriolis == "constant":
        fE = jnp.full_like(latE, 1.46e-4)
        fN = jnp.full_like(latN, 1.46e-4)
    elif cfg_dyn.coriolis == "zero":
        fE = jnp.zeros_like(latE)
        fN = jnp.zeros_like(latN)
    else:
        fE = 2.0 * cst.omega * jnp.sin(latE)
        fN = 2.0 * cst.omega * jnp.sin(latN)
    fmE = jnp.where(iceEmask, fE * emass, 0.0)
    fmN = jnp.where(iceNmask, fN * nmass, 0.0)

    sgnE = jnp.sign(jnp.where(fmE == 0, 1.0, fmE))
    sgnN = jnp.sign(jnp.where(fmN == 0, 1.0, fmN))
    waterxE = jnp.where(iceEmask, uocnE * cst.cosw - vocnE * cst.sinw * sgnE, 0.0)
    wateryN = jnp.where(iceNmask, vocnN * cst.cosw + uocnN * cst.sinw * sgnN, 0.0)
    forcexE = jnp.where(iceEmask, strairxE - fmE * vocnE, 0.0)
    forceyN = jnp.where(iceNmask, strairyN + fmN * uocnN, 0.0)

    uvelE = jnp.where(iceEmask, uvelE, 0.0)
    vvelN = jnp.where(iceNmask, vvelN, 0.0)

    # landfast seabed stress at the faces (seabed_stress_factor_LKD for
    # grid_ice C/CD)
    if cfg_dyn.seabed_stress:
        TbE = seabed_stress_LKD_face(grid, cfg_dyn, aice, vice, iceEmask, "E")
        TbN = seabed_stress_LKD_face(grid, cfg_dyn, aice, vice, iceNmask, "N")
    else:
        TbE = jnp.zeros_like(aiE)
        TbN = jnp.zeros_like(aiN)

    return CPrep(iceTmask=iceTmask, iceEmask=iceEmask, iceNmask=iceNmask,
                 aiE=aiE, aiN=aiN, emassdti=emassdti, nmassdti=nmassdti,
                 fmE=fmE, fmN=fmN, waterxE=waterxE, wateryN=wateryN,
                 forcexE=forcexE, forceyN=forceyN,
                 uocnE=uocnE, vocnE=vocnE, uocnN=uocnN, vocnN=vocnN,
                 uvelE_init=uvelE, vvelN_init=vvelN,
                 TbE=TbE, TbN=TbN,
                 Cw=jnp.full_like(aiE, cst.dragio))


class CDPrepExtra(NamedTuple):
    """Additional E/N-point momentum inputs for the CD grid (both velocity
    components live at both faces; reference stepuv_CD)."""
    forceyE: jnp.ndarray
    wateryE: jnp.ndarray
    forcexN: jnp.ndarray
    waterxN: jnp.ndarray
    vvelE_init: jnp.ndarray
    uvelN_init: jnp.ndarray


def dyn_prep_cd(grid: Grid, cfg_dyn, dt: float, prep: CPrep, *,
                vvelE, uvelN, strairxT, strairyT) -> CDPrepExtra:
    """The CD-grid extras on top of dyn_prep_c: y-forcing at E points and
    x-forcing at N points."""
    def toE(f, kind="S"):
        return grid_average_X2Y(kind, f, "T", "E", grid)

    def toN(f, kind="S"):
        return grid_average_X2Y(kind, f, "T", "N", grid)

    strairyE = toE(strairyT, "F")
    strairxN = toN(strairxT, "F")
    sgnE = jnp.sign(jnp.where(prep.fmE == 0, 1.0, prep.fmE))
    sgnN = jnp.sign(jnp.where(prep.fmN == 0, 1.0, prep.fmN))
    wateryE = jnp.where(prep.iceEmask,
                        prep.vocnE * cst.cosw + prep.uocnE * cst.sinw * sgnE,
                        0.0)
    waterxN = jnp.where(prep.iceNmask,
                        prep.uocnN * cst.cosw - prep.vocnN * cst.sinw * sgnN,
                        0.0)
    forceyE = jnp.where(prep.iceEmask, strairyE + prep.fmE * prep.uocnE, 0.0)
    forcexN = jnp.where(prep.iceNmask, strairxN - prep.fmN * prep.vocnN, 0.0)
    return CDPrepExtra(forceyE=forceyE, wateryE=wateryE, forcexN=forcexN,
                       waterxN=waterxN,
                       vvelE_init=jnp.where(prep.iceEmask, vvelE, 0.0),
                       uvelN_init=jnp.where(prep.iceNmask, uvelN, 0.0))


def c_stress_divergence(grid, spT, smT, s12U):
    """strintxE / strintyN from the C-grid stress state
    (div_stress_Ex / div_stress_Ny, ice_dyn_evp.F90:2195-2416)."""
    bc = grid.bc
    spT_e = _shE(spT, 0, 1, bc, vec=False)
    smT_e = _shE(smT, 0, 1, bc, vec=False)
    dyT_e = _shT(grid.dyT, 0, 1, bc)
    s12_s = _shE(s12U, -1, 0, bc, vec=False)
    dxU_s = _shT(grid.dxU, -1, 0, bc)
    earear = jnp.where(grid.earea > 0, 1.0 / jnp.maximum(grid.earea, 1.0), 0.0)
    strintxE = earear * (
        0.5 * grid.dyE * (spT_e - spT)
        + (0.5 / jnp.maximum(grid.dyE, 1.0)) *
        (dyT_e ** 2 * smT_e - grid.dyT ** 2 * smT)
        + (1.0 / jnp.maximum(grid.dxE, 1.0)) *
        (grid.dxU ** 2 * s12U - dxU_s ** 2 * s12_s))

    spT_n = _shN(spT, 1, 0, bc, vec=False)
    smT_n = _shN(smT, 1, 0, bc, vec=False)
    dxT_n = _shT(grid.dxT, 1, 0, bc)
    s12_w = _shN(s12U, 0, -1, bc, vec=False)
    dyU_w = _shT(grid.dyU, 0, -1, bc)
    narear = jnp.where(grid.narea > 0, 1.0 / jnp.maximum(grid.narea, 1.0), 0.0)
    strintyN = narear * (
        0.5 * grid.dxN * (spT_n - spT)
        - (0.5 / jnp.maximum(grid.dxN, 1.0)) *
        (dxT_n ** 2 * smT_n - grid.dxT ** 2 * smT)
        + (1.0 / jnp.maximum(grid.dyN, 1.0)) *
        (grid.dyU ** 2 * s12U - dyU_w ** 2 * s12_w))
    return strintxE, strintyN


def deformations_C(grid: Grid, uvelE, vvelN, p: EvpParams):
    """divu, shear, Delta at T points from C-grid strain rates (reference
    deformationsC_T, ice_dyn_shared.F90:1968): T-point divergence/tension
    plus area-averaged U-point shear."""
    bc = grid.bc
    vvelE = grid_average_X2Y("S", vvelN, "N", "E", grid)
    uvelN = grid_average_X2Y("S", uvelE, "E", "N", grid)
    uvelU = grid_average_X2Y("S", uvelE, "E", "U", grid)
    vvelU = grid_average_X2Y("S", vvelN, "N", "U", grid)
    divU, tenU, shearU = strain_rates_U_c(grid, uvelE, vvelE, uvelN,
                                          vvelN, uvelU, vvelU)
    divT, tensionT = strain_rates_T_c(grid, uvelE, vvelN)
    uarea = grid.uarea
    uarea_w = _shU(uarea, 0, -1, bc)
    uarea_s = _shU(uarea, -1, 0, bc)
    uarea_sw = _shU(uarea, -1, -1, bc)
    den = jnp.maximum(uarea + uarea_w + uarea_s + uarea_sw, 1.0)
    shearT = (shearU * uarea + _shU(shearU, 0, -1, bc) * uarea_w +
              _shU(shearU, -1, 0, bc) * uarea_s +
              _shU(shearU, -1, -1, bc) * uarea_sw) / den
    tarear = grid.tarear
    divu = divT * tarear
    shear = jnp.sqrt(tensionT ** 2 + shearT ** 2) * tarear
    Delta = jnp.sqrt(divT ** 2 + p.e_factor * (tensionT ** 2 +
                                               shearT ** 2)) * tarear
    return divu, shear, Delta


def seabed_stress_LKD_face(grid: Grid, cfg_dyn, aice, vice, mask, face: str):
    """Lemieux et al. landfast seabed stress factor at E or N points
    (reference seabed_stress_factor_LKD at grid_ice C/CD: the two adjacent
    T cells instead of the U point's four)."""
    bc = grid.bc
    offs = [(0, 0), (0, 1)] if face == "E" else [(0, 0), (1, 0)]
    sh = lambda f, dj, di: _shT(f, dj, di, bc)
    hw2 = [sh(grid.bathymetry, dj, di) for dj, di in offs]
    hwf = jnp.min(jnp.stack([jnp.where(h > 0, h, 1e30) for h in hw2]), axis=0)
    af = jnp.max(jnp.stack([sh(aice, dj, di) for dj, di in offs]), axis=0)
    hf = jnp.max(jnp.stack([sh(vice, dj, di) for dj, di in offs]), axis=0)
    docalc = (hwf < cfg_dyn.threshold_hw) & mask
    hcf = af * hwf / cfg_dyn.k1
    Tb = cfg_dyn.k2 * jnp.maximum(0.0, hf - hcf) * \
        jnp.exp(-cfg_dyn.alphab * (1.0 - af))
    return jnp.where(docalc, Tb, 0.0)


def c_dyn_finish(grid: Grid, prep: CPrep, uvelE, vvelN, spT, smT, s12U,
                 *, vvelE=None, uvelN=None, strintyE=None, strintxN=None):
    """Post-subcycle coupler/diagnostic exports for C/CD grids (reference
    ice_dyn_evp.F90:1380-1445 dyn_finish at E/N + strint U averages).

    Returns a dict with U-point strintx/strinty, taubx/tauby and
    strocnx/strocny (the same planes the B path exports), plus the native
    E/N planes."""
    # transverse velocities at the faces (C grid: interpolated)
    if vvelE is None:
        vvelE = grid_average_X2Y("S", vvelN, "N", "E", grid)
    if uvelN is None:
        uvelN = grid_average_X2Y("S", uvelE, "E", "N", grid)

    strintxE, strintyN = c_stress_divergence(grid, spT, smT, s12U)

    # seabed drag at the converged velocities (taub = -u*Cb; stepu_C tail)
    CbE = prep.TbE / (jnp.sqrt(uvelE ** 2 + vvelE ** 2) + cst.u0)
    CbN = prep.TbN / (jnp.sqrt(uvelN ** 2 + vvelN ** 2) + cst.u0)
    taubxE = -uvelE * CbE
    taubyN = -vvelN * CbN

    # ice-ocean stress at the faces (dyn_finish, ice_dyn_shared.F90)
    def strocn(u, v, uocn, vocn, ai, fm):
        vrel = ai * cst.rhow * prep.Cw * jnp.sqrt((uocn - u) ** 2 +
                                                  (vocn - v) ** 2)
        sgn = jnp.sign(jnp.where(fm == 0, 1.0, fm))
        sx = vrel * ((uocn - u) * cst.cosw - (vocn - v) * cst.sinw * sgn)
        sy = vrel * ((vocn - v) * cst.cosw + (uocn - u) * cst.sinw * sgn)
        return sx, sy

    strocnxE, strocnyE = strocn(uvelE, vvelE, prep.uocnE, prep.vocnE,
                                prep.aiE, prep.fmE)
    strocnxN, strocnyN = strocn(uvelN, vvelN, prep.uocnN, prep.vocnN,
                                prep.aiN, prep.fmN)

    # U-point exports (grid_average_X2Y('S', E/N -> U), reference :1437-1444)
    toU_E = lambda f: grid_average_X2Y("S", f, "E", "U", grid)
    toU_N = lambda f: grid_average_X2Y("S", f, "N", "U", grid)
    out = dict(
        strintx=toU_E(strintxE), strinty=toU_N(strintyN),
        taubx=toU_E(taubxE), tauby=toU_N(taubyN),
        strocnx=toU_E(strocnxE), strocny=toU_N(strocnyN),
        strintxE=strintxE, strintyN=strintyN,
        taubxE=taubxE, taubyN=taubyN,
        strocnxE=strocnxE, strocnyE=strocnyE,
        strocnxN=strocnxN, strocnyN=strocnyN)
    if strintyE is not None:
        out["strinty"] = 0.5 * (out["strinty"] + toU_E(strintyE))
        out["tauby"] = 0.5 * (out["tauby"] + toU_E(-vvelE * CbE))
        out["strintyE"] = strintyE
        out["taubyE"] = -vvelE * CbE
    if strintxN is not None:
        out["strintx"] = 0.5 * (out["strintx"] + toU_N(strintxN))
        out["taubx"] = 0.5 * (out["taubx"] + toU_N(-uvelN * CbN))
        out["strintxN"] = strintxN
        out["taubxN"] = -uvelN * CbN
    return out


class CEvpState(NamedTuple):
    uvelE: jnp.ndarray
    vvelN: jnp.ndarray
    stresspT: jnp.ndarray
    stressmT: jnp.ndarray
    stress12U: jnp.ndarray


def c_subcycle_step(grid, p: EvpParams, prep: CPrep, strength, DminTarea,
                    st: CEvpState) -> CEvpState:
    """One C-grid elastic subcycle (stress at T & U + E/N momentum) —
    shared by the fori_loop solver below and the wide-halo shard_map path
    (parallel/evp_wide.py). `grid` may be a Grid or a namespace of the
    same plane attributes."""
    bc = grid.bc
    c1m = 1.0 - p.arlx1i * p.revp
    a1, d1 = p.arlx1i, p.denom1

    uarea = grid.uarea
    uarea_w = _shU(uarea, 0, -1, bc)
    uarea_s = _shU(uarea, -1, 0, bc)
    uarea_sw = _shU(uarea, -1, -1, bc)

    if True:   # single block (indentation preserved from the loop-body form)
        uvelE, vvelN = st.uvelE, st.vvelN
        # derived face/corner velocities (reference: grid_average per iter)
        vvelE = grid_average_X2Y("S", vvelN, "N", "E", grid)
        uvelN = grid_average_X2Y("S", uvelE, "E", "N", grid)
        uvelU = grid_average_X2Y("S", uvelE, "E", "U", grid)
        vvelU = grid_average_X2Y("S", vvelN, "N", "U", grid)

        divU, tenU, shearU = strain_rates_U_c(grid, uvelE, vvelE, uvelN,
                                              vvelN, uvelU, vvelU)

        # --- T-point stress (stressC_T) --------------------------------
        divT, tensionT = strain_rates_T_c(grid, uvelE, vvelN)
        shU_w = _shU(shearU, 0, -1, bc)
        shU_s = _shU(shearU, -1, 0, bc)
        shU_sw = _shU(shearU, -1, -1, bc)
        den = jnp.maximum(uarea + uarea_w + uarea_s + uarea_sw, 1.0)
        shearTsqr = (shearU ** 2 * uarea + shU_w ** 2 * uarea_w +
                     shU_s ** 2 * uarea_s + shU_sw ** 2 * uarea_sw) / den
        shearT = (shearU * uarea + shU_w * uarea_w +
                  shU_s * uarea_s + shU_sw * uarea_sw) / den
        DeltaT = jnp.sqrt(divT ** 2 + p.e_factor * (tensionT ** 2 + shearTsqr))
        zetax2T, etax2T, rep_prsT = visc_replpress(strength, DminTarea, DeltaT, p)

        m = prep.iceTmask
        spT = jnp.where(m, (st.stresspT * c1m +
                            a1 * (zetax2T * divT - rep_prsT)) * d1, st.stresspT)
        smT = jnp.where(m, (st.stressmT * c1m +
                            a1 * etax2T * tensionT) * d1, st.stressmT)

        # --- U-point stress12 (stressC_U, visc_method='avg_zeta') ------
        e_e = _shU(etax2T, 0, 1, bc)
        e_n = _shU(etax2T, 1, 0, bc)
        e_ne = _shU(etax2T, 1, 1, bc)
        ta = grid.tarea
        ta_e = _shU(ta, 0, 1, bc)
        ta_n = _shU(ta, 1, 0, bc)
        ta_ne = _shU(ta, 1, 1, bc)
        etax2U = (etax2T * ta + e_e * ta_e + e_n * ta_n + e_ne * ta_ne) / \
            jnp.maximum(ta + ta_e + ta_n + ta_ne, 1.0)
        s12U = (st.stress12U * c1m + a1 * 0.5 * etax2U * shearU) * d1

        # --- divergence of stress at E (x) and N (y) --------------------
        strintxE, strintyN = c_stress_divergence(grid, spT, smT, s12U)
        # rheology cutoff at near-massless face points (reference
        # rheofactE/N, rheo_area_min=1e-3, ice_dyn_shared.F90:67 +
        # div_stress_* multiplies): without it a fringe point pushed by
        # its neighbors' stress with emassdti ~ 0 integrates to km/s
        from .common import RHEO_AREA_MIN
        strintxE = strintxE * (prep.aiE > RHEO_AREA_MIN).astype(
            strintxE.dtype)
        strintyN = strintyN * (prep.aiN > RHEO_AREA_MIN).astype(
            strintyN.dtype)

        # --- momentum: u at E (stepu_C), v at N (stepv_C) ---------------
        # explicit transverse velocity via interpolation
        vold_E = grid_average_X2Y("S", vvelN, "N", "E", grid)
        uold_N = grid_average_X2Y("S", uvelE, "E", "N", grid)

        vrelE = prep.aiE * cst.rhow * prep.Cw * jnp.sqrt(
            (prep.uocnE - uvelE) ** 2 + (prep.vocnE - vold_E) ** 2)
        CbE = prep.TbE / (jnp.sqrt(uvelE ** 2 + vold_E ** 2) + cst.u0)
        ccaE = (p.brlx + p.revp) * prep.emassdti + vrelE * cst.cosw + CbE
        sgnE = jnp.sign(jnp.where(prep.fmE == 0, 1.0, prep.fmE))
        ccbE = prep.fmE + sgnE * vrelE * cst.sinw
        cc1 = strintxE + prep.forcexE + vrelE * prep.waterxE \
            + prep.emassdti * (p.brlx * uvelE + p.revp * prep.uvelE_init)
        uE_new = jnp.where(prep.iceEmask,
                           (ccbE * vold_E + cc1) / jnp.where(prep.iceEmask, ccaE, 1.0),
                           0.0)

        vrelN = prep.aiN * cst.rhow * prep.Cw * jnp.sqrt(
            (prep.uocnN - uold_N) ** 2 + (prep.vocnN - vvelN) ** 2)
        CbN = prep.TbN / (jnp.sqrt(uold_N ** 2 + vvelN ** 2) + cst.u0)
        ccaN = (p.brlx + p.revp) * prep.nmassdti + vrelN * cst.cosw + CbN
        sgnN = jnp.sign(jnp.where(prep.fmN == 0, 1.0, prep.fmN))
        ccbN = prep.fmN + sgnN * vrelN * cst.sinw
        cc2 = strintyN + prep.forceyN + vrelN * prep.wateryN \
            + prep.nmassdti * (p.brlx * vvelN + p.revp * prep.vvelN_init)
        vN_new = jnp.where(prep.iceNmask,
                           (-ccbN * uold_N + cc2) / jnp.where(prep.iceNmask, ccaN, 1.0),
                           0.0)

        return CEvpState(uE_new, vN_new, spT, smT, s12U)


def evp_c_solve(grid: Grid, p: EvpParams, prep: CPrep, strength,
                stresspT, stressmT, stress12U):
    """C-grid EVP subcycle loop (ice_dyn_evp.F90:938-1101)."""
    DminTarea = p.deltaminEVP * grid.tarea
    init = CEvpState(prep.uvelE_init, prep.vvelN_init,
                     jnp.where(prep.iceTmask, stresspT, 0.0),
                     jnp.where(prep.iceTmask, stressmT, 0.0),
                     stress12U)
    final = jax.lax.fori_loop(
        0, p.ndte,
        lambda _, st: c_subcycle_step(grid, p, prep, strength, DminTarea, st),
        init)

    # B-grid-compatible corner velocity for transport/coupling
    uvelU = grid_average_X2Y("S", final.uvelE, "E", "U", grid)
    vvelU = grid_average_X2Y("S", final.vvelN, "N", "U", grid)
    return final, uvelU, vvelU


class CDEvpState(NamedTuple):
    """CD-grid prognostic set: both velocity components at both faces,
    stress tensor at T and U points (reference stressCD_T:1978,
    stressCD_U:2088, stepuv_CD)."""
    uvelE: jnp.ndarray
    vvelE: jnp.ndarray
    uvelN: jnp.ndarray
    vvelN: jnp.ndarray
    stresspT: jnp.ndarray
    stressmT: jnp.ndarray
    stress12T: jnp.ndarray
    stresspU: jnp.ndarray
    stressmU: jnp.ndarray
    stress12U: jnp.ndarray


def evp_cd_solve(grid: Grid, p: EvpParams, prep: CPrep, extra: CDPrepExtra,
                 strength, init: CDEvpState):
    """CD-grid EVP subcycle loop (ice_dyn_evp.F90:1125-1293): stresses at
    BOTH T and U points, momentum stepped for BOTH components at E and N
    via an implicit 2x2 point solve."""
    bc = grid.bc
    DminTarea = p.deltaminEVP * grid.tarea
    DminUarea = p.deltaminEVP * grid.uarea
    c1m = 1.0 - p.arlx1i * p.revp
    a1, d1 = p.arlx1i, p.denom1

    uarea = grid.uarea
    uarea_w = _shU(uarea, 0, -1, bc)
    uarea_s = _shU(uarea, -1, 0, bc)
    uarea_sw = _shU(uarea, -1, -1, bc)
    ta = grid.tarea
    ta_e = _shU(ta, 0, 1, bc)
    ta_n = _shU(ta, 1, 0, bc)
    ta_ne = _shU(ta, 1, 1, bc)

    def body(_, st: CDEvpState):
        uvelE, vvelE, uvelN, vvelN = st.uvelE, st.vvelE, st.uvelN, st.vvelN
        uvelU = grid_average_X2Y("S", uvelE, "E", "U", grid)
        vvelU = grid_average_X2Y("S", vvelN, "N", "U", grid)

        divU, tenU, shearU = strain_rates_U_c(grid, uvelE, vvelE, uvelN,
                                              vvelN, uvelU, vvelU)

        # --- T-point stresses (stressCD_T: full tensor) ----------------
        divT, tensionT = strain_rates_T_c(grid, uvelE, vvelN)
        shU_w = _shU(shearU, 0, -1, bc)
        shU_s = _shU(shearU, -1, 0, bc)
        shU_sw = _shU(shearU, -1, -1, bc)
        den = uarea + uarea_w + uarea_s + uarea_sw
        shearT = (shearU * uarea + shU_w * uarea_w +
                  shU_s * uarea_s + shU_sw * uarea_sw) / den
        DeltaT = jnp.sqrt(divT ** 2 + p.e_factor * (tensionT ** 2 +
                                                    shearT ** 2))
        zetax2T, etax2T, rep_prsT = visc_replpress(strength, DminTarea,
                                                   DeltaT, p)
        m = prep.iceTmask
        spT = jnp.where(m, (st.stresspT * c1m +
                            a1 * (zetax2T * divT - rep_prsT)) * d1,
                        st.stresspT)
        smT = jnp.where(m, (st.stressmT * c1m +
                            a1 * etax2T * tensionT) * d1, st.stressmT)
        s12T = jnp.where(m, (st.stress12T * c1m +
                             a1 * 0.5 * etax2T * shearT) * d1, st.stress12T)

        # --- U-point stresses (stressCD_U, visc_method='avg_zeta') -----
        def uavg(f):
            return (f * ta + _shU(f, 0, 1, bc) * ta_e +
                    _shU(f, 1, 0, bc) * ta_n + _shU(f, 1, 1, bc) * ta_ne) / \
                (ta + ta_e + ta_n + ta_ne)
        strU = uavg(strength)
        DeltaU = jnp.sqrt(divU ** 2 + p.e_factor * (tenU ** 2 +
                                                    shearU ** 2))
        zetax2U, etax2U, rep_prsU = visc_replpress(strU, DminUarea, DeltaU, p)
        spU = (st.stresspU * c1m + a1 * (zetax2U * divU - rep_prsU)) * d1
        smU = (st.stressmU * c1m + a1 * etax2U * tenU) * d1
        s12U = (st.stress12U * c1m + a1 * 0.5 * etax2U * shearU) * d1

        # --- stress divergences at E (x & y) and N (x & y) --------------
        earear = jnp.where(grid.earea > 0,
                           1.0 / jnp.maximum(grid.earea, 1.0), 0.0)
        narear = jnp.where(grid.narea > 0,
                           1.0 / jnp.maximum(grid.narea, 1.0), 0.0)

        # div_stress_Ex (T normal stresses, U shear): as the C grid
        spT_e = _shE(spT, 0, 1, bc, vec=False)
        smT_e = _shE(smT, 0, 1, bc, vec=False)
        dyT_e = _shT(grid.dyT, 0, 1, bc)
        s12U_s = _shE(s12U, -1, 0, bc, vec=False)
        dxU_s = _shT(grid.dxU, -1, 0, bc)
        strintxE = earear * (
            0.5 * grid.dyE * (spT_e - spT)
            + (0.5 / grid.dyE) * (dyT_e ** 2 * smT_e - grid.dyT ** 2 * smT)
            + (1.0 / grid.dxE) * (grid.dxU ** 2 * s12U -
                                  dxU_s ** 2 * s12U_s))

        # div_stress_Ey (U normal stresses, T shear)
        spU_s = _shE(spU, -1, 0, bc, vec=False)
        smU_s = _shE(smU, -1, 0, bc, vec=False)
        s12T_e = _shE(s12T, 0, 1, bc, vec=False)
        strintyE = earear * (
            0.5 * grid.dxE * (spU - spU_s)
            - (0.5 / grid.dxE) * (grid.dxU ** 2 * smU - dxU_s ** 2 * smU_s)
            + (1.0 / grid.dyE) * (dyT_e ** 2 * s12T_e -
                                  grid.dyT ** 2 * s12T))

        # div_stress_Ny (T normal stresses, U shear): as the C grid
        spT_n = _shN(spT, 1, 0, bc, vec=False)
        smT_n = _shN(smT, 1, 0, bc, vec=False)
        dxT_n = _shT(grid.dxT, 1, 0, bc)
        s12U_w = _shN(s12U, 0, -1, bc, vec=False)
        dyU_w = _shT(grid.dyU, 0, -1, bc)
        strintyN = narear * (
            0.5 * grid.dxN * (spT_n - spT)
            - (0.5 / grid.dxN) * (dxT_n ** 2 * smT_n - grid.dxT ** 2 * smT)
            + (1.0 / grid.dyN) * (grid.dyU ** 2 * s12U -
                                  dyU_w ** 2 * s12U_w))

        # div_stress_Nx (U normal stresses, T shear)
        spU_w = _shN(spU, 0, -1, bc, vec=False)
        smU_w = _shN(smU, 0, -1, bc, vec=False)
        s12T_n = _shN(s12T, 1, 0, bc, vec=False)
        strintxN = narear * (
            0.5 * grid.dyN * (spU - spU_w)
            + (0.5 / grid.dyN) * (grid.dyU ** 2 * smU - dyU_w ** 2 * smU_w)
            + (1.0 / grid.dxN) * (dxT_n ** 2 * s12T_n -
                                  grid.dxT ** 2 * s12T))

        # rheology cutoff (reference rheofactE/N; see the C-grid solver)
        from .common import RHEO_AREA_MIN
        rfE = (prep.aiE > RHEO_AREA_MIN).astype(strintxE.dtype)
        rfN = (prep.aiN > RHEO_AREA_MIN).astype(strintyN.dtype)
        strintxE = strintxE * rfE
        strintyE = strintyE * rfE
        strintyN = strintyN * rfN
        strintxN = strintxN * rfN

        # --- momentum: implicit 2x2 at E and at N (stepuv_CD) -----------
        vrelE = prep.aiE * cst.rhow * prep.Cw * jnp.sqrt(
            (prep.uocnE - uvelE) ** 2 + (prep.vocnE - vvelE) ** 2)
        CbE = prep.TbE / (jnp.sqrt(uvelE ** 2 + vvelE ** 2) + cst.u0)
        ccaE = (p.brlx + p.revp) * prep.emassdti + vrelE * cst.cosw + CbE
        ccaE = jnp.where(prep.iceEmask, ccaE, 1.0)
        sgnE = jnp.sign(jnp.where(prep.fmE == 0, 1.0, prep.fmE))
        ccbE = prep.fmE + sgnE * vrelE * cst.sinw
        cc1 = strintxE + prep.forcexE + vrelE * prep.waterxE \
            + prep.emassdti * (p.brlx * uvelE + p.revp * prep.uvelE_init)
        cc2 = strintyE + extra.forceyE + vrelE * extra.wateryE \
            + prep.emassdti * (p.brlx * vvelE + p.revp * extra.vvelE_init)
        detE = ccaE ** 2 + ccbE ** 2
        uE_new = jnp.where(prep.iceEmask, (ccaE * cc1 + ccbE * cc2) / detE,
                           0.0)
        vE_new = jnp.where(prep.iceEmask, (ccaE * cc2 - ccbE * cc1) / detE,
                           0.0)

        vrelN = prep.aiN * cst.rhow * prep.Cw * jnp.sqrt(
            (prep.uocnN - uvelN) ** 2 + (prep.vocnN - vvelN) ** 2)
        CbN = prep.TbN / (jnp.sqrt(uvelN ** 2 + vvelN ** 2) + cst.u0)
        ccaN = (p.brlx + p.revp) * prep.nmassdti + vrelN * cst.cosw + CbN
        ccaN = jnp.where(prep.iceNmask, ccaN, 1.0)
        sgnN = jnp.sign(jnp.where(prep.fmN == 0, 1.0, prep.fmN))
        ccbN = prep.fmN + sgnN * vrelN * cst.sinw
        cc3 = strintxN + extra.forcexN + vrelN * extra.waterxN \
            + prep.nmassdti * (p.brlx * uvelN + p.revp * extra.uvelN_init)
        cc4 = strintyN + prep.forceyN + vrelN * prep.wateryN \
            + prep.nmassdti * (p.brlx * vvelN + p.revp * prep.vvelN_init)
        detN = ccaN ** 2 + ccbN ** 2
        uN_new = jnp.where(prep.iceNmask, (ccaN * cc3 + ccbN * cc4) / detN,
                           0.0)
        vN_new = jnp.where(prep.iceNmask, (ccaN * cc4 - ccbN * cc3) / detN,
                           0.0)

        return CDEvpState(uE_new, vE_new, uN_new, vN_new,
                          spT, smT, s12T, spU, smU, s12U)

    final = jax.lax.fori_loop(0, p.ndte, body, init)
    uvelU = grid_average_X2Y("S", final.uvelE, "E", "U", grid)
    vvelU = grid_average_X2Y("S", final.vvelN, "N", "U", grid)
    return final, uvelU, vvelU
