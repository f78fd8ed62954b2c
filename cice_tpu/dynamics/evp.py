"""B-grid elastic-viscous-plastic (EVP) dynamics solver.

TPU-native re-implementation of cicecore/cicedyn/dynamics/ice_dyn_evp.F90
(`evp`:259, `stress`:1457) with the bilinear variational stress discretization
of Hunke & Dukowicz (2002) and the Bouillon et al. (2013) revised-EVP option.

Structure: the reference runs `do ksub=1,ndte` with one MPI halo exchange per
subcycle. Here the whole subcycle loop is a single `lax.fori_loop` over dense
(ny, nx) arrays inside jit — neighbor access lowers to XLA collective-permutes
of edge slabs when the arrays are sharded, and XLA fuses the stress + momentum
updates into a handful of HBM passes. No index lists, no gather/scatter: masks
(`jnp.where`) carry the active-cell logic (ice_dyn_shared.F90 dyn_prep2's
icellT/indxTi compression).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid
from ..core.halo import shift
from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_NECORNER,
                         FIELD_TYPE_SCALAR, FIELD_TYPE_VECTOR)
from .common import (DynPrep, EvpParams, StrainRates, strain_rates_B,
                     stepu_dense, visc_replpress, deformations_B)

# bilinear basis-integral coefficients (reference ice_constants.F90:79-85)
P5, P25 = 0.5, 0.25
P333 = 1.0 / 3.0
P166 = 1.0 / 6.0
P222 = 2.0 / 9.0
P111 = 1.0 / 9.0
P055 = 1.0 / 18.0
P027 = 1.0 / 36.0


class EvpState(NamedTuple):
    """Carry of the subcycle loop."""
    uvel: jnp.ndarray
    vvel: jnp.ndarray
    stressp: jnp.ndarray   # (4, ny, nx): NE, NW, SW, SE corner sigma11+sigma22
    stressm: jnp.ndarray   # sigma11-sigma22
    stress12: jnp.ndarray  # sigma12


def stress_update(grid: Grid, p: EvpParams, strength, DminTarea,
                  uvel, vvel, stressp, stressm, stress12, iceTmask):
    """One elastic stress relaxation step + stress-divergence force.

    Returns updated (stressp, stressm, stress12) — each (4, ny, nx) with
    corner order [NE, NW, SW, SE] = reference suffixes _1.._4 reordered as
    (1, 2, 3, 4) = (NE, NW, SW, SE) — and (strintx, strinty) at U points.
    Mirrors `stress` (ice_dyn_evp.F90:1457) + the strintx assembly in `stepu`
    (ice_dyn_shared.F90:948-951).
    """
    sr = strain_rates_B(grid, uvel, vvel, p)

    zne, ene, rne = visc_replpress(strength, DminTarea, sr.Deltane, p)
    znw, enw, rnw = visc_replpress(strength, DminTarea, sr.Deltanw, p)
    zsw, esw, rsw = visc_replpress(strength, DminTarea, sr.Deltasw, p)
    zse, ese, rse = visc_replpress(strength, DminTarea, sr.Deltase, p)

    c1m = 1.0 - p.arlx1i * p.revp
    a1, d1 = p.arlx1i, p.denom1

    def relax(old, target):
        return jnp.where(iceTmask, (old * c1m + a1 * target) * d1, old)

    sp1 = relax(stressp[0], zne * sr.divune - rne)
    sp2 = relax(stressp[1], znw * sr.divunw - rnw)
    sp3 = relax(stressp[2], zsw * sr.divusw - rsw)
    sp4 = relax(stressp[3], zse * sr.divuse - rse)

    sm1 = relax(stressm[0], ene * sr.tensionne)
    sm2 = relax(stressm[1], enw * sr.tensionnw)
    sm3 = relax(stressm[2], esw * sr.tensionsw)
    sm4 = relax(stressm[3], ese * sr.tensionse)

    s121 = relax(stress12[0], P5 * ene * sr.shearne)
    s122 = relax(stress12[1], P5 * enw * sr.shearnw)
    s123 = relax(stress12[2], P5 * esw * sr.shearsw)
    s124 = relax(stress12[3], P5 * ese * sr.shearse)

    strintx, strinty = stress_divergence(
        grid, sp1, sp2, sp3, sp4, sm1, sm2, sm3, sm4, s121, s122, s123, s124)

    return (jnp.stack([sp1, sp2, sp3, sp4]),
            jnp.stack([sm1, sm2, sm3, sm4]),
            jnp.stack([s121, s122, s123, s124]),
            strintx, strinty)


def stress_divergence(grid: Grid, sp1, sp2, sp3, sp4, sm1, sm2, sm3, sm4,
                      s121, s122, s123, s124):
    """Bilinear variational divergence of the corner stresses → force per
    unit area at U points (reference `stress` str(:,:,1:8) assembly +
    `stepu` gather; ice_dyn_evp.F90:1647-1745, ice_dyn_shared.F90:948-951)."""
    dxT, dyT, dxhy, dyhx = grid.dxT, grid.dyT, grid.dxhy, grid.dyhx

    ssigpn = sp1 + sp2
    ssigps = sp3 + sp4
    ssigpe = sp1 + sp4
    ssigpw = sp2 + sp3
    ssigp1 = (sp1 + sp3) * P055
    ssigp2 = (sp2 + sp4) * P055

    ssigmn = sm1 + sm2
    ssigms = sm3 + sm4
    ssigme = sm1 + sm4
    ssigmw = sm2 + sm3
    ssigm1 = (sm1 + sm3) * P055
    ssigm2 = (sm2 + sm4) * P055

    ssig12n = s121 + s122
    ssig12s = s123 + s124
    ssig12e = s121 + s124
    ssig12w = s122 + s123
    ssig121 = (s121 + s123) * P111
    ssig122 = (s122 + s124) * P111

    csigpne = P111 * sp1 + ssigp2 + P027 * sp3
    csigpnw = P111 * sp2 + ssigp1 + P027 * sp4
    csigpsw = P111 * sp3 + ssigp2 + P027 * sp1
    csigpse = P111 * sp4 + ssigp1 + P027 * sp2

    csigmne = P111 * sm1 + ssigm2 + P027 * sm3
    csigmnw = P111 * sm2 + ssigm1 + P027 * sm4
    csigmsw = P111 * sm3 + ssigm2 + P027 * sm1
    csigmse = P111 * sm4 + ssigm1 + P027 * sm2

    csig12ne = P222 * s121 + ssig122 + P055 * s123
    csig12nw = P222 * s122 + ssig121 + P055 * s124
    csig12sw = P222 * s123 + ssig122 + P055 * s121
    csig12se = P222 * s124 + ssig121 + P055 * s122

    str12ew = P5 * dxT * (P333 * ssig12e + P166 * ssig12w)
    str12we = P5 * dxT * (P333 * ssig12w + P166 * ssig12e)
    str12ns = P5 * dyT * (P333 * ssig12n + P166 * ssig12s)
    str12sn = P5 * dyT * (P333 * ssig12s + P166 * ssig12n)

    # u-momentum contributions of this T cell to its 4 corners
    strp = P25 * dyT * (P333 * ssigpn + P166 * ssigps)
    strm = P25 * dyT * (P333 * ssigmn + P166 * ssigms)
    str1 = -strp - strm - str12ew + dxhy * (-csigpne + csigmne) + dyhx * csig12ne
    str2 = strp + strm - str12we + dxhy * (-csigpnw + csigmnw) + dyhx * csig12nw
    strp = P25 * dyT * (P333 * ssigps + P166 * ssigpn)
    strm = P25 * dyT * (P333 * ssigms + P166 * ssigmn)
    str3 = -strp - strm + str12ew + dxhy * (-csigpse + csigmse) + dyhx * csig12se
    str4 = strp + strm + str12we + dxhy * (-csigpsw + csigmsw) + dyhx * csig12sw

    # v-momentum contributions
    strp = P25 * dxT * (P333 * ssigpe + P166 * ssigpw)
    strm = P25 * dxT * (P333 * ssigme + P166 * ssigmw)
    str5 = -strp + strm - str12ns - dyhx * (csigpne + csigmne) + dxhy * csig12ne
    str6 = strp - strm - str12sn - dyhx * (csigpse + csigmse) + dxhy * csig12se
    strp = P25 * dxT * (P333 * ssigpw + P166 * ssigpe)
    strm = P25 * dxT * (P333 * ssigmw + P166 * ssigme)
    str7 = -strp + strm + str12ns - dyhx * (csigpnw + csigmnw) + dxhy * csig12nw
    str8 = strp - strm + str12sn - dyhx * (csigpsw + csigmsw) + dxhy * csig12sw

    # U(i,j) collects from the 4 T cells sharing it: T(i,j) [this], T east,
    # T north, T northeast  (Fortran str(i,j,1)+str(i+1,j,2)+str(i,j+1,3)+
    # str(i+1,j+1,4) — reference ice_dyn_shared.F90:102-105)
    sh = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)
    strintx = grid.uarear * (str1 + sh(str2, 0, 1) + sh(str3, 1, 0) + sh(str4, 1, 1))
    strinty = grid.uarear * (str5 + sh(str6, 1, 0) + sh(str7, 0, 1) + sh(str8, 1, 1))
    return strintx, strinty


def evp_solve(grid: Grid, p: EvpParams, prep: DynPrep, strength,
              stressp, stressm, stress12, *, uocn, vocn):
    """Run the full EVP subcycle loop (reference ice_dyn_evp.F90:859-931).

    Returns (uvel, vvel, stressp, stressm, stress12, strintx, strinty,
    taubx, tauby).
    """
    DminTarea = p.deltaminEVP * grid.tarea
    # zero stress state where there is no ice (dyn_prep2 behavior)
    zero3 = lambda s: jnp.where(prep.iceTmask[None], s, 0.0)
    init = EvpState(prep.uvel, prep.vvel, zero3(stressp), zero3(stressm),
                    zero3(stress12))

    def body(_, st: EvpState):
        sp, sm, s12, strintx, strinty = stress_update(
            grid, p, strength, DminTarea, st.uvel, st.vvel,
            st.stressp, st.stressm, st.stress12, prep.iceTmask)
        unew, vnew, _, _ = stepu_dense(st.uvel, st.vvel, strintx, strinty,
                                       prep, p, uocn, vocn)
        return EvpState(unew, vnew, sp, sm, s12)

    final = jax.lax.fori_loop(0, p.ndte, body, init)

    # final force diagnostics + seabed stress at the converged velocity
    sp, sm, s12, strintx, strinty = stress_update(
        grid, p, strength, DminTarea, final.uvel, final.vvel,
        final.stressp, final.stressm, final.stress12, prep.iceTmask)
    del sp, sm, s12  # diagnostics-only recompute; stress state stays at ndte
    Cb = prep.TbU / (jnp.sqrt(final.uvel ** 2 + final.vvel ** 2) + cst.u0)
    taubx = -final.uvel * Cb
    tauby = -final.vvel * Cb
    return (final.uvel, final.vvel, final.stressp, final.stressm,
            final.stress12, strintx, strinty, taubx, tauby)


def evp_ocean_stress(prep: DynPrep, uvel, vvel, uocn, vocn):
    """Ice-ocean stress at U points for the coupler (evp_finish semantics,
    ice_dyn_shared.F90 `dyn_finish`)."""
    vrel = prep.aiU * cst.rhow * prep.Cw * jnp.sqrt((uocn - uvel) ** 2 +
                                                    (vocn - vvel) ** 2)
    sgn = jnp.sign(jnp.where(prep.fm == 0, 1.0, prep.fm))
    strocnx = vrel * ((uocn - uvel) * cst.cosw - (vocn - vvel) * cst.sinw * sgn)
    strocny = vrel * ((vocn - vvel) * cst.cosw + (uocn - uvel) * cst.sinw * sgn)
    return strocnx, strocny
