"""Implicit viscous-plastic (VP) dynamics solver: Picard + Krylov.

TPU-native re-implementation of cicecore/cicedyn/dynamics/ice_dyn_vp.F90
(`implicit_solver`:152, `anderson_solver`:663, `calc_zeta_dPr`:1122,
`matvec`:1535, `calc_bvec`:1854, `fgmres`:2737) — Lemieux et al. (2008,
2012), Bouillon et al. (2013) revisited VP.

Design: the nonlinear momentum equation F(u)=0 is solved by Picard
fixed-point iterations; each iteration freezes the viscosities (zeta/eta from
the previous iterate, `visc_method` semantics) and the drag linearization
(vrel), yielding a LINEAR operator A(u,v) whose action is matrix-free (the
same B-grid bilinear stress divergence as EVP, minus the constant
replacement-pressure part which moves to the RHS). The linear solves use
`jax.scipy.sparse.linalg.gmres` over the (u, v) pytree with a diagonal
preconditioner — the idiomatic JAX form of the reference's FGMRES+pgmres
stack (global dot products lower to psum on a mesh). Fixed iteration counts
keep everything jit-stable; convergence is monitored, not branched on.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid
from .common import DynPrep, EvpParams, evp_params, strain_rates_B, visc_replpress
from .evp import stress_divergence


class VpViscosity(NamedTuple):
    zetax2: tuple     # per corner (ne, nw, sw, se)
    etax2: tuple
    rep_prs: tuple


def calc_viscosities(grid: Grid, p: EvpParams, strength, DminTarea, uvel, vvel):
    """zeta/eta/replacement pressure at the 4 T-cell corners from the current
    velocity iterate (reference calc_zeta_dPr)."""
    sr = strain_rates_B(grid, uvel, vvel, p)
    zne, ene, rne = visc_replpress(strength, DminTarea, sr.Deltane, p)
    znw, enw, rnw = visc_replpress(strength, DminTarea, sr.Deltanw, p)
    zsw, esw, rsw = visc_replpress(strength, DminTarea, sr.Deltasw, p)
    zse, ese, rse = visc_replpress(strength, DminTarea, sr.Deltase, p)
    return VpViscosity(zetax2=(zne, znw, zsw, zse), etax2=(ene, enw, esw, ese),
                       rep_prs=(rne, rnw, rsw, rse))


def vp_stress_divergence(grid: Grid, p: EvpParams, visc: VpViscosity,
                         uvel, vvel, include_rep: bool):
    """Internal stress force for the VP operator: sigma = zeta*eps (linear in
    u) minus optionally the constant replacement pressure."""
    sr = strain_rates_B(grid, uvel, vvel, p)
    z, e, r = visc.zetax2, visc.etax2, visc.rep_prs
    rp = (lambda i: r[i]) if include_rep else (lambda i: 0.0)
    sp1 = z[0] * sr.divune - rp(0)
    sp2 = z[1] * sr.divunw - rp(1)
    sp3 = z[2] * sr.divusw - rp(2)
    sp4 = z[3] * sr.divuse - rp(3)
    sm1 = e[0] * sr.tensionne
    sm2 = e[1] * sr.tensionnw
    sm3 = e[2] * sr.tensionsw
    sm4 = e[3] * sr.tensionse
    s121 = 0.5 * e[0] * sr.shearne
    s122 = 0.5 * e[1] * sr.shearnw
    s123 = 0.5 * e[2] * sr.shearsw
    s124 = 0.5 * e[3] * sr.shearse
    return stress_divergence(grid, sp1, sp2, sp3, sp4, sm1, sm2, sm3, sm4,
                             s121, s122, s123, s124)


def rep_pressure_force(grid: Grid, visc: VpViscosity):
    """Force from the constant replacement-pressure field (moves to RHS)."""
    r = visc.rep_prs
    z = jnp.zeros_like(r[0])
    return stress_divergence(grid, -r[0], -r[1], -r[2], -r[3],
                             z, z, z, z, z, z, z, z)


def implicit_solver(grid: Grid, cfg_dyn, prep: DynPrep, strength, *,
                    uocn, vocn, dt: float):
    """Picard + GMRES implicit VP solve (reference implicit_solver:152).

    Returns (uvel, vvel, stress corner state for diagnostics/restart,
    nonlinear residual history).
    """
    p = evp_params(cfg_dyn, dt)
    DminTarea = cfg_dyn.deltaminVP * grid.tarea
    mask = prep.iceUmask
    u, v = prep.uvel, prep.vvel

    res_hist = []

    def drag_coeffs(u, v):
        vrel = prep.aiU * cst.rhow * prep.Cw * jnp.sqrt((uocn - u) ** 2 +
                                                        (vocn - v) ** 2)
        Cb = prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
        return vrel, Cb

    for _ in range(cfg_dyn.maxits_nonlin):
        if cfg_dyn.use_mean_vrel:
            vrel, Cb = drag_coeffs(u, v)
        else:
            vrel, Cb = drag_coeffs(u, v)
        visc = calc_viscosities(grid, p, strength, DminTarea, u, v)

        cca = prep.umassdti + vrel * cst.cosw + Cb
        sgn = jnp.sign(jnp.where(prep.fm == 0, 1.0, prep.fm))
        ccb = prep.fm + sgn * vrel * cst.sinw
        cca_safe = jnp.where(mask, cca, 1.0)

        def matvec(x):
            du, dv = x
            sx, sy = vp_stress_divergence(grid, p, visc, du, dv,
                                          include_rep=False)
            au = cca_safe * du - ccb * dv - sx
            av = ccb * du + cca_safe * dv - sy
            return (jnp.where(mask, au, du), jnp.where(mask, av, dv))

        rx, ry = rep_pressure_force(grid, visc)
        bu = prep.forcex + vrel * prep.waterx + prep.umassdti * prep.uvel_init + rx
        bv = prep.forcey + vrel * prep.watery + prep.umassdti * prep.vvel_init + ry
        b = (jnp.where(mask, bu, 0.0), jnp.where(mask, bv, 0.0))

        if cfg_dyn.precond in ("diag", "pgmres"):
            M = lambda x: (x[0] / cca_safe, x[1] / cca_safe)
        else:
            M = None

        # nonlinear residual |F(u_k)| = |A(u_k) u_k - b(u_k)| BEFORE the
        # solve: linearization and iterate taken at the same point
        au, av = matvec((u, v))
        res = jnp.sqrt(jnp.sum((au - b[0]) ** 2 + (av - b[1]) ** 2))
        res_hist.append(res)

        x, _ = jax.scipy.sparse.linalg.gmres(
            matvec, b, x0=(u, v), tol=cfg_dyn.reltol_fgmres, atol=0.0,
            restart=min(cfg_dyn.dim_fgmres, 50),
            maxiter=cfg_dyn.maxits_fgmres // min(cfg_dyn.dim_fgmres, 50) + 1,
            M=M, solve_method="batched")
        u = jnp.where(mask, x[0], 0.0)
        v = jnp.where(mask, x[1], 0.0)

    # final stress state for diagnostics/restart (EVP-compatible layout)
    visc = calc_viscosities(grid, p, strength, DminTarea, u, v)
    sr = strain_rates_B(grid, u, v, p)
    z, e, r = visc.zetax2, visc.etax2, visc.rep_prs
    stressp = jnp.stack([z[0] * sr.divune - r[0], z[1] * sr.divunw - r[1],
                         z[2] * sr.divusw - r[2], z[3] * sr.divuse - r[3]])
    stressm = jnp.stack([e[0] * sr.tensionne, e[1] * sr.tensionnw,
                         e[2] * sr.tensionsw, e[3] * sr.tensionse])
    stress12 = jnp.stack([0.5 * e[0] * sr.shearne, 0.5 * e[1] * sr.shearnw,
                          0.5 * e[2] * sr.shearsw, 0.5 * e[3] * sr.shearse])
    strintx, strinty = vp_stress_divergence(grid, p, visc, u, v,
                                            include_rep=True)
    taubx = -u * prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
    tauby = -v * prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
    return (u, v, stressp, stressm, stress12, strintx, strinty, taubx, tauby,
            jnp.stack(res_hist))
