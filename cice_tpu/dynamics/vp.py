"""Implicit viscous-plastic (VP) dynamics solver: Picard + Krylov.

TPU-native re-implementation of cicecore/cicedyn/dynamics/ice_dyn_vp.F90
(`implicit_solver`:152, `anderson_solver`:663, `calc_zeta_dPr`:1122,
`matvec`:1535, `calc_bvec`:1854, `fgmres`:2737) — Lemieux et al. (2008,
2012), Bouillon et al. (2013) revisited VP.

Design: the nonlinear momentum equation F(u)=0 is solved by Picard
fixed-point iterations (optionally Anderson-accelerated,
`algo_nonlin='anderson'`); each iteration freezes the viscosities
(zeta/eta from the previous iterate) and the drag linearization (vrel),
yielding a LINEAR operator A(u,v) whose action is matrix-free (the same
B-grid bilinear stress divergence as EVP, minus the constant
replacement-pressure part which moves to the RHS). The linear solves use a
right-preconditioned FLEXIBLE GMRES written here (fixed Krylov dimension &
restart counts — jit-stable; MGS or CGS orthogonalization per
`ortho_type`), preconditioned by `precond='pgmres'` (an inner
diagonally-preconditioned GMRES of dimension `dim_pgmres`, exactly the
reference's pgmres:3139), 'diag', or 'ident'. Global dot products lower to
psum on a device mesh. Convergence is monitored, never branched on.
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


# ---------------------------------------------------------------------------
# Krylov machinery over (u, v) pairs
# ---------------------------------------------------------------------------

def _dot(a, b):
    """Global inner product (lowers to psum under shard_map)."""
    return jnp.sum(a[0] * b[0] + a[1] * b[1])


def _add(a, b, s=1.0):
    return (a[0] + s * b[0], a[1] + s * b[1])


def _scale(a, s):
    return (a[0] * s, a[1] * s)


def fgmres(matvec, b, x0, M, dim: int, restarts: int = 1,
           ortho: str = "mgs", reltol: float = 0.0):
    """Right-preconditioned flexible GMRES (reference fgmres:2737).

    Fixed Krylov dimension `dim` per cycle and a fixed number of restart
    cycles — no data-dependent control flow, so the whole solve traces
    into one XLA computation. The preconditioner M may itself be an
    iterative solve (flexible: the preconditioned vectors Z_j are stored).
    reltol (dynamics_nml reltol_fgmres): restart cycles whose entry
    residual is already below reltol*|r_0| leave x unchanged — the static
    equivalent of the reference's tolerance exit.
    """
    # Stacked-buffer Arnoldi under lax.fori_loop: the traced graph size is
    # O(1) in `dim` and `restarts` (one Arnoldi body + one cycle body), so
    # the reference's default dim_fgmres=50 compiles in seconds where a
    # python-unrolled Krylov loop exploded XLA compile time at gx1 scale.
    eps = 1e-30
    dtype = b[0].dtype
    ny, nx = b[0].shape
    bS = jnp.stack(b)                       # (2, ny, nx)
    mv = lambda s: jnp.stack(matvec((s[0], s[1])))
    Mv = lambda s: jnp.stack(M((s[0], s[1])))
    cgs = (ortho == "cgs")

    def arnoldi(j, carry):
        V, Z, H = carry
        z = Mv(V[j])
        w = mv(z)
        idx = jnp.arange(dim + 1)
        if cgs:     # classical GS: one fused projection against all slots
            hs = jnp.tensordot(V, w, axes=((1, 2, 3), (0, 1, 2)))
            hs = jnp.where(idx <= j, hs, 0.0)
            w = w - jnp.tensordot(hs, V, axes=1)
            hcol = hs
        else:       # modified GS: sequential, numerically safer

            def mgs(i, c):
                w_, hc = c
                hij = jnp.where(i <= j, jnp.sum(w_ * V[i]), 0.0)
                return w_ - hij * V[i], hc.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, dim + 1, mgs,
                                        (w, jnp.zeros(dim + 1, dtype)))
        hlast = jnp.sqrt(jnp.sum(w * w))
        V = V.at[j + 1].set(w / jnp.maximum(hlast, eps))
        H = H.at[:, j].set(hcol.at[j + 1].set(hlast))
        return V, Z.at[j].set(z), H

    def cycle(carry, _):
        x, beta0, active = carry
        r = bS - mv(x)
        beta = jnp.sqrt(jnp.sum(r * r))
        first = beta0 < 0.0
        beta0 = jnp.where(first, beta, beta0)
        if reltol > 0.0:
            active = active & (first | (beta > reltol * beta0))
        V0 = jnp.zeros((dim + 1, 2, ny, nx), dtype)
        V0 = V0.at[0].set(r / jnp.maximum(beta, eps))
        Z0 = jnp.zeros((dim, 2, ny, nx), dtype)
        H0 = jnp.zeros((dim + 1, dim), dtype)
        V, Z, H = jax.lax.fori_loop(0, dim, arnoldi, (V0, Z0, H0))
        e1 = jnp.zeros((dim + 1,), dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1, rcond=None)
        y = jnp.where(active, y, 0.0)
        x = x + jnp.tensordot(y, Z, axes=1)
        return (x, beta0, active), None

    (x, _, _), _ = jax.lax.scan(
        cycle, (jnp.stack(x0), jnp.asarray(-1.0, dtype),
                jnp.asarray(True)), None, length=restarts)
    return (x[0], x[1])


def _pgmres_preconditioner(matvec, diag, dim: int, ortho: str,
                           reltol: float = 0.0):
    """The reference's 'pgmres' preconditioner (pgmres:3139): an inner
    GMRES of small fixed dimension on the same operator, itself diagonally
    preconditioned (reltol = dynamics_nml reltol_pgmres)."""
    Md = lambda t: (t[0] / diag, t[1] / diag)

    def M(v):
        zero = (jnp.zeros_like(v[0]), jnp.zeros_like(v[1]))
        return fgmres(matvec, v, zero, Md, dim=dim, restarts=1, ortho=ortho,
                      reltol=reltol)
    return M


def _anderson_update(x_hist, f_hist, g_new, x_new, damping):
    """Anderson(m) mixing (reference anderson_solver:663 with QR updates;
    here the small least-squares is solved directly): given histories of
    iterates x_k and residuals f_k = G(x_k) - x_k, return the accelerated
    next iterate."""
    m = len(f_hist) - 1
    if m < 1:
        return g_new
    fk = f_hist[-1]
    dF = []
    dX = []
    for i in range(m):
        dF.append(_add(f_hist[i + 1], f_hist[i], -1.0))
        dX.append(_add(x_hist[i + 1], x_hist[i], -1.0))
    # least squares min ||f_k - dF gamma|| on the flattened columns (more
    # stable than normal equations when the dF are nearly collinear; the
    # reference maintains the same LS problem by QR up/downdating)
    cols = [jnp.concatenate([d[0].ravel(), d[1].ravel()]) for d in dF]
    Fm = jnp.stack(cols, axis=1)
    fv = jnp.concatenate([fk[0].ravel(), fk[1].ravel()])
    gamma, *_ = jnp.linalg.lstsq(Fm, fv, rcond=1e-6)
    # safeguard: shrink aggressive extrapolations (keeps AA a contraction
    # even with an inexact inner solve)
    gnorm = jnp.sqrt(jnp.sum(gamma ** 2))
    gamma = gamma * jnp.minimum(1.0, 1.5 / jnp.maximum(gnorm, 1e-12))
    out = g_new
    for i in range(m):
        out = _add(out, _add(dX[i], dF[i]), -gamma[i])
    if damping > 0.0:
        out = _add(_scale(out, 1.0 - damping), _scale(x_new, damping))
    return out


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
    anderson = cfg_dyn.algo_nonlin == "anderson"
    x_hist = [(u, v)]
    f_hist = []
    vrel_prev = None
    active = None   # scalar: nonlinear iteration still above reltol_nonlin

    def drag_coeffs(u, v):
        vrel = prep.aiU * cst.rhow * prep.Cw * jnp.sqrt((uocn - u) ** 2 +
                                                        (vocn - v) ** 2)
        Cb = prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
        return vrel, Cb

    # reference defaults honored (dim_fgmres=50): the loop-based fgmres
    # no longer needs the round-1 compile-size cap of 16
    dim = cfg_dyn.dim_fgmres
    restarts = max(1, cfg_dyn.maxits_fgmres // max(dim, 1))

    for _ in range(cfg_dyn.maxits_nonlin):
        vrel, Cb = drag_coeffs(u, v)
        if cfg_dyn.use_mean_vrel and not anderson and vrel_prev is not None:
            # average the linearized drag between iterates (dynamics_nml
            # use_mean_vrel; damps the Picard fixed point). Not under
            # Anderson: the mixing needs a stationary map g(u).
            vrel = 0.5 * (vrel + vrel_prev)
        vrel_prev = vrel
        visc = calc_viscosities(grid, p, strength, DminTarea, u, v)

        cca = prep.umassdti + vrel * cst.cosw + Cb
        sgn = jnp.sign(jnp.where(prep.fm == 0, 1.0, prep.fm))
        ccb = prep.fm + sgn * vrel * cst.sinw
        cca_safe = jnp.where(mask, cca, 1.0)

        # rheology cutoff at near-massless fringe points (reference
        # rheo_area_min; see dynamics/common.py stepu_dense): the implicit
        # operator is near-singular there (umassdti ~ vrel ~ 0 with finite
        # neighbor stress), which stalls/diverges FGMRES
        from .common import RHEO_AREA_MIN
        rf = (prep.aiU > RHEO_AREA_MIN).astype(u.dtype)

        def matvec(x):
            du, dv = x
            sx, sy = vp_stress_divergence(grid, p, visc, du, dv,
                                          include_rep=False)
            au = cca_safe * du - ccb * dv - rf * sx
            av = ccb * du + cca_safe * dv - rf * sy
            return (jnp.where(mask, au, du), jnp.where(mask, av, dv))

        rx, ry = rep_pressure_force(grid, visc)
        rx, ry = rf * rx, rf * ry
        bu = prep.forcex + vrel * prep.waterx + prep.umassdti * prep.uvel_init + rx
        bv = prep.forcey + vrel * prep.watery + prep.umassdti * prep.vvel_init + ry
        b = (jnp.where(mask, bu, 0.0), jnp.where(mask, bv, 0.0))

        if cfg_dyn.precond == "pgmres":
            M = _pgmres_preconditioner(matvec, cca_safe,
                                       max(2, min(cfg_dyn.dim_pgmres,
                                                  cfg_dyn.maxits_pgmres)),
                                       cfg_dyn.ortho_type,
                                       reltol=cfg_dyn.reltol_pgmres)
        elif cfg_dyn.precond == "diag":
            M = lambda x: (x[0] / cca_safe, x[1] / cca_safe)
        else:
            M = lambda x: x

        # nonlinear residual |F(u_k)| = |A(u_k) u_k - b(u_k)| BEFORE the
        # solve: linearization and iterate taken at the same point
        au, av = matvec((u, v))
        res = jnp.sqrt(jnp.sum((au - b[0]) ** 2 + (av - b[1]) ** 2))
        res_hist.append(res)
        if cfg_dyn.monitor_nonlin:
            jax.debug.print("vp nonlin it {k}: res {r:.3e}",
                            k=len(res_hist) - 1, r=res)
        # reltol_nonlin without data-dependent control flow: the loop count
        # stays static, but iterates freeze once the residual drops below
        # reltol_nonlin * |F(u_0)| (result identical to early exit)
        done = res <= cfg_dyn.reltol_nonlin * res_hist[0]
        active = ~done if active is None else (active & ~done)

        x = fgmres(matvec, b, (u, v), M, dim=dim, restarts=restarts,
                   ortho=cfg_dyn.ortho_type, reltol=cfg_dyn.reltol_fgmres)
        g = (jnp.where(mask & active, x[0], u),
             jnp.where(mask & active, x[1], v))
        g = (jnp.where(mask, g[0], 0.0), jnp.where(mask, g[1], 0.0))

        if anderson:
            it = len(res_hist) - 1
            f_hist.append(_add(g, (u, v), -1.0))
            if len(f_hist) > cfg_dyn.dim_andacc + 1:
                f_hist.pop(0)
                x_hist.pop(0)
            if it >= cfg_dyn.start_andacc:
                acc = _anderson_update(x_hist, f_hist, g, (u, v),
                                       cfg_dyn.damping_andacc)
            else:
                acc = g
            u = jnp.where(mask, acc[0], 0.0)
            v = jnp.where(mask, acc[1], 0.0)
            x_hist.append((u, v))
        else:
            u, v = g

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
