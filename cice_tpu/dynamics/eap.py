"""Elastic-anisotropic-plastic (EAP) rheology solver.

TPU-native re-implementation of cicecore/cicedyn/dynamics/ice_dyn_eap.F90
(`eap`:89, `init_eap` yield-surface tables :557-724, `stress_eap`:1163,
`update_stress_rdg`:1581, `stepa`:1870, `calc_ffrac`:1978) — the anisotropic
rheology of Wilchinsky & Feltham with the Tsamados, Feltham & Wilchinsky
(2013, JGR Appendix A) lookup-table formulation.

Structure: a per-corner structure tensor A (a11, a12; trace 1) evolves with
the stress state; the anisotropic stress comes from 3-D lookup tables
sigma_r/sigma_s(x, y, A1) precomputed at init by quadrature of the
diamond-floe contact kernels. TPU mapping: tables are built vectorized in
numpy once (init), the per-cell lookup is a flat `take` (nearest-entry, as
the reference's default interpolate_stress_rdg=.false.), and the subcycle
loop is a `lax.fori_loop` sharing the B-grid bilinear stress-divergence
assembly with EVP (cice_tpu.dynamics.evp.stress_divergence).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..core.grid import Grid
from .common import DynPrep, EvpParams, strain_rates_B, stepu_dense
from .evp import stress_divergence

NX_YIELD, NY_YIELD, NA_YIELD = 41, 41, 21
KFRICTION = 0.45
PHI = math.pi / 12.0          # diamond floe acute half-angle (30 deg)
KFRAC = 0.001                 # fracturing rate constant (calc_ffrac)
FFRAC_THRESHOLD = 0.3
KTH = 0.2 * 0.001             # structure-tensor isotropic recovery rate


def _w1(a):
    return (-223.87569446 + 2361.2198663 * a - 10606.56079975 * a ** 2
            + 26315.50025642 * a ** 3 - 38948.30444297 * a ** 4
            + 34397.72407466 * a ** 5 - 16789.98003081 * a ** 6
            + 3495.82839237 * a ** 7)


def _w2(a):
    return (-6670.68911883 + 70222.33061536 * a - 314871.71525448 * a ** 2
            + 779570.02793492 * a ** 3 - 1151098.82436864 * a ** 4
            + 1013896.59464498 * a ** 5 - 493379.44906738 * a ** 6
            + 102356.551518 * a ** 7)


def _contact_kernels(x, y, z, phi):
    """Ridging (r) and sliding (s) stress kernels for diamond floes at
    contact orientation z, strain direction x, A-alignment y (Tsamados et
    al. 2013 eq. A4-A8). Vectorized over broadcast x/y/z arrays."""
    pih = 0.5 * np.pi
    p = phi
    n1t2 = [np.cos(z + pih - p) * np.cos(z + p),
            np.cos(z + pih - p) * np.sin(z + p),
            np.sin(z + pih - p) * np.cos(z + p),
            np.sin(z + pih - p) * np.sin(z + p)]
    n2t1 = [np.cos(z - pih + p) * np.cos(z - p),
            np.cos(z - pih + p) * np.sin(z - p),
            np.sin(z - pih + p) * np.cos(z - p),
            np.sin(z - pih + p) * np.sin(z - p)]
    t1t2 = [np.cos(z - p) * np.cos(z + p),
            np.cos(z - p) * np.sin(z + p),
            np.sin(z - p) * np.cos(z + p),
            np.sin(z - p) * np.sin(z + p)]
    t2t1 = [np.cos(z + p) * np.cos(z - p),
            np.cos(z + p) * np.sin(z - p),
            np.sin(z + p) * np.cos(z - p),
            np.sin(z + p) * np.sin(z - p)]
    cy2 = np.cos(y) ** 2
    ty = np.tan(y)
    d11 = cy2 * (np.cos(x) + np.sin(x) * ty * ty)
    d12 = cy2 * ty * (-np.cos(x) + np.sin(x))
    d22 = cy2 * (np.sin(x) + np.cos(x) * ty * ty)

    def dot(t):
        return t[0] * d11 + (t[1] + t[2]) * d12 + t[3] * d22

    IIn1t2 = dot(n1t2)
    IIn2t1 = dot(n2t1)
    IIt1t2 = dot(t1t2)
    H12 = (-IIn1t2 >= cst.puny).astype(float)
    H21 = (-IIn2t1 >= cst.puny).astype(float)
    sgn = np.sign(IIt1t2 + cst.puny)

    s11r = -(H12 * n1t2[0] + H21 * n2t1[0])
    s12r = -0.5 * (H12 * (n1t2[1] + n1t2[2]) + H21 * (n2t1[1] + n2t1[2]))
    s22r = -(H12 * n1t2[3] + H21 * n2t1[3])
    s11s = sgn * (H12 * t1t2[0] + H21 * t2t1[0])
    s12s = sgn * 0.5 * (H12 * (t1t2[1] + t1t2[2]) + H21 * (t2t1[1] + t2t1[2]))
    s22s = sgn * (H12 * t1t2[3] + H21 * t2t1[3])
    return s11r, s12r, s22r, s11s, s12s, s22s


@lru_cache(maxsize=1)
def yield_tables():
    """Build the 6 (nx, ny, na) lookup tables by z-quadrature
    (init_eap, ice_dyn_eap.F90:649-718), vectorized in numpy."""
    nz = 100
    pi, piq, pih = np.pi, np.pi / 4, np.pi / 2
    da = 0.5 / (NA_YIELD - 1)
    dx = pi / (NX_YIELD - 1)
    dy = pi / (NY_YIELD - 1)
    dz = pi / nz
    xs = pi + piq - dx + dx * np.arange(1, NX_YIELD + 1)
    ys = -dy + dy * np.arange(1, NY_YIELD + 1)
    als = 0.5 - da + da * np.arange(1, NA_YIELD + 1)
    zs = -pih + dz * np.arange(1, nz + 1)

    X = xs[:, None, None]
    Y = ys[None, :, None]
    Z = zs[None, None, :]
    k = _contact_kernels(X, Y, Z, PHI)        # each (nx, ny, nz)
    sin2phi = math.sin(2 * PHI)

    tables = []
    for comp in k:
        tab = np.zeros((NX_YIELD, NY_YIELD, NA_YIELD))
        for ia, a in enumerate(als[:-1]):
            w = _w1(a) * np.exp(-_w2(a) * zs * zs)
            tab[:, :, ia] = np.tensordot(comp, w, axes=([2], [0])) * dz / sin2phi
        # last entry: perfectly aligned (delta distribution at z=0)
        k0 = _contact_kernels(X[:, :, :1], Y[:, :, :1],
                              np.zeros((1, 1, 1)), PHI)
        tables.append(tab)
    k0 = _contact_kernels(xs[:, None], ys[None, :], np.zeros((1, 1)), PHI)
    for tab, comp0 in zip(tables, k0):
        tab[:, :, -1] = 0.5 * comp0 / sin2phi
    tables = [np.where(np.abs(t) < 1e-6, 0.0, t) for t in tables]
    return tuple(np.asarray(t, np.float32) for t in tables)


INVSIN = 1.0 / math.sin(2 * np.pi / 12.0) / (1.0 + KFRICTION * KFRICTION)


def _principal_cos2(m11, m22, m12):
    """(Cos^2, Sin^2, CosSin) of the rotation to principal axes."""
    diff = m11 - m22
    denom = jnp.sqrt(diff * diff + 4.0 * m12 * m12)
    ok = denom > cst.puny
    safe = jnp.where(ok, denom, 1.0)
    c2 = jnp.where(ok, 0.5 + 0.5 * diff / safe, 1.0)
    s2 = jnp.where(ok, 0.5 - 0.5 * diff / safe, cst.puny)
    cs = jnp.where(ok, m12 / safe, cst.puny)
    return c2, s2, cs


def stress_rdg(divu, tension, shear, a11, a12, strength, tabs):
    """Anisotropic stress at one corner from the lookup tables
    (update_stress_rdg). All args (ny, nx); returns (stressp_t, stressm_t,
    stress12_t, alphar) — the instantaneous yield stress targets."""
    s11r, s12r, s22r, s11s, s12s, s22s = tabs
    a22 = 1.0 - a11
    Q11Q11, Q12Q12, Q11Q12 = _principal_cos2(a11, a22, a12)
    atemp = Q11Q11 * a11 + 2.0 * Q11Q12 * a12 + Q12Q12 * a22
    atemp = jnp.maximum(atemp, 1.0 - atemp)

    d11 = 0.5 * (divu + tension)
    d12 = 0.5 * shear
    d22 = 0.5 * (divu - tension)
    Qd11Qd11, Qd12Qd12, Qd11Qd12 = _principal_cos2(d11, d22, d12)
    dtemp1 = Qd11Qd11 * d11 + 2.0 * Qd11Qd12 * d12 + Qd12Qd12 * d22
    dtemp2 = Qd12Qd12 * d11 - 2.0 * Qd11Qd12 * d12 + Qd11Qd11 * d22

    x = jnp.arctan2(dtemp2, jnp.where(dtemp1 == 0, cst.puny, dtemp1))
    x = jnp.where(x < np.pi / 4, x + 2 * np.pi, x)
    tany1 = Q11Q12 - Qd11Qd12
    tany2 = Q11Q11 - Qd12Qd12
    y = jnp.arctan2(tany1, jnp.where(tany2 == 0, cst.puny, tany2))
    y = jnp.where(y > np.pi, y - np.pi, y)
    y = jnp.where(y < 0, y + np.pi, y)

    dx = np.pi / (NX_YIELD - 1)
    dy = np.pi / (NY_YIELD - 1)
    da = 0.5 / (NA_YIELD - 1)
    kx = jnp.clip(((x - np.pi / 4 - np.pi) / dx).astype(jnp.int32), 0, NX_YIELD - 1)
    ky = jnp.clip((y / dy).astype(jnp.int32), 0, NY_YIELD - 1)
    ka = jnp.clip(((atemp - 0.5) / da).astype(jnp.int32), 0, NA_YIELD - 1)
    flat = (kx * NY_YIELD + ky) * NA_YIELD + ka

    def take(tab):
        return jnp.take(tab.reshape(-1), flat)

    t11r, t12r, t22r = take(s11r), take(s12r), take(s22r)
    t11s, t12s, t22s = take(s11s), take(s12s), take(s22s)

    stressp = strength * (t11r + KFRICTION * t11s +
                          t22r + KFRICTION * t22s) * INVSIN
    stress12 = strength * (t12r + KFRICTION * t12s) * INVSIN
    stressm = strength * (t11r + KFRICTION * t11s -
                          t22r - KFRICTION * t22s) * INVSIN

    # back-rotation into general coordinates
    sig11 = 0.5 * (stressp + stressm)
    sig12 = stress12
    sig22 = 0.5 * (stressp - stressm)
    g11 = Q11Q11 * sig11 + Q12Q12 * sig22 - 2.0 * Q11Q12 * sig12
    g12 = Q11Q12 * sig11 - Q11Q12 * sig22 + (Q11Q11 - Q12Q12) * sig12
    g22 = Q12Q12 * sig11 + Q11Q11 * sig22 + 2.0 * Q11Q12 * sig12
    return g11 + g22, g11 - g22, g12


def calc_ffrac(stressp, stressm, stress12, a11, a12):
    """Structure-tensor source from stress state (calc_ffrac:1978):
    diffusion toward the fracture-favored orientation under unconfined
    compression or shear faulting."""
    sigma11 = 0.5 * (stressp + stressm)
    sigma12 = stress12
    sigma22 = 0.5 * (stressp - stressm)
    gamma = jnp.where(stressm == 0.0, 0.5 * (np.pi / 2),
                      0.5 * jnp.arctan2(2.0 * sigma12,
                                        jnp.where(stressm == 0, 1.0,
                                                  sigma11 - sigma22)))
    Q11 = jnp.cos(gamma)
    Q12 = jnp.sin(gamma)
    s1 = Q11 * Q11 * sigma11 + 2 * Q11 * Q12 * sigma12 + Q12 * Q12 * sigma22
    s2 = Q12 * Q12 * sigma11 - 2 * Q11 * Q12 * sigma12 + Q11 * Q11 * sigma22

    frac_active = ((s1 >= 0) & (s2 < 0)) | \
        ((s1 <= 0) & (s2 != 0) & (s1 / jnp.where(s2 == 0, 1.0, s2)
                                  <= FFRAC_THRESHOLD) & (s2 < 0))
    m1 = jnp.where(frac_active, KFRAC * (a11 - Q12 * Q12), 0.0)
    m2 = jnp.where(frac_active, KFRAC * (a12 + Q11 * Q12), 0.0)
    return m1, m2


class EapState(NamedTuple):
    uvel: jnp.ndarray
    vvel: jnp.ndarray
    stressp: jnp.ndarray     # (4, ny, nx)
    stressm: jnp.ndarray
    stress12: jnp.ndarray
    a11: jnp.ndarray         # (4, ny, nx) per-corner structure tensor
    a12: jnp.ndarray


def eap_solve(grid: Grid, p: EvpParams, prep: DynPrep, strength,
              stressp, stressm, stress12, *, uocn, vocn, a11=None, a12=None):
    """EAP subcycle loop (reference `eap`:89). Signature matches evp_solve
    with the structure tensor carried internally (0.5/0 init when absent —
    isotropic; restart plumbing carries it via extra state)."""
    tabs = tuple(jnp.asarray(t) for t in yield_tables())
    if a11 is None:
        a11 = jnp.full((4,) + grid.shape, 0.5, stressp.dtype)
    if a12 is None:
        a12 = jnp.zeros((4,) + grid.shape, stressp.dtype)

    zero3 = lambda s: jnp.where(prep.iceTmask[None], s, 0.0)
    init = EapState(prep.uvel, prep.vvel, zero3(stressp), zero3(stressm),
                    zero3(stress12), a11, a12)
    dtei = float(p.ndte) / 1.0   # 1/dte in subcycle units folds into ratios
    # structure tensor: implicit update with recovery kth (stepa:1870)
    dteikth_num = 1.0
    # NOTE: reference dtei = 1/dte (dte = dt/ndte); ratios below use the
    # same combination (a*dtei + p5*kth - m) / (dtei + kth) which is
    # invariant to the common 1/dte scale only through kth*dte; we keep
    # kth*dte explicit:
    def body(ksub, st: EapState):
        sr = strain_rates_B(grid, st.uvel, st.vvel, p)
        corners = [
            (sr.divune, sr.tensionne, sr.shearne),
            (sr.divunw, sr.tensionnw, sr.shearnw),
            (sr.divusw, sr.tensionsw, sr.shearsw),
            (sr.divuse, sr.tensionse, sr.shearse),
        ]
        c1m = 1.0 - p.arlx1i * p.revp
        sp_new, sm_new, s12_new = [], [], []
        a11_new, a12_new = [], []
        for c, (dv, tn, sh) in enumerate(corners):
            tp, tm, t12 = stress_rdg(dv, tn, sh, st.a11[c], st.a12[c],
                                     strength, tabs)
            spc = jnp.where(prep.iceTmask,
                            (st.stressp[c] + tp * p.arlx1i) * p.denom1,
                            st.stressp[c])
            smc = jnp.where(prep.iceTmask,
                            (st.stressm[c] + tm * p.arlx1i) * p.denom1,
                            st.stressm[c])
            s12c = jnp.where(prep.iceTmask,
                             (st.stress12[c] + t12 * p.arlx1i) * p.denom1,
                             st.stress12[c])
            sp_new.append(spc)
            sm_new.append(smc)
            s12_new.append(s12c)
            m1, m2 = calc_ffrac(spc, smc, s12c, st.a11[c], st.a12[c])
            # implicit relaxation toward isotropy (stepa)
            a11c = (st.a11[c] + 0.5 * KTH - m1) / (1.0 + KTH)
            a12c = (st.a12[c] - m2) / (1.0 + KTH)
            a11_new.append(a11c)
            a12_new.append(a12c)

        strintx, strinty = stress_divergence(
            grid, sp_new[0], sp_new[1], sp_new[2], sp_new[3],
            sm_new[0], sm_new[1], sm_new[2], sm_new[3],
            s12_new[0], s12_new[1], s12_new[2], s12_new[3])
        unew, vnew, _, _ = stepu_dense(st.uvel, st.vvel, strintx, strinty,
                                       prep, p, uocn, vocn)
        return EapState(unew, vnew, jnp.stack(sp_new), jnp.stack(sm_new),
                        jnp.stack(s12_new), jnp.stack(a11_new),
                        jnp.stack(a12_new))

    final = jax.lax.fori_loop(0, p.ndte, body, init)

    strintx, strinty = stress_divergence(
        grid, *[final.stressp[c] for c in range(4)],
        *[final.stressm[c] for c in range(4)],
        *[final.stress12[c] for c in range(4)])
    Cb = prep.TbU / (jnp.sqrt(final.uvel ** 2 + final.vvel ** 2) + cst.u0)

    # yield-surface stress diagnostic: one extra stress_rdg evaluation at
    # the converged state; the reference's yieldstress11/12/22 are the
    # corner-averaged anisotropic target stresses before EVP relaxation
    # (ice_dyn_eap.F90:1436-1446)
    sr = strain_rates_B(grid, final.uvel, final.vvel, p)
    corners = [(sr.divune, sr.tensionne, sr.shearne),
               (sr.divunw, sr.tensionnw, sr.shearnw),
               (sr.divusw, sr.tensionsw, sr.shearsw),
               (sr.divuse, sr.tensionse, sr.shearse)]
    tp_sum = tm_sum = t12_sum = 0.0
    for c, (dv, tn, sh) in enumerate(corners):
        tp, tm, t12 = stress_rdg(dv, tn, sh, final.a11[c], final.a12[c],
                                 strength, tabs)
        tp_sum = tp_sum + tp
        tm_sum = tm_sum + tm
        t12_sum = t12_sum + t12
    msk = prep.iceTmask
    yieldstress = {
        "yieldstress11": jnp.where(msk, 0.125 * (tp_sum + tm_sum), 0.0),
        "yieldstress22": jnp.where(msk, 0.125 * (tp_sum - tm_sum), 0.0),
        "yieldstress12": jnp.where(msk, 0.25 * t12_sum, 0.0),
    }
    return (final.uvel, final.vvel, final.stressp, final.stressm,
            final.stress12, strintx, strinty, -final.uvel * Cb,
            -final.vvel * Cb, final.a11, final.a12, yieldstress)
