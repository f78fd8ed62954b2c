"""Ice thickness distribution: category bounds, linear remapping, aggregation.

TPU-native re-implementation of the Icepack ITD utilities the reference
consumes (SURVEY.md §2.9: icepack_init_itd, icepack_aggregate,
icepack_compute_tracers, icepack_itd / linear ITD remap of Lipscomb 2001).
Everything is dense and vmapped over grid cells: category loops are unrolled
(ncat is 5), per-cell branching becomes jnp.where masks.

Science: W. H. Lipscomb (2001), Remapping the thickness distribution in sea
ice models, JGR 106(C7); category bounds per kcatbound as documented in the
Icepack/CICE user guide (ug_case_settings kcatbound).
"""

from __future__ import annotations

import math
from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst

# rebin parcel-move merge under lax.cond vs unconditional (env knob for
# A/B on real hardware; the cond wins standalone, see ridging.RIDGE_WHILE)
REBIN_COND = os.environ.get("CICE_TPU_REBIN_COND", "1") == "1"


def category_bounds(ncat: int, kcatbound: int = 1, nilyr: int = 7,
                    kitd: int = 1) -> np.ndarray:
    """hin_max(0:ncat): thickness category boundaries (m).

    kcatbound: 0 original [Lipscomb 2001 eq. 22], 1 'new' rounded boundaries,
    2 WMO standard, -1 single category. Reference behavior: icepack_init_itd
    (documented in Icepack docs; boundary formulas are standard).
    """
    if kcatbound == -1 or ncat == 1:
        return np.array([0.0, 999.9])
    if kcatbound == 0:
        cc1 = 3.0 / ncat
        cc2 = 15.0 * cc1
        cc3 = 3.0
        bounds = [0.0]
        for n in range(1, ncat + 1):
            x1 = (n - 1) / ncat
            bounds.append(bounds[-1] + cc1 + cc2 * (1.0 + math.tanh(cc3 * (x1 - 1.0))))
        bounds[-1] = 999.9
        return np.array(bounds)
    if kcatbound == 1:
        # rounded boundaries (cice 'new' defaults for ncat=5: .64 1.39 2.47 4.57)
        cc1 = 3.0 / ncat
        cc2 = 15.0 * cc1
        cc3 = 3.0
        bounds = [0.0]
        for n in range(1, ncat + 1):
            x1 = (n - 1) / ncat
            b = bounds[-1] + cc1 + cc2 * (1.0 + math.tanh(cc3 * (x1 - 1.0)))
            bounds.append(100.0 * round(b * 100.0) / 10000.0)
        bounds = [round(b, 6) for b in bounds]
        bounds[-1] = 999.9
        return np.array(bounds)
    if kcatbound == 2:  # WMO
        wmo = {5: [0.0, 0.30, 0.70, 1.20, 2.0, 999.9],
               6: [0.0, 0.15, 0.30, 0.70, 1.20, 2.0, 999.9],
               7: [0.0, 0.10, 0.15, 0.30, 0.70, 1.20, 2.0, 999.9]}
        if ncat not in wmo:
            raise ValueError("WMO bounds require ncat in (5,6,7)")
        return np.array(wmo[ncat])
    if kcatbound == 3:
        # asymptotic scheme (ug_case_settings.rst:336): fine resolution for
        # thin ice, boundaries growing without bound toward the thick end:
        # H_n = n / (ncat + 1 - n). Behavioral stand-in for the Icepack
        # formula (source external to the reference repo); e.g. ncat=7 ->
        # 0.14, 0.33, 0.60, 1.0, 1.67, 3.0 m.
        bounds = [0.0] + [n / (ncat + 1.0 - n) for n in range(1, ncat)]
        bounds.append(999.9)
        return np.array(bounds)
    raise ValueError(f"unknown kcatbound {kcatbound}")


def initial_itd_profile(ncat: int, hin_max: np.ndarray, hbar: float = 3.0):
    """Initial area fractions per category, peaked near hbar
    (reference set_state_var ice_init.F90:3266 'parabolic' profile)."""
    ainit = np.zeros(ncat)
    hinit = np.zeros(ncat)
    for n in range(ncat):
        hl, hu = hin_max[n], min(hin_max[n + 1], 2.0 * hbar)
        hinit[n] = 0.5 * (hl + min(hu, hin_max[n + 1] if n < ncat - 1 else hl + 1.0))
        if hu > hl:
            xl, xu = hl / hbar, min(hu, 2.0 * hbar) / hbar
            if xl < 2.0:
                # integral of parabola a(h) ~ max(0, h(2-h/hbar)) normalized
                f = lambda x: x * x - x ** 3 / 3.0
                ainit[n] = max(f(min(xu, 2.0)) - f(min(xl, 2.0)), 0.0)
    s = ainit.sum()
    if s > 0:
        ainit = 0.95 * ainit / s   # total initial concentration 0.95
    for n in range(ncat):
        hinit[n] = 0.5 * (hin_max[n] + hin_max[n + 1]) if n < ncat - 1 else hin_max[n] + 0.5
    return ainit, hinit


# ---------------------------------------------------------------------------
# packed-tracer utilities: the category-shift/merge machinery below runs on
# one (ncat, NT, ny, nx) array with a static per-layer dependency index
# instead of per-registry-spec Python loops — the traced graph shrinks
# ~NT-fold (XLA compile time is the binding constraint, VERDICT r2 #2)
# ---------------------------------------------------------------------------

def flat_dep_table(registry):
    """Static (dep_idx (NT,), layout) flattening registry tracers
    layer-by-layer; dep_idx[k] in (DEP_AICE, DEP_VICE, DEP_VSNO)."""
    dep_idx = []
    layout = []
    for spec in registry:
        nl = spec.nlayers or 0
        layout.append((spec.name, len(dep_idx), nl))
        for _ in range(max(nl, 1)):
            dep_idx.append(spec.depend)
    return np.asarray(dep_idx), tuple(layout)


def name_offsets(registry):
    """name -> (row offset, row count) into the packed (ncat, NT, ny, nx)
    stack (single source of the max(nl, 1) flattening convention)."""
    _, layout = flat_dep_table(registry)
    return {nm: (o, max(nl, 1)) for nm, o, nl in layout}


def pack_tracers(trcrn, registry):
    """Stack registry tracers into (ncat, NT, ny, nx), layers flattened."""
    planes = []
    for spec in registry:
        t = trcrn[spec.name]
        planes.append(t if t.ndim == 4 else t[:, None])
    return jnp.concatenate(planes, axis=1)


def unpack_tracers(trm, registry):
    out = {}
    k = 0
    for spec in registry:
        nl = spec.nlayers or 0
        n = max(nl, 1)
        sl = trm[:, k:k + n]
        out[spec.name] = sl if nl else sl[:, 0]
        k += n
    return out


def _dep_onehot(didx):
    """Static (NT, 3) one-hot dependency selector (precomputed host-side)."""
    oh = np.zeros((len(didx), 3), np.float32)
    oh[np.arange(len(didx)), np.asarray(didx)] = 1.0
    return oh


def _dep_weight(didx, wa, wv, ws):
    """(NT, ...) per-flat-tracer merge weight selected by dependency.

    One-hot einsum, NOT jnp.take: an NT-length gather along a 3-row axis
    lowers to a serialized TPU gather (round-3/5 gotcha), while the
    (NT,3)x(3,ny,nx) contraction is a single fused broadcast-multiply."""
    oh = didx if isinstance(didx, np.ndarray) and didx.ndim == 2 \
        else _dep_onehot(np.asarray(didx))
    w3 = jnp.stack([wa, wv, ws])
    return jnp.einsum("tk,k...->t...", jnp.asarray(oh, w3.dtype), w3)


# ---------------------------------------------------------------------------
# aggregation (icepack_aggregate)
# ---------------------------------------------------------------------------

def aggregate_area(aicen):
    return jnp.sum(aicen, axis=0)


def compute_tracers(aicen, vicen, vsnon, trcrn, registry):
    """Cell-mean tracer values (icepack_compute_tracers semantics):
    weight per dependency, divide by aggregate weight."""
    from ..model.state import DEP_AICE, DEP_VICE, DEP_VSNO
    out = {}
    denom = {DEP_AICE: jnp.sum(aicen, axis=0), DEP_VICE: jnp.sum(vicen, axis=0),
             DEP_VSNO: jnp.sum(vsnon, axis=0)}
    wgt = {DEP_AICE: aicen, DEP_VICE: vicen, DEP_VSNO: vsnon}
    for spec in registry:
        w = wgt[spec.depend]
        t = trcrn[spec.name]
        if t.ndim == 4:
            w = w[:, None]
        num = jnp.sum(t * w, axis=0)
        den = denom[spec.depend]
        den = den[None] if t.ndim == 4 else den
        out[spec.name] = jnp.where(den > cst.puny, num / jnp.maximum(den, cst.puny), 0.0)
    return out


# ---------------------------------------------------------------------------
# linear remapping of the ITD (kitd=1), Lipscomb 2001
# ---------------------------------------------------------------------------

def _linear_g(a, h, lo, hi, puny):
    """Limited linear thickness distribution g(h) on [lo, hi].

    Lipscomb (2001) eqs. 13-15: fit g(h) = g0 + g1*(h - hl_eff) to the
    category's (area, mean thickness); where the fit would go negative at an
    endpoint, shrink the support to a triangle so g >= 0 everywhere.
    Returns (g0, g1, hl_eff, hr_eff).
    """
    eta = jnp.maximum(hi - lo, puny)
    x = jnp.clip((h - lo) / eta, 0.0, 1.0)
    # interior fit
    g0_mid = a / eta * (4.0 - 6.0 * x)
    g1_mid = a / (eta * eta) * (12.0 * x - 6.0)
    # right triangle (x > 2/3): support [hi - w, hi], g rises from 0
    w_r = jnp.maximum(3.0 * (1.0 - x) * eta, puny)
    # left triangle (x < 1/3): support [lo, lo + w], g falls to 0
    w_l = jnp.maximum(3.0 * x * eta, puny)

    right = x > 2.0 / 3.0
    left = x < 1.0 / 3.0
    hl_eff = jnp.where(right, hi - w_r, lo)
    hr_eff = jnp.where(left, lo + w_l, hi)
    g0 = jnp.where(right, 0.0, jnp.where(left, 2.0 * a / w_l, g0_mid))
    g1 = jnp.where(right, 2.0 * a / (w_r * w_r),
                   jnp.where(left, -2.0 * a / (w_l * w_l), g1_mid))
    return g0, g1, hl_eff, hr_eff


def _transfer_integrals(g0, g1, hl_eff, hr_eff, c1, c2):
    """(area, volume) integrals of g over [c1, c2] clipped to the support."""
    y1 = jnp.clip(c1 - hl_eff, 0.0, hr_eff - hl_eff)
    y2 = jnp.clip(c2 - hl_eff, 0.0, hr_eff - hl_eff)
    da = g0 * (y2 - y1) + 0.5 * g1 * (y2 * y2 - y1 * y1)
    dv = hl_eff * da + 0.5 * g0 * (y2 * y2 - y1 * y1) \
        + g1 * (y2 ** 3 - y1 ** 3) / 3.0
    return da, dv


def linear_itd_remap(aicen, vicen, vsnon, trcrn, hin_max, hicen_old, hicen_new,
                     registry):
    """Restore fixed thickness-category boundaries after vertical growth/melt.

    Lipscomb (2001) linear remapping (reference consumes it as icepack_itd /
    linear_itd, kitd=1): displace the boundaries with the thermodynamic growth
    field, rebuild a limited-linear g(h) per displaced category, and move the
    integral beyond each fixed boundary to the neighbor category — area,
    volume, snow (in proportion to area), and tracers (donor values merged
    with dependency weights). Fully dense/masked: runs for every cell, every
    boundary, with jnp.where gating.
    """
    from ..model.state import DEP_AICE, DEP_VICE, DEP_VSNO

    ncat = aicen.shape[0]
    dt = aicen.dtype
    puny = jnp.asarray(cst.puny, dt)

    # --- displaced boundaries (Lipscomb eq. 8-12) --------------------------
    hbnew = [jnp.zeros_like(aicen[0])]
    for n in range(ncat - 1):
        hb = jnp.asarray(hin_max[n + 1], dt)
        h1, h2 = hicen_old[n], hicen_old[n + 1]
        d1 = hicen_new[n] - hicen_old[n]
        d2 = hicen_new[n + 1] - hicen_old[n + 1]
        both = (aicen[n] > puny) & (aicen[n + 1] > puny)
        only1 = (aicen[n] > puny) & ~both
        only2 = (aicen[n + 1] > puny) & ~both
        dh21 = h2 - h1
        slope = jnp.where(jnp.abs(dh21) > puny,
                          (d2 - d1) / jnp.where(jnp.abs(dh21) > puny, dh21, 1.0), 0.0)
        dhb = d1 + slope * (hb - h1)
        dhb = jnp.where(both, dhb, jnp.where(only1, d1, jnp.where(only2, d2, 0.0)))
        hbn = hb + dhb
        # keep displaced boundary within the fixed neighbors' bounds
        hbn = jnp.clip(hbn, jnp.asarray(hin_max[n], dt) + puny,
                       jnp.asarray(hin_max[n + 2], dt) - puny)
        hbnew.append(hbn)
    hbnew.append(jnp.full_like(aicen[0], hin_max[-1]))

    a = list(aicen)
    v = list(vicen)
    s = list(vsnon)
    didx, _ = flat_dep_table(registry)
    didx = _dep_onehot(didx)
    packed_in = not isinstance(trcrn, dict)
    tr = list(trcrn) if packed_in \
        else list(pack_tracers(trcrn, registry))  # per-cat (NT, ny, nx)

    for n in range(ncat - 1):
        hb_fixed = jnp.asarray(hin_max[n + 1], dt)
        hb_disp = hbnew[n + 1]
        up = hb_disp > hb_fixed + puny       # ice grew across the boundary
        dn = hb_disp < hb_fixed - puny       # ice melted back across it

        # donor support uses displaced boundaries
        h_dn = vicen_safe_h(v[n], a[n])
        h_dn1 = vicen_safe_h(v[n + 1], a[n + 1])
        g0u, g1u, hlu, hru = _linear_g(a[n], h_dn, hbnew[n], hb_disp, puny)
        dau, dvu = _transfer_integrals(g0u, g1u, hlu, hru, hb_fixed, hb_disp)
        g0d, g1d, hld, hrd = _linear_g(a[n + 1], h_dn1, hb_disp, hbnew[n + 2], puny)
        dad, dvd = _transfer_integrals(g0d, g1d, hld, hrd, hb_disp, hb_fixed)

        oku = up & (a[n] > puny)
        okd = dn & (a[n + 1] > puny)
        dau = jnp.where(oku, jnp.clip(dau, 0.0, a[n]), 0.0)
        dvu = jnp.where(oku, jnp.clip(dvu, 0.0, v[n]), 0.0)
        dad = jnp.where(okd, jnp.clip(dad, 0.0, a[n + 1]), 0.0)
        dvd = jnp.where(okd, jnp.clip(dvd, 0.0, v[n + 1]), 0.0)

        # snow moves in proportion to area moved (icepack shift_ice)
        dsu = jnp.where(a[n] > puny, s[n] * dau / jnp.maximum(a[n], puny), 0.0)
        dsd = jnp.where(a[n + 1] > puny, s[n + 1] * dad / jnp.maximum(a[n + 1], puny), 0.0)

        # merge tracers into the receiver with dependency weights (packed:
        # one NT-vectorized weighted mean instead of a per-spec loop)
        du_ = _dep_weight(didx, dau, dvu, dsu)
        dd_ = _dep_weight(didx, dad, dvd, dsd)
        ru_ = _dep_weight(didx, a[n + 1], v[n + 1], s[n + 1])
        rd_ = _dep_weight(didx, a[n], v[n], s[n])
        t_n, t_n1 = tr[n], tr[n + 1]
        # upward transfer: donor n -> receiver n+1
        den_u = ru_ + du_
        tr[n + 1] = jnp.where(den_u > puny, (t_n1 * ru_ + t_n * du_) /
                              jnp.maximum(den_u, puny), t_n1)
        # downward transfer: donor n+1 -> receiver n
        den_d = rd_ + dd_
        tr[n] = jnp.where(den_d > puny, (t_n * rd_ + t_n1 * dd_) /
                          jnp.maximum(den_d, puny), t_n)

        a[n] = a[n] - dau + dad
        a[n + 1] = a[n + 1] + dau - dad
        v[n] = v[n] - dvu + dvd
        v[n + 1] = v[n + 1] + dvu - dvd
        s[n] = s[n] - dsu + dsd
        s[n + 1] = s[n + 1] + dsu - dsd

    trm = jnp.stack(tr)
    return (jnp.stack(a), jnp.stack(v), jnp.stack(s),
            trm if packed_in else unpack_tracers(trm, registry))


def vicen_safe_h(v, a):
    return jnp.where(a > cst.puny, v / jnp.maximum(a, cst.puny), 0.0)


def rebin(aicen, vicen, vsnon, trcrn, hin_max, registry):
    """Make sure category mean thicknesses lie within bounds by shifting whole
    parcels to the correct neighbor category (icepack `rebin` semantics).
    One sweep up + one sweep down; guaranteed in-bounds for adjacent spills."""
    ncat = aicen.shape[0]
    a = list(aicen)
    v = list(vicen)
    s = list(vsnon)
    didx, _ = flat_dep_table(registry)
    didx = _dep_onehot(didx)
    packed_in = not isinstance(trcrn, dict)
    tr = list(trcrn) if packed_in \
        else list(pack_tracers(trcrn, registry))  # per-cat (NT, ny, nx)

    def move(frm, to, moving):
        """Move the masked parcels (whole category content) frm->to
        (packed NT-vectorized weighted mean).  The NT-stack merge — the
        expensive part — runs under a device-side lax.cond: after the
        linear ITD remap, out-of-bounds parcels are RARE, so the common
        case skips the two stack reads + one write entirely."""
        def _merge(args):
            t_to, t_frm = args
            wsrc = _dep_weight(didx, a[frm], v[frm], s[frm])
            wdst = _dep_weight(didx, a[to], v[to], s[to])
            wsm = jnp.where(moving[None], wsrc, 0.0)
            den = wdst + wsm
            return jnp.where(den > cst.puny,
                             (t_to * wdst + t_frm * wsm) /
                             jnp.maximum(den, cst.puny), t_to)

        if REBIN_COND:
            tr[to] = jax.lax.cond(jnp.any(moving), _merge,
                                  lambda args: args[0], (tr[to], tr[frm]))
        else:
            tr[to] = _merge((tr[to], tr[frm]))
        for pool in (a, v, s):
            dm = jnp.where(moving, pool[frm], 0.0)
            pool[to] = pool[to] + dm
            pool[frm] = pool[frm] - dm

    for n in range(ncat - 1):        # sweep up
        h = vicen_safe_h(v[n], a[n])
        moving = (a[n] > cst.puny) & (h > hin_max[n + 1])
        move(n, n + 1, moving)
    for n in range(ncat - 1, 0, -1):  # sweep down
        h = vicen_safe_h(v[n], a[n])
        moving = (a[n] > cst.puny) & (h < hin_max[n])
        move(n, n - 1, moving)

    trm = jnp.stack(tr)
    return (jnp.stack(a), jnp.stack(v), jnp.stack(s),
            trm if packed_in else unpack_tracers(trm, registry))


def cleanup_itd(aicen, vicen, vsnon, trcrn, registry, *, puny=cst.puny,
                dt=None, sal_ref=4.0):
    """Zero out negligible categories, renormalize aice <= 1
    (icepack cleanup_itd semantics). With `dt` given, the zapped mass and
    enthalpy are returned as ocean fluxes (reference cleanup_itd dfresh/
    dfsalt/dfhocn) so the freshwater/heat budgets stay closed; without dt
    the legacy 4-tuple is returned (flux-free contexts)."""
    keep = (aicen > puny) & (vicen > 0.0)
    vice_rm = jnp.sum(jnp.where(keep, 0.0, vicen), axis=0)
    vsno_rm = jnp.sum(jnp.where(keep, 0.0, vsnon), axis=0)
    packed_in = not isinstance(trcrn, dict)
    if packed_in:
        # packed (ncat, NT, ny, nx) stack: qice/qsno live at their layout
        # offsets (therm2 packed chain)
        off = name_offsets(registry)
        qice_m = qsno_m = None
        if "qice" in off:
            o, n = off["qice"]
            qice_m = trcrn[:, o:o + n].mean(axis=1)
        if "qsno" in off:
            o, n = off["qsno"]
            qsno_m = trcrn[:, o:o + n].mean(axis=1)
    else:
        qice_m = trcrn["qice"].mean(axis=1) if "qice" in trcrn else None
        qsno_m = trcrn["qsno"].mean(axis=1) if "qsno" in trcrn else None
    eice_rm = esno_rm = None
    if dt is not None and qice_m is not None and qsno_m is not None:
        eice_rm = jnp.sum(jnp.where(keep, 0.0, qice_m * vicen), axis=0)
        esno_rm = jnp.sum(jnp.where(keep, 0.0, qsno_m * vsnon), axis=0)
    aicen = jnp.where(keep, aicen, 0.0)
    vicen = jnp.where(keep, vicen, 0.0)
    vsnon = jnp.where(keep, vsnon, 0.0)
    if packed_in:
        trcrn = jnp.where(keep[:, None], trcrn, 0.0)
    else:
        trcrn = {k: jnp.where(keep[:, None] if v.ndim == 4 else keep,
                              v, 0.0)
                 for k, v in trcrn.items()}
    aice = jnp.sum(aicen, axis=0)
    scale = jnp.where(aice > 1.0, 1.0 / jnp.maximum(aice, puny), 1.0)
    aicen = aicen * scale[None]
    if dt is None:
        return aicen, vicen, vsnon, trcrn
    dt_i = 1.0 / dt
    flux = dict(
        fresh=(cst.rhoi * vice_rm + cst.rhos * vsno_rm) * dt_i,
        fsalt=cst.rhoi * vice_rm * sal_ref * 1e-3 * dt_i,
        fhocn=((eice_rm + esno_rm) * dt_i if eice_rm is not None
               else jnp.zeros_like(vice_rm)))
    return aicen, vicen, vsnon, trcrn, flux
