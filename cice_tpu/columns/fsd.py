"""Floe size distribution (tr_fsd): thermodynamic evolution + wave fracture.

Equivalent of the Icepack FSD pack the reference consumes
(`icepack_init_fsd_bounds/icepack_init_fsd/icepack_step_wavefracture/
icepack_cleanup_fsd`, the FSD branches inside icepack_step_therm2;
tracer_nml `tr_fsd`, nfsd in ice_domain_size; wave coupling
`step_dyn_wave` ice_step_mod.F90:897-958 — SURVEY.md §2.9). Icepack source
not vendored; written from the published science: Roach, Horvat, Dean &
Bitz (2018, JAMES) prognostic joint floe-size/thickness distribution —
new-ice formation into the smallest category, lateral growth/melt as
advection in floe-size space, floe welding as quadratic coagulation, and
wave fracture redistributing large floes (Horvat & Tziperman 2015).

Tracer: fsd (ncat, nfsd, ny, nx) — area fraction of each category's ice in
each floe-size bin; sums to 1 over bins where ice is present.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst

# 12-bin floe radius boundaries (m) of Roach et al. (2018) (nfsd=12); other
# nfsd values take the first nfsd+1 bounds of the full table or a power-law
# extension of it.
FLOE_RAD_BOUNDS = np.array(
    [0.0665, 5.31, 14.2, 29.0, 52.7, 87.8, 139.5, 211.8,
     308.4, 431.6, 585.8, 774.8, 1002.0])


def fsd_bounds(nfsd: int):
    """(lower, upper, mid) floe radii (m) for nfsd bins."""
    if nfsd + 1 <= len(FLOE_RAD_BOUNDS):
        b = FLOE_RAD_BOUNDS[:nfsd + 1]
    else:
        extra = FLOE_RAD_BOUNDS[-1] * (1.3 ** np.arange(
            1, nfsd + 2 - len(FLOE_RAD_BOUNDS)))
        b = np.concatenate([FLOE_RAD_BOUNDS, extra])
    return b[:-1], b[1:], 0.5 * (b[:-1] + b[1:])


def fsd_cleanup(fsd, aicen):
    """Renormalize the FSD to sum to 1 over bins wherever ice exists
    (icepack_cleanup_fsd): negative clipping + normalization; ice-free
    cells get the all-small-floes distribution."""
    fsd = jnp.maximum(fsd, 0.0)
    tot = jnp.sum(fsd, axis=1, keepdims=True)
    base = jnp.zeros_like(fsd).at[:, 0].set(1.0)
    ok = tot > cst.puny
    return jnp.where(ok, fsd / jnp.maximum(tot, cst.puny), base)


def fsd_new_ice(fsd, aicen, da_new, nfsd: int):
    """New (frazil) ice forms as the smallest floes (Roach et al. 2018 —
    without waves all new area enters bin 0): re-weight the distribution
    by the old/new area split."""
    a_old = jnp.maximum(aicen, 0.0)
    a_new = jnp.maximum(da_new, 0.0)
    tot = a_old + a_new
    w_old = jnp.where(tot > cst.puny, a_old / jnp.maximum(tot, cst.puny), 1.0)
    add = jnp.zeros_like(fsd).at[:, 0].set(1.0)
    return fsd * w_old[:, None] + add * (1.0 - w_old[:, None])


def fsd_lateral_growth(cfg, dt, fsd, G_rad, nfsd: int):
    """Lateral growth/melt advects area in floe-size space: df/dt =
    -d(G f)/dr with growth speed G_rad (m/s, >0 growth). First-order
    upwind over the static bin grid."""
    lo, hi, mid = fsd_bounds(nfsd)
    widths = [float(w) for w in (hi - lo)]
    out = []
    grow = G_rad > 0.0
    for n in range(nfsd):
        f = fsd[:, n]
        # flux across the upper boundary (growth) / lower boundary (melt)
        c_out = jnp.abs(G_rad) * dt / widths[n]
        c_out = jnp.clip(c_out, 0.0, 1.0)
        out.append(f * (1.0 - c_out))
    res = jnp.stack(out, axis=1)
    for n in range(nfsd):
        c_in_src = jnp.clip(jnp.abs(G_rad) * dt / widths[n], 0.0, 1.0)
        inflow = fsd[:, n] * c_in_src
        # growth: into bin n+1 (largest bin keeps its mass); melt: bin n-1
        res = res.at[:, min(n + 1, nfsd - 1)].add(
            jnp.where(grow, inflow, 0.0))
        res = res.at[:, max(n - 1, 0)].add(jnp.where(grow, 0.0, inflow))
    return res


def fsd_weld(dt, fsd, aicen, frzmlt, nfsd: int):
    """Floe welding under freezing conditions (Roach et al. 2018):
    quadratic-in-f coagulation moving area up one bin with rate
    kappa_weld * aice * f^2."""
    KWELD = 0.01 / cst.secday      # merge rate scale (1/s)
    freezing = (frzmlt > 0.0).astype(fsd.dtype)
    res = fsd
    for n in range(nfsd - 1):
        dfn = jnp.clip(KWELD * dt * aicen * fsd[:, n] ** 2, 0.0, fsd[:, n])
        dfn = dfn * freezing[None]
        res = res.at[:, n].add(-dfn)
        res = res.at[:, n + 1].add(dfn)
    return res


def wave_attenuation_depth(hs_wave, aice):
    """e-folding attenuation distance of wave energy into the pack (m)."""
    return 1.0e4 * jnp.ones_like(hs_wave)


# --- spectral fracture (icepack_wavefracspec.F90 wave_frac analogue) -------

EPS_CRIT = 3.0e-5        # critical flexural strain (Horvat & Tziperman 2015)
NX_TRANSECT = 200        # surface-realization sample points
DX_TRANSECT = 25.0       # sample spacing (m) — reference uses 25 m
_G = 9.80616


def wave_frac_histogram(E, dwavefreq, wavefreq, hbar, nfsd: int):
    """Fracture-length histogram from a deterministic sea-surface
    realization (reference wave_frac, icepack_wavefracspec.F90):

      eta(x)   = sum_k sqrt(2 E_k df_k) cos(2 pi x / lam_k + phi_k)
      strain   = (hbar/2) |d2 eta/dx2|    (flexural strain of a thin plate
                                           conforming to the surface)
      fracture at local strain maxima exceeding EPS_CRIT; new floe sizes
      are the gaps between successive fracture points, binned to the FSD
      categories (length-weighted so redistribution conserves area).

    Deterministic phases (golden-angle sequence) stand in for the
    reference's seeded random draw — BFB across runs and decompositions.
    Returns W: (nfsd, ny, nx) length-weighted gap histogram.
    """
    dtype = E.dtype
    nfreq = E.shape[0]
    lam = _G / (2.0 * math.pi * wavefreq ** 2)             # deep-water (m)
    amp = jnp.sqrt(2.0 * jnp.maximum(E, 0.0) * dwavefreq[:, None, None])
    phi = (2.0 * math.pi * 0.6180339887) * jnp.arange(nfreq, dtype=dtype)
    x = jnp.arange(NX_TRANSECT, dtype=dtype) * DX_TRANSECT  # (nx_t,)
    # analytic curvature of the realization: (nx_t, ny, nx) after the sum
    karg = (2.0 * math.pi / lam)[:, None] * x[None, :] + phi[:, None]
    curv = (-(2.0 * math.pi / lam[:, None]) ** 2 *
            jnp.cos(karg)).astype(dtype)                   # (nfreq, nx_t)
    # strain(x, cell) = hbar/2 * |sum_k amp_k * curv_k(x)|
    strain = 0.5 * hbar[None] * jnp.abs(
        jnp.einsum("kt,kij->tij", curv, amp))              # (nx_t, ny, nx)
    s_prev = jnp.roll(strain, 1, axis=0).at[0].set(0.0)
    s_next = jnp.roll(strain, -1, axis=0).at[-1].set(0.0)
    mark = (strain > EPS_CRIT) & (strain > s_prev) & (strain >= s_next)
    idx = jnp.arange(NX_TRANSECT, dtype=dtype)[:, None, None]
    marked_idx = jnp.where(mark, idx, -1.0)
    prev_incl = jax.lax.cummax(marked_idx, axis=0)
    prev_excl = jnp.roll(prev_incl, 1, axis=0).at[0].set(-1.0)
    gap = jnp.where(mark & (prev_excl >= 0.0),
                    (idx - prev_excl) * DX_TRANSECT, 0.0)  # (nx_t, ny, nx)
    lo, hi_b, _ = fsd_bounds(nfsd)
    W = []
    for n in range(nfsd):
        inbin = (gap > float(lo[n])) & (gap <= float(hi_b[n]))
        W.append(jnp.sum(jnp.where(inbin, gap, 0.0), axis=0))
    return jnp.stack(W)                                    # (nfsd, ny, nx)


def fsd_wave_fracture(cfg, dt, fsd, aicen, vicen, hs_wave, Tp_wave,
                      nfsd: int, wave_spectrum=None):
    """Wave-induced floe fracture (Horvat & Tziperman 2015 via Roach et
    al. 2018). With a 25-bin `wave_spectrum`, fracture sizes come from the
    surface-realization histogram (wave_frac_histogram) and fractured area
    redistributes onto the histogram bins smaller than the donor floe —
    the reference icepack_step_wavefracture pathway. Without a spectrum,
    the round-1 dominant-wavelength scheme applies (floes above
    lambda/4 break; deposit weighted by bin width below the critical
    size). Strain criterion in both: flexural strain > EPS_CRIT."""
    if wave_spectrum is not None:
        from ..model.forcing import wave_frequencies
        # flexural plate thickness = ICE thickness vice/aice, not the
        # concentration-diluted cell mean (Horvat & Tziperman use floe
        # thickness; at low aice the cell mean underestimates strain)
        hbar = jnp.sum(vicen, axis=0) / \
            jnp.maximum(jnp.sum(aicen, axis=0), cst.puny)
        f, df = wave_frequencies(fsd.dtype)
        W = wave_frac_histogram(wave_spectrum, df, f, hbar, nfsd)
        _, hi_b, mid = fsd_bounds(nfsd)
        mid = [float(m) for m in mid]
        active = (hs_wave > 0.01)
        frac_rate = jnp.clip(dt / (6.0 * 3600.0), 0.0, 1.0)
        res = fsd
        # donor bins lose area where fracture pieces smaller than the floe
        # exist; gains land on the histogram bins (k < i), conserving area
        for i in range(nfsd):
            wsum = sum(W[k] for k in range(i)) if i > 0 else None
            if wsum is None:
                continue
            lose = active & (wsum > 0.0)
            df_i = jnp.where(lose[None], fsd[:, i] * frac_rate, 0.0)
            res = res.at[:, i].add(-df_i)
            for k in range(i):
                share = jnp.where(wsum > 0.0,
                                  W[k] / jnp.maximum(wsum, cst.puny), 0.0)
                res = res.at[:, k].add(df_i * share[None])
        return res
    g = _G
    lam = g * jnp.maximum(Tp_wave, 1.0) ** 2 / (2.0 * math.pi)   # wavelength
    hi = jnp.where(aicen > cst.puny,
                   vicen / jnp.maximum(aicen, cst.puny), 0.0)
    eps = 2.0 * hi * math.pi ** 2 * jnp.maximum(hs_wave, 0.0)[None] / \
        jnp.maximum(lam, 1.0)[None] ** 2
    EPS_CRIT = 3.0e-5
    active = (eps > EPS_CRIT) & (hs_wave[None] > 0.01)
    r_crit = 0.5 * lam[None] / 2.0          # floes above lambda/4 break

    lo, hi_b, mid = fsd_bounds(nfsd)
    widths = [float(w) for w in (hi_b - lo)]
    mid = [float(x) for x in mid]
    hi_b = [float(x) for x in hi_b]
    # fraction of each bin that fractures this step (rate ~ 1/6h when active)
    frac_rate = jnp.clip(dt / (6.0 * 3600.0), 0.0, 1.0)
    res = fsd
    broken = jnp.zeros_like(fsd[:, 0])
    for n in range(nfsd):
        breaks = active & (r_crit < mid[n])
        df = jnp.where(breaks, fsd[:, n] * frac_rate, 0.0)
        res = res.at[:, n].add(-df)
        broken = broken + df
    # deposit into bins fully below r_crit, weighted by bin width
    wsum = jnp.zeros_like(broken)
    wts = []
    for n in range(nfsd):
        w = jnp.where(active & (hi_b[n] <= r_crit), widths[n], 0.0)
        wts.append(w)
        wsum = wsum + w
    for n in range(nfsd):
        share = jnp.where(wsum > 0, wts[n] / jnp.maximum(wsum, cst.puny), 0.0)
        res = res.at[:, n].add(broken * share)
    # if no bin qualifies (waves break everything), smallest bin takes it
    res = res.at[:, 0].add(jnp.where(wsum > 0, 0.0, broken))
    return res


def _fsd_agg(fsd, aicen):
    """Cell aggregate of the joint distribution: (nfsd, ny, nx) area per
    floe-size bin (source of the f_afsd/f_dafsd_* history fields)."""
    return jnp.sum(fsd * aicen[:, None], axis=0)


def step_dyn_wave(cfg, dt, *, fsd, aicen, vicen, hs_wave, Tp_wave,
                  wave_spectrum=None, return_tend: bool = False):
    """Wave-fracture phase (reference step_dyn_wave ice_step_mod.F90:897).
    Returns the updated (cleaned) fsd tracer; with return_tend=True also a
    dict with the dafsd_wave tendency (1/s per bin, reference
    ice_history_fsd.F90 f_dafsd_wave)."""
    nfsd = cfg.domain.nfsd
    if not cfg.tracers.tr_fsd or nfsd <= 1:
        return (fsd, {}) if return_tend else fsd
    out = fsd_wave_fracture(cfg, dt, fsd, aicen, vicen, hs_wave, Tp_wave,
                            nfsd, wave_spectrum=wave_spectrum)
    out = fsd_cleanup(out, aicen)
    if return_tend:
        tend = {"dafsd_wave": (_fsd_agg(out, aicen) -
                               _fsd_agg(fsd, aicen)) / dt}
        return out, tend
    return out


def step_fsd_thermo(cfg, dt, *, fsd, aicen, da_new, G_rad, frzmlt,
                    return_tend: bool = False):
    """Thermodynamic FSD evolution: new ice + lateral growth/melt +
    welding (the FSD side-channel of icepack_step_therm2). With
    return_tend=True also returns the per-process aggregate tendencies
    (reference f_dafsd_newi/latg/latm/weld, 1/s per bin); lateral
    growth/melt split by the sign of the growth rate."""
    nfsd = cfg.domain.nfsd
    if not cfg.tracers.tr_fsd or nfsd <= 1:
        return (fsd, {}) if return_tend else fsd
    f1 = fsd_new_ice(fsd, aicen, da_new, nfsd)
    f2 = fsd_lateral_growth(cfg, dt, f1, G_rad, nfsd)
    f3 = fsd_weld(dt, f2, aicen, frzmlt, nfsd)
    out = fsd_cleanup(f3, aicen)
    if not return_tend:
        return out
    a0 = _fsd_agg(fsd, aicen)
    a1 = _fsd_agg(f1, aicen)
    a2 = _fsd_agg(f2, aicen)
    a3 = _fsd_agg(f3, aicen)
    dlat = (a2 - a1) / dt
    growing = jnp.any(G_rad > 0.0, axis=0)        # cell-level growth flag
    tend = {
        "dafsd_newi": (a1 - a0) / dt,
        "dafsd_latg": jnp.where(growing[None], dlat, 0.0),
        "dafsd_latm": jnp.where(growing[None], 0.0, dlat),
        "dafsd_weld": (a3 - a2) / dt,
    }
    return out, tend
