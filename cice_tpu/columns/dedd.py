"""Delta-Eddington multiple-scattering shortwave (shortwave='dEdd').

Column-physics equivalent of the Icepack delta-Eddington radiation the
reference consumes through `icepack_step_radiation` / `icepack_shortwave`
(shortwave_nml `shortwave='dEdd'`; call site ice_step_mod.F90:1292-1473 —
SURVEY.md §2.9). The Icepack source is not vendored in the reference repo;
this is written from the published scheme: Briegleb & Light (2007, NCAR/TN-
472+STR): per-category columns are split into snow-covered / bare-ice /
ponded sub-columns, each a stack of homogeneous layers with delta-scaled
inherent optical properties, solved by the analytic delta-Eddington
two-stream solution per layer and combined with the adding method
(top-down transmission/reflection recursions, bottom-up reflectivities,
interface fluxes).

Two bands (visible < 700 nm, near-IR), direct + diffuse streams. All
arrays are dense `(ncat, ny, nx)`; the layer loops are static Python
loops over nslyr/nilyr — everything traces into one XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst
from .shortwave import ShortwaveOut

# --- inherent optical properties -------------------------------------------
# (scattering sigma [1/m], absorption kappa [1/m], asymmetry g) per band.
# Magnitudes follow Briegleb & Light (2007): strongly scattering surface
# scattering layer (SSL), moderately scattering drained layer (DL), weakly
# scattering interior (INT); pond water absorbs but barely scatters; snow
# scattering set by grain radius through geometric optics.
IOPS_ICE_VIS = ((250.0, 0.11, 0.94),   # SSL
                (30.0, 0.25, 0.94),    # DL
                (2.5, 0.35, 0.94))     # INT
IOPS_ICE_NIR = ((250.0, 8.0, 0.94),
                (30.0, 12.0, 0.94),
                (2.5, 18.0, 0.94))
IOP_POND_VIS = (0.0, 0.30, 0.0)
IOP_POND_NIR = (0.0, 14.0, 0.0)
W0_SNOW_VIS = 0.99999
W0_SNOW_NIR = 0.9650
G_SNOW = 0.89
H_SSL = 0.05        # surface scattering layer thickness (m)
H_DL = 0.05         # drained layer thickness (m)
ALB_OCEAN = 0.06    # underlying ocean albedo (both bands)
MU0_MIN = 0.05


def _delta_eddington_layer(tau, w0, g, mu0):
    """Analytic delta-Eddington solution for one homogeneous layer.

    Returns (rdir, tdir, rdif, tdif, trnlay): direct-beam reflectance and
    total transmittance, diffuse reflectance/transmittance, and direct-beam
    (unscattered) transmission. Formulas: Briegleb (1992) / CCM3 radcsw as
    adopted by Briegleb & Light (2007) eqs. (50)-(55).
    """
    # delta scaling: f = g^2
    f = g * g
    taus = (1.0 - w0 * f) * tau
    ws = jnp.clip((1.0 - f) * w0 / jnp.maximum(1.0 - w0 * f, 1e-12),
                  0.0, 0.999999)
    gs = g / (1.0 + g)

    lm = jnp.sqrt(jnp.maximum(3.0 * (1.0 - ws) * (1.0 - ws * gs), 1e-12))
    ue = 1.5 * (1.0 - ws * gs) / lm
    # avoid the lam*mu0 -> 1 resonance
    denom = 1.0 - (lm * mu0) ** 2
    denom = jnp.where(jnp.abs(denom) < 1e-6,
                      jnp.sign(denom) * 1e-6 + (denom == 0) * 1e-6, denom)
    alp = 0.75 * ws * mu0 * (1.0 + gs * (1.0 - ws)) / denom
    gam = 0.5 * ws * (1.0 + 3.0 * gs * mu0 * mu0 * (1.0 - ws)) / denom
    apg = alp + gam
    amg = alp - gam

    extins = jnp.exp(-jnp.minimum(lm * taus, 25.0))
    ne = (ue + 1.0) ** 2 / extins - (ue - 1.0) ** 2 * extins
    rdif = (ue * ue - 1.0) * (1.0 / extins - extins) / ne
    tdif = 4.0 * ue / ne

    trnlay = jnp.exp(-jnp.minimum(taus / jnp.maximum(mu0, MU0_MIN), 25.0))
    rdir = apg * rdif + amg * tdif * trnlay - amg
    tdir = apg * tdif + (amg * rdif - apg + 1.0) * trnlay
    rdir = jnp.clip(rdir, 0.0, 1.0)
    tdir = jnp.clip(tdir, 0.0, 1.0)
    return rdir, tdir, jnp.clip(rdif, 0.0, 1.0), jnp.clip(tdif, 0.0, 1.0), trnlay


def _adding(layers, mu0, alb_ocn):
    """Adding method over a static list of (tau, w0, g) layers above ocean.

    Returns (albdir, albdif, absdir[k], absdif[k], trandir, trandif):
    column albedos, per-layer absorbed fraction, and transmittance to the
    ocean, separately per incident direct / diffuse unit flux.
    """
    n = len(layers)
    props = [_delta_eddington_layer(tau, w0, g, mu0) for tau, w0, g in layers]

    one = jnp.ones_like(mu0)
    zero = jnp.zeros_like(mu0)
    # top-down: stack-above quantities at each interface 0..n
    trndir = [one]; trntdr = [one]; trndif = [one]; rdndif = [zero]
    for k in range(n):
        rdir, tdir, rdif, tdif, trn = props[k]
        refkm1 = 1.0 / (1.0 - rdndif[k] * rdif)
        tdrrdir = trndir[k] * rdir
        tdndif = trntdr[k] - trndir[k]
        trntdr.append(trndir[k] * tdir +
                      (tdndif + tdrrdir * rdndif[k]) * refkm1 * tdif)
        rdndif.append(rdif + tdif * rdndif[k] * refkm1 * tdif)
        trndif.append(trndif[k] * refkm1 * tdif)
        trndir.append(trndir[k] * trn)

    # bottom-up: stack-below reflectivities at each interface
    rupdir = [None] * (n + 1)
    rupdif = [None] * (n + 1)
    rupdir[n] = jnp.full_like(mu0, alb_ocn)
    rupdif[n] = jnp.full_like(mu0, alb_ocn)
    for k in range(n - 1, -1, -1):
        rdir, tdir, rdif, tdif, trn = props[k]
        refkp1 = 1.0 / (1.0 - rdif * rupdif[k + 1])
        rupdir[k] = rdir + (trn * rupdir[k + 1] +
                            (tdir - trn) * rupdif[k + 1]) * refkp1 * tdif
        rupdif[k] = rdif + tdif * rupdif[k + 1] * refkp1 * tdif

    # interface net fluxes per unit incident direct / diffuse
    fdir_net = []   # net downward at interface k (direct-incident column)
    fdif_net = []
    for k in range(n + 1):
        refk = 1.0 / (1.0 - rdndif[k] * rupdif[k])
        fdirup = (trndir[k] * rupdir[k] +
                  (trntdr[k] - trndir[k]) * rupdif[k]) * refk
        fdirdn = trndir[k] + (trntdr[k] - trndir[k] +
                              trndir[k] * rupdir[k] * rdndif[k]) * refk
        fdifup = trndif[k] * rupdif[k] * refk
        fdifdn = trndif[k] * refk
        fdir_net.append(fdirdn - fdirup)
        fdif_net.append(fdifdn - fdifup)

    albdir = 1.0 - fdir_net[0]
    albdif = 1.0 - fdif_net[0]
    absdir = [fdir_net[k] - fdir_net[k + 1] for k in range(n)]
    absdif = [fdif_net[k] - fdif_net[k + 1] for k in range(n)]
    return albdir, albdif, absdir, absdif, fdir_net[n], fdif_net[n]


def _ice_layer_iops(hi, nilyr, band_iops, tau_alg=None):
    """IOPs for the nilyr uniform ice layers: each layer takes SSL/DL/INT
    properties by the depth of its midpoint (dense blend, no branches).
    tau_alg: optional absorption optical depth added to the bottom layer
    (dEdd_algae: ice-algal chlorophyll shading, zbgc_nml)."""
    (s_ssl, a_ssl, g_i), (s_dl, a_dl, _), (s_int, a_int, _) = band_iops
    hl = hi / nilyr
    out = []
    for k in range(nilyr):
        zmid = hl * (k + 0.5)
        in_ssl = (zmid < H_SSL).astype(hi.dtype)
        in_dl = ((zmid >= H_SSL) & (zmid < H_SSL + H_DL)).astype(hi.dtype)
        in_int = 1.0 - in_ssl - in_dl
        sig = in_ssl * s_ssl + in_dl * s_dl + in_int * s_int
        kab = in_ssl * a_ssl + in_dl * a_dl + in_int * a_int
        tau = (sig + kab) * hl
        w0 = sig / jnp.maximum(sig + kab, 1e-12)
        if tau_alg is not None and k == nilyr - 1:
            t2 = tau + jnp.maximum(tau_alg, 0.0)
            w0 = w0 * tau / jnp.maximum(t2, 1e-12)
            tau = t2
        out.append((tau, w0, jnp.full_like(hi, g_i)))
    return out


# Aerosol-in-snow optics per species class, [vis, nir] per property —
# magnitudes follow the SNICAR coefficients the reference's column physics
# documents (Icepack kaer_tab/waer_tab/gaer_tab; species order bc1, bc2,
# dust1..dust4; nir here is the average of Icepack's two nir sub-bands).
AER_OPTICS = [
    # (ext m2/kg (vis, nir), ssa (vis, nir), g (vis, nir))
    ((11580.0, 3687.0), (0.291, 0.174), (0.353, 0.287)),   # bc1 (fresh BC)
    ((25799.0, 8587.0), (0.744, 0.474), (0.598, 0.494)),   # bc2 (aged BC)
    ((196.5, 209.3), (0.972, 0.949), (0.673, 0.697)),      # dust1
    ((2665.9, 1538.5), (0.943, 0.897), (0.684, 0.668)),    # dust2
    ((840.8, 596.1), (0.946, 0.903), (0.716, 0.687)),      # dust3
    ((387.5, 276.0), (0.947, 0.906), (0.757, 0.712)),      # dust4
]
MODAL_BC_ENHANCE = 1.5   # internal-mixing absorption enhancement (modal_aero;
#                          Flanner et al. 2012 sulfate-coated BC factor)


def _mix_aerosol(tau, w0, g, aero_mass, band: str, modal: bool):
    """Blend aerosol extinction into a (tau, w0, g) layer. aero_mass is a
    list over species of kg/m^2 loadings in this layer."""
    bi = 0 if band == "vis" else 1
    tau_t, sw_t, gsw_t = tau, w0 * tau, g * w0 * tau
    for s, mass in enumerate(aero_mass):
        ext, ssa, ga = AER_OPTICS[s % len(AER_OPTICS)]
        ext_b, ssa_b, g_b = ext[bi], ssa[bi], ga[bi]
        if modal and s % len(AER_OPTICS) in (0, 1):   # BC species
            # enhancement acts on absorption: scale ext, renormalize ssa
            abs_b = ext_b * (1.0 - ssa_b) * MODAL_BC_ENHANCE
            sca_b = ext_b * ssa_b
            ext_b = abs_b + sca_b
            ssa_b = sca_b / ext_b
        ta = ext_b * jnp.maximum(mass, 0.0)
        tau_t = tau_t + ta
        sw_t = sw_t + ssa_b * ta
        gsw_t = gsw_t + g_b * ssa_b * ta
    w0_t = sw_t / jnp.maximum(tau_t, 1e-12)
    g_t = gsw_t / jnp.maximum(sw_t, 1e-12)
    return tau_t, jnp.clip(w0_t, 0.0, 1.0), jnp.clip(g_t, 0.0, 1.0)


def _snow_iops(hs, nslyr, rsnw_m, band: str, aero_snow=None,
               modal: bool = False):
    """Snow layer IOPs via geometric optics: tau = 3 h rho_s / (2 rho_i r);
    aerosol loadings darken the top (surface-scavenged) snow layer."""
    w0 = W0_SNOW_VIS if band == "vis" else W0_SNOW_NIR
    hl = hs / nslyr
    tau = 1.5 * hl * cst.rhos / (cst.rhoi * jnp.maximum(rsnw_m, 1e-5))
    out = [[tau, jnp.full_like(hs, w0), jnp.full_like(hs, G_SNOW)]
           for _ in range(nslyr)]
    if aero_snow is not None and len(aero_snow):
        out[0] = list(_mix_aerosol(out[0][0], out[0][1], out[0][2],
                                   aero_snow, band, modal))
    return [tuple(layer) for layer in out]


def _column(band, mu0, *, hs, hi, hpnd, nslyr, nilyr, rsnw_m, kind,
            aero_snow=None, modal=False, tau_alg=None,
            R_ice=0.0, R_pnd=0.0):
    """Albedos/absorption for one sub-column type ('snow'|'bare'|'pond').

    R_ice/R_pnd: standard-deviation tuning of the bare-ice / pond SSL
    scattering (shortwave_nml; reference dEdd R_ice, R_pnd)."""
    ice_iops = IOPS_ICE_VIS if band == "vis" else IOPS_ICE_NIR
    pond_iop = IOP_POND_VIS if band == "vis" else IOP_POND_NIR
    if R_ice:
        # one sigma ~ 15% scattering change in the surface layers
        fac = max(1.0 + 0.15 * R_ice, 0.05)
        (s1, a1, g1), (s2, a2, g2), l3 = ice_iops
        ice_iops = ((s1 * fac, a1, g1), (s2 * fac, a2, g2), l3)
    if R_pnd and kind == "pond":
        sigp, kabp, gp = pond_iop
        pond_iop = (sigp, max(kabp * (1.0 - 0.15 * R_pnd), 1e-3), gp)
    layers = []
    nsl = 0
    if kind == "snow":
        layers += _snow_iops(hs, nslyr, rsnw_m, band, aero_snow, modal)
        nsl = nslyr
    elif kind == "pond":
        sig, kab, g = pond_iop
        tau = (sig + kab) * hpnd
        layers.append((tau, jnp.full_like(hpnd, sig / max(sig + kab, 1e-12)),
                       jnp.full_like(hpnd, g)))
        nsl = 1
    layers += _ice_layer_iops(hi, nilyr, ice_iops,
                              tau_alg if band == "vis" else None)
    albdir, albdif, absdir, absdif, trdir, trdif = _adding(
        layers, mu0, ALB_OCEAN)
    # split absorbed: layers above the ice count as surface absorption
    sfc_dir = sum(absdir[:nsl]) if nsl else jnp.zeros_like(mu0)
    sfc_dif = sum(absdif[:nsl]) if nsl else jnp.zeros_like(mu0)
    return dict(albdir=albdir, albdif=albdif,
                sfc_dir=sfc_dir, sfc_dif=sfc_dif,
                ice_dir=absdir[nsl:], ice_dif=absdif[nsl:],
                tr_dir=trdir, tr_dif=trdif)


def shortwave_dEdd(Tsf, hi, hs, hpnd, apeff, swvdr, swvdf, swidr, swidf,
                   coszen, cfg_sw, nilyr: int, nslyr: int = 1,
                   aero_snow=None, modal_aero: bool = False,
                   tau_alg=None) -> ShortwaveOut:
    """Delta-Eddington shortwave for all categories at once.

    Tsf/hi/hs/hpnd/apeff: (ncat, ny, nx); sw* and coszen (ny, nx).
    Sub-column area weights per category: ponded = apeff, snow-covered
    = (1-apeff)*fsnow_patch, bare = remainder (Briegleb & Light §4).
    aero_snow: optional list over species of (ncat, ny, nx) kg/m^2 snow
    aerosol loadings (tr_aero; modal_aero per ug_case_settings thermo_nml).
    """
    mu0 = jnp.maximum(coszen, MU0_MIN) * jnp.ones_like(Tsf)
    hi_s = jnp.maximum(hi, 0.0)
    hs_s = jnp.maximum(hs, 0.0)

    # snow grain radius (m): ramp from cold fine grains to the melting
    # radius rsnw_mlt over dT_mlt (R_snw shifts the melting-onset radius)
    dTs = jnp.clip((cst.Timelt - Tsf) / cfg_sw.dT_mlt, 0.0, 1.0)
    rsnw_um = cfg_sw.rsnw_mlt - (cfg_sw.rsnw_mlt - 180.0) * dTs \
        - 30.0 * cfg_sw.R_snw
    rsnw_m = jnp.clip(rsnw_um, 50.0, 2000.0) * 1e-6

    fsnow_patch = hs_s / (hs_s + cst.snowpatch)
    w_pnd = jnp.clip(apeff, 0.0, 1.0)
    w_snw = (1.0 - w_pnd) * fsnow_patch
    w_bare = jnp.maximum(1.0 - w_pnd - w_snw, 0.0)

    common = dict(hs=hs_s, hi=jnp.maximum(hi_s, 0.001), hpnd=hpnd,
                  nslyr=nslyr, nilyr=nilyr, rsnw_m=rsnw_m,
                  aero_snow=aero_snow, modal=modal_aero, tau_alg=tau_alg,
                  R_ice=cfg_sw.R_ice, R_pnd=cfg_sw.R_pnd)

    out = {}
    for band in ("vis", "nir"):
        cols = {k: _column(band, mu0, kind=k, **common)
                for k in ("snow", "bare", "pond")}
        mix = lambda key: (w_snw * cols["snow"][key] +
                           w_bare * cols["bare"][key] +
                           w_pnd * cols["pond"][key])
        out[band] = dict(
            albdir=mix("albdir"), albdif=mix("albdif"),
            sfc_dir=mix("sfc_dir"), sfc_dif=mix("sfc_dif"),
            ice_dir=[w_snw * cols["snow"]["ice_dir"][k] +
                     w_bare * cols["bare"]["ice_dir"][k] +
                     w_pnd * cols["pond"]["ice_dir"][k]
                     for k in range(nilyr)],
            ice_dif=[w_snw * cols["snow"]["ice_dif"][k] +
                     w_bare * cols["bare"]["ice_dif"][k] +
                     w_pnd * cols["pond"]["ice_dif"][k]
                     for k in range(nilyr)],
            tr_dir=mix("tr_dir"), tr_dif=mix("tr_dif"))

    v, n = out["vis"], out["nir"]
    # absorbed fluxes (W/m^2)
    sfc = (swvdr * v["sfc_dir"] + swvdf * v["sfc_dif"] +
           swidr * n["sfc_dir"] + swidf * n["sfc_dif"])
    layer_abs = []
    for k in range(nilyr):
        layer_abs.append(swvdr * v["ice_dir"][k] + swvdf * v["ice_dif"][k] +
                         swidr * n["ice_dir"][k] + swidf * n["ice_dif"][k])
    fswthru = (swvdr * v["tr_dir"] + swvdf * v["tr_dif"] +
               swidr * n["tr_dir"] + swidf * n["tr_dif"])
    fswint = sum(layer_abs)

    # the top ice layer's absorption acts as surface flux for the
    # conduction solve's surface balance only when snow is absent; keep the
    # reference convention: fswsfc = snow/pond + top-layer portion stays in
    # Iswabs (temperature_changes consumes Iswabs per layer).
    dark = (swvdr + swvdf + swidr + swidf) <= cst.puny
    zero_sun = lambda x: jnp.where(dark, 0.0, x)

    Iswabs = jnp.stack([zero_sun(a) for a in layer_abs], axis=1)
    return ShortwaveOut(
        alvdr=jnp.clip(v["albdir"], 0.0, 1.0),
        alvdf=jnp.clip(v["albdif"], 0.0, 1.0),
        alidr=jnp.clip(n["albdir"], 0.0, 1.0),
        alidf=jnp.clip(n["albdif"], 0.0, 1.0),
        fswsfc=zero_sun(sfc), fswint=zero_sun(fswint),
        fswthru=zero_sun(fswthru), Iswabs=Iswabs,
        fswpen=zero_sun(fswint + fswthru))
