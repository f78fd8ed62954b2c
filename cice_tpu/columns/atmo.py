"""Atmosphere-ice boundary layer: turbulent flux transfer coefficients.

Column-physics equivalent of the Icepack `icepack_atm_boundary` /
`icepack_atmo` surface the reference consumes (SURVEY.md §2.9; call site
ice_step_mod.F90 step_therm1). The icepack source is not vendored in the
reference checkout, so this is written from the published science: the
CCSM Monin-Obukhov similarity scheme (Kauffman & Large 2002 flux
parameterization; `atmbndy='similarity'`) and the constant-coefficient
alternative (`atmbndy='constant'`).

Everything is dense over the grid: the stability iteration runs a fixed
`natmiter` count (reference namelist forcing_nml natmiter=5) with no
data-dependent branching — jit/vmap friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst


class AtmoCoeffs(NamedTuple):
    shcoef: jnp.ndarray   # sensible-heat transfer coefficient (W m-2 K-1)
    lhcoef: jnp.ndarray   # latent-heat transfer coefficient (W m-2 / (kg/kg))
    strx: jnp.ndarray     # wind stress on ice, x (N/m^2)
    stry: jnp.ndarray     # wind stress on ice, y (N/m^2)
    # reference-height diagnostics (f_Tref/f_Qref history fields):
    Tref: jnp.ndarray = None   # 2 m air temperature (K)
    Qref: jnp.ndarray = None   # 2 m specific humidity (kg/kg)
    Uref: jnp.ndarray = None   # 10 m wind speed (m/s)


def saturated_specific_humidity_ice(TsfK, rhoa):
    """q_sat over ice (kg/kg) — icepack qqqice/TTTice parameterization.
    TsfK floored at 150 K: a negative absolute temperature (possible
    only from degenerate unconverged columns) would flip the exp() to
    +inf and NaN every consumer."""
    return (cst.qqqice / jnp.maximum(rhoa, 1e-8)) * \
        jnp.exp(-cst.TTTice / jnp.maximum(TsfK, 150.0))


def saturated_specific_humidity_ocn(TsfK, rhoa):
    return (cst.qqqocn / jnp.maximum(rhoa, 1e-8)) * \
        jnp.exp(-cst.TTTocn / jnp.maximum(TsfK, 150.0))


def _psi_stable(hol):
    return -(0.7 * hol + 0.75 * (hol - 14.3) * jnp.exp(-0.35 * hol) + 10.7)


def _psimu(xd):
    """Unstable momentum stability function."""
    return jnp.log((1.0 + xd * (2.0 + xd)) * (1.0 + xd * xd) / 8.0) \
        - 2.0 * jnp.arctan(xd) + 1.571


def _psixu(xd):
    """Unstable scalar stability function."""
    return 2.0 * jnp.log((1.0 + xd * xd) / 2.0)


def atmo_boundary_layer(Tsf, potT, uatm, vatm, wind, zlvl, Qa, rhoa,
                        *, natmiter: int = 5, over: str = "ice",
                        iceruf: float = cst.iceruf,
                        Cdn_atm=None, atmiter_conv: float = 0.0
                        ) -> AtmoCoeffs:
    """Monin-Obukhov similarity transfer coefficients over ice or ocean.

    Tsf in degC; potT (K) potential temperature at zlvl; Qa specific humidity;
    returns coefficients such that
      fsens = shcoef * (potT - TsfK),   flat = lhcoef * (Qa - qsfc).
    """
    TsfK = Tsf + cst.Tffresh
    if over == "ice":
        qsfc = saturated_specific_humidity_ice(TsfK, rhoa)
        lheat = cst.Lsub
        zrf = iceruf
    else:
        qsfc = saturated_specific_humidity_ocn(TsfK, rhoa)
        lheat = cst.Lvap
        zrf = 0.0005

    vmag = jnp.maximum(wind, 1.0)      # umin wind speed floor (m/s)
    thva = potT * (1.0 + cst.zvir * Qa)        # virtual potential temperature
    delt = potT - TsfK
    delq = Qa - qsfc

    # neutral coefficients; with formdrag the momentum coefficient comes
    # from the Tsamados decomposition (sqrt(Cdn) = u*/U at zref),
    # reference icepack_atmo formdrag branch
    rdn0 = cst.vonkar / jnp.log(cst.zref / zrf)
    if Cdn_atm is not None and over == "ice":
        rdn = jnp.sqrt(jnp.maximum(Cdn_atm, 1e-6))
    else:
        rdn = rdn0
    rhn = rdn0     # heat/moisture stay skin-scale (form drag is momentum-only)
    ren = rdn0

    # initial turbulent scales
    ustar = rdn * vmag
    tstar = rhn * delt
    qstar = ren * delq

    alz = jnp.log(zlvl / cst.zref)
    cp = cst.cp_air * (1.0 + cst.cp_wv * Qa)

    rd = rdn
    rh = rhn
    re = ren
    # atmiter_conv: freeze converged points (|d ustar| below threshold)
    # instead of exiting — loop count stays static under jit
    active = jnp.ones_like(vmag, dtype=bool)
    for _ in range(natmiter):
        ustar_prev = ustar
        hol = (cst.vonkar * cst.gravit * zlvl *
               (tstar / thva + qstar / (1.0 / cst.zvir + Qa)) /
               jnp.maximum(ustar * ustar, 1e-12))
        hol = jnp.clip(hol, -10.0, 10.0)
        stable = 0.5 * (1.0 + jnp.sign(hol))
        xqq = jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * hol)), 1.0)
        xqq = jnp.sqrt(xqq)
        psimh = -5.0 * hol * stable + (1.0 - stable) * _psimu(xqq)
        psixh = -5.0 * hol * stable + (1.0 - stable) * _psixu(xqq)
        rd_n = rdn / (1.0 + rdn / cst.vonkar * (alz - psimh))
        rh_n = rhn / (1.0 + rhn / cst.vonkar * (alz - psixh))
        re_n = ren / (1.0 + ren / cst.vonkar * (alz - psixh))
        rd = jnp.where(active, rd_n, rd)
        rh = jnp.where(active, rh_n, rh)
        re = jnp.where(active, re_n, re)
        ustar = rd * vmag
        tstar = rh * delt
        qstar = re * delq
        if atmiter_conv > 0.0:
            active = active & (jnp.abs(ustar - ustar_prev) > atmiter_conv)

    # |stress| = rhoa*ustar^2 = rhoa*(rd*vmag)^2 along the wind direction:
    # the vector form is rhoa*rd^2*vmag * (uatm, vatm) — the coefficient
    # multiplies the wind COMPONENTS, not the full |U| again (a spare
    # vmag factor here made 10 m/s winds pull 10x too hard and blew up
    # the gx1 JRA55 dynamics once calc_strair used this path)
    tau = rhoa * ustar * rd          # = rhoa * rd^2 * vmag
    strx = tau * uatm
    stry = tau * vatm
    shcoef = rhoa * ustar * cp * rh
    lhcoef = rhoa * ustar * lheat * re

    # reference-height diagnostics: similarity profile evaluated at 2 m
    # (temperature/humidity) and 10 m (wind) — reference icepack_atmo
    # Tref/Qref/Uref outputs consumed by f_Tref/f_Qref history fields
    zTrf = 2.0
    hol2 = hol * zTrf / zlvl
    xd2 = jnp.sqrt(jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * hol2)), 1.0))
    psix2 = -5.0 * hol2 * stable + (1.0 - stable) * _psixu(xd2)
    prof = jnp.log(zlvl / zTrf) - psixh + psix2
    Tref = potT - delt * (rh / cst.vonkar) * prof - 0.01 * zTrf
    Qref = Qa - delq * (re / cst.vonkar) * prof
    Uref = vmag * rd / jnp.maximum(rdn, 1e-8)
    return AtmoCoeffs(shcoef=shcoef, lhcoef=lhcoef, strx=strx, stry=stry,
                      Tref=Tref, Qref=Qref, Uref=Uref)


def atmo_boundary_const(Tsf, uatm, vatm, wind, rhoa, Qa,
                        over: str = "ice") -> AtmoCoeffs:
    """Constant-coefficient scheme (`atmbndy='constant'`)."""
    lheat = cst.Lsub if over == "ice" else cst.Lvap
    tau = rhoa * 0.0012 * wind
    shcoef = (1.20e-3) * cst.cp_air * rhoa * wind
    lhcoef = (1.50e-3) * lheat * rhoa * wind
    return AtmoCoeffs(shcoef=shcoef, lhcoef=lhcoef,
                      strx=tau * uatm, stry=tau * vatm)


def surface_fluxes(Tsf, shcoef, lhcoef, potT, Qa, rhoa, flw, fswsfc,
                   emissivity: float = cst.emissivity):
    """Surface energy fluxes and their Tsf derivatives at temperature Tsf.

    Sign convention (reference/icepack): downward positive. Returns
    (fsurf_net, dfsurf_dT, fsens, flat, flwout) where fsurf_net includes
    absorbed shortwave at the surface + net longwave + turbulent fluxes.
    """
    TsfK = Tsf + cst.Tffresh
    qsfc = saturated_specific_humidity_ice(TsfK, rhoa)
    dqsfc_dT = qsfc * cst.TTTice / (TsfK * TsfK)

    fsens = shcoef * (potT - TsfK)
    dfsens_dT = -shcoef
    flat = lhcoef * (Qa - qsfc)
    dflat_dT = -lhcoef * dqsfc_dT
    flwout = -emissivity * cst.stefan_boltzmann * TsfK ** 4
    dflwout_dT = -4.0 * emissivity * cst.stefan_boltzmann * TsfK ** 3
    flwdabs = emissivity * flw

    fsurf = fswsfc + flwdabs + flwout + fsens + flat
    dfsurf = dflwout_dT + dfsens_dT + dflat_dT
    return fsurf, dfsurf, fsens, flat, flwout
