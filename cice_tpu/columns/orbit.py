"""Orbital mechanics for solar zenith angle — icepack_init_orbit parity.

The reference couples to CESM's shr_orb_mod: `icepack_init_orbit` stores
(eccen, obliqr, lambm0, mvelpp) and `icepack_orbital`-based coszen feeds the
delta-Eddington shortwave (SURVEY §2.9 Setup). Here the same four parameters
live in `OrbitalParams`; `solar_declination` is the shr_orb_decl algorithm
(mean→true longitude expansion in eccentricity, declination from obliquity,
inverse-square distance factor), and `compute_coszen` produces the
instantaneous or daily-average cosine of the solar zenith angle.

Defaults are the modern epoch. Paleo values of (eccen, obliq, mvelp) are
namelist inputs, matching how coupled CESM hands them to Icepack (the Berger
1978 series generation lives in the coupler there too, not in the ice model).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp

DAYS_PER_YEAR = 365.0
VE_DAY = 80.5          # calendar day of the vernal equinox (shr_orb_mod)


@dataclass(frozen=True)
class OrbitalParams:
    eccen: float = 0.0167          # orbital eccentricity
    obliq: float = 23.4392991      # obliquity (degrees)
    mvelp: float = 102.932         # moving vernal equinox long. of perihelion (deg)

    @property
    def obliqr(self) -> float:     # obliquity in radians
        return math.radians(self.obliq)

    @property
    def mvelpp(self) -> float:
        """Moving vernal equinox longitude of perihelion PLUS pi (radians) —
        the angle from perihelion to the vernal equinox as shr_orb uses it."""
        return math.radians(self.mvelp) + math.pi

    @property
    def lambm0(self) -> float:
        """Mean longitude of perihelion at the vernal equinox (radians):
        chosen so the mean longitude is 0 at the equinox (shr_orb_params
        closing step)."""
        e = self.eccen
        beta = math.sqrt(1.0 - e * e)
        m = self.mvelpp
        return -2.0 * (
            (e / 2.0 + e ** 3 / 8.0) * (1.0 + beta) * math.sin(m)
            - (e * e / 4.0) * (0.5 + beta) * math.sin(2.0 * m)
            + (e ** 3 / 8.0) * (1.0 / 3.0 + beta) * math.sin(3.0 * m))


def orb_params(iyear: int) -> OrbitalParams:
    """Orbital parameters for a model year — shr_orb_params analogue
    (the reference obtains these from the CESM coupler's shr_orb_mod,
    which evaluates the Berger 1978 trigonometric series; CICE itself
    only consumes the result via icepack_init_orbit,
    ice_comp_nuopc.F90:47 / ice_comp_mct.F90:226).

    Here the parameters come from the standard secular polynomial
    expansions (Simon et al. 1994 / Meeus, as used by IAU): exact to
    ~1e-6 in eccentricity and <0.01 deg in obliquity/perihelion for
    |year - 2000| within a few millennia — i.e. for every non-paleo
    configuration. Paleo runs (orb_mode='fixed_parameters' in the
    reference) pass explicit (eccen, obliq, mvelp) exactly as coupled
    CESM does; the full Berger series table is intentionally not
    replicated (documented delta, PARITY §2.9)."""
    T = (iyear - 2000.0) / 100.0          # Julian centuries from J2000
    # IAU 2006-style obliquity polynomial (arcsec)
    eps = (84381.448 - 46.8150 * T - 0.00059 * T * T
           + 0.001813 * T ** 3) / 3600.0
    eccen = 0.016708634 - 0.000042037 * T - 0.0000001267 * T * T
    # longitude of perihelion from the moving equinox (deg)
    mvelp = (102.93735 + 1.71946 * T + 0.00046 * T * T) % 360.0
    return OrbitalParams(eccen=float(eccen), obliq=float(eps),
                         mvelp=float(mvelp))


def solar_declination(calday, params: OrbitalParams = OrbitalParams()):
    """(declination [rad], eccentricity factor [–]) for a calendar day.

    shr_orb_decl: mean longitude from the day number, true longitude via the
    equation-of-center expansion to O(e^3), declination from the obliquity,
    and the inverse-square earth-sun distance factor for the solar constant.
    """
    e = params.eccen
    lambm = params.lambm0 + (calday - VE_DAY) * 2.0 * math.pi / DAYS_PER_YEAR
    lmm = lambm - params.mvelpp
    sinl = jnp.sin(lmm)
    lamb = lambm + e * (2.0 * sinl + e * (1.25 * jnp.sin(2.0 * lmm)
                                          + e * (13.0 / 12.0) * jnp.sin(3.0 * lmm)))
    invrho = (1.0 + e * jnp.cos(lamb - params.mvelpp)) / (1.0 - e * e)
    decl = jnp.arcsin(math.sin(params.obliqr) * jnp.sin(lamb))
    eccf = invrho * invrho
    return decl, eccf


def compute_coszen(tlat, tlon, calday, params: OrbitalParams = OrbitalParams(),
                   *, daily_mean: bool = False):
    """Cosine of the solar zenith angle.

    Instantaneous (using the hour angle from the fractional day and
    longitude) or the daylight-weighted daily mean the reference uses when
    forcing is daily (`compute_coszen` ice_forcing.F90:2558 semantics).
    tlat/tlon in radians; calday is the fractional day of year (1-based).
    """
    decl, eccf = solar_declination(calday, params)
    if daily_mean:
        # daylight average: integrate cos(z) over the sunlit hour angles
        cosH = jnp.clip(-jnp.tan(tlat) * jnp.tan(decl), -1.0, 1.0)
        H = jnp.arccos(cosH)               # half-day hour angle
        mean = (H * jnp.sin(tlat) * jnp.sin(decl)
                + jnp.cos(tlat) * jnp.cos(decl) * jnp.sin(H)) / math.pi
        return jnp.maximum(mean, 0.0), eccf
    frac = calday - jnp.floor(calday)      # fraction of day (UTC)
    hour_angle = 2.0 * math.pi * frac + tlon - math.pi
    cosz = (jnp.sin(tlat) * jnp.sin(decl)
            + jnp.cos(tlat) * jnp.cos(decl) * jnp.cos(hour_angle))
    return jnp.maximum(cosz, 0.0), eccf
