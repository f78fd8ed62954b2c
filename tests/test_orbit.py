"""Orbital solar geometry (icepack_init_orbit / shr_orb_decl parity)."""

import math

import jax.numpy as jnp
import numpy as np

from cice_tpu.columns.orbit import (OrbitalParams, compute_coszen,
                                    solar_declination)


def test_declination_annual_cycle():
    p = OrbitalParams()
    days = jnp.arange(1.0, 366.0)
    decl, eccf = solar_declination(days, p)
    decl = np.asarray(decl)
    # equinoxes near day 80.5 / 266, solstices near 172 / 355
    assert abs(decl[79]) < 0.03                       # ~0 at vernal equinox
    assert abs(decl.max() - math.radians(23.44)) < 0.01
    assert abs(decl.min() + math.radians(23.44)) < 0.01
    assert 165 < int(decl.argmax()) < 177             # max near Jun 21
    # eccentricity factor: ~(1±e)^-2 extremes, perihelion in early January
    e = p.eccen
    np.testing.assert_allclose(np.asarray(eccf).max(), (1 - e) ** -2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(eccf).min(), (1 + e) ** -2, rtol=1e-3)
    assert int(np.asarray(eccf).argmax()) < 20 or int(np.asarray(eccf).argmax()) > 350


def test_zero_eccentricity_is_pure_obliquity():
    p = OrbitalParams(eccen=0.0)
    decl, eccf = solar_declination(jnp.asarray([172.0]), p)
    np.testing.assert_allclose(np.asarray(eccf), 1.0, rtol=1e-12)
    # circular orbit: decl = asin(sin(obliq) * sin(2pi (d-80.5)/365))
    expect = math.asin(math.sin(p.obliqr)
                       * math.sin(2 * math.pi * (172.0 - 80.5) / 365.0))
    np.testing.assert_allclose(float(decl[0]), expect, rtol=1e-12)


def test_coszen_daily_mean_polar():
    lat = jnp.asarray([[math.radians(85.0), math.radians(-85.0),
                        math.radians(0.0)]])
    lon = jnp.zeros_like(lat)
    # NH summer solstice: midnight sun at 85N, polar night at 85S
    cz, _ = compute_coszen(lat, lon, 172.0, daily_mean=True)
    cz = np.asarray(cz)[0]
    assert cz[0] > 0.3 and cz[1] == 0.0
    # equator: daily mean ~ cos(decl)/pi * (sin H + ...) ~ 0.3
    assert 0.25 < cz[2] < 0.35


def test_coszen_instantaneous_noon():
    lat = jnp.asarray([[0.0]])
    lon = jnp.asarray([[0.0]])
    # local noon at lon 0 = calday fraction 0.5 (UTC noon)
    cz, _ = compute_coszen(lat, lon, 81.0 + 0.5, daily_mean=False)
    assert float(cz[0, 0]) > 0.99          # overhead sun at equinox
    cz0, _ = compute_coszen(lat, lon, 81.0 + 0.0, daily_mean=False)
    assert float(cz0[0, 0]) == 0.0         # midnight


def test_paleo_obliquity_changes_declination():
    hot = OrbitalParams(obliq=24.5)
    cold = OrbitalParams(obliq=22.0)
    dh, _ = solar_declination(jnp.asarray([172.0]), hot)
    dc, _ = solar_declination(jnp.asarray([172.0]), cold)
    assert float(dh[0]) > float(dc[0])
