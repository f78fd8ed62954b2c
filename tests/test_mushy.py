"""Mushy-layer thermodynamics (ktherm=2) tests.

Oracles: exact inversion identities of the published state relations
(Turner, Hunke & Jeffery 2013), physical bounds of liquid fraction and
conductivity, desalination direction of gravity drainage, and an
end-to-end ktherm=2 model run (no NaNs, ice survives winter forcing,
bulk salinity stays in the physical range and decreases with age).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.columns import mushy as m
from cice_tpu.config import Config


def test_liquidus_round_trip():
    S = jnp.array([0.5, 5.0, 33.0, 100.0, 141.0, 180.0])
    T = m.liquidus_temperature(S)
    np.testing.assert_allclose(np.asarray(m.liquidus_brine_salinity(T)),
                               np.asarray(S), rtol=1e-12)
    # seawater freezes near -1.8C
    assert abs(float(m.liquidus_temperature(jnp.array(33.0))) + 1.786) < 0.05


def test_enthalpy_temperature_round_trip():
    T = jnp.array([-30.0, -20.0, -10.0, -7.0, -4.0, -1.5, -0.3])
    for S0 in (1.0, 5.0, 10.0):
        S = jnp.full_like(T, S0)
        q = m.enthalpy_mush(T, S)
        np.testing.assert_allclose(np.asarray(m.temperature_mush(q, S)),
                                   np.asarray(T), atol=1e-9)


def test_enthalpy_monotone_in_T():
    T = jnp.linspace(-30.0, -0.2, 100)
    S = jnp.full_like(T, 5.0)
    q = np.asarray(m.enthalpy_mush(T, S))
    assert np.all(np.diff(q) > 0.0)


def test_liquid_fraction_bounds_and_limits():
    # cold -> mostly solid; near liquidus -> mostly liquid
    phi_cold = float(m.liquid_fraction(jnp.array(-25.0), jnp.array(5.0)))
    phi_warm = float(m.liquid_fraction(jnp.array(-0.4), jnp.array(5.0)))
    assert 0.0 < phi_cold < 0.05
    assert phi_warm > 0.5
    # above the liquidus phi saturates at 1
    assert float(m.liquid_fraction(jnp.array(-0.05), jnp.array(15.0))) == 1.0


def test_conductivity_and_heat_capacity():
    T = jnp.array([-20.0, -5.0, -1.0])
    S = jnp.full_like(T, 5.0)
    k = np.asarray(m.conductivity_mush(T, S))
    assert np.all(k > 0.1) and np.all(k < 3.0)
    # conductivity decreases as mush becomes more liquid (brine conducts less)
    assert k[0] > k[-1]
    c = np.asarray(m.eff_heat_capacity_mush(T, T, S))
    assert np.all(c > 0.0)
    # effective capacity blows up near the liquidus (brine-pocket melting)
    assert c[-1] > c[0]


def test_new_ice_properties():
    q, S = m.new_ice_enthalpy_salinity(jnp.array(-1.8), jnp.array(34.0), 0.85)
    # new bottom ice: a few g/kg bulk salinity, enthalpy below liquid water
    assert 2.0 < float(S) < 8.0
    assert float(q) < -1.5e8


def test_gravity_drainage_desalinates():
    cfg = Config()
    nilyr = 4
    shape = (3, 3)
    S = [jnp.full(shape, 12.0) for _ in range(nilyr)]
    T = [jnp.full(shape, -2.0) for _ in range(nilyr)]   # warm, permeable
    S2, fsalt = m.drain_salinity(cfg.thermo, 86400.0, S_layers=S, T_layers=T,
                                 hilyr=jnp.full(shape, 0.3),
                                 sss=jnp.full(shape, 34.0), nilyr=nilyr)
    for k in range(nilyr):
        assert np.all(np.asarray(S2[k]) <= 12.0)
        assert np.all(np.asarray(S2[k]) >= 0.0)
    assert np.all(np.asarray(fsalt) >= 0.0)
    # cold impermeable mush barely drains
    Tc = [jnp.full(shape, -20.0) for _ in range(nilyr)]
    S3, _ = m.drain_salinity(cfg.thermo, 86400.0, S_layers=S, T_layers=Tc,
                             hilyr=jnp.full(shape, 0.3),
                             sss=jnp.full(shape, 34.0), nilyr=nilyr)
    drained_warm = 12.0 - np.asarray(S2[0]).mean()
    drained_cold = 12.0 - np.asarray(S3[0]).mean()
    assert drained_cold < drained_warm + 1e-9


def test_gravity_drainage_rate_and_marginal_stability():
    """Quantitative oracles for the convective (rapid-mode) drainage:

    1. Magnitude: young growing ice (bulk 25 g/kg at -4 C over 34 g/kg
       water) desalinates at 1-20 g/kg per day — the observed rapid-mode
       range (Notz & Worster 2009 fig. 7; Turner & Hunke 2015).
    2. Marginal stability: iterating drainage at fixed temperature drives
       the layer Rayleigh number down to ~Rac and then shuts off, leaving
       a finite interior bulk salinity of a few g/kg (the C-shape floor),
       NOT zero.
    3. Conservation: column salt loss equals the integrated fsalt flux.
    """
    cfg = Config()
    nilyr = 4
    shape = (2, 2)
    hilyr = jnp.full(shape, 0.15)
    sss = jnp.full(shape, 34.0)
    S = [jnp.full(shape, 25.0) for _ in range(nilyr)]
    T = [jnp.full(shape, -4.0) for _ in range(nilyr)]
    dt = 3600.0

    def ra_of(S_k, T_k, k):
        phi = m.liquid_fraction(T_k, S_k)
        perm = m.PERM_A * (jnp.maximum(phi - m.PHI_PERC, 0.0) /
                           (1.0 - m.PHI_PERC)) ** 3
        Sbr = m.liquidus_brine_salinity(T_k)
        L = 0.15 * (nilyr - k - 0.5)
        return float((m.GRAV * m.BETA_S * jnp.maximum(Sbr - sss, 0.0) *
                      perm * L / (m.KAPPA_T * m.NU_BRINE))[0, 0])

    assert ra_of(S[0], T[0], 0) > cfg.thermo.Rac_rapid_mode  # starts unstable

    salt0 = sum(float(s[0, 0]) for s in S) * 1e-3 * 917.0 * 0.15
    fsalt_int = 0.0
    day1_loss = None
    for it in range(24 * 10):          # 10 days, hourly
        S, fsalt = m.drain_salinity(cfg.thermo, dt, S_layers=S, T_layers=T,
                                    hilyr=hilyr, sss=sss, nilyr=nilyr)
        fsalt_int += float(fsalt[0, 0]) * dt
        if it == 23:
            day1_loss = 25.0 - float(S[0][0, 0])
    # 1. day-one rapid-mode desalination magnitude (top layer)
    assert 1.0 < day1_loss < 20.0, day1_loss
    # 2. marginal stability: convection off, interior salinity finite;
    # the bottom layer keeps a higher floor (short Rayleigh length) — the
    # C-shape of observed bulk-salinity profiles
    for k in range(nilyr):
        assert ra_of(S[k], T[k], k) < 1.5 * cfg.thermo.Rac_rapid_mode
        hi = 12.0 if k < nilyr - 1 else 18.0
        assert 1.0 < float(S[k][0, 0]) < hi
    assert float(S[0][0, 0]) < float(S[nilyr - 1][0, 0])   # C-shape order
    # 3. salt conservation against the ocean flux
    salt1 = sum(float(s[0, 0]) for s in S) * 1e-3 * 917.0 * 0.15
    np.testing.assert_allclose(salt0 - salt1, fsalt_int, rtol=1e-5)


def test_slow_mode_background_drainage():
    """Slow mode alone (convection subcritical): permeable mature ice keeps
    desalinating at the weak background rate — well under 0.5 g/kg/day —
    and impermeable layers (phi < phi_c) do not drain at all."""
    cfg = Config()
    shape = (2, 2)
    hilyr = jnp.full(shape, 0.3)
    sss = jnp.full(shape, 34.0)
    # mature ice: bulk 6 g/kg; at -3 C phi ~ 0.11 > phi_c; Ra subcritical
    S = [jnp.full(shape, 6.0)]
    T = [jnp.full(shape, -3.0)]
    S1, fsalt = m.drain_salinity(cfg.thermo, 86400.0, S_layers=S,
                                 T_layers=T, hilyr=hilyr, sss=sss, nilyr=1)
    loss = 6.0 - float(S1[0][0, 0])
    assert 0.0 < loss < 0.5, loss
    # cold impermeable: phi < phi_c -> no slow mode either
    Tc = [jnp.full(shape, -25.0)]
    S2, _ = m.drain_salinity(cfg.thermo, 86400.0, S_layers=S, T_layers=Tc,
                             hilyr=hilyr, sss=sss, nilyr=1)
    assert abs(float(S2[0][0, 0]) - 6.0) < 1e-6


@pytest.mark.slow
def test_ktherm2_end_to_end():
    from cice_tpu.model.driver import Model
    from cice_tpu.config import box2001_config
    cfg = box2001_config(24, 24).with_overrides(**{
        "thermo.ktherm": 2, "forcing.atm_data_type": "seasonal",
        "setup.dt": 3600.0})
    mdl = Model(cfg)
    mdl.run(12)
    st = mdl.state
    a = np.asarray(st.aice)
    S = np.asarray(st.trcrn["sice"])
    q = np.asarray(st.trcrn["qice"])
    assert not np.isnan(a).any() and not np.isnan(S).any() \
        and not np.isnan(q).any()
    assert a.max() > 0.5                      # winter ice persists
    assert S.min() >= 0.0 and S.max() < 35.0  # physical salinity range


def test_thin_snow_skin_no_overflow():
    """hs between puny and hs_min (e.g. 1e-10 m) must NOT enter the
    conduction solve as snow: 1/hslyr conductances (~1e10) overflow the
    f32 tridiagonal into NaN (round-4 root cause of the gx1 SH-collapse;
    icepack's lsnow threshold is hs_min=1e-4)."""
    import jax.numpy as jnp
    import numpy as np
    from cice_tpu.columns.thermo_vertical import (bl99_salinity,
                                                  enthalpy_ice,
                                                  enthalpy_snow,
                                                  melting_temps,
                                                  temperature_changes)
    nilyr, nslyr = 7, 1
    salin = bl99_salinity(nilyr)
    Tm = melting_temps(salin)
    shp = (4, 4)
    hin = jnp.full(shp, 0.32)
    for hs in (0.0, 1e-10, 5e-5, 0.1):
        hslyr = jnp.full(shp, hs / nslyr)
        qice = [jnp.full(shp, float(enthalpy_ice(-2.0, float(Tm[k]))))
                for k in range(nilyr)]
        qsno = [jnp.full(shp, float(enthalpy_snow(-5.0)))
                for _ in range(nslyr)]
        out, qs_new, qi_new = temperature_changes(
            3600.0, nilyr, nslyr, Tsf=jnp.zeros(shp), qsno=qsno, qice=qice,
            salin=salin, Tm=Tm, hilyr=hin / nilyr, hslyr=hslyr,
            Tbot=jnp.full(shp, -1.86), fswsfc=jnp.full(shp, 150.0),
            Iswabs=[jnp.full(shp, 5.0)] * nilyr,
            shcoef=jnp.full(shp, 10.0), lhcoef=jnp.full(shp, 5.0),
            potT=jnp.full(shp, 275.0), Qa=jnp.full(shp, 4e-3),
            rhoa=jnp.full(shp, 1.3), flw=jnp.full(shp, 300.0))
        for nm, v in (("Tsf", out.Tsf), ("fcondtop", out.fcondtop),
                      ("fcondbot", out.fcondbot)):
            assert np.isfinite(np.asarray(v)).all(), (hs, nm)
        for q in qi_new:
            assert np.isfinite(np.asarray(q)).all(), hs
