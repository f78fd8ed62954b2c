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
