"""Form drag (Tsamados et al. 2014 / neutral_drag_coeffs parity):
decomposition properties + model integration with formdrag=True."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu import constants as cst
from cice_tpu.columns.formdrag import (CAMAX, CSA, CWMAX,
                                       neutral_drag_coeffs)


def _fields(aice=0.9, hi=2.0, hs=0.2, alvl=1.0, vlvl=1.0, apnd=0.0,
            hpnd=0.0, shape=(4, 4)):
    f = lambda v: jnp.full(shape, v, jnp.float32)
    return dict(aice=f(aice), vice=f(aice * hi), vsno=f(aice * hs),
                alvl=f(alvl), vlvl=f(vlvl), apnd=f(apnd), hpnd=f(hpnd))


def test_level_ice_is_skin_plus_floe_only():
    d = neutral_drag_coeffs(**_fields(alvl=1.0, vlvl=1.0))
    assert float(d.Cdn_atm_rdg.max()) == 0.0
    assert float(d.Cdn_ocn_keel.max()) == 0.0
    assert float(d.hridge.max()) == 0.0
    # skin scales with aice
    np.testing.assert_allclose(np.asarray(d.Cdn_atm_skin), 0.9 * CSA,
                               rtol=1e-6)


def test_ridging_increases_drag():
    level = neutral_drag_coeffs(**_fields(alvl=1.0, vlvl=1.0))
    ridged = neutral_drag_coeffs(**_fields(alvl=0.6, vlvl=0.5))
    assert float(ridged.Cdn_atm.mean()) > float(level.Cdn_atm.mean())
    assert float(ridged.Cdn_ocn.mean()) > float(level.Cdn_ocn.mean())
    assert float(ridged.hkeel.mean()) == pytest.approx(
        4.0 * float(ridged.hridge.mean()))


def test_ponds_increase_atm_drag():
    dry = neutral_drag_coeffs(**_fields(apnd=0.0, hpnd=0.0))
    wet = neutral_drag_coeffs(**_fields(apnd=0.4, hpnd=0.2))
    assert float(wet.Cdn_atm.mean()) > float(dry.Cdn_atm.mean())
    assert float(wet.Cdn_ocn.mean()) == pytest.approx(
        float(dry.Cdn_ocn.mean()))     # ponds are atm-side only


def test_open_water_defaults():
    d = neutral_drag_coeffs(**_fields(aice=0.0, hi=0.0, hs=0.0))
    np.testing.assert_allclose(np.asarray(d.Cdn_ocn), cst.dragio, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.Cdn_atm), CSA, rtol=1e-6)


def test_caps_respected():
    # pathologically ridged thick ice stays within the physical caps
    d = neutral_drag_coeffs(**_fields(aice=1.0, hi=20.0, alvl=0.05,
                                      vlvl=0.02))
    assert float(d.Cdn_atm.max()) <= CAMAX + 1e-9
    assert float(d.Cdn_ocn.max()) <= CWMAX + 1e-9
    assert np.isfinite(np.asarray(d.hridge)).all()
    assert float(d.hfreebd.min()) >= 0.0


def test_freeboard_hydrostatic():
    d = neutral_drag_coeffs(**_fields(aice=1.0, hi=1.0, hs=0.0))
    # freeboard of bare 1 m ice: (1 - rhoi/rhow) m
    np.testing.assert_allclose(np.asarray(d.hfreebd),
                               1.0 - cst.rhoi / cst.rhow, rtol=1e-5)


def test_model_runs_with_formdrag():
    from cice_tpu.config import Config
    from cice_tpu.model.driver import Model
    cfg = Config().with_overrides(**{
        "grid.nx_global": 24, "grid.ny_global": 24,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "forcing.formdrag": True,
        "dynamics.ndte": 10, "thermo.nit": 4})
    m = Model(cfg)
    m.run(2)
    assert bool(np.isfinite(np.asarray(m.state.aicen)).all())
    assert bool(np.isfinite(np.asarray(m.state.uvel)).all())
