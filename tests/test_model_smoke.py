"""End-to-end model smoke tests (reference smoke test analogue, SURVEY §4.1).

Run the full coupled thermo+dyn step on a small box; assert finiteness,
physical bounds, and that both freezing and melting regimes do something.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.model.driver import Model


def _box_cfg(nx=32, ny=32, **over):
    o = {
        "grid.nx_global": nx, "grid.ny_global": ny,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "grid.lonrefrect": -156.5, "grid.latrefrect": 71.35,
        "setup.dt": 3600.0,
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 30,
        "thermo.nit": 8,
    }
    o.update(over)
    return Config().with_overrides(**o)


def test_model_runs_and_stays_physical():
    cfg = _box_cfg()
    m = Model(cfg)
    assert float(m.state.aice.max()) > 0.5   # initial pack present (lat>60)
    m.run(6)
    aice = np.asarray(m.state.aice)
    vice = np.asarray(m.state.vice)
    assert np.isfinite(aice).all() and np.isfinite(vice).all()
    assert aice.min() >= -1e-6 and aice.max() <= 1.0 + 1e-6
    assert vice.min() >= -1e-6
    assert np.isfinite(np.asarray(m.state.uvel)).all()
    Tsfc = np.asarray(m.state.trcrn["Tsfcn"])
    assert Tsfc.max() <= 1e-3 and Tsfc.min() >= -80.0
    assert np.isfinite(np.asarray(m.state.sst)).all()


def test_model_winter_grows_ice():
    """Cold dark forcing must grow ice volume (congelation/frazil)."""
    cfg = _box_cfg(**{"forcing.atm_data_type": "seasonal",
                      "setup.month_init": 1})
    m = Model(cfg)
    v0 = float(m.state.vice.sum())
    m.run(24)   # one day of winter
    v1 = float(m.state.vice.sum())
    assert np.isfinite(v1)
    assert v1 > v0 * 0.999   # not shrinking in deep winter


def test_model_no_dynamics_mode():
    cfg = _box_cfg(**{"dynamics.kdyn": 0})
    m = Model(cfg)
    m.run(3)
    assert float(jnp.abs(m.state.uvel).max()) == 0.0
    assert np.isfinite(np.asarray(m.state.vice)).all()
