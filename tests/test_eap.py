"""EAP anisotropic rheology tests."""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params, ice_strength_hibler
from cice_tpu.dynamics.eap import eap_solve, yield_tables


def test_yield_tables_shape_and_sanity():
    tabs = yield_tables()
    assert len(tabs) == 6
    for t in tabs:
        assert t.shape == (41, 41, 21)
        assert np.isfinite(t).all()
    s11r = tabs[0]
    # ridging stress tables must be overwhelmingly compressive (negative)
    assert (s11r <= 1e-6).mean() > 0.85
    assert np.abs(s11r).max() > 0.1   # non-trivial magnitudes


def test_eap_runs_stable():
    nx = ny = 32
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": 60, "dynamics.coriolis": "constant",
    })
    grid = rectgrid(nx, ny, kmt_type="none")
    z = jnp.zeros(grid.shape)
    aice = jnp.full(grid.shape, 0.95)
    vice = aice * 2.0
    jj, ii = np.mgrid[0:ny, 0:nx]
    strairx = jnp.asarray(0.1 + 0.1 * np.sin(2 * np.pi * jj / ny), jnp.float32)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=strairx, strairyT=z,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice)
    z3 = jnp.zeros((4,) + grid.shape)
    u, v, sp, sm, s12, *_ = eap_solve(grid, p, prep, strength, z3, z3, z3,
                                      uocn=z, vocn=z)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(sp)).all()
    assert float(jnp.abs(u).max()) < 1.0
    # anisotropic stress resists the wind: pack moves slower than free drift
    assert float(jnp.abs(u).max()) > 1e-4   # but it does move
