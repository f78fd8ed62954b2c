"""Transport tests: conservation, monotonicity, translation (upwind).

Mirrors the reference's internal transport checks
(ice_transport_driver.F90:309,426-520 global conservation + monotonicity).
"""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.transport import (global_mass, transport_remap,
                                         transport_upwind)
from cice_tpu.model.state import tracer_registry, zeros_state


def _setup(nx=64, ny=64):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
    })
    grid = rectgrid(nx, ny, kmt_type="none", dtype=jnp.float32)
    reg = tracer_registry(cfg)
    state = zeros_state(cfg, grid)
    # gaussian blob of ice in the middle, category 2
    jj, ii = np.mgrid[0:ny, 0:nx]
    blob = np.exp(-(((ii - nx / 2) / 6.0) ** 2 + ((jj - ny / 2) / 6.0) ** 2))
    aicen = np.zeros((cfg.domain.ncat, ny, nx), np.float32)
    aicen[1] = 0.8 * blob
    vicen = aicen * 1.5
    vsnon = aicen * 0.1
    trcrn = dict(state.trcrn)
    trcrn["Tsfcn"] = jnp.full_like(state.trcrn["Tsfcn"], -5.0)
    trcrn["qice"] = jnp.full_like(state.trcrn["qice"], -2.0e8)
    trcrn["sice"] = jnp.full_like(state.trcrn["sice"], 5.0)
    trcrn["qsno"] = jnp.full_like(state.trcrn["qsno"], -1.0e8)
    trcrn["iage"] = jnp.full_like(state.trcrn["iage"], 3.0e7)
    state = state.replace(aicen=jnp.asarray(aicen), vicen=jnp.asarray(vicen),
                          vsnon=jnp.asarray(vsnon), trcrn=trcrn)
    return cfg, grid, reg, state


def test_upwind_conservation_cyclic():
    cfg, grid, reg, state = _setup()
    u = 0.2
    state = state.replace(uvel=jnp.full(grid.shape, u),
                          vvel=jnp.full(grid.shape, 0.1))
    Tf = jnp.full(grid.shape, -1.8)
    a0, v0, s0 = global_mass(grid, state)
    for _ in range(10):
        state = transport_upwind(grid, state, reg, Tf, dt=3600.0)
    a1, v1, s1 = global_mass(grid, state)
    assert abs(float(a1 - a0)) / float(a0) < 1e-5
    assert abs(float(v1 - v0)) / float(v0) < 1e-5
    assert abs(float(s1 - s0)) / float(s0) < 1e-5


def test_upwind_monotone_and_translates():
    cfg, grid, reg, state = _setup()
    dx = float(grid.dxT[0, 0])
    dt = 3600.0
    u = 0.25 * dx / dt   # CFL 0.25, eastward
    state = state.replace(uvel=jnp.full(grid.shape, u))
    Tf = jnp.full(grid.shape, -1.8)
    amax0 = float(jnp.max(state.aicen[1]))
    com0 = _center_of_mass_x(grid, state)
    nsteps = 8
    for _ in range(nsteps):
        state = transport_upwind(grid, state, reg, Tf, dt=dt)
    # monotone: no new extrema
    assert float(jnp.max(state.aicen[1])) <= amax0 + 1e-6
    assert float(jnp.min(state.aicen[1])) >= -1e-7
    # blob center moved ~ u*t eastward
    com1 = _center_of_mass_x(grid, state)
    moved = (com1 - com0) * dx
    expect = u * dt * nsteps
    assert abs(moved - expect) / expect < 0.05
    # tracers stay within initial bounds (no ratio blowups)
    assert float(jnp.max(jnp.abs(state.trcrn["iage"]))) <= 3.0e7 * 1.001
    qice = np.asarray(state.trcrn["qice"])
    mask = np.asarray(state.vicen) > 1e-8
    assert qice[np.broadcast_to(mask[:, None], qice.shape)].max() <= 0.0


def _center_of_mass_x(grid, state):
    a = np.asarray(state.aicen[1])
    ii = np.arange(a.shape[1])[None, :]
    return float((a * ii).sum() / a.sum())


def test_remap_conserves_and_monotone():
    cfg, grid, reg, state = _setup()
    state = state.replace(uvel=jnp.full(grid.shape, 0.3),
                          vvel=jnp.full(grid.shape, 0.15))
    Tf = jnp.full(grid.shape, -1.8)
    a0, v0, s0 = global_mass(grid, state)
    amax0 = float(jnp.max(state.aicen[1]))
    for _ in range(10):
        state = transport_remap(grid, state, reg, Tf, dt=3600.0)
    a1, v1, s1 = global_mass(grid, state)
    assert abs(float(a1 - a0)) / float(a0) < 1e-5
    assert abs(float(v1 - v0)) / float(v0) < 1e-5
    assert float(jnp.max(state.aicen[1])) <= amax0 + 1e-6
    assert float(jnp.min(state.aicen[1])) >= -1e-7
    qice = np.asarray(state.trcrn["qice"])
    assert np.isfinite(qice).all()


def test_remap_less_diffusive_than_upwind():
    """2nd-order reconstruction must preserve the blob peak far better than
    1st-order upwind after many steps (the reference's reason for remap)."""
    cfg, grid, reg, s_remap = _setup()
    s_upwind = s_remap
    dx = float(grid.dxT[0, 0])
    dt = 3600.0
    u = jnp.full(grid.shape, 0.4 * dx / dt)   # CFL 0.4
    s_remap = s_remap.replace(uvel=u)
    s_upwind = s_upwind.replace(uvel=u)
    Tf = jnp.full(grid.shape, -1.8)
    amax0 = float(jnp.max(s_remap.aicen[1]))
    for _ in range(40):
        s_remap = transport_remap(grid, s_remap, reg, Tf, dt=dt)
        s_upwind = transport_upwind(grid, s_upwind, reg, Tf, dt=dt)
    peak_r = float(jnp.max(s_remap.aicen[1])) / amax0
    peak_u = float(jnp.max(s_upwind.aicen[1])) / amax0
    assert peak_r > peak_u + 0.1
    assert peak_r > 0.7


def test_upwind_blocked_by_land():
    """No ice flows into land; mass in the ocean is conserved when flux
    toward a wall is blocked by the edge masks."""
    cfg, grid, reg, state = _setup()
    nx, ny = 64, 64
    grid2 = rectgrid(nx, ny, kmt_type="channel", dtype=jnp.float32)
    state = zeros_state(cfg, grid2)
    aicen = np.zeros((cfg.domain.ncat, ny, nx), np.float32)
    aicen[1, 10:20, :] = 0.5
    state = state.replace(aicen=jnp.asarray(aicen),
                          vicen=jnp.asarray(aicen) * 1.0,
                          vvel=jnp.full(grid2.shape, -0.3))  # southward, at wall
    Tf = jnp.full(grid2.shape, -1.8)
    a0, v0, _ = global_mass(grid2, state)
    for _ in range(20):
        state = transport_upwind(grid2, state, reg, Tf, dt=3600.0)
    a1, v1, _ = global_mass(grid2, state)
    # land rows stay empty
    land = ~np.asarray(grid2.tmask)
    assert np.abs(np.asarray(state.aice)[land]).max() == 0.0
    assert abs(float(v1 - v0)) / float(v0) < 1e-5


def test_incremental_remap_uniform_field_invariant():
    """A spatially-uniform density under uniform velocity must be exactly
    preserved by the remap (reconstruction gradients vanish; flux in =
    flux out) — sensitive check of the departure-geometry bookkeeping."""
    cfg, grid, reg, state = _setup()
    a = jnp.full((cfg.domain.ncat,) + grid.shape, 0.16)
    state = state.replace(aicen=a, vicen=a * 1.5, vsnon=a * 0.1,
                          uvel=jnp.full(grid.shape, 0.3),
                          vvel=jnp.full(grid.shape, -0.2))
    Tf = jnp.full(grid.shape, -1.8)
    out = transport_remap(grid, state, reg, Tf, dt=3600.0)
    # interior cells (the N/S boundary rows see open-boundary in/outflow)
    np.testing.assert_allclose(np.asarray(out.aicen)[:, 2:-2], 0.16,
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(out.vicen)[:, 2:-2], 0.24,
                               rtol=2e-6)


def test_incremental_remap_rotation_conserves():
    """Solid-body rotation: mass exactly conserved, field stays bounded."""
    cfg, grid, reg, state = _setup()
    ny, nx = grid.shape
    jj, ii = np.mgrid[0:ny, 0:nx]
    dx = float(grid.dxT[0, 0])
    x = (ii - nx / 2) * dx
    y = (jj - ny / 2) * dx
    om = 2.0e-6   # rad/s
    state = state.replace(uvel=jnp.asarray(-om * y, jnp.float32),
                          vvel=jnp.asarray(om * x, jnp.float32))
    Tf = jnp.full(grid.shape, -1.8)
    a0, v0, s0 = global_mass(grid, state)
    for _ in range(8):
        state = transport_remap(grid, state, reg, Tf, dt=3600.0)
    a1, v1, s1 = global_mass(grid, state)
    assert abs(float(a1 - a0)) / float(a0) < 1e-5
    assert abs(float(v1 - v0)) / float(v0) < 1e-5
    assert float(jnp.max(state.aicen)) <= 0.85   # bounded (near-monotone)
    assert float(jnp.min(state.aicen)) >= -1e-7
