"""Fused remap tracer-flux kernel vs the XLA reference path.

The Pallas kernel (kernels/remap_pallas.py) must reproduce
remap_exact._family_fluxes' tracer transports exactly (same expression
tree, same candidate accumulation order) on every supported boundary
combination; tests run the kernel through the Pallas interpreter on the
CPU backend (conftest forces JAX_PLATFORMS=cpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import make_grid
from cice_tpu.dynamics import remap_exact as rx
from cice_tpu.kernels.remap_pallas import tracer_fluxes_fused
from cice_tpu.model.state import tracer_registry


def _problem(ew, ns, ny=24, nx=16, seed=0):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "grid.ew_boundary_type": ew, "grid.ns_boundary_type": ns})
    grid = make_grid(cfg)
    registry = tracer_registry(cfg)
    table = rx.build_flat_table(registry)
    NT = len(table)
    ncat = cfg.domain.ncat
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 9)
    shp = (ncat, NT, ny, nx)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0, 1.0)
    mc = jnp.abs(u(ks[0], (ncat + 1, ny, nx)))
    mx = 0.2 * u(ks[1], (ncat + 1, ny, nx))
    my = 0.2 * u(ks[2], (ncat + 1, ny, nx))
    tc = u(ks[3], shp)
    tx = 0.3 * u(ks[4], shp)
    ty = 0.3 * u(ks[5], shp)
    dxs = 0.2 * u(ks[6], (ny, nx))
    dys = 0.2 * u(ks[7], (ny, nx))
    return grid, table, mc, mx, my, tc, tx, ty, dxs, dys


@pytest.mark.parametrize("ew,ns", [("cyclic", "open"), ("open", "open"),
                                   ("closed", "closed")])
def test_fused_matches_xla(ew, ns):
    grid, table, mc, mx, my, tc, tx, ty, dxs, dys = _problem(ew, ns)
    ref = rx.remap_fluxes(grid, dxs, dys, mc, mx, my, tc, tx, ty, table)
    got = rx.remap_fluxes(grid, dxs, dys, mc, mx, my, tc, tx, ty, table,
                          flux_kernel="fused_pallas")
    # mass fluxes: now kernel-computed (round 4); fp reassociation only
    for g, r, name in ((got[0], ref[0], "mflxe"), (got[1], ref[1],
                                                   "mflxn")):
        scale = float(np.max(np.abs(np.asarray(r)))) or 1.0
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6 * scale,
                                   err_msg=name)
    # tracer fluxes: same expression tree; fp reassociation differences
    # only (Pallas vs XLA fusion order). Tolerance is scaled by the field
    # magnitude — areafac puts values at ~1e7, so f32 reassociation noise
    # is ~1e7 * 1e-7 in absolute terms even where the result is small.
    for g, r, name in ((got[2], ref[2], "mtflxe"), (got[3], ref[3],
                                                    "mtflxn")):
        scale = float(np.max(np.abs(np.asarray(r)))) or 1.0
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6 * scale,
                                   err_msg=name)


def test_fused_inside_full_remap():
    """horizontal_remap_exact(flux_kernel='fused_pallas') conserves and
    matches the XLA path on a jitted full transport step."""
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 24,
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001"})
    from cice_tpu.model.driver import Model
    m = Model(cfg)
    grid = m.grid
    registry = m.static.registry
    s = m.state
    uvel = 0.2 * jnp.sin(jnp.arange(grid.shape[0])[:, None] * 0.3) * \
        jnp.ones(grid.shape)
    s = s.replace(uvel=uvel.astype(s.uvel.dtype),
                  vvel=0.5 * uvel.astype(s.uvel.dtype))
    Tf = jnp.full(grid.shape, -1.8, s.aice.dtype)

    run = lambda fk: rx.horizontal_remap_exact(
        grid, s, registry, Tf, 3600.0, flux_kernel=fk)
    ref, _ = jax.jit(lambda: run("xla"))()
    got, _ = jax.jit(lambda: run("fused_pallas"))()
    for f in ("aicen", "vicen", "vsnon"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-5, atol=1e-7, err_msg=f)
    for name in ref.trcrn:
        np.testing.assert_allclose(np.asarray(got.trcrn[name]),
                                   np.asarray(ref.trcrn[name]),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_fused_full_matches_xla():
    """transport_fused (one-pass construct+flux+update kernel) matches
    the XLA path on a jitted full transport step, and conserves.

    Tolerance note: at gx1 scale all f32 engines carry ~1e-3 relative
    noise on the chain-solved tracers vs an f64 oracle (enthalpy ~3e8
    J/m^3 through divide-by-small-mass chains); the fused_full kernel
    measured CLOSER to f64 (4.6e-4 mean) than the XLA f32 path (1.3e-3).
    The toy-size comparison here is much tighter."""
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 24,
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001"})
    from cice_tpu.model.driver import Model
    m = Model(cfg)
    grid = m.grid
    s = m.state
    uvel = 0.2 * jnp.sin(jnp.arange(grid.shape[0])[:, None] * 0.3) * \
        jnp.ones(grid.shape)
    s = s.replace(uvel=uvel.astype(s.uvel.dtype),
                  vvel=0.5 * uvel.astype(s.uvel.dtype))
    Tf = jnp.full(grid.shape, -1.8, s.aice.dtype)

    run = lambda fk: rx.horizontal_remap_exact(
        grid, s, m.static.registry, Tf, 3600.0, flux_kernel=fk,
        conserv_check=True)
    ref, dref = jax.jit(lambda: run("xla"))()
    got, dgot = jax.jit(lambda: run("fused_full"))()
    for f in ("aicen", "vicen", "vsnon"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-5, atol=1e-7, err_msg=f)
    for name in ref.trcrn:
        r = np.asarray(ref.trcrn[name])
        scale = float(np.abs(r).max()) or 1.0
        np.testing.assert_allclose(np.asarray(got.trcrn[name]), r,
                                   rtol=5e-4, atol=5e-5 * scale,
                                   err_msg=name)
    # both engines conserve area/tracer sums
    assert float(dgot["cons_err_area"]) < 1e-5
    assert float(dgot["cons_err_tracer"]) < 1e-4
    assert bool(dgot["neg_mass"]) == bool(dref["neg_mass"])
