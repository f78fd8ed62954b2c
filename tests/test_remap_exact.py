"""Exact incremental remapping oracles.

Mirrors the reference's internal transport checks plus a brute-force
geometric oracle: the pentagon/Green's-theorem edge integrals are compared
against dense rasterization of the swept region (the construction of
ice_transport_remap.F90 locate_triangles/transport_integrals evaluated by
Monte-Carlo-free Riemann sampling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics import remap_exact as rx
from cice_tpu.model.state import tracer_registry, zeros_state

F = jnp.float64


def _setup(nx=32, ny=32, kmt="none", seed=0, cfg_over=None):
    over = {"grid.nx_global": nx, "grid.ny_global": ny}
    over.update(cfg_over or {})
    cfg = Config().with_overrides(**over)
    grid = rectgrid(nx, ny, kmt_type=kmt, dtype=F)
    reg = tracer_registry(cfg)
    state = zeros_state(cfg, grid)
    rng = np.random.default_rng(seed)
    ncat = cfg.domain.ncat
    jj, ii = np.mgrid[0:ny, 0:nx]
    blob = np.exp(-(((ii - nx / 2) / 5.0) ** 2 + ((jj - ny / 2) / 5.0) ** 2))
    aicen = np.zeros((ncat, ny, nx))
    aicen[1] = 0.7 * blob
    aicen[2] = 0.2 * blob
    tm = np.asarray(grid.tmask)
    aicen *= tm
    vicen = aicen * (1.0 + 0.3 * rng.random((ncat, ny, nx)))
    vsnon = aicen * 0.1
    trcrn = dict(state.trcrn)
    trcrn["Tsfcn"] = jnp.asarray(-5.0 - 3.0 * rng.random(
        state.trcrn["Tsfcn"].shape))
    trcrn["qice"] = jnp.asarray(-2.0e8 * (1 + 0.2 * rng.random(
        state.trcrn["qice"].shape)))
    trcrn["sice"] = jnp.asarray(5.0 * (1 + 0.1 * rng.random(
        state.trcrn["sice"].shape)))
    trcrn["qsno"] = jnp.asarray(-1.0e8 * (1 + 0.1 * rng.random(
        state.trcrn["qsno"].shape)))
    if "iage" in trcrn:
        trcrn["iage"] = jnp.asarray(3.0e7 * rng.random(
            state.trcrn["iage"].shape))
    state = state.replace(
        aicen=jnp.asarray(aicen), vicen=jnp.asarray(vicen),
        vsnon=jnp.asarray(vsnon), trcrn=trcrn)
    return cfg, grid, reg, state


def _tf(grid):
    return jnp.full(grid.shape, -1.8, F)


# ---------------------------------------------------------------------------
# flux-level oracles
# ---------------------------------------------------------------------------

def test_uniform_flow_constant_field_flux():
    """Constant mass, uniform velocity: mflxe = u*dt*HTE*m,
    mflxn = v*dt*HTN*m exactly (signs + scaling)."""
    cfg, grid, reg, state = _setup()
    table = rx.build_flat_table(reg)
    m0 = 0.6
    ncat = cfg.domain.ncat
    am = jnp.full((ncat + 1,) + grid.shape, m0, F)
    trm = jnp.full((ncat, len(table)) + grid.shape, 1.0, F)
    mc, mx, my, tc, tx, ty, _ts = rx.construct_fields(grid, am, trm, table,
                                                 grid.hm)
    dt = 1800.0
    u, v = 0.4, -0.25
    dxs = jnp.full(grid.shape, -u * dt, F) / grid.dxU
    dys = jnp.full(grid.shape, -v * dt, F) / grid.dyU
    mflxe, mflxn, mtflxe, mtflxn = rx.remap_fluxes(
        grid, dxs, dys, mc, mx, my, tc, tx, ty, table)
    expect_e = u * dt * float(grid.HTE[5, 5]) * m0
    expect_n = v * dt * float(grid.HTN[5, 5]) * m0
    np.testing.assert_allclose(np.asarray(mflxe[0, 5:-5, 5:-5]), expect_e,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mflxn[0, 5:-5, 5:-5]), expect_n,
                               rtol=1e-12)
    # constant tracer = 1: mass*tracer flux equals mass flux
    np.testing.assert_allclose(np.asarray(mtflxe[:, :, 5:-5, 5:-5]),
                               expect_e, rtol=1e-12)


def test_flux_matches_rasterized_pentagon():
    """Brute-force oracle: mass flux across one N edge equals the Riemann
    sum of the donor reconstructions over the swept pentagon."""
    cfg, grid, reg, state = _setup(nx=16, ny=16, seed=3)
    table = rx.build_flat_table(reg)
    rng = np.random.default_rng(7)
    ncat = cfg.domain.ncat
    am = jnp.asarray(0.3 + 0.5 * rng.random((ncat + 1,) + grid.shape))
    trm = jnp.ones((ncat, len(table)) + grid.shape, F)
    mc, mx, my, tc, tx, ty, _ts = rx.construct_fields(grid, am, trm, table,
                                                 grid.hm)
    dt = 1800.0
    dx_m = float(grid.dxU[0, 0])
    umax = 0.4 * dx_m / dt
    u = (2 * rng.random(grid.shape) - 1) * umax
    # v same-sign everywhere: the swept region is then simple (no signed
    # cancellation), so the unsigned even-odd raster below is a valid oracle
    v = (0.1 + 0.9 * rng.random(grid.shape)) * umax
    dxs = jnp.asarray(-u * dt) / grid.dxU
    dys = jnp.asarray(-v * dt) / grid.dyU
    mflxe, mflxn, _, _ = rx.remap_fluxes(grid, dxs, dys, mc, mx, my,
                                         None, None, None, table)

    # rasterize the N-edge pentagon at (j0, i0) in edge-local coords
    j0, i0 = 8, 8
    dxs_np, dys_np = np.asarray(dxs), np.asarray(dys)
    CL = np.array([-0.5, 0.0]) + [dxs_np[j0, i0 - 1] * 0, 0]
    CR = np.array([0.5, 0.0])
    DL = np.array([-0.5 + dxs_np[j0, i0 - 1], dys_np[j0, i0 - 1]])
    DR = np.array([0.5 + dxs_np[j0, i0], dys_np[j0, i0]])
    poly = [CL, CR, DR, DL]      # simple quad (DM on the segment)

    N = 4000
    xs = np.linspace(-1.4, 1.4, N)
    ys = np.linspace(-0.9, 0.9, N)
    dA = (xs[1] - xs[0]) * (ys[1] - ys[0])
    PX, PY = np.meshgrid(xs, ys, indexing="ij")
    # even-odd crossing rule, vectorized (quad is simple at CFL<0.5)
    crossings = np.zeros_like(PX, dtype=int)
    n = len(poly)
    for k in range(n):
        x1, y1 = poly[k]
        x2, y2 = poly[(k + 1) % n]
        crosses = (y1 > PY) != (y2 > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (PY - y1) / (y2 - y1) * (x2 - x1)
        crossings += (crosses & (PX < xint)).astype(int)
    inside = crossings % 2 == 1

    mc_np = np.asarray(mc)
    mx_np = np.asarray(mx)
    my_np = np.asarray(my)
    cat = 1
    col = np.where(PX < -0.5, -1, np.where(PX >= 0.5, 1, 0))
    row = np.where(PY >= 0, 1, 0)
    val = np.zeros_like(PX)
    for c in (-1, 0, 1):
        for r in (0, 1):
            sel = (col == c) & (row == r)
            jd, idx = j0 + r, i0 + c
            cx, cy = float(c), r - 0.5
            val = np.where(sel, mc_np[cat, jd, idx]
                           + mx_np[cat, jd, idx] * (PX - cx)
                           + my_np[cat, jd, idx] * (PY - cy), val)
    total = float((val * inside).sum() * dA)
    # departure below edge (dys<0) means flow northward: positive flux
    north = dys_np[j0, i0] + dys_np[j0, i0 - 1] < 0
    expected = total * float(grid.narea[j0, i0]) * (1.0 if north else -1.0)
    got = float(mflxn[cat, j0, i0])
    assert abs(got - expected) / max(abs(expected), 1e-12) < 2e-3, \
        (got, expected)


def test_prescribed_edgearea_uniform():
    """Bentsen adjustment: prescribed edge areas reproduced exactly for a
    C-grid-style uniform flow (mflx = uvelE*HTE*dt*m)."""
    cfg, grid, reg, state = _setup()
    table = rx.build_flat_table(reg)
    m0 = 0.5
    ncat = cfg.domain.ncat
    am = jnp.full((ncat + 1,) + grid.shape, m0, F)
    mc, mx, my, tc, tx, ty, _ts = rx.construct_fields(
        grid, am, jnp.ones((ncat, len(table)) + grid.shape, F), table,
        grid.hm)
    dt = 1800.0
    u, v = 0.3, 0.2
    # perturb the corner trajectories; the prescribed areas must win
    rng = np.random.default_rng(1)
    du = 0.1 * u * (2 * rng.random(grid.shape) - 1)
    dxs = jnp.asarray(-(u + du) * dt) / grid.dxU
    dys = jnp.full(grid.shape, -v * dt, F) / grid.dyU
    ea_e = jnp.full(grid.shape, u * dt, F) * grid.HTE
    ea_n = jnp.full(grid.shape, v * dt, F) * grid.HTN
    mflxe, mflxn, _, _ = rx.remap_fluxes(grid, dxs, dys, mc, mx, my,
                                         None, None, None, table,
                                         edgearea_e=ea_e, edgearea_n=ea_n)
    expect_e = u * dt * float(grid.HTE[5, 5]) * m0
    expect_n = v * dt * float(grid.HTN[5, 5]) * m0
    np.testing.assert_allclose(np.asarray(mflxe[0, 5:-5, 5:-5]), expect_e,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mflxn[0, 5:-5, 5:-5]), expect_n,
                               rtol=1e-10)


# ---------------------------------------------------------------------------
# full-state remap
# ---------------------------------------------------------------------------

def test_zero_velocity_identity():
    cfg, grid, reg, state = _setup()
    new, diag = rx.horizontal_remap_exact(grid, state, reg, _tf(grid),
                                          3600.0)
    np.testing.assert_allclose(np.asarray(new.aicen), np.asarray(state.aicen),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(new.vicen), np.asarray(state.vicen),
                               atol=1e-13)
    assert not bool(diag["oob"])
    assert not bool(diag["neg_mass"])


def test_conservation_random_flow():
    cfg, grid, reg, state = _setup(kmt="default", seed=5)
    dt = 3600.0
    dx_m = float(grid.dxU[0, 0])
    umax = 0.3 * dx_m / dt
    # smooth low-wavenumber flow: monotonicity holds for simple (uncrossed)
    # swept quads; cell-scale sign noise can produce tiny overshoots even
    # in the reference construction (signed triangle areas)
    ny, nx = grid.shape
    jj, ii = np.mgrid[0:ny, 0:nx]
    u = umax * np.sin(2 * np.pi * ii / nx) * np.cos(2 * np.pi * jj / ny)
    v = umax * np.cos(2 * np.pi * ii / nx) * np.sin(4 * np.pi * jj / ny)
    u = u * np.asarray(grid.uvm)
    v = v * np.asarray(grid.uvm)
    state = state.replace(uvel=jnp.asarray(u), vvel=jnp.asarray(v))
    table = rx.build_flat_table(reg)
    am0, trm0 = rx.state_to_tracers(state, reg, table)
    asum0, atsum0 = rx.global_sums(grid, am0, trm0, table)
    for _ in range(5):
        state, diag = rx.horizontal_remap_exact(
            grid, state, reg, _tf(grid), dt, l_dp_midpt=True,
            conserv_check=True, monotonicity_check=True)
        assert not bool(diag["neg_mass"])
        assert not bool(diag["oob"])
        assert not bool(diag["mono_violation"])
        assert float(diag["cons_err_area"]) < 1e-12
        assert float(diag["cons_err_tracer"]) < 1e-10
    am1, trm1 = rx.state_to_tracers(state, reg, table)
    asum1, atsum1 = rx.global_sums(grid, am1, trm1, table)
    # ice categories conserve exactly across the state round trip; aice0
    # (index 0) is recomputed as clip(1 - sum aicen) by the State property,
    # so convergent flow (aice > 1 awaiting ridging) legitimately moves it
    np.testing.assert_allclose(np.asarray(asum1[1:]), np.asarray(asum0[1:]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(atsum1), np.asarray(atsum0),
                               rtol=1e-10, atol=1e-4)


def test_translation_accuracy():
    """Gaussian blob translated at CFL 0.25: center moves u*t; peak decays
    only slightly (2nd-order scheme beats upwind substantially)."""
    cfg, grid, reg, state = _setup(nx=64, ny=64)
    dt = 3600.0
    dx_m = float(grid.dxT[0, 0])
    u = 0.25 * dx_m / dt
    state = state.replace(uvel=jnp.full(grid.shape, u, F))
    amax0 = float(jnp.max(state.aicen[1]))
    jj, ii = np.mgrid[0:64, 0:64]

    def com_x(s):
        a = np.asarray(s.aicen[1])
        return (a * ii).sum() / a.sum()

    c0 = com_x(state)
    nsteps = 16
    for _ in range(nsteps):
        state, diag = rx.horizontal_remap_exact(grid, state, reg, _tf(grid),
                                                dt)
    moved = (com_x(state) - c0) * dx_m
    expect = u * dt * nsteps
    assert abs(moved - expect) / expect < 0.02
    # peak preservation: remap keeps ~90% after 4 cells of travel
    # (measured 89.97%; upwind at this CFL/extent keeps ~55%)
    assert float(jnp.max(state.aicen[1])) > 0.85 * amax0
    # monotone: no overshoot
    assert float(jnp.max(state.aicen[1])) <= amax0 * (1 + 1e-10)
    assert float(jnp.min(state.aicen[1])) >= -1e-14


def test_oob_flag_on_cfl_violation():
    cfg, grid, reg, state = _setup()
    dt = 3600.0
    dx_m = float(grid.dxU[0, 0])
    u = 1.5 * dx_m / dt          # CFL 1.5
    state = state.replace(uvel=jnp.full(grid.shape, u, F))
    _, diag = rx.horizontal_remap_exact(grid, state, reg, _tf(grid), dt)
    assert bool(diag["oob"])


def test_tracer_monotone_ranges():
    """Tracers (including dependent chains) stay within their initial
    global ranges under random flow."""
    cfg, grid, reg, state = _setup(seed=9, cfg_over={
        "tracers.tr_lvl": True, "tracers.tr_pond_lvl": True})
    rng = np.random.default_rng(2)
    trcrn = dict(state.trcrn)
    mask = np.asarray(state.aicen) > 0
    trcrn["alvl"] = jnp.asarray(np.where(mask, 0.5 + 0.4 * rng.random(
        state.trcrn["alvl"].shape), 0.0))
    trcrn["apnd"] = jnp.asarray(np.where(mask, 0.2 + 0.3 * rng.random(
        state.trcrn["apnd"].shape), 0.0))
    trcrn["hpnd"] = jnp.asarray(np.where(mask, 0.1 + 0.1 * rng.random(
        state.trcrn["hpnd"].shape), 0.0))
    state = state.replace(trcrn=trcrn)
    dt = 3600.0
    dx_m = float(grid.dxU[0, 0])
    umax = 0.3 * dx_m / dt
    ny, nx = grid.shape
    jj, ii = np.mgrid[0:ny, 0:nx]
    u = umax * np.cos(2 * np.pi * jj / ny)
    v = umax * np.sin(2 * np.pi * ii / nx)
    state = state.replace(uvel=jnp.asarray(u), vvel=jnp.asarray(v))
    for _ in range(4):
        state, diag = rx.horizontal_remap_exact(
            grid, state, reg, _tf(grid), dt, l_dp_midpt=True,
            monotonicity_check=True)
        assert not bool(diag["mono_violation"])
    live = np.asarray(state.aicen) > 1e-8
    hp = np.asarray(state.trcrn["hpnd"])
    assert hp[live].max() <= 0.2 + 1e-6
    assert hp[live].min() >= -1e-10
    al = np.asarray(state.trcrn["alvl"])
    assert al[live].max() <= 0.9 + 1e-6


def test_knife_edge_chain_no_amplification():
    """Round-5 annual-run regression: a category row whose weight chain is
    knife-edge thin (sub-hs_min snow: hs ~ 1e-7 per area) must NOT
    amplify its dependent tracer through repeated remap steps.  The
    signed-fragment flux decomposition is not convex at such
    denominators — before the registry range rails + puny chain floors,
    |qsno| grew multiplicatively (~1.5x/step, reaching ~1e24 J/m^3 over a
    130-day gx3 run) and the corrupted energy's ocean dump flash-froze
    the global ocean.  Bounds here are the TracerSpec.lo/hi rails."""
    import cice_tpu.constants as cst

    cfg, grid, reg, state = _setup(seed=5)
    trcrn = dict(state.trcrn)
    an = np.asarray(state.aicen)
    mask = an > 0
    # physical cold snow enthalpy on a knife-edge snow layer
    vs = np.asarray(state.vsnon)
    vs = np.where(mask, an * 1e-7, 0.0)         # hs = 1e-7 m per area
    qs = np.where(mask[:, None], -2.5e8, 0.0)
    trcrn["qsno"] = jnp.asarray(np.broadcast_to(
        qs, state.trcrn["qsno"].shape).copy())
    state = state.replace(vsnon=jnp.asarray(vs), trcrn=trcrn)
    dt = 3600.0
    dx_m = float(grid.dxU[0, 0])
    umax = 0.3 * dx_m / dt
    ny, nx = grid.shape
    jj, ii = np.mgrid[0:ny, 0:nx]
    u = umax * np.cos(2 * np.pi * jj / ny + 0.3)
    v = umax * np.sin(2 * np.pi * ii / nx + 0.1)
    state = state.replace(uvel=jnp.asarray(u), vvel=jnp.asarray(v))
    for _ in range(8):
        state, _ = rx.horizontal_remap_exact(
            grid, state, reg, _tf(grid), dt, l_dp_midpt=True)
    q = np.asarray(state.trcrn["qsno"])
    assert np.isfinite(q).all()
    # the registry rail: physical window, no growth beyond the floor
    from cice_tpu.model.state import _QSNO_LO
    assert q.min() >= _QSNO_LO - 1.0
    assert q.max() <= 1e-6
    # Tsfcn rail holds too
    t = np.asarray(state.trcrn["Tsfcn"])
    assert t.min() >= -100.0 - 1e-6 and t.max() <= 1e-6
