"""Wide-halo shard_map EVP (parallel/evp_wide.py) vs the GSPMD solver.

The distributed-correctness oracle of the reference is decomposition
invariance — bit-for-bit identical results across block sizes / task counts
(SURVEY.md §4.3, decomp_suite.ts). The analogue here: the explicit-comm
wide-halo solver on an 8-device mesh must reproduce the single-program
fori_loop solver exactly, for every boundary-condition family and for
chunk remainders / clamped fuse factors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.core.halo import BC
from cice_tpu.dynamics.common import dyn_prep, evp_params
from cice_tpu.dynamics.evp import evp_solve
from cice_tpu.parallel.evp_wide import evp_solve_wide
from cice_tpu.parallel.mesh import make_mesh


def _problem(nx, ny, bc, ndte, seed=0):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny, "dynamics.ndte": ndte,
        "dynamics.coriolis": "latitude"})
    grid = rectgrid(nx, ny, kmt_type="none", bc=bc, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    f = lambda lo, hi: jnp.asarray(
        rng.uniform(lo, hi, (ny, nx)), jnp.float32)
    aice = jnp.clip(f(0.0, 1.2), 0.0, 1.0)
    vice = aice * f(0.5, 3.0)
    z = jnp.zeros((ny, nx), jnp.float32)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=0.1 * vice, aiceU_prev_mask=jnp.zeros((ny, nx), bool),
                    uvel=f(-0.1, 0.1), vvel=f(-0.1, 0.1),
                    strairxT=f(-0.2, 0.2), strairyT=f(-0.2, 0.2),
                    uocn_T=f(-0.05, 0.05), vocn_T=f(-0.05, 0.05),
                    ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    from cice_tpu.columns.ridging import ice_strength
    strength = ice_strength(jnp.stack([aice / 5] * 5),
                            jnp.stack([vice / 5] * 5), aice, vice,
                            cfg.dynamics)
    sp = jnp.asarray(rng.uniform(-100, 100, (4, ny, nx)), jnp.float32)
    sm = jnp.asarray(rng.uniform(-100, 100, (4, ny, nx)), jnp.float32)
    s12 = jnp.asarray(rng.uniform(-50, 50, (4, ny, nx)), jnp.float32)
    uocn = f(-0.1, 0.1)
    vocn = f(-0.1, 0.1)
    return grid, p, prep, strength, sp, sm, s12, uocn, vocn


def _compare(bc, ndte, k_fuse, mesh_shape=(2, 4), nx=48, ny=32):
    grid, p, prep, strength, sp, sm, s12, uocn, vocn = _problem(
        nx, ny, bc, ndte)
    ref = jax.jit(lambda: evp_solve(grid, p, prep, strength, sp, sm, s12,
                                    uocn=uocn, vocn=vocn))()
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:8])
    got = jax.jit(lambda: evp_solve_wide(grid, p, prep, strength, sp, sm,
                                         s12, uocn=uocn, vocn=vocn,
                                         mesh=mesh, k_fuse=k_fuse))()
    names = ["uvel", "vvel", "stressp", "stressm", "stress12",
             "strintx", "strinty", "taubx", "tauby"]
    for name, a, b in zip(names, ref, got):
        a, b = np.asarray(a), np.asarray(b)
        # the two paths are different XLA programs (different fusion/FMA
        # contraction), so agreement is to f32 roundoff, not bitwise;
        # bitwise decomp invariance is asserted WITHIN the wide path below
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * scale,
                                   err_msg=name)


def test_cyclic_x_open_ns_with_remainder(devices8):
    # ndte=11, k=4: two full chunks + remainder 3
    _compare(BC(ew="cyclic", ns="open"), ndte=11, k_fuse=4)


def test_open_x_closed_ns_single_chunk(devices8):
    _compare(BC(ew="open", ns="closed"), ndte=8, k_fuse=8)


def test_doubly_cyclic(devices8):
    _compare(BC(ew="cyclic", ns="cyclic"), ndte=6, k_fuse=2)


def test_k_clamped_to_tile(devices8):
    # tiles are 16x12; k_fuse=64 must clamp to min(ndte, ly-1, lx-1)
    _compare(BC(ew="cyclic", ns="open"), ndte=12, k_fuse=64)


def test_mesh_shape_invariance(devices8):
    """Decomp-invariance oracle (SURVEY §4.3): the wide-halo solver must
    give identical answers across mesh shapes — the TPU analogue of the
    reference's BFB-across-decompositions contract (decomp_suite.ts)."""
    grid, p, prep, strength, sp, sm, s12, uocn, vocn = _problem(
        48, 32, BC(ew="cyclic", ns="open"), ndte=9)
    outs = []
    for shape in [(2, 4), (4, 2), (1, 8)]:
        mesh = make_mesh(shape, devices=jax.devices()[:8])
        outs.append(jax.jit(lambda mesh=mesh: evp_solve_wide(
            grid, p, prep, strength, sp, sm, s12, uocn=uocn, vocn=vocn,
            mesh=mesh, k_fuse=4))())
    for other in outs[1:]:
        for name, a, b in zip(["u", "v"], outs[0][:2], other[:2]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6 * scale,
                                       err_msg=name)


def test_tripole_falls_back(devices8):
    grid, p, prep, strength, sp, sm, s12, uocn, vocn = _problem(
        48, 32, BC(ew="cyclic", ns="open"), ndte=4)
    # mesh=None triggers the GSPMD fallback
    ref = evp_solve(grid, p, prep, strength, sp, sm, s12, uocn=uocn,
                    vocn=vocn)
    got = evp_solve_wide(grid, p, prep, strength, sp, sm, s12, uocn=uocn,
                         vocn=vocn, mesh=None)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


@pytest.mark.parametrize("ns_kind", ["tripole", "tripoleT"])
def test_tripole_fold_matches_gspmd(devices8, ns_kind):
    """The northern-seam fold messaging (x-mirrored device ppermute with
    the 180-degree rotation rules: vector sign flips, diagonal stress
    corner swaps, signed metric-partner swaps) must reproduce the GSPMD
    solver across the seam — the reference's hardest comm seam
    (ice_boundary.F90:7910-9052, ice_HaloUpdate_stress:7440)."""
    _compare(BC(ew="cyclic", ns=ns_kind), ndte=7, k_fuse=3)


def test_tripole_fold_mesh_invariance(devices8):
    """Sharded tripole decomp invariance at two mesh shapes (VERDICT r2
    next-step #4): fold messaging must be mesh-shape independent."""
    grid, p, prep, strength, sp, sm, s12, uocn, vocn = _problem(
        48, 32, BC(ew="cyclic", ns="tripole"), ndte=6)
    outs = []
    for shape in [(2, 4), (1, 8), (4, 2)]:
        mesh = make_mesh(shape, devices=jax.devices()[:8])
        outs.append(jax.jit(lambda mesh=mesh: evp_solve_wide(
            grid, p, prep, strength, sp, sm, s12, uocn=uocn, vocn=vocn,
            mesh=mesh, k_fuse=3))())
    for other in outs[1:]:
        for name, a, b in zip(["u", "v"], outs[0][:2], other[:2]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6 * scale,
                                       err_msg=name)


def test_model_step_wide_halo(devices8):
    """Full coupled step with evp_algorithm='wide_halo' on a sharded mesh
    matches the standard algorithm exactly."""
    from cice_tpu.model.driver import Model
    from cice_tpu.model.step import model_step
    from cice_tpu.model.forcing import get_forcing
    from cice_tpu.parallel.mesh import shard_state

    base = {
        "grid.nx_global": 32, "grid.ny_global": 32,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 10, "thermo.nit": 4,
    }
    cfg_ref = Config().with_overrides(**base)
    m_ref = Model(cfg_ref)
    fc = get_forcing(m_ref.cfg, m_ref.grid, 0.0, 1.0, m_ref.state.aice,
                     m_ref.forcing)
    s_ref, _ = model_step(m_ref.static, m_ref.grid, m_ref.state, fc,
                          cfg_ref.setup.dt)

    mesh = make_mesh((2, 4), devices=jax.devices()[:8])
    cfg_w = Config().with_overrides(**dict(
        base, **{"dynamics.evp_algorithm": "wide_halo",
                 "dynamics.evp_wide_k": 4}))
    m_w = Model(cfg_w, mesh=mesh)
    state = shard_state(mesh, m_w.state)
    fcs = shard_state(mesh, fc)
    s_w, _ = model_step(m_w.static, m_w.grid, state, fcs, cfg_w.setup.dt)

    # tolerance: f32 roundoff of two differently-sharded programs (every
    # phase of the sharded step re-fuses), not an EVP-path discrepancy
    np.testing.assert_allclose(np.asarray(s_ref.uvel),
                               np.asarray(s_w.uvel), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_ref.aice),
                               np.asarray(s_w.aice), rtol=0, atol=1e-5)
