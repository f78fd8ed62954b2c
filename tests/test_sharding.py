"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference's distributed-correctness oracle is decomposition invariance —
identical results across MPI layouts (SURVEY §4.3). Here: the SAME jitted
step on a 1-device vs multi-device mesh must agree bitwise (XLA collectives
+ fixed reduction order), which is the TPU-mesh equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params, ice_strength_hibler
from cice_tpu.dynamics.evp import evp_solve
from cice_tpu.parallel.mesh import make_mesh, shard_state


@pytest.fixture(scope="module")
def evp_problem():
    nx = ny = 32
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": 20, "dynamics.coriolis": "constant",
    })
    grid = rectgrid(nx, ny, kmt_type="none", dtype=jnp.float32)
    z = jnp.zeros(grid.shape, jnp.float32)
    jj, ii = np.mgrid[0:ny, 0:nx]
    aice = jnp.asarray(0.5 + 0.4 * np.sin(2 * np.pi * jj / ny) *
                       np.cos(2 * np.pi * ii / nx), jnp.float32)
    vice = aice * 1.5
    strairx = jnp.asarray(0.1 + 0.05 * np.sin(2 * np.pi * ii / nx), jnp.float32)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=strairx, strairyT=z,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice)
    return cfg, grid, prep, p, strength


def _solve(grid, p, prep, strength):
    z = jnp.zeros(grid.shape, jnp.float32)
    z3 = jnp.zeros((4,) + grid.shape, jnp.float32)
    out = evp_solve(grid, p, prep, strength, z3, z3, z3, uocn=z, vocn=z)
    return np.asarray(out[0]), np.asarray(out[1])


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_evp_mesh_invariance(evp_problem):
    """EVP on a sharded 2x4 mesh == single-device result (allclose to f32
    roundoff; the stencil halos become collective permutes)."""
    cfg, grid, prep, p, strength = evp_problem
    u1, v1 = _solve(grid, p, prep, strength)

    mesh = make_mesh(shape=(2, 4))
    grid_s = shard_state(mesh, grid)
    prep_s = shard_state(mesh, prep)
    strength_s = shard_state(mesh, strength)
    u2, v2 = _solve(grid_s, p, prep_s, strength_s)

    np.testing.assert_allclose(u1, u2, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=2e-6, rtol=1e-5)


def test_tripole_mesh_invariance():
    """EVP across the tripole U-fold: sharded 2x4 mesh == single device.

    The seam halo (reflection i -> nx-1-i with sign flips across the
    northern boundary, reference ice_boundary.F90:7910-9052) lowers to a
    collective permute between x-mirrored devices; the result must be
    invariant to the decomposition (reference decomp_suite contract)."""
    from cice_tpu.core.grid import make_grid

    nx, ny = 32, 24
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "grid.grid_format": "tripole", "grid.kmt_type": "default",
        "dynamics.ndte": 20, "dynamics.coriolis": "constant",
    })
    grid = make_grid(cfg)
    z = jnp.zeros(grid.shape, grid.ULAT.dtype)
    jj, ii = np.mgrid[0:ny, 0:nx]
    tm = np.asarray(grid.tmask)
    aice = jnp.asarray((0.6 + 0.3 * np.cos(2 * np.pi * ii / nx)) * tm,
                       z.dtype)
    vice = aice * 1.5
    strairx = jnp.asarray(0.1 + 0.05 * np.sin(2 * np.pi * jj / ny), z.dtype)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=strairx, strairyT=z + 0.02,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice)

    def solve(g, pr, s):
        z3 = jnp.zeros((4,) + g.shape, z.dtype)
        zz = jnp.zeros(g.shape, z.dtype)
        out = evp_solve(g, p, pr, s, z3, z3, z3, uocn=zz, vocn=zz)
        return np.asarray(out[0]), np.asarray(out[1])

    u1, v1 = solve(grid, prep, strength)
    assert np.abs(u1).max() > 0.0 and np.isfinite(u1).all()

    mesh = make_mesh(shape=(2, 4))
    u2, v2 = solve(shard_state(mesh, grid), shard_state(mesh, prep),
                   shard_state(mesh, strength))
    np.testing.assert_allclose(u1, u2, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=2e-6, rtol=1e-5)


def test_full_step_sharded(evp_problem):
    """The whole coupled model step compiles & runs sharded over 8 devices
    (the dryrun_multichip contract), including the tripole-seam leg."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
