"""Fused-subcycle Pallas EVP kernel vs the XLA reference loop.

Runs the Pallas kernel in interpreter mode on CPU (bit-compatible
semantics with the TPU lowering) and checks the velocities match the
plain `evp_solve` fori_loop — same math, different execution schedule, so
agreement is tight f32."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params, ice_strength_hibler
from cice_tpu.dynamics.evp import evp_solve
from cice_tpu.kernels.evp_pallas import evp_solve_fused


def _setup(nx=64, ny=48, ndte=40):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": ndte, "dynamics.coriolis": "constant"})
    grid = rectgrid(nx, ny, kmt_type="none", dtype=jnp.float32)
    z = jnp.zeros(grid.shape, jnp.float32)
    jj, ii = np.mgrid[0:ny, 0:nx]
    aice = jnp.asarray(0.9 - 0.2 * np.exp(-((ii - nx / 2) / 8.0) ** 2),
                       jnp.float32) * jnp.ones(grid.shape, jnp.float32)
    vice = aice * 1.2
    strairx = jnp.asarray(0.12 * np.sin(2 * np.pi * jj / ny) + 0.06,
                          jnp.float32)
    strairy = jnp.asarray(0.08 * np.cos(2 * np.pi * ii / nx), jnp.float32)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=strairx, strairyT=strairy,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice).astype(jnp.float32)
    return grid, p, prep, strength


@pytest.mark.parametrize("tile_y", [None, 16])
def test_pallas_matches_xla(tile_y):
    grid, p, prep, strength = _setup()
    z3 = jnp.zeros((4,) + grid.shape, jnp.float32)
    zz = jnp.zeros(grid.shape, jnp.float32)
    u0, v0, *_ = evp_solve(grid, p, prep, strength, z3, z3, z3,
                           uocn=zz, vocn=zz)
    u1, v1, *_ = evp_solve_fused(grid, p, prep, strength, z3, z3, z3,
                                 uocn=zz, vocn=zz, k_fuse=8,
                                 tile_y=tile_y, interpret=True)
    scale = float(jnp.max(jnp.abs(u0))) + 1e-12
    err_u = float(jnp.max(jnp.abs(u1 - u0))) / scale
    err_v = float(jnp.max(jnp.abs(v1 - v0))) / scale
    assert np.isfinite(np.asarray(u1)).all()
    assert err_u < 2e-4 and err_v < 2e-4, (err_u, err_v)
    assert scale > 1e-3     # the flow is nontrivial


def test_pallas_k_fuse_invariance():
    """Different fusion factors must give the same trajectory (the halo is
    wide enough that chunking is exact in the interior)."""
    grid, p, prep, strength = _setup(ndte=24)
    z3 = jnp.zeros((4,) + grid.shape, jnp.float32)
    zz = jnp.zeros(grid.shape, jnp.float32)
    outs = []
    for k in (4, 12):
        u, v, *_ = evp_solve_fused(grid, p, prep, strength, z3, z3, z3,
                                   uocn=zz, vocn=zz, k_fuse=k,
                                   tile_y=16, interpret=True)
        outs.append(np.asarray(u))
    np.testing.assert_allclose(outs[0], outs[1], atol=5e-6)
