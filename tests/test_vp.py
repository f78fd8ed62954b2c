"""Implicit VP solver tests.

Oracle (reference dynpicard test philosophy): the VP solution satisfies the
nonlinear momentum balance (residual decreases), and EVP — which approximates
the same VP rheology by pseudo-time subcycling — must agree with the implicit
solution to within the EVP convergence error.
"""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params, ice_strength_hibler
from cice_tpu.dynamics.evp import evp_solve
from cice_tpu.dynamics.vp import implicit_solver


def _setup(nx=32, ny=32):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": 500, "dynamics.coriolis": "constant",
        "dynamics.maxits_nonlin": 20, "dynamics.reltol_fgmres": 1e-2,
    })
    grid = rectgrid(nx, ny, kmt_type="none")
    z = jnp.zeros(grid.shape)
    aice = jnp.full(grid.shape, 0.9)
    vice = aice * 1.0
    # spatially varying wind: shear + convergence
    jj, ii = np.mgrid[0:ny, 0:nx]
    strairx = jnp.asarray(0.15 * np.sin(2 * np.pi * jj / ny) + 0.05, jnp.float32)
    strairy = jnp.asarray(0.1 * np.cos(2 * np.pi * ii / nx), jnp.float32)
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt, aice=aice, vice=vice,
                    vsno=z, aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                    uvel=z, vvel=z, strairxT=strairx, strairyT=strairy,
                    uocn_T=z, vocn_T=z, ss_tltx_T=z, ss_tlty_T=z)
    strength = ice_strength_hibler(aice, vice)
    return cfg, grid, prep, strength


def test_vp_residual_decreases():
    cfg, grid, prep, strength = _setup()
    z = jnp.zeros(grid.shape)
    out = implicit_solver(grid, cfg.dynamics, prep, strength,
                          uocn=z, vocn=z, dt=cfg.setup.dt)
    u, v, *_, res = out
    res = np.asarray(res)
    assert np.isfinite(np.asarray(u)).all()
    assert res[-1] < res[0] * 0.25       # Picard converges
    assert np.abs(np.asarray(u)).max() < 1.0


def test_vp_matches_converged_evp():
    cfg, grid, prep, strength = _setup()
    z = jnp.zeros(grid.shape)
    uvp, vvp, *_ = implicit_solver(grid, cfg.dynamics, prep, strength,
                                   uocn=z, vocn=z, dt=cfg.setup.dt)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    z3 = jnp.zeros((4,) + grid.shape)
    uevp, vevp, *_ = evp_solve(grid, p, prep, strength, z3, z3, z3,
                               uocn=z, vocn=z)
    m = np.asarray(prep.iceUmask)
    du = np.abs(np.asarray(uvp) - np.asarray(uevp))[m]
    scale = np.abs(np.asarray(uvp))[m].max() + 1e-12
    # EVP approximates VP: agreement to ~20% of the velocity scale
    assert np.median(du) / scale < 0.2


def test_anderson_accelerates_picard():
    """Anderson(5) should reach a residual no worse than plain Picard in
    the same number of nonlinear iterations (reference algo_nonlin)."""
    cfg, grid, prep, strength = _setup()
    z = jnp.zeros(grid.shape)
    # compare on the same stationary fixed-point map: use_mean_vrel averages
    # the drag between iterates, which (correctly) only applies to Picard
    few = {"dynamics.maxits_nonlin": 8, "dynamics.dim_fgmres": 8,
           "dynamics.use_mean_vrel": False}
    cfg_p = cfg.with_overrides(**few)
    cfg_a = cfg.with_overrides(**few, **{"dynamics.algo_nonlin": "anderson",
                                         "dynamics.dim_andacc": 4})
    *_, res_p = implicit_solver(grid, cfg_p.dynamics, prep, strength,
                                uocn=z, vocn=z, dt=cfg.setup.dt)
    out_a = implicit_solver(grid, cfg_a.dynamics, prep, strength,
                            uocn=z, vocn=z, dt=cfg.setup.dt)
    res_a = out_a[-1]
    assert np.isfinite(np.asarray(out_a[0])).all()
    assert float(res_a[-1]) <= float(res_p[-1]) * 3.0   # no blow-up
    assert float(res_a[-1]) < float(res_a[0])           # converging


def test_precond_variants_agree():
    """pgmres / diag / ident preconditioning converge to the same velocity
    field (preconditioning changes the path, not the solution)."""
    cfg, grid, prep, strength = _setup(24, 24)
    z = jnp.zeros(grid.shape)
    sols = []
    for pc in ("pgmres", "diag", "ident"):
        c = cfg.with_overrides(**{"dynamics.precond": pc,
                                  "dynamics.maxits_nonlin": 12,
                                  "dynamics.dim_fgmres": 12,
                                  "dynamics.ortho_type": "mgs" if pc != "diag"
                                  else "cgs"})
        u, v, *_ = implicit_solver(grid, c.dynamics, prep, strength,
                                   uocn=z, vocn=z, dt=cfg.setup.dt)
        sols.append((np.asarray(u), np.asarray(v)))
    for (u2, v2) in sols[1:]:
        scale = np.abs(sols[0][0]).max()
        assert np.abs(u2 - sols[0][0]).max() < 0.08 * scale + 1e-4
