"""EVP dynamics tests: free-drift balance, stability, symmetry.

Oracle strategy mirrors the reference's (SURVEY.md §4): no golden files —
physical invariants (momentum balance residual at convergence, boundedness,
mirror symmetry) on an idealized box grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu import constants as cst
from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.dynamics.common import dyn_prep, evp_params, ice_strength_hibler
from cice_tpu.dynamics.evp import evp_solve, evp_ocean_stress


def _box_setup(nx=48, ny=48, strength_scale=1.0, wind=10.0, ndte=120,
               hice=2.0):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "grid.ew_boundary_type": "cyclic", "grid.ns_boundary_type": "open",
        "dynamics.ndte": ndte, "dynamics.coriolis": "constant",
    })
    grid = rectgrid(nx, ny, kmt_type="none")
    ny_, nx_ = grid.shape
    aice = jnp.full((ny_, nx_), 0.9)
    vice = jnp.full((ny_, nx_), hice) * aice
    vsno = jnp.zeros((ny_, nx_))
    # quadratic-drag wind stress, eastward
    strairx = jnp.full((ny_, nx_), cst.rhoa_ref * 0.0012 * wind * wind)
    strairy = jnp.zeros((ny_, nx_))
    zeros = jnp.zeros((ny_, nx_))
    prep = dyn_prep(grid, cfg.dynamics, cfg.setup.dt,
                    aice=aice, vice=vice, vsno=vsno,
                    aiceU_prev_mask=jnp.zeros((ny_, nx_), bool),
                    uvel=zeros, vvel=zeros,
                    strairxT=strairx, strairyT=strairy,
                    uocn_T=zeros, vocn_T=zeros,
                    ss_tltx_T=zeros, ss_tlty_T=zeros)
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice) * strength_scale
    return cfg, grid, prep, p, strength, aice


def _run(cfg, grid, prep, p, strength):
    z3 = jnp.zeros((4,) + grid.shape)
    zeros = jnp.zeros(grid.shape)
    return evp_solve(grid, p, prep, strength, z3, z3, z3,
                     uocn=zeros, vocn=zeros)


def test_free_drift_balance():
    """With negligible ice strength the converged velocity satisfies the
    analytic free-drift momentum balance: tau_air + tau_ocean + coriolis = 0.

    Thin ice (0.2 m) keeps the EVP pseudo-time relaxation rate
    vrel/(brlx*umass/dt) large enough to converge within ndte subcycles —
    the balance residual is a direct measure of subcycle convergence."""
    cfg, grid, prep, p, strength, _ = _box_setup(strength_scale=1e-12,
                                                 ndte=500, hice=0.2)
    u, v, *_ = _run(cfg, grid, prep, p, strength)
    interior = np.s_[5:-5, 5:-5]
    un = np.asarray(u)[interior]
    vn = np.asarray(v)[interior]
    aiU = np.asarray(prep.aiU)[interior]
    fm = np.asarray(prep.fm)[interior]
    fx = np.asarray(prep.forcex)[interior]
    fy = np.asarray(prep.forcey)[interior]
    vrel = aiU * cst.rhow * cst.dragio * np.sqrt(un**2 + vn**2)
    rx = fx - vrel * un + fm * vn
    ry = fy - vrel * vn - fm * un
    scale = np.abs(fx).max()
    assert np.abs(rx).max() / scale < 5e-3
    assert np.abs(ry).max() / scale < 5e-3
    # drift speed is a few % of wind speed, deflected right of the wind (NH)
    speed = np.sqrt(un**2 + vn**2)
    assert 0.05 < speed.max() < 1.0
    assert vn.mean() < 0.0  # rightward (southward) Ekman-like deflection


def test_evp_full_strength_stable():
    cfg, grid, prep, p, strength, _ = _box_setup()
    u, v, sp, sm, s12, strintx, strinty, taubx, tauby = _run(cfg, grid, prep, p, strength)
    for arr in (u, v, sp, sm, s12, strintx, strinty):
        assert np.isfinite(np.asarray(arr)).all()
    speed = np.sqrt(np.asarray(u)**2 + np.asarray(v)**2)
    assert speed.max() < 1.0  # bounded, slower than free drift somewhere
    # internal stress should oppose the wind on average over the pack
    assert np.asarray(strintx)[np.asarray(prep.iceUmask)].mean() < 0.0


def test_evp_mirror_symmetry():
    """North-south mirror symmetry: flipping the domain and the forcing's y
    components yields the mirrored solution (coriolis=zero to keep symmetry)."""
    cfg, grid, prep, p, strength, _ = _box_setup()
    cfg = cfg.with_overrides(**{"dynamics.coriolis": "zero"})
    zeros = jnp.zeros(grid.shape)
    aice = jnp.full(grid.shape, 0.9)
    vice = 2.0 * aice
    wind = jnp.full(grid.shape, 0.1)

    def solve(strairy_sign):
        prep2 = dyn_prep(grid, cfg.dynamics, cfg.setup.dt,
                         aice=aice, vice=vice, vsno=zeros,
                         aiceU_prev_mask=jnp.zeros(grid.shape, bool),
                         uvel=zeros, vvel=zeros,
                         strairxT=zeros, strairyT=strairy_sign * wind,
                         uocn_T=zeros, vocn_T=zeros,
                         ss_tltx_T=zeros, ss_tlty_T=zeros)
        return _run(cfg, grid, prep2, p, ice_strength_hibler(aice, vice))

    up, vp, *_ = solve(+1.0)
    um, vm, *_ = solve(-1.0)
    # u even, v odd under y-reflection; U points j -> ny-2-j (corner grid)
    un_p = np.asarray(up)[:-1][::-1]
    vn_p = np.asarray(vp)[:-1][::-1]
    np.testing.assert_allclose(np.asarray(um)[:-1], un_p, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm)[:-1], -vn_p, atol=1e-6)


def test_ocean_stress_finite():
    cfg, grid, prep, p, strength, _ = _box_setup()
    u, v, *_ = _run(cfg, grid, prep, p, strength)
    zeros = jnp.zeros(grid.shape)
    sx, sy = evp_ocean_stress(prep, u, v, zeros, zeros)
    assert np.isfinite(np.asarray(sx)).all()
    # eastward drift drags the ocean eastward -> ice feels westward: strocnx<0
    assert np.asarray(sx)[np.asarray(prep.iceUmask)].mean() < 0.0
