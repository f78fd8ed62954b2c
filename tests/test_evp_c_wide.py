"""C-grid wide-halo shard_map EVP vs the GSPMD fori_loop solver.

Same decomposition-invariance oracle as tests/test_evp_wide.py, for the
C-grid solver (BASELINE.json config 5 targets C-grid EVP scaling). The
C-grid subcycle has a deeper dependency cone (velocity averages + two
viscosity averages + stress divergence, C_RADIUS rings per subcycle);
these tests pin the radius at several fuse factors — an underestimate
would show up as interior divergence at larger k.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.core.halo import BC
from cice_tpu.dynamics.common import evp_params, ice_strength_hibler
from cice_tpu.dynamics.evp_c import dyn_prep_c, evp_c_solve
from cice_tpu.parallel.evp_wide import evp_c_solve_wide
from cice_tpu.parallel.mesh import make_mesh


def _problem(nx, ny, bc, ndte, seed=0):
    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "dynamics.ndte": ndte, "dynamics.coriolis": "latitude"})
    grid = rectgrid(nx, ny, kmt_type="none", bc=bc, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    f = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, (ny, nx)), jnp.float32)
    aice = jnp.clip(f(0.0, 1.2), 0.0, 1.0)
    vice = aice * f(0.5, 3.0)
    z = jnp.zeros((ny, nx), jnp.float32)
    prep = dyn_prep_c(grid, cfg.dynamics, cfg.setup.dt, aice=aice,
                      vice=vice, vsno=0.1 * vice, uvelE=f(-0.1, 0.1),
                      vvelN=f(-0.1, 0.1), strairxT=f(-0.2, 0.2),
                      strairyT=f(-0.2, 0.2), uocn_T=f(-0.05, 0.05),
                      vocn_T=f(-0.05, 0.05))
    p = evp_params(cfg.dynamics, cfg.setup.dt)
    strength = ice_strength_hibler(aice, vice)
    spT = jnp.asarray(rng.uniform(-100, 100, (ny, nx)), jnp.float32)
    smT = jnp.asarray(rng.uniform(-100, 100, (ny, nx)), jnp.float32)
    s12U = jnp.asarray(rng.uniform(-50, 50, (ny, nx)), jnp.float32)
    return grid, p, prep, strength, spT, smT, s12U


def _compare(bc, ndte, k_fuse, mesh_shape=(2, 2), nx=64, ny=64):
    grid, p, prep, strength, spT, smT, s12U = _problem(nx, ny, bc, ndte)
    ref = jax.jit(lambda: evp_c_solve(grid, p, prep, strength, spT, smT,
                                      s12U))()
    mesh = make_mesh(mesh_shape, devices=jax.devices()[:np.prod(mesh_shape)])
    got = jax.jit(lambda: evp_c_solve_wide(grid, p, prep, strength, spT,
                                           smT, s12U, mesh=mesh,
                                           k_fuse=k_fuse))()
    for name in ("uvelE", "vvelN", "stresspT", "stressmT", "stress12U"):
        a = np.asarray(getattr(ref[0], name))
        b = np.asarray(getattr(got[0], name))
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * scale,
                                   err_msg=name)
    for name, a, b in (("uvelU", ref[1], got[1]), ("vvelU", ref[2], got[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5, err_msg=name)


def test_c_wide_cyclic_remainder(devices8):
    # ndte=7, k=3: two full chunks + remainder 1; H = 6*3 = 18 < tile 32
    _compare(BC(ew="cyclic", ns="open"), ndte=7, k_fuse=3)


def test_c_wide_open_closed(devices8):
    _compare(BC(ew="open", ns="closed"), ndte=4, k_fuse=4)


def test_c_wide_k1_vs_k4(devices8):
    """k=1 (exchange every subcycle, trivially safe) and k=4 (deep cone)
    must agree — pins C_RADIUS adequacy."""
    grid, p, prep, strength, spT, smT, s12U = _problem(
        64, 64, BC(ew="cyclic", ns="open"), ndte=8)
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    outs = [jax.jit(lambda k=k: evp_c_solve_wide(
        grid, p, prep, strength, spT, smT, s12U, mesh=mesh, k_fuse=k))()
        for k in (1, 4)]
    for name in ("uvelE", "vvelN"):
        a = np.asarray(getattr(outs[0][0], name))
        b = np.asarray(getattr(outs[1][0], name))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6, err_msg=name)
