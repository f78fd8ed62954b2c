"""Melt pond scheme tests (tr_pond_lvl / tr_pond_topo behavior).

Oracle strategy follows the reference's physical-invariant style: ponds
grow under surface melt, shrink/refreeze when cold, stay bounded by the
level-ice fraction and ice thickness, and vanish on open water.
"""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.columns.ponds import compute_ponds_lvl, compute_ponds_topo, step_ponds

SHAPE = (5, 4, 4)  # (ncat, ny, nx)


def _fields(aicen=0.8, hi=1.0, hs=0.0):
    a = jnp.full(SHAPE, aicen)
    return dict(aicen=a, vicen=a * hi, vsnon=a * hs)


def test_ponds_grow_under_melt_and_cap():
    cfg = Config()
    f = _fields()
    out = compute_ponds_lvl(
        cfg.ponds, 3600.0, alvl=jnp.full(SHAPE, 0.9),
        apnd=jnp.zeros(SHAPE), hpnd=jnp.zeros(SHAPE), ipnd=jnp.zeros(SHAPE),
        Tsf=jnp.zeros(SHAPE), meltt=jnp.full(SHAPE, 0.02),
        melts=jnp.zeros(SHAPE), frain=jnp.zeros(SHAPE[1:]),
        aice=jnp.full(SHAPE[1:], 0.9), **f)
    assert np.all(np.asarray(out.apnd) > 0.0)
    assert np.all(np.asarray(out.hpnd) > 0.0)
    # geometry contract hpnd = pndaspect * apnd (away from the depth cap)
    np.testing.assert_allclose(np.asarray(out.hpnd),
                               cfg.ponds.pndaspect * np.asarray(out.apnd),
                               rtol=1e-5)
    assert np.all(np.asarray(out.apnd) <= 1.0)


def test_ponds_refreeze_cold_surface():
    cfg = Config()
    f = _fields()
    kw = dict(alvl=jnp.full(SHAPE, 0.9), apnd=jnp.full(SHAPE, 0.4),
              hpnd=jnp.full(SHAPE, 0.32), ipnd=jnp.zeros(SHAPE),
              meltt=jnp.zeros(SHAPE), melts=jnp.zeros(SHAPE),
              frain=jnp.zeros(SHAPE[1:]), aice=jnp.full(SHAPE[1:], 0.9), **f)
    warm = compute_ponds_lvl(cfg.ponds, 86400.0, Tsf=jnp.zeros(SHAPE), **kw)
    cold = compute_ponds_lvl(cfg.ponds, 86400.0, Tsf=jnp.full(SHAPE, -20.0), **kw)
    assert np.all(np.asarray(cold.apnd) < np.asarray(warm.apnd) + 1e-12)
    # hlid variant grows a lid when cold
    cfgh = cfg.replace(ponds=cfg.ponds.replace(frzpnd="hlid"))
    lid = compute_ponds_lvl(cfgh.ponds, 86400.0, Tsf=jnp.full(SHAPE, -20.0), **kw)
    assert np.all(np.asarray(lid.ipnd) > 0.0)


def test_ponds_zero_without_ice():
    cfg = Config()
    f = _fields(aicen=0.0, hi=0.0)
    out = compute_ponds_lvl(
        cfg.ponds, 3600.0, alvl=jnp.zeros(SHAPE),
        apnd=jnp.full(SHAPE, 0.5), hpnd=jnp.full(SHAPE, 0.4),
        ipnd=jnp.zeros(SHAPE), Tsf=jnp.zeros(SHAPE),
        meltt=jnp.full(SHAPE, 0.02), melts=jnp.zeros(SHAPE),
        frain=jnp.zeros(SHAPE[1:]), aice=jnp.zeros(SHAPE[1:]), **f)
    assert np.all(np.asarray(out.apnd) == 0.0)
    assert np.all(np.asarray(out.hpnd) == 0.0)


def test_ponds_depth_capped_by_thin_ice():
    cfg = Config()
    f = _fields(hi=0.1)  # 10 cm ice: depth cap 9 cm
    out = compute_ponds_lvl(
        cfg.ponds, 3600.0, alvl=jnp.full(SHAPE, 1.0),
        apnd=jnp.full(SHAPE, 0.9), hpnd=jnp.full(SHAPE, 0.7),
        ipnd=jnp.zeros(SHAPE), Tsf=jnp.zeros(SHAPE),
        meltt=jnp.zeros(SHAPE), melts=jnp.zeros(SHAPE),
        frain=jnp.zeros(SHAPE[1:]), aice=jnp.full(SHAPE[1:], 0.9), **f)
    assert np.all(np.asarray(out.hpnd) <= 0.09 + 1e-9)


def test_topo_ponds_drain_above_freeboard():
    cfg = Config()
    f = _fields(hi=0.5, hs=0.4)  # heavy snow load -> small freeboard
    out = compute_ponds_topo(
        cfg.ponds, 3600.0, apnd=jnp.full(SHAPE, 0.8),
        hpnd=jnp.full(SHAPE, 0.6), ipnd=jnp.zeros(SHAPE),
        Tsf=jnp.zeros(SHAPE), meltt=jnp.zeros(SHAPE), melts=jnp.zeros(SHAPE),
        frain=jnp.zeros(SHAPE[1:]), aice=jnp.full(SHAPE[1:], 0.9), **f)
    assert np.all(np.asarray(out.dpnd_flush) > 0.0)
    assert np.all(np.asarray(out.hpnd) < 0.6)


def test_step_ponds_dispatch_updates_tracers():
    cfg = Config()
    f = _fields()
    trcrn = {"apnd": jnp.zeros(SHAPE), "hpnd": jnp.zeros(SHAPE),
             "ipnd": jnp.zeros(SHAPE), "alvl": jnp.full(SHAPE, 0.9)}
    out, apeff, flush = step_ponds(
        cfg, 3600.0, trcrn=trcrn, Tsf=jnp.zeros(SHAPE),
        meltt=jnp.full(SHAPE, 0.02), melts=jnp.zeros(SHAPE),
        frain=jnp.zeros(SHAPE[1:]), aice=jnp.full(SHAPE[1:], 0.9), **f)
    assert np.all(np.asarray(out["apnd"]) > 0.0)
    assert np.all(np.asarray(apeff) >= 0.0)
    # snow-covered ponds are hidden from radiation
    f2 = _fields(hs=0.5)
    _, apeff2, _ = step_ponds(
        cfg, 3600.0, trcrn=trcrn, Tsf=jnp.zeros(SHAPE),
        meltt=jnp.full(SHAPE, 0.02), melts=jnp.zeros(SHAPE),
        frain=jnp.zeros(SHAPE[1:]), aice=jnp.full(SHAPE[1:], 0.9), **f2)
    assert np.all(np.asarray(apeff2) == 0.0)
