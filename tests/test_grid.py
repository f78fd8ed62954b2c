"""Grid construction and grid_average_X2Y tests
(oracles: reference unittests `gridavgchk`, `halochk` semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.core.grid import rectgrid, latlon_grid, grid_average_X2Y
from cice_tpu.core.halo import BC, shift
from cice_tpu import constants as cst


@pytest.fixture(scope="module")
def box():
    return rectgrid(16, 12, 16.0e5, 16.0e5, kmt_type="default",
                    bc=BC(ew="cyclic", ns="open"), dtype=jnp.float64)


def test_rect_metrics_uniform(box):
    g = box
    dx = 16.0e3
    assert np.allclose(g.dxT, dx)
    assert np.allclose(g.dyT, dx)
    assert np.allclose(g.tarea, dx * dx)
    assert np.allclose(g.uarea, dx * dx)
    assert np.allclose(g.dxhy, 0.0)
    assert np.allclose(g.dyhx, 0.0)
    assert np.allclose(g.cyp, dx)
    assert np.allclose(g.cxm, -dx)  # cxm = -(1.5*HTN_s - 0.5*HTN) is negative


def test_rect_masks(box):
    g = box
    hm = np.asarray(g.hm)
    uvm = np.asarray(g.uvm)
    # umask is min of 4 surrounding T masks
    for j in range(11):
        for i in range(16):
            ip1 = (i + 1) % 16
            expect = min(hm[j, i], hm[j, ip1], hm[j + 1, i], hm[j + 1, ip1])
            assert uvm[j, i] == expect, (j, i)


def test_shift_cyclic_x():
    f = jnp.arange(12.0).reshape(3, 4)
    bc = BC(ew="cyclic", ns="open")
    e = shift(f, di=1, bc=bc)
    assert np.allclose(np.asarray(e)[:, -1], np.asarray(f)[:, 0])
    n = shift(f, dj=1, bc=bc)
    assert np.allclose(np.asarray(n)[-1, :], 0.0)  # open: zero ghost
    assert np.allclose(np.asarray(n)[0, :], np.asarray(f)[1, :])


def test_latlon_areas_sum_to_band(box):
    g = latlon_grid(36, 24, lat_min=-80.0, lat_max=80.0, dtype=jnp.float64)
    # total ocean area should be близко the spherical band area (minus polar rows)
    band = 2.0 * np.pi * cst.radius ** 2 * (np.sin(np.deg2rad(80.0)) -
                                            np.sin(np.deg2rad(-80.0)))
    total = float(jnp.sum(g.tarea))
    assert abs(total - band) / band < 0.1


def test_grid_average_T2U_conserves_uniform(box):
    g = box
    f = jnp.ones_like(g.hm)
    u = grid_average_X2Y("A", f, "T", "U", g)
    assert np.allclose(np.asarray(u), 1.0)
    s = grid_average_X2Y("S", f, "T", "U", g)
    # masked average of a constant is the constant where any source is ocean
    wet = np.asarray(sum(shift(g.hm * g.tarea, dj, di, bc=g.bc)
                         for dj, di in [(0, 0), (0, 1), (1, 0), (1, 1)])) > 0
    assert np.allclose(np.asarray(s)[wet], 1.0)


def test_grid_average_F_conserves_total(box):
    g = box
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(12, 16))
    u = grid_average_X2Y("F", f, "T", "U", g)
    # 'F' conserves area-integrated flux on a uniform cyclic-x grid interior
    tot_t = float(jnp.sum(f * g.tarea))
    tot_u = float(jnp.sum(u * g.uarea))
    # boundary rows are not conservative (open ns edge) — compare loosely
    assert abs(tot_u - tot_t) / tot_t < 0.15


def test_roundtrip_T2U2T_identity_for_constant(box):
    g = box
    f = jnp.full_like(g.hm, 3.0)
    u = grid_average_X2Y("A", f, "T", "U", g)
    t = grid_average_X2Y("A", u, "U", "T", g)
    assert np.allclose(np.asarray(t), 3.0)
