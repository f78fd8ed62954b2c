"""Exhaustive grid_average_X2Y checks — the gridavgchk unit test analogue
(drivers/unittest/gridavgchk/gridavgchk.F90): every src->dst pair for the
'S'/'A'/'F' semantics (ice_grid.F90:4159/4388/4616) on a cyclic rectgrid.

Properties (matching the reference driver's expectations):
- 'S' and 'A' map a constant field to the same constant (weighted averages
  of a constant are the constant) on all-ocean grids;
- 'A' of a linear-in-x field on a uniform grid lands on the destination
  point's x coordinate (2nd-order accuracy of the 2/4-point average);
- 'F' conserves the global area integral: sum(dst*area_dst) == sum(src*area_src).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.core.grid import grid_average_X2Y, rectgrid

PAIRS = [("T", "U"), ("U", "T"), ("T", "E"), ("E", "T"), ("T", "N"),
         ("N", "T"), ("E", "U"), ("N", "U"), ("E", "N"), ("N", "E"),
         ("U", "E"), ("U", "N")]


@pytest.fixture(scope="module")
def grid():
    return rectgrid(16, 16, kmt_type="none", dtype=jnp.float64)


@pytest.mark.parametrize("src,dst", PAIRS)
@pytest.mark.parametrize("kind", ["S", "A"])
def test_constant_preserved(grid, src, dst, kind):
    w = jnp.full(grid.shape, 3.25, jnp.float64)
    out = np.asarray(grid_average_X2Y(kind, w, src, dst, grid))
    # masked 'S' averages return 0 where the source mask empties the stencil
    # (ns-boundary rows of face/corner masks); every valid point must be the
    # constant, and ALL interior points must be valid
    valid = out != 0.0
    np.testing.assert_allclose(out[valid], 3.25, rtol=1e-13)
    assert valid[2:-2, :].all()


@pytest.mark.parametrize("src,dst", PAIRS)
def test_flux_conserves_integral(grid, src, dst):
    rng = np.random.RandomState(hash((src, dst)) % 2**31)
    w = rng.rand(*grid.shape)
    w[:2] = 0.0          # the ns boundary is 'open' (flux leaves the domain)
    w[-2:] = 0.0         # — zero edge rows make conservation exact
    w = jnp.asarray(w)
    out = grid_average_X2Y("F", w, src, dst, grid)
    a_src = np.asarray(getattr(grid, {"T": "tarea", "U": "uarea",
                                      "E": "earea", "N": "narea"}[src]))
    a_dst = np.asarray(getattr(grid, {"T": "tarea", "U": "uarea",
                                      "E": "earea", "N": "narea"}[dst]))
    tot_src = (np.asarray(w) * a_src).sum()
    tot_dst = (np.asarray(out) * a_dst).sum()
    np.testing.assert_allclose(tot_dst, tot_src, rtol=1e-12)


def test_linear_in_x_second_order(grid):
    """T->E average of f(x)=x lands exactly on the E-point x (midpoint of
    the two surrounding T columns) under cyclic wrap — interior columns."""
    nx = grid.shape[1]
    x = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64), grid.shape)
    out = np.asarray(grid_average_X2Y("A", x, "T", "E", grid))
    # E point between T columns i and i+1 -> i + 0.5 (skip the wrap column)
    expect = np.arange(nx) + 0.5
    np.testing.assert_allclose(out[:, :-1], np.broadcast_to(expect[:-1],
                                                            (grid.shape[0],
                                                             nx - 1)),
                               rtol=1e-13)


def test_identity_same_grid(grid):
    w = jnp.asarray(np.random.RandomState(0).rand(*grid.shape))
    out = grid_average_X2Y("S", w, "T", "T", grid)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
