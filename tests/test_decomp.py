"""Decomposition utilities: space-filling curves + distributions.

Oracle style follows the reference's property checks: a space-filling curve
must visit every block exactly once with unit steps (ice_spacecurve.F90),
distributions must cover all active blocks and balance work
(ice_distribution.F90), land blocks are eliminated (ice_domain.F90:457).
"""

import numpy as np
import pytest

from cice_tpu.parallel.decomp import (
    auto_decomp, create_distribution, distribution_stats, gilbert2d,
    hilbert2d, spacecurve, spacecurve_device_order, work_per_block)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (4, 4), (8, 8), (3, 3),
                                 (5, 5), (6, 9), (7, 11), (12, 20), (40, 48),
                                 (1, 7), (9, 1), (13, 2)])
def test_gilbert_is_unit_step_permutation(w, h):
    pts = gilbert2d(w, h)
    assert pts.shape == (w * h, 2)
    # every cell exactly once
    lin = pts[:, 1] * w + pts[:, 0]
    assert len(np.unique(lin)) == w * h
    assert pts[:, 0].min() == 0 and pts[:, 0].max() == w - 1
    assert pts[:, 1].min() == 0 and pts[:, 1].max() == h - 1
    # consecutive cells are 4-neighbors (the defining curve property);
    # odd-long x even-short rectangles admit exactly one diagonal step
    # (bipartite parity — see gilbert2d docstring)
    d = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    steps = np.abs(np.diff(pts, axis=0))
    diag = (steps == 1).all(axis=1)
    parity_exc = (max(w, h) % 2 == 1) and (min(w, h) % 2 == 0) and min(w, h) > 1
    if parity_exc:
        assert ((d == 1) | diag).all() and diag.sum() <= 1
    else:
        assert (d == 1).all()


def test_hilbert_special_case():
    pts = hilbert2d(3)          # 8x8
    assert pts.shape == (64, 2)
    d = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (d == 1).all()


def test_spacecurve_rank_grid():
    rank = spacecurve(6, 5)
    assert rank.shape == (5, 6)
    assert sorted(rank.ravel().tolist()) == list(range(30))


@pytest.mark.parametrize("method", ["cartesian", "roundrobin", "sectcart",
                                    "sectrobin", "spiralcenter", "rake",
                                    "spacecurve", "wghtfile"])
def test_distribution_covers_and_balances(method):
    nbx, nby, nprocs = 8, 6, 4
    rng = np.random.RandomState(0)
    work = 0.5 + rng.rand(nby, nbx)
    dist = create_distribution(nbx, nby, nprocs, method, work=work)
    assert dist.shape == (nby, nbx)
    assert dist.min() >= 0 and dist.max() < nprocs
    # every proc gets at least one block at this blocks/proc ratio
    assert len(np.unique(dist)) == nprocs
    st = distribution_stats(dist, work)
    assert st["active_blocks"] == nbx * nby
    # work-aware contiguous methods balance within 60% of mean
    if method in ("rake", "wghtfile", "spacecurve", "spiralcenter"):
        assert st["imbalance"] < 0.6


def test_land_block_elimination():
    nbx, nby = 6, 4
    kmt = np.ones((40, 60))
    kmt[:20, :30] = 0.0          # SW quadrant is land
    work = work_per_block(nbx, nby, "block", kmt=kmt)
    dist = create_distribution(nbx, nby, 3, "spacecurve", work=work)
    assert (dist[:2, :3] == -1).all()          # land blocks dropped
    assert (dist[2:, :] >= 0).all()
    st = distribution_stats(dist, work)
    assert st["eliminated_blocks"] == 6


def test_latitude_weighting():
    lat = np.linspace(-80, 80, 32)[:, None] * np.ones((1, 16))
    w = work_per_block(4, 4, "latitude", lat_t=lat)
    assert w.shape == (4, 4)
    assert w[0].mean() > w[1].mean()       # poleward rows heavier


def test_auto_decomp():
    (py, px), (ty, tx) = auto_decomp(320, 384, 8)
    assert py * px == 8
    assert ty * py >= 384 and tx * px >= 320
    (py1, px1), _ = auto_decomp(256, 256, 1)
    assert (py1, px1) == (1, 1)


def test_spacecurve_device_order():
    order = spacecurve_device_order(4, 4)
    assert sorted(order.tolist()) == list(range(16))
