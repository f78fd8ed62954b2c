"""Format-true BASELINE fixture machinery (io.fixtures) at miniature size.

Covers the same code path as the production gx3/gx1/tx1 fixtures — POP
binary writer -> io.grids reader -> core.grid metric derivation -> coupled
stepping with file forcing (NCAR npz / JRA55 nc / ocean clim npz) — on
grids small enough for fast CI. Reference formats: popgrid
ice_grid.F90:1000 (grid records), ncar_data/JRA55_data
ice_forcing.F90:2023-2305 (forcing containers).
"""

import os

import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.core.grid import make_grid
from cice_tpu.io import fixtures as fx


NX, NY = 36, 40


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("fix")
    arrs = fx.make_displaced_pole_arrays(NX, NY)
    gpath = os.path.join(root, "grid.bin")
    kpath = os.path.join(root, "kmt.bin")
    fx.write_pop_grid_binary(gpath, arrs)
    fx.write_kmt_binary(kpath, arrs["kmt"])
    TLATd = np.rad2deg(arrs["TLAT"])
    TLONd = np.rad2deg(arrs["TLON"])
    fdir = os.path.join(root, "forcing")
    fx.write_ncar_npz(fdir, TLATd, TLONd)
    fx.write_jra55_nc(fdir, TLATd, TLONd, nrec=56)
    fx.write_ocean_clim_npz(fdir, TLATd, TLONd)
    return dict(root=root, grid=gpath, kmt=kpath, forcing=fdir, arrs=arrs)


def _cfg(mini, **extra):
    ov = {"grid.nx_global": NX, "grid.ny_global": NY,
          "grid.grid_format": "pop_bin", "grid.grid_file": mini["grid"],
          "grid.kmt_file": mini["kmt"], "grid.ew_boundary_type": "cyclic",
          "forcing.atm_data_type": "ncar",
          "forcing.atm_data_dir": mini["forcing"],
          "forcing.ocn_data_type": "clim",
          "forcing.ocn_data_dir": mini["forcing"],
          "dynamics.ndte": 20}
    ov.update(extra)
    return Config().with_overrides(**ov)


def test_pop_binary_roundtrip(mini):
    """The writer/reader pair is the identity on the primary records."""
    from cice_tpu.io.grids import read_pop_grid_binary, read_kmt_binary
    d = read_pop_grid_binary(mini["grid"], NX, NY)
    a = mini["arrs"]
    np.testing.assert_allclose(d["ULAT"], a["ULAT"], rtol=0, atol=0)
    np.testing.assert_allclose(d["HTN"], a["HTN"] * 100.0, rtol=1e-12)
    np.testing.assert_allclose(d["ANGLE"], a["ANGLE"], rtol=0, atol=0)
    kmt = read_kmt_binary(mini["kmt"], NX, NY)
    assert set(np.unique(kmt)) <= {0.0, 40.0}
    assert (kmt > 0).any() and (kmt == 0).any()


def test_displaced_pole_geometry(mini):
    """Pole is displaced into land; metrics positive and consistent."""
    a = mini["arrs"]
    # the row closest to the rotated pole must be entirely on land
    assert a["kmt"][-1].max() == 0.0
    assert (a["HTN"] > 0).all() and (a["HTE"] > 0).all()
    # no grid point reaches the geographic pole singularity in ocean rows:
    # the maximum ULAT over ocean-adjacent rows stays < 90 deg
    assert np.rad2deg(a["ULAT"]).max() <= 90.0 + 1e-9
    # ANGLE deviates from zero somewhere (it's a rotated grid)...
    assert np.abs(a["ANGLE"]).max() > 0.1
    # ...but stays zero-mean-ish along the equatorial rows (antisymmetric
    # displacement field)
    g = make_grid(_cfg(mini))
    assert float(g.tarea.min()) > 0.0


def test_tripole_fixture_fold_symmetry():
    a = fx.make_tripole_arrays(24, 20)
    # U-fold requires the top-row metrics to be mirror-symmetric in i
    np.testing.assert_allclose(a["HTN"][-1], a["HTN"][-1][::-1], rtol=1e-12)
    np.testing.assert_allclose(a["ULAT"][-1], a["ULAT"][-1][::-1], rtol=0,
                               atol=0)
    # seam-consistent land mask
    np.testing.assert_array_equal(a["kmt"][-1], a["kmt"][-1][::-1])


def test_ncar_file_forcing_step(mini):
    """Two coupled steps driven by NCAR npz + ocean clim files."""
    from cice_tpu.model.driver import Model
    m = Model(_cfg(mini))
    m.step()
    m.step()
    assert np.isfinite(np.asarray(m.state.vice)).all()
    assert float(m.forcing.wind.max()) > 0.0          # file winds arrived
    assert float(m.forcing.sss.std()) > 0.0           # clim ocean arrived


def test_jra55_file_forcing_step(mini):
    """JRA55 netCDF path (3-hourly records, day_init=2 avoids pre-file
    reads) drives a coupled step; record interpolation is exercised."""
    from cice_tpu.model.driver import Model
    cfg = _cfg(mini, **{"forcing.atm_data_type": "jra55",
                        "setup.day_init": 2})
    m = Model(cfg)
    m.step()
    m.step()
    assert np.isfinite(np.asarray(m.state.vice)).all()
    assert float(m.forcing.flw.max()) > 100.0         # dlwsfc read (W/m2)


def test_wind_rotation_preserves_speed(mini):
    """geo->grid rotation through ANGLET is orthogonal: |wind| unchanged,
    and on a rotated grid the components genuinely change."""
    import jax.numpy as jnp
    from cice_tpu.model.forcing import (get_forcing, prepare_forcing,
                                        zeros_forcing, default_ocn)
    cfg = _cfg(mini)
    g = make_grid(cfg)
    fc0 = default_ocn(g, cfg, zeros_forcing(g.shape, cfg.np_dtype))
    raw = {"Tair": np.full(g.shape, 260.0), "uatm": np.full(g.shape, 7.0),
           "vatm": np.full(g.shape, 1.0)}
    fc = prepare_forcing(g, cfg, raw, fc0, yday=10.0)
    sp = np.hypot(np.asarray(fc.uatm), np.asarray(fc.vatm))
    np.testing.assert_allclose(sp, np.hypot(7.0, 1.0), rtol=1e-5)
    assert float(jnp.abs(fc.uatm - 7.0).max()) > 0.1   # rotation acted
    cfg_off = _cfg(mini, **{"forcing.rotate_wind": False})
    fc2 = prepare_forcing(g, cfg_off, raw, fc0, yday=10.0)
    np.testing.assert_allclose(np.asarray(fc2.uatm), 7.0, rtol=1e-6)
