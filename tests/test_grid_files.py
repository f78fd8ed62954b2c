"""Grid-file ingestion tests: POP binary / netCDF round trips."""

import numpy as np

from cice_tpu.config import Config
from cice_tpu.core.grid import latlon_grid, make_grid
from cice_tpu.io.grids import (read_kmt_binary, read_pop_grid_binary,
                               read_pop_grid_nc)

NY, NX = 20, 24


def _reference_arrays():
    """Primary arrays of a small spherical grid, in POP file conventions
    (ULAT/ULON radians, HTN/HTE cm)."""
    g = latlon_grid(NX, NY)
    ULAT = np.asarray(g.ULAT, np.float64)
    ULON = np.asarray(g.ULON, np.float64)
    HTN = np.asarray(g.HTN, np.float64) / 0.01
    HTE = np.asarray(g.HTE, np.float64) / 0.01
    return g, ULAT, ULON, HTN, HTE


def test_pop_binary_round_trip(tmp_path):
    g0, ULAT, ULON, HTN, HTE = _reference_arrays()
    path = str(tmp_path / "grid_gx.bin")
    with open(path, "wb") as f:
        for arr in (ULAT, ULON, HTN, HTE, HTN, HTE,
                    np.zeros_like(ULAT)):
            f.write(arr.astype(">f8").tobytes())
    kmt = np.ones((NY, NX), np.int32)
    kmt[0] = 0
    kmt[-1] = 0
    kpath = str(tmp_path / "kmt.bin")
    kmt.astype(">i4").tofile(kpath)

    d = read_pop_grid_binary(path, NX, NY)
    np.testing.assert_allclose(d["ULAT"], ULAT)
    np.testing.assert_allclose(d["HTN"], HTN)
    k = read_kmt_binary(kpath, NX, NY)
    assert k[0, 0] == 0 and k[5, 5] == 1

    cfg = Config().with_overrides(**{
        "grid.nx_global": NX, "grid.ny_global": NY,
        "grid.grid_format": "pop_bin", "grid.grid_file": path,
        "grid.kmt_file": kpath})
    g = make_grid(cfg)
    np.testing.assert_allclose(np.asarray(g.tarea),
                               np.asarray(g0.tarea), rtol=1e-5)
    assert not bool(np.asarray(g.hm)[0].any())       # land row respected
    assert bool(np.asarray(g.hm)[5].all())


def test_pop_netcdf_round_trip(tmp_path):
    from scipy.io import netcdf_file
    g0, ULAT, ULON, HTN, HTE = _reference_arrays()
    path = str(tmp_path / "grid_gx.nc")
    kmt = np.ones((NY, NX))
    kmt[:2] = 0
    with netcdf_file(path, "w") as f:
        f.createDimension("ny", NY)
        f.createDimension("nx", NX)
        for name, arr in [("ulat", ULAT), ("ulon", ULON), ("htn", HTN),
                          ("hte", HTE), ("kmt", kmt),
                          ("angle", np.zeros_like(ULAT))]:
            v = f.createVariable(name, "d", ("ny", "nx"))
            v[:] = arr
    d = read_pop_grid_nc(path)
    np.testing.assert_allclose(d["ULAT"], ULAT)
    assert "kmt" in d

    cfg = Config().with_overrides(**{
        "grid.nx_global": NX, "grid.ny_global": NY,
        "grid.grid_format": "pop_nc", "grid.grid_file": path})
    g = make_grid(cfg)
    assert not bool(np.asarray(g.hm)[0:2].any())
    np.testing.assert_allclose(np.asarray(g.dxT), np.asarray(g0.dxT),
                               rtol=1e-5)


def test_tripole_bc_from_config(tmp_path):
    """A tripole ns_boundary_type propagates into the grid halo BC."""
    g0, ULAT, ULON, HTN, HTE = _reference_arrays()
    path = str(tmp_path / "grid_tx.bin")
    with open(path, "wb") as f:
        for arr in (ULAT, ULON, HTN, HTE):
            f.write(arr.astype(">f8").tobytes())
    cfg = Config().with_overrides(**{
        "grid.nx_global": NX, "grid.ny_global": NY,
        "grid.grid_format": "pop_bin", "grid.grid_file": path,
        "grid.ew_boundary_type": "cyclic",
        "grid.ns_boundary_type": "tripole"})
    g = make_grid(cfg)
    assert g.bc.ns == "tripole"
