"""Grid-file ingestion: POP binary / netCDF grids + kmt masks.

Equivalent of the file paths of cicecore/cicedyn/infrastructure/ice_grid.F90:
`popgrid`:1000 (big-endian direct-access binary: ULAT, ULON, HTN, HTE,
HUS, HUW, ANGLE records; kmt from a separate binary), `popgrid_nc`:1077
(netCDF with ulat/ulon/htn/hte/angle/kmt variables), used for the gx3/gx1
displaced-pole and tx1 tripole production grids.

Host-side numpy IO; the resulting Grid is device-ready via
core.grid.from_arrays (metric derivation, masks, halo BC).
"""

from __future__ import annotations

import numpy as np

from ..core.grid import BC, Grid, from_arrays

CM_TO_M = 0.01


def read_pop_grid_binary(path: str, nx: int, ny: int):
    """POP binary grid: consecutive big-endian float64 (ny, nx) records
    ULAT, ULON (radians), HTN, HTE, HUS, HUW (cm), ANGLE (radians)
    (reference popgrid ice_grid.F90:1000)."""
    rec = ny * nx
    raw = np.fromfile(path, ">f8")
    names = ["ULAT", "ULON", "HTN", "HTE", "HUS", "HUW", "ANGLE"]
    out = {}
    for k, name in enumerate(names):
        if (k + 1) * rec <= raw.size:
            out[name] = raw[k * rec:(k + 1) * rec].reshape(ny, nx)
    return out


def read_kmt_binary(path: str, nx: int, ny: int) -> np.ndarray:
    """kmt (ocean depth-level count) as big-endian int32 or float64
    (reference ice_read_global int variants)."""
    raw = np.fromfile(path, ">i4")
    if raw.size == ny * nx:
        return raw.reshape(ny, nx).astype(np.float64)
    raw = np.fromfile(path, ">f8")
    return raw[:ny * nx].reshape(ny, nx)


def read_pop_grid_nc(path: str):
    """POP netCDF3 grid file (reference popgrid_nc ice_grid.F90:1077)."""
    from scipy.io import netcdf_file
    out = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for key, names in dict(
                ULAT=("ulat", "ULAT"), ULON=("ulon", "ULON"),
                HTN=("htn", "HTN"), HTE=("hte", "HTE"),
                ANGLE=("angle", "ANGLE"), kmt=("kmt", "KMT")).items():
            for n in names:
                if n in f.variables:
                    out[key] = np.array(f.variables[n][:], np.float64)
                    break
    return out


def load_grid_files(cfg, dtype=None) -> Grid:
    """Build a Grid from grid_file (+ kmt_file) per grid_format
    ('pop_bin' | 'pop_nc'); boundary conditions from
    ew/ns_boundary_type (tripole grids: ns_boundary_type='tripole')."""
    g = cfg.grid
    nx, ny = g.nx_global, g.ny_global
    bc = BC(ew=g.ew_boundary_type, ns=g.ns_boundary_type)
    if g.grid_format in ("pop_nc", "nc"):
        d = read_pop_grid_nc(g.grid_file)
    else:
        d = read_pop_grid_binary(g.grid_file, nx, ny)
    kmt = d.get("kmt")
    if kmt is None:
        if not g.kmt_file:
            kmt = np.ones((ny, nx))
        else:
            kmt = read_kmt_binary(g.kmt_file, nx, ny)
    # HTN/HTE arrive in cm from POP files (reference scales by cm_to_m)
    htn = d["HTN"] * CM_TO_M
    hte = d["HTE"] * CM_TO_M
    return from_arrays(d["ULAT"], d["ULON"], htn, hte, kmt, bc,
                       angle=d.get("ANGLE"),
                       dtype=dtype if dtype is not None else cfg.np_dtype)
