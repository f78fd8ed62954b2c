"""Format-true BASELINE grid/forcing fixtures (gx3, gx1, tx1).

The reference's production grids (gx3/gx1 displaced-pole, tx1 tripole) ship
as external POP-format binaries downloaded by `cice.setup`; they are not in
the repository. This module synthesizes *format-true* stand-ins — same byte
layout, record order, units and staggering as the files `popgrid`
(ice_grid.F90:1000) reads — so the whole file path (io.grids readers →
core.grid metric derivation → coupled stepping) is exercised end-to-end at
the real production sizes (BASELINE.json configs 1-5).

Grid construction
-----------------
* gx3/gx1: a true displaced-pole grid built by a rotated-pole mapping: index
  space is a regular (rotated-lat, rotated-lon) lattice whose north pole maps
  to Greenland (75N, 318E) — the same reason the real gx grids displace their
  pole (no coordinate singularity in the Arctic ocean). All metrics
  (HTN/HTE great-circle edge lengths, ANGLE from the local grid-x direction)
  are computed from the mapped corner lattice, so they are exactly consistent
  with the coordinates, as in a real curvilinear grid file.
* tx1: mirror-symmetric tripole stand-in — spherical metrics (dx a function
  of j only satisfies the U-fold symmetry HTN[j_top, i] == HTN[j_top, nx-1-i])
  with the northern U row at the fold; ns_boundary_type='tripole'.
* land mask: continents evaluated at true TLAT/TLON (core.landmask), so
  coastlines land where geography says regardless of grid rotation.

Forcing fixtures are written in the exact container formats the readers
in io.forcing_files dispatch on: NCAR bulk monthly (.npz), JRA55 3-hourly
(netCDF3, airtmp/spchmd/wndewd/wndnwd/glbrad/dlwsfc/ttlpcp), and the monthly
ocean climatology (.npz) — reference ncar_data/JRA55_data/ocn_data_ncar
(ice_forcing.F90:2023-2305).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..core.landmask import continents_mask

RADIUS = 6.37e6          # earth radius (m), reference ice_constants
CM_PER_M = 100.0

# fixture grid dimensions — the real production sizes (BASELINE.json)
GRID_DIMS = {"gx3": (100, 116), "gx1": (320, 384), "tx1": (360, 240)}


def fixtures_root() -> str:
    """Fixture cache directory (override with $CICE_TPU_FIXTURES)."""
    return os.environ.get(
        "CICE_TPU_FIXTURES",
        os.path.join(tempfile.gettempdir(), "cice_tpu_fixtures"))


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def _rotated_to_geo(phi_r, lam_r, pole_lat, pole_lon):
    """Map rotated coordinates (radians) to geographic (radians): the
    rotated-frame north pole lands at geographic (pole_lat, pole_lon)."""
    sp, cp = np.sin(pole_lat), np.cos(pole_lat)
    sin_phi = np.sin(phi_r) * sp + np.cos(phi_r) * cp * np.cos(lam_r)
    phi = np.arcsin(np.clip(sin_phi, -1.0, 1.0))
    lam = pole_lon + np.arctan2(
        np.cos(phi_r) * np.sin(lam_r),
        np.sin(phi_r) * cp - np.cos(phi_r) * sp * np.cos(lam_r))
    return phi, np.mod(lam, 2.0 * np.pi)


def _gc_dist(lat1, lon1, lat2, lon2):
    """Great-circle distance (m) via the haversine form (robust for the
    short cell-edge arcs used here)."""
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (np.sin(0.5 * dlat) ** 2 +
         np.cos(lat1) * np.cos(lat2) * np.sin(0.5 * dlon) ** 2)
    return 2.0 * RADIUS * np.arcsin(np.clip(np.sqrt(a), 0.0, 1.0))


def _corner_metrics(Klat, Klon):
    """HTN/HTE/ANGLE from an augmented corner lattice K[(ny+1), (nx+1)]
    where U[j, i] = K[j+1, i+1] and column 0 is the cyclic wrap of the last.

    HTN(j,i): north face of T(j,i) — arc between corners U(j, i-1), U(j, i)
    (POP staggering, ice_grid.F90 primary_grid_lengths_HTN).
    HTE(j,i): east face — arc between U(j-1, i), U(j, i).
    ANGLE(j,i): angle of the local grid +x direction measured CCW from true
    east at the U point (POP convention; forcing rotates geographic vectors
    into grid components with u = E cosA + N sinA, v = N cosA - E sinA).
    """
    HTN = _gc_dist(Klat[1:, :-1], Klon[1:, :-1], Klat[1:, 1:], Klon[1:, 1:])
    HTE = _gc_dist(Klat[:-1, 1:], Klon[:-1, 1:], Klat[1:, 1:], Klon[1:, 1:])
    # i-tangent at U points by backward difference along the corner row
    dlam = np.mod(Klon[1:, 1:] - Klon[1:, :-1] + np.pi, 2 * np.pi) - np.pi
    dE = np.cos(Klat[1:, 1:]) * dlam
    dN = Klat[1:, 1:] - Klat[1:, :-1]
    ANGLE = np.arctan2(dN, dE)
    return HTN, HTE, ANGLE


def _tlatlon(ULAT, ULON):
    """T coordinates as the spherical average of the 4 surrounding U points
    (same construction as core.grid._derive / reference Tlatlon)."""
    x = np.cos(ULAT) * np.cos(ULON)
    y = np.cos(ULAT) * np.sin(ULON)
    z = np.sin(ULAT)
    s = lambda f: np.roll(f, 1, axis=1)
    sw = lambda f: f + s(f) + np.roll(f, 1, axis=0) + np.roll(s(f), 1, axis=0)
    tx, ty, tz = 0.25 * sw(x), 0.25 * sw(y), 0.25 * sw(z)
    d = np.maximum(np.sqrt(tx * tx + ty * ty + tz * tz), 1e-30)
    TLAT = np.arcsin(np.clip(tz / d, -1, 1))
    TLON = np.mod(np.arctan2(ty, tx), 2 * np.pi)
    return TLAT, TLON


# ---------------------------------------------------------------------------
# grid builders
# ---------------------------------------------------------------------------

def make_displaced_pole_arrays(nx: int, ny: int, pole_lat_deg: float = 75.0,
                               pole_lon_deg: float = 318.0,
                               lat_min: float = -78.0,
                               lat_max: float = 87.0) -> dict:
    """Displaced-pole grid arrays (radians / meters) at (ny, nx)."""
    d2r = np.pi / 180.0
    # corner lattice in rotated coordinates: (ny+1) rows x (nx+1) columns
    # (column 0 duplicates column nx for the cyclic wrap)
    phi_r = np.linspace(lat_min, lat_max, ny + 1)[:, None] * d2r
    lam_r = (np.arange(nx + 1) * (2.0 * np.pi / nx))[None, :]  # ii=0 == wrap
    phi_r = np.broadcast_to(phi_r, (ny + 1, nx + 1))
    Klat, Klon = _rotated_to_geo(phi_r, lam_r, pole_lat_deg * d2r,
                                 pole_lon_deg * d2r)
    HTN, HTE, ANGLE = _corner_metrics(Klat, Klon)
    ULAT, ULON = Klat[1:, 1:], Klon[1:, 1:]
    TLAT, TLON = _tlatlon(ULAT, ULON)
    kmt = continents_mask(TLAT / d2r, TLON / d2r)
    kmt[0, :] = 0.0
    kmt[-1, :] = 0.0        # closed northern boundary ring (around the pole)
    return dict(ULAT=ULAT, ULON=ULON, HTN=HTN, HTE=HTE, ANGLE=ANGLE,
                TLAT=TLAT, TLON=TLON, kmt=kmt)


def make_tripole_arrays(nx: int, ny: int, lat_min: float = -78.0,
                        lat_max: float = 89.0) -> dict:
    """Mirror-symmetric tripole stand-in: spherical metrics, U fold at the
    top row (ug_implementation.rst:279-380 seam semantics)."""
    d2r = np.pi / 180.0
    phi = np.linspace(lat_min, lat_max, ny + 1)[:, None] * d2r
    lam = (np.arange(nx + 1) * (2.0 * np.pi / nx))[None, :]
    Klat = np.broadcast_to(phi, (ny + 1, nx + 1)).copy()
    Klon = np.broadcast_to(lam, (ny + 1, nx + 1)).copy()
    HTN, HTE, ANGLE = _corner_metrics(Klat, Klon)
    ULAT, ULON = Klat[1:, 1:], Klon[1:, 1:]
    TLAT, TLON = _tlatlon(ULAT, ULON)
    kmt = continents_mask(TLAT / d2r, TLON / d2r)
    kmt[0, :] = 0.0
    # the top row is the tripole seam — halo-folded, not closed; make the
    # seam physically consistent across the fold (T ghost row ny maps to
    # row ny-1 reversed)
    top = np.minimum(kmt[-1], kmt[-1][::-1])
    kmt[-1] = top
    return dict(ULAT=ULAT, ULON=ULON, HTN=HTN, HTE=HTE, ANGLE=ANGLE,
                TLAT=TLAT, TLON=TLON, kmt=kmt)


# ---------------------------------------------------------------------------
# POP binary writers (inverse of io.grids.read_pop_grid_binary/read_kmt_binary)
# ---------------------------------------------------------------------------

def write_pop_grid_binary(path: str, d: dict) -> None:
    """Big-endian f64 records ULAT, ULON (radians), HTN, HTE, HUS, HUW (cm),
    ANGLE (radians) — the exact popgrid layout (ice_grid.F90:1000)."""
    hus = d["HTN"]          # HUS/HUW are unused by the reader but present
    huw = d["HTE"]          # in real files; fill with the edge lengths
    recs = [d["ULAT"], d["ULON"], d["HTN"] * CM_PER_M, d["HTE"] * CM_PER_M,
            hus * CM_PER_M, huw * CM_PER_M, d["ANGLE"]]
    with open(path, "wb") as f:
        for r in recs:
            f.write(np.ascontiguousarray(r, ">f8").tobytes())


def write_kmt_binary(path: str, kmt: np.ndarray) -> None:
    """kmt ocean-level count as big-endian int32 (0=land; ocean cells get a
    plausible level count so LKD seabed stress sees bathymetry)."""
    lev = np.where(kmt > 0.5, 40, 0).astype(">i4")
    with open(path, "wb") as f:
        f.write(np.ascontiguousarray(lev).tobytes())


# ---------------------------------------------------------------------------
# forcing fixtures
# ---------------------------------------------------------------------------

def _analytic_atm(TLATd, TLONd, doy: float, hour_utc: float = 12.0) -> dict:
    """Smooth seasonal analytic atmosphere evaluated at day-of-year `doy`."""
    latr = np.deg2rad(TLATd)
    lonr = np.deg2rad(TLONd)
    # annual-mean temperature + seasonally reversing anomaly by hemisphere
    tmean = 301.0 - 43.0 * (np.abs(TLATd) / 90.0) ** 2
    amp = 15.0 * (np.abs(TLATd) / 90.0) ** 1.5
    season = -np.cos(2.0 * np.pi * (doy - 15.0) / 365.0)   # NH coldest ~Jan 15
    Tair = tmean + amp * np.sign(TLATd) * season
    # humidity: 80% of saturation (cap applied again by prepare_forcing)
    Qa = 0.8 * (640380.0 / 1.3) * np.exp(-5107.4 / Tair)
    # zonal circulation bands + drifting synoptic wave
    phase = 2.0 * np.pi * doy / 30.0
    uatm = (6.0 * np.sin(2.0 * latr) ** 2 - 2.0 +
            2.0 * np.cos(3.0 * lonr + phase))
    vatm = 2.0 * np.sin(3.0 * lonr + phase) + np.sin(2.0 * latr)
    # daily-mean downwelling SW from solar declination
    decl = np.deg2rad(-23.44) * np.cos(2.0 * np.pi * (doy + 10.0) / 365.0)
    cosz_noon = np.clip(np.cos(latr - decl), 0.0, 1.0)
    diurnal = max(np.cos(2.0 * np.pi * (hour_utc - 12.0) / 24.0), 0.0)
    fsw = 1365.0 * 0.55 * cosz_noon * (0.4 + 0.6 * diurnal)
    cldf = 0.5 + 0.2 * np.sin(latr) ** 2
    # precipitation (mks kg/m^2/s), ~1 mm/day with storm-track maxima
    fsnow = 1.0e-5 * (0.4 + 0.6 * np.cos(2.0 * latr) ** 2)
    flw = 5.67e-8 * (Tair - 10.0) ** 4 * (0.7 + 0.2 * cldf)
    return dict(Tair=Tair, Qa=Qa, uatm=uatm, vatm=vatm, fsw=fsw, cldf=cldf,
                fsnow=fsnow, flw=flw)


def write_ncar_npz(dirpath: str, TLATd, TLONd, year: int = 2005) -> str:
    """NCAR bulk monthly file: 12 records per field (ncar_dataset layout)."""
    os.makedirs(dirpath, exist_ok=True)
    fields = {k: [] for k in
              ("Tair", "Qa", "uatm", "vatm", "fsw", "cldf", "fsnow")}
    for m in range(12):
        a = _analytic_atm(TLATd, TLONd, doy=(m + 0.5) * 365.0 / 12.0)
        for k in fields:
            fields[k].append(a[k])
    path = os.path.join(dirpath, f"ncar_bulk_{year:04d}.npz")
    np.savez_compressed(path, **{k: np.asarray(v, np.float32)
                                 for k, v in fields.items()})
    return path


def write_jra55_nc(dirpath: str, TLATd, TLONd, year: int = 2005,
                   nrec: int = 56, rec0: int = 0) -> str:
    """JRA55-format netCDF3: 3-hourly records of airtmp/spchmd/wndewd/
    wndnwd/glbrad/dlwsfc/ttlpcp (jra55_dataset layout). Only `nrec` records
    starting at `rec0` are materialized — runs must start late enough
    (day_init >= 2 for rec0=0) that no record before `rec0` is read."""
    from scipy.io import netcdf_file
    os.makedirs(dirpath, exist_ok=True)
    ny, nx = np.asarray(TLATd).shape
    path = os.path.join(dirpath, f"JRA55_{year:04d}.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("time", nrec)
        f.createDimension("nj", ny)
        f.createDimension("ni", nx)
        vars = {k: f.createVariable(k, "f", ("time", "nj", "ni"))
                for k in ("airtmp", "spchmd", "wndewd", "wndnwd", "glbrad",
                          "dlwsfc", "ttlpcp")}
        buf = {k: np.empty((nrec, ny, nx), np.float32) for k in vars}
        for r in range(nrec):
            sec = (rec0 + r + 0.5) * 3.0 * 3600.0
            doy = 1.0 + sec / 86400.0
            a = _analytic_atm(TLATd, TLONd, doy,
                              hour_utc=(sec / 3600.0) % 24.0)
            buf["airtmp"][r] = a["Tair"]
            buf["spchmd"][r] = a["Qa"]
            buf["wndewd"][r] = a["uatm"]
            buf["wndnwd"][r] = a["vatm"]
            buf["glbrad"][r] = a["fsw"]
            buf["dlwsfc"][r] = a["flw"]
            buf["ttlpcp"][r] = a["fsnow"]
        for k, v in vars.items():
            v[:] = buf[k]
    return path


def write_ocean_clim_npz(dirpath: str, TLATd, TLONd) -> str:
    """Monthly ocean climatology (ocean_clim_dataset layout)."""
    os.makedirs(dirpath, exist_ok=True)
    latr = np.deg2rad(np.asarray(TLATd))
    lonr = np.deg2rad(np.asarray(TLONd))
    sst, sss, uocn, vocn, qdp, hmix = [], [], [], [], [], []
    for m in range(12):
        doy = (m + 0.5) * 365.0 / 12.0
        season = -np.cos(2.0 * np.pi * (doy - 15.0) / 365.0)
        t = (28.0 * np.cos(latr) ** 2 - 1.2 +
             1.5 * np.sign(latr) * season * np.abs(np.sin(latr)))
        sst.append(np.maximum(t, -1.8))
        sss.append(34.0 - 2.0 * np.cos(latr) ** 6)
        uocn.append(0.05 * np.sin(2.0 * latr) + 0.02 * np.cos(2 * lonr))
        vocn.append(0.02 * np.sin(2 * lonr))
        qdp.append(np.full_like(t, -2.0))          # W/m^2 deep heat flux
        hmix.append(20.0 + 10.0 * np.cos(latr) ** 2)
    path = os.path.join(dirpath, "ocean_clim.npz")
    np.savez_compressed(path, sst=np.asarray(sst, np.float32),
                        sss=np.asarray(sss, np.float32),
                        uocn=np.asarray(uocn, np.float32),
                        vocn=np.asarray(vocn, np.float32),
                        qdp=np.asarray(qdp, np.float32),
                        hmix=np.asarray(hmix, np.float32))
    return path


# ---------------------------------------------------------------------------
# top-level: materialize everything once
# ---------------------------------------------------------------------------

def ensure_baseline_fixtures(root: str | None = None, year: int = 2005,
                             verbose: bool = False) -> dict:
    """Create (idempotently) the full BASELINE fixture set under `root`.

    Layout:
      {root}/grids/{name}_grid.bin, {name}_kmt.bin     POP binary
      {root}/forcing/{name}/ncar_bulk_YYYY.npz          NCAR bulk monthly
      {root}/forcing/gx1/JRA55_YYYY.nc                  JRA55 3-hourly
      {root}/forcing/{name}/ocean_clim.npz              ocean climatology
    Returns {name: {"grid": ..., "kmt": ..., "forcing": dir, ...}}.
    """
    root = root or fixtures_root()
    gdir = os.path.join(root, "grids")
    os.makedirs(gdir, exist_ok=True)
    out = {}
    for name, (nx, ny) in GRID_DIMS.items():
        gpath = os.path.join(gdir, f"{name}_grid.bin")
        kpath = os.path.join(gdir, f"{name}_kmt.bin")
        fdir = os.path.join(root, "forcing", name)
        entry = {"grid": gpath, "kmt": kpath, "forcing": fdir,
                 "nx": nx, "ny": ny}
        done = os.path.join(fdir, ".complete")
        if not os.path.exists(done):
            if verbose:
                print(f"[fixtures] generating {name} ({nx}x{ny}) ...")
            arrs = (make_tripole_arrays(nx, ny) if name == "tx1"
                    else make_displaced_pole_arrays(nx, ny))
            write_pop_grid_binary(gpath, arrs)
            write_kmt_binary(kpath, arrs["kmt"])
            TLATd = np.rad2deg(arrs["TLAT"])
            TLONd = np.rad2deg(arrs["TLON"])
            write_ncar_npz(fdir, TLATd, TLONd, year)
            write_ocean_clim_npz(fdir, TLATd, TLONd)
            if name == "gx1":
                write_jra55_nc(fdir, TLATd, TLONd, year)
            with open(done, "w") as f:
                f.write("ok\n")
        out[name] = entry
    return out
