"""File-based forcing datasets: readers + time interpolation.

Equivalent of the dataset machinery in
cicecore/cicedyn/general/ice_forcing.F90: per-dataset file lists
(`JRA55_files`:2181, `ncar_files`), record reading through the low-level
field IO (`ice_read_xyt` ice_read_write.F90:198 — big-endian direct-access
binary; netCDF variants `ice_read_nc_*`:1096), and the linear
time-interpolation machinery (`interp_coeff`:1341-1488,
`interpolate_data`:1492, `read_data`:756 with record rotation).

TPU-native shape: files are read on the HOST with numpy (forcing prep sits
outside the jitted step, exactly as the reference does IO on the master
rank), producing `(ny, nx)` numpy arrays that the forcing layer uploads
once per bracketing record; interpolation between the two bracketing
records happens every step with two scalars (c1, c2).

Supported container formats:
- `.npz`  — dict of arrays `(nrec, ny, nx)` keyed by field name
- `.nc`   — netCDF3-classic via scipy (CDF1/2; the reference's
            `ice_read_nc_xy` for default-format files)
- `.bin`  — raw big-endian float64 direct-access records in field-major
            order (the reference's POP-style binary, ice_read_write.F90:198)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

SECDAY = 86400.0
DAYYR = 365.0


# ---------------------------------------------------------------------------
# record readers
# ---------------------------------------------------------------------------

def read_field_record(path: str, varname: str, nrec: int, shape,
                      total_recs: Optional[int] = None) -> np.ndarray:
    """Read record `nrec` (0-based) of `varname` from a forcing file.
    Dispatch on extension (reference ice_read_xyt / ice_read_nc_xy)."""
    ny, nx = shape
    if path.endswith(".npz"):
        with np.load(path) as z:
            arr = z[varname]
        return np.asarray(arr[nrec], np.float64)
    if path.endswith(".nc"):
        from scipy.io import netcdf_file
        with netcdf_file(path, "r", mmap=False) as f:
            v = f.variables[varname]
            if v.data.ndim == 3 and nrec >= v.data.shape[0]:
                raise ValueError(
                    f"forcing record {nrec} is beyond the {v.data.shape[0]} "
                    f"records of '{varname}' in {path} — the run window "
                    "exceeds the materialized forcing (fixture files carry "
                    "a limited record window; regenerate with more records "
                    "or start/stop the run inside the window)")
            data = v[nrec] if v.data.ndim == 3 else v[:]
            out = np.array(data, np.float64)
            # apply CF scale/offset when present
            sf = getattr(v, "scale_factor", None)
            ao = getattr(v, "add_offset", None)
            if sf is not None:
                out = out * float(sf)
            if ao is not None:
                out = out + float(ao)
        return out
    if path.endswith(".bin"):
        # field-major big-endian f64: all records of field 0, then field 1…
        # varname here is "<index>" into the per-file field order
        fidx = int(varname)
        recsize = ny * nx * 8
        ntot = total_recs if total_recs else 1
        off = (fidx * ntot + nrec) * recsize
        with open(path, "rb") as f:
            f.seek(off)
            buf = f.read(recsize)
        return np.frombuffer(buf, ">f8").reshape(ny, nx).astype(np.float64)
    raise ValueError(f"unknown forcing container: {path}")


# ---------------------------------------------------------------------------
# time interpolation (reference interp_coeff / interpolate_data)
# ---------------------------------------------------------------------------

def interp_coeff(timesecs: float, recslot: int, secint: float,
                 offset: float = 0.0):
    """Linear weights (c1, c2) between bracketing records
    (reference interp_coeff ice_forcing.F90:1436): records are centered at
    (rec-0.5)*secint + offset; recslot is the index of the record AFTER
    `timesecs`."""
    t2 = (recslot - 0.5) * secint + offset
    t1 = t2 - secint
    c2 = (timesecs - t1) / secint
    c2 = min(max(c2, 0.0), 1.0)
    return 1.0 - c2, c2


@dataclass
class ForcingDataset:
    """One time-varying forcing stream (e.g. NCAR monthly atmosphere,
    JRA55 3-hourly): bracketing-record cache + per-step interpolation."""

    path_pattern: str            # e.g. "{dir}/jra55_{year:04d}.nc"
    fields: Dict[str, str]       # model field -> file variable name
    secint: float                # seconds between records
    data_dir: str = ""
    fyear_init: int = 2005
    ycycle: int = 1              # years in the forcing cycle
    offset: float = 0.0          # record-center offset (s)
    shape: tuple = (0, 0)
    calendar_type: str = "noleap"   # 'gregorian': leap-year record counts
                                    # (reference JRA55_data leap handling)
    # cache: (year, rec) -> {field: array}
    _cache: dict = field(default_factory=dict)

    def days_in_year(self, year: int) -> float:
        if self.calendar_type == "gregorian" and (
                year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)):
            return 366.0
        if self.calendar_type == "360day":
            return 360.0
        return DAYYR

    def n_per_year(self, year: int | None = None) -> int:
        d = DAYYR if year is None else self.days_in_year(year)
        return int(round(d * SECDAY / self.secint))

    def _file_for(self, year: int) -> str:
        cyc_year = self.fyear_init + (year - self.fyear_init) % self.ycycle
        return self.path_pattern.format(dir=self.data_dir, year=cyc_year)

    def _read_rec(self, year: int, rec: int) -> Dict[str, np.ndarray]:
        # wrap records across year boundaries (per-year record counts: a
        # 3-hourly gregorian stream has 2928 records in leap years)
        while rec < 0:
            year -= 1
            rec += self.n_per_year(year)
        while rec >= self.n_per_year(year):
            rec -= self.n_per_year(year)
            year += 1
        npy = self.n_per_year(year)
        key = (self._file_for(year), rec)
        if key not in self._cache:
            path = key[0]
            out = {}
            for name, var in self.fields.items():
                out[name] = read_field_record(path, var, rec, self.shape,
                                              total_recs=npy)
            # keep only a handful of records resident
            if len(self._cache) > 4:
                self._cache.clear()
            self._cache[key] = out
        return self._cache[key]

    def at_time(self, year: int, sec_of_year: float) -> Dict[str, np.ndarray]:
        """Interpolated fields at (`year`, seconds since Jan 1). 0-based
        record r is centered at (r+0.5)*secint; `r_after` is the first
        record centered at/after the requested time."""
        r_after = int(np.floor((sec_of_year - self.offset) / self.secint +
                               0.5))
        c1, c2 = interp_coeff(sec_of_year, r_after + 1, self.secint,
                              self.offset)
        r1 = self._read_rec(year, r_after - 1)
        r2 = self._read_rec(year, r_after)
        return {k: c1 * r1[k] + c2 * r2[k] for k in self.fields}


# ---------------------------------------------------------------------------
# dataset definitions (reference ncar_files / JRA55_files)
# ---------------------------------------------------------------------------

def ncar_dataset(data_dir: str, shape, fyear_init=2005,
                 ycycle=1) -> ForcingDataset:
    """NCAR bulk monthly forcing (reference ncar_data ice_forcing.F90:2023):
    monthly records of the bulk-flux inputs."""
    return ForcingDataset(
        path_pattern="{dir}/ncar_bulk_{year:04d}.npz",
        fields=dict(Tair="Tair", Qa="Qa", uatm="uatm", vatm="vatm",
                    fsw="fsw", cldf="cldf", fsnow="fsnow"),
        secint=DAYYR * SECDAY / 12.0, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=ycycle, shape=shape)


def jra55_dataset(data_dir: str, shape, fyear_init=2005,
                  ycycle=1) -> ForcingDataset:
    """JRA55(do) 3-hourly forcing (reference JRA55_data:2305): airtmp,
    spchmd, wind, downward sw/lw, precipitation."""
    return ForcingDataset(
        path_pattern="{dir}/JRA55_{year:04d}.nc",
        fields=dict(Tair="airtmp", Qa="spchmd", uatm="wndewd",
                    vatm="wndnwd", swdn="glbrad", flw="dlwsfc",
                    fsnow="ttlpcp"),
        secint=3.0 * 3600.0, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=ycycle, shape=shape)


def ocean_clim_dataset(data_dir: str, shape, fyear_init=2005) -> ForcingDataset:
    """Monthly ocean climatology (sst/sss/currents/qdp; reference
    ocn_data_ncar)."""
    return ForcingDataset(
        path_pattern="{dir}/ocean_clim.npz",
        fields=dict(sst="sst", sss="sss", uocn="uocn", vocn="vocn",
                    qdp="qdp", hmix="hmix"),
        secint=DAYYR * SECDAY / 12.0, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=1, shape=shape)


def monthly_dataset(data_dir: str, shape, fyear_init=2005,
                    ycycle=1) -> ForcingDataset:
    """Monthly climatology atmosphere (reference monthly_data
    ice_forcing.F90: cldf/fsnow/Tair/Qa/wind monthly means)."""
    return ForcingDataset(
        path_pattern="{dir}/monthly_clim.npz",
        fields=dict(Tair="Tair", Qa="Qa", uatm="uatm", vatm="vatm",
                    cldf="cldf", fsnow="fsnow"),
        secint=DAYYR * SECDAY / 12.0, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=ycycle, shape=shape)


def hadgem_dataset(data_dir: str, shape, fyear_init=2005,
                   ycycle=1) -> ForcingDataset:
    """HadGEM3 monthly forcing (reference hadgem_data ice_forcing.F90):
    direct wind stress (strax/stray) + optional topmelt/botmelt per
    category are the distinguishing fields; here the cell-mean pair."""
    return ForcingDataset(
        path_pattern="{dir}/MONTHLY/hadgem_{year:04d}.nc",
        fields=dict(Tair="airtmp", Qa="spchmd", strax="taux", stray="tauy",
                    uatm="u10", vatm="v10", swdn="swdn", flw="lwdn",
                    fsnow="snowfall", frain="rainfall"),
        secint=DAYYR * SECDAY / 12.0, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=ycycle, shape=shape)


def hycom_ocean_dataset(data_dir: str, shape,
                        fyear_init=2005) -> ForcingDataset:
    """HYCOM ocean forcing (reference ocn_data_hycom_init: netCDF sst/sss
    + surface currents on the model grid)."""
    return ForcingDataset(
        path_pattern="{dir}/hycom_ocn_{year:04d}.nc",
        fields=dict(sst="sst", sss="sss", uocn="uvel", vocn="vvel"),
        secint=SECDAY, data_dir=data_dir,
        fyear_init=fyear_init, ycycle=1, shape=shape)


# ---------------------------------------------------------------------------
# point time-series datasets (oned / ISPOL): single-column records broadcast
# to the (ny, nx) grid — the reference's oned_data/ISPOL_data read scalar
# series the same way (ice_forcing.F90 oned_files/ISPOL_files)
# ---------------------------------------------------------------------------

@dataclass
class PointSeriesDataset:
    """Scalar time series (one value per record per field) broadcast to the
    grid; container: npz of 1-D arrays keyed by field."""

    path: str
    fields: Dict[str, str]
    secint: float
    shape: tuple = (0, 0)
    _data: Optional[dict] = None

    def _load(self):
        if self._data is None:
            with np.load(self.path) as z:
                self._data = {k: np.asarray(z[v], np.float64)
                              for k, v in self.fields.items() if v in z}
        return self._data

    def at_time(self, year: int, sec_of_year: float) -> Dict[str, np.ndarray]:
        data = self._load()
        out = {}
        for k, series in data.items():
            n = series.size
            r_after = int(np.floor(sec_of_year / self.secint + 0.5))
            c1, c2 = interp_coeff(sec_of_year, r_after + 1, self.secint)
            v = c1 * series[(r_after - 1) % n] + c2 * series[r_after % n]
            out[k] = np.full(self.shape, v)
        return out


def oned_dataset(data_dir: str, shape) -> PointSeriesDataset:
    """Single-point hourly forcing (reference oned_data)."""
    return PointSeriesDataset(
        path=os.path.join(data_dir, "oned_forcing.npz"),
        fields=dict(Tair="Tair", Qa="Qa", uatm="uatm", vatm="vatm",
                    fsw="fsw", flw="flw", fsnow="fsnow"),
        secint=3600.0, shape=shape)


def ispol_dataset(data_dir: str, shape) -> PointSeriesDataset:
    """ISPOL (Ice Station POLarstern) Weddell-Sea field-campaign series
    (reference ISPOL_data; 6-hourly)."""
    return PointSeriesDataset(
        path=os.path.join(data_dir, "ispol_forcing.npz"),
        fields=dict(Tair="Tair", Qa="Qa", uatm="uatm", vatm="vatm",
                    fsw="fsw", flw="flw", fsnow="fsnow"),
        secint=6.0 * 3600.0, shape=shape)


# ---------------------------------------------------------------------------
# ocean-surface wave spectrum dataset (reference get_wave_spec,
# ice_forcing.F90: wave_spec_type='file' reads `wave_spec_file`, a
# monthly 25-frequency E(f) wave-model product fed to the FSD fracture)
# ---------------------------------------------------------------------------

@dataclass
class WaveSpecDataset:
    """Monthly (12, nfreq, ny, nx) — or static (nfreq, ny, nx) —
    `efreq` spectra [m^2/Hz]; `at_month` returns the month's planes."""

    path: str
    shape: tuple
    _data: np.ndarray | None = None

    def _load(self) -> np.ndarray:
        if self._data is None:
            if self.path.endswith(".npz"):
                with np.load(self.path) as z:
                    self._data = np.asarray(z["efreq"], np.float32)
            else:
                from scipy.io import netcdf_file
                with netcdf_file(self.path, "r", mmap=False) as f:
                    self._data = np.array(f.variables["efreq"][:],
                                          np.float32)
            if self._data.shape[-2:] != tuple(self.shape):
                raise ValueError(
                    f"wave_spec_file grid {self._data.shape[-2:]} != "
                    f"model grid {tuple(self.shape)}")
        return self._data

    def at_month(self, month: int) -> np.ndarray:
        d = self._load()
        if d.ndim == 3:
            return d
        return d[(month - 1) % d.shape[0]]


def wave_spec_dataset(path: str, shape) -> WaveSpecDataset:
    return WaveSpecDataset(path=path, shape=tuple(shape))
