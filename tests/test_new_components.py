"""Round-1 gap-fill components: variable rectgrid, MOM supergrid reader,
prescribed-ice mode, snow aging table, point-series forcing, plots CLI,
prognostic EAP structure tensor."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config


def test_rectgrid_scale_dxdy():
    from cice_tpu.core.grid import BC, rectgrid
    g = rectgrid(16, 12, 30.0e5, 30.0e5, "none", BC(ew="cyclic", ns="open"),
                 dxscale=1.1, dyscale=1.05)
    htn = np.asarray(g.HTN)
    hte = np.asarray(g.HTE)
    # spacing grows geometrically away from the domain center
    assert htn[0, 0] > htn[0, 8] * 1.5
    assert htn[0, -1] > htn[0, 8] * 1.5
    assert hte[0, 0] > hte[6, 0]
    # uniform when scale=1
    gu = rectgrid(16, 12, 30.0e5, 30.0e5, "none", BC(ew="cyclic", ns="open"))
    assert np.allclose(np.asarray(gu.HTN), np.asarray(gu.HTN)[0, 0])


def test_mom_supergrid_reader(tmp_path):
    from scipy.io import netcdf_file
    from cice_tpu.io.grids import read_mom_supergrid
    ny, nx = 6, 8
    path = str(tmp_path / "ocean_hgrid.nc")
    yy, xx = np.meshgrid(np.linspace(40.0, 50.0, 2 * ny + 1),
                         np.linspace(0.0, 16.0, 2 * nx + 1), indexing="ij")
    dx = np.full((2 * ny + 1, 2 * nx), 5.0e4)     # m per supergrid half-edge
    dy = np.full((2 * ny, 2 * nx + 1), 4.0e4)
    with netcdf_file(path, "w") as f:
        f.createDimension("nyp", 2 * ny + 1)
        f.createDimension("nxp", 2 * nx + 1)
        f.createDimension("ny", 2 * ny)
        f.createDimension("nx", 2 * nx)
        f.createVariable("x", "d", ("nyp", "nxp"))[:] = xx
        f.createVariable("y", "d", ("nyp", "nxp"))[:] = yy
        f.createVariable("dx", "d", ("nyp", "nx"))[:] = dx
        f.createVariable("dy", "d", ("ny", "nxp"))[:] = dy
        f.createVariable("angle_dx", "d", ("nyp", "nxp"))[:] = \
            np.zeros_like(xx)
    d = read_mom_supergrid(path)
    assert d["ULAT"].shape == (ny, nx)
    assert np.allclose(d["HTN"], 1.0e5)           # two half-edges summed
    assert np.allclose(d["HTE"], 8.0e4)
    # corner lat of cell (0,0) = supergrid node (2,2)
    assert np.isclose(d["ULAT"][0, 0], yy[2, 2] * np.pi / 180.0)


def test_prescribed_ice_mode():
    from cice_tpu.model.driver import Model
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "grid.grid_format": "latlon", "forcing.atm_data_type": "seasonal",
        "setup.prescribed_ice": True, "dynamics.kdyn": 0,
        "thermo.nit": 3})
    m = Model(cfg)
    m.run(2)
    aice = np.asarray(m.state.aice)
    lat = np.asarray(m.grid.TLAT)
    hm = np.asarray(m.grid.hm)
    polar = (lat > 70.0 * np.pi / 180.0) & (hm > 0.5)
    # prescribed cover forced to ~0.95 at high latitude
    assert polar.sum() > 0
    assert np.all(np.abs(aice[polar] - 0.95) < 0.05)
    # thickness follows the hemispheric prescription (2 m NH)
    vice = np.asarray(m.state.vice)
    nhp = polar & (lat > 0)
    if nhp.sum():
        hi = vice[nhp] / np.maximum(aice[nhp], 1e-6)
        assert np.all(np.abs(hi - 2.0) < 0.7)


def test_snow_aging_table_lookup():
    from cice_tpu.columns.snowtable import make_test_table, table_aging_rate
    t = make_test_table()
    # warm snow ages faster than cold snow; fresh grains age fastest
    warm = table_aging_rate(t, jnp.array(-1.0), jnp.array(10.0),
                            jnp.array(200.0), jnp.array(100.0), 100.0)
    cold = table_aging_rate(t, jnp.array(-40.0), jnp.array(10.0),
                            jnp.array(200.0), jnp.array(100.0), 100.0)
    aged = table_aging_rate(t, jnp.array(-1.0), jnp.array(10.0),
                            jnp.array(200.0), jnp.array(800.0), 100.0)
    assert float(warm) > float(cold)
    assert float(warm) > float(aged)
    assert float(cold) >= 0.0


def test_snow_table_in_metamorphism():
    from cice_tpu.columns.snow import grain_metamorphism
    cfg = Config().with_overrides(**{"snow.snw_aging_table": "test"})
    shp = (2, 1, 4, 4)
    r0 = jnp.full(shp, 120.0)
    sm = jnp.full(shp, 50.0)
    rs = grain_metamorphism(cfg.snow, 86400.0, r0, jnp.full(shp, -5.0),
                            sm, jnp.zeros(shp), Tgrd=jnp.full(shp, 20.0),
                            rhos_eff=jnp.full(shp, 150.0))
    assert np.all(np.asarray(rs) >= 120.0)          # grains only grow
    assert np.all(np.asarray(rs) <= cfg.snow.rsnw_tmax)


def test_point_series_forcing(tmp_path):
    from cice_tpu.io.forcing_files import oned_dataset
    n = 48
    np.savez(tmp_path / "oned_forcing.npz",
             Tair=260.0 + np.arange(n, dtype=float),
             Qa=np.full(n, 1e-3), uatm=np.full(n, 3.0),
             vatm=np.zeros(n), fsw=np.zeros(n), flw=np.full(n, 250.0),
             fsnow=np.zeros(n))
    ds = oned_dataset(str(tmp_path), (4, 4))
    r = ds.at_time(2005, 3600.0 * 10.0)
    assert r["Tair"].shape == (4, 4)
    # hourly records centered at (k+0.5)h: t=10h interpolates recs 9 & 10
    assert 268.9 < r["Tair"][0, 0] < 269.6


def test_eap_structure_tensor_prognostic():
    from cice_tpu.model.state import zeros_state
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "grid.grid_format": "rect", "grid.kmt_type": "none"})
    from cice_tpu.core.grid import make_grid
    grid = make_grid(cfg)
    st = zeros_state(cfg, grid)
    assert st.a11.shape == (4, 16, 16)
    assert np.allclose(np.asarray(st.a11), 0.5)     # isotropic init
    # restart round-trips the tensor (write/read_restart_eap parity)
    from cice_tpu.calendar import Calendar
    from cice_tpu.io.restart import read_restart, write_restart
    st2 = st.replace(a11=st.a11 + 0.01, a12=st.a12 - 0.02)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = write_restart(d, st2, Calendar())
        st3, _ = read_restart(p, st)
    assert np.allclose(np.asarray(st3.a11), np.asarray(st2.a11))
    assert np.allclose(np.asarray(st3.a12), np.asarray(st2.a12))


def test_cmip_history_fields():
    from cice_tpu.core.grid import make_grid
    from cice_tpu.io.history import build_fields
    from cice_tpu.model.flux import zeros_fluxout
    from cice_tpu.model.state import zeros_state
    cfg = Config().with_overrides(**{
        "grid.nx_global": 8, "grid.ny_global": 8,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "setup.hist_cmip": True})
    grid = make_grid(cfg)
    st = zeros_state(cfg, grid)
    fl = zeros_fluxout(grid.shape, np.float32)
    fields = build_fields(cfg)
    names = {f.name for f in fields}
    for want in ("siconc", "sithick", "siu", "sispeed", "simass"):
        assert want in names, want
    from cice_tpu.model.flux import zeros_forcing
    fc = zeros_forcing(grid.shape)
    for f in fields:
        if f.name.startswith("si"):
            args = (st, fl, grid, fc) if f.needs_forcing else (st, fl, grid)
            arr = np.asarray(f.extract(*args))
            want = tuple(sz for _d, sz in f.dims) + (8, 8)
            assert arr.shape == want, (f.name, arr.shape, want)
            assert np.all(np.isfinite(arr)), f.name


def test_plots_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from cice_tpu.cli.plots import plot2d, timeseries
    import json
    np.savez(tmp_path / "iceh.npz", aice=np.random.rand(8, 8))
    outs = plot2d([str(tmp_path / "iceh.npz")], "aice")
    assert os.path.exists(outs[0])
    with open(tmp_path / "diag.json", "w") as f:
        json.dump([{"area_nh": float(i)} for i in range(5)], f)
    p = timeseries(str(tmp_path / "diag.json"), ["area_nh"])
    assert os.path.exists(p)
