"""HDF5 IO backend (restart_format/history_format='hdf5').

Reference parity: io_netcdf with nf90_netcdf4 — restart_format='hdf5' and
history_format='hdf5' with history_deflate / history_chunksize
(ug_case_settings.rst setup_nml; io_suite.ts hdf5 rows). The restart
contract is the same exact round-trip the npz/cdf1 backends honor.
"""

import os

import jax
import numpy as np

from cice_tpu.config import Config
from cice_tpu.model.driver import Model
from cice_tpu.io.restart import read_restart, write_restart


def _cfg(tmp_path, **over):
    o = {
        "grid.nx_global": 24, "grid.ny_global": 24,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 10, "thermo.nit": 4,
        "setup.dumpfreq": "x",
        "setup.restart_dir": str(tmp_path / "restart"),
        "setup.pointer_file": str(tmp_path / "restart" / "ice.restart_file"),
        "setup.history_dir": str(tmp_path / "history"),
    }
    o.update(over)
    return Config().with_overrides(**o)


def _assert_state_equal(s1, s2):
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restart_hdf5_bfb(tmp_path):
    """hdf5 restart round-trips bit-for-bit (native dtypes, no casts);
    the .nc suffix is shared with cdf1 and dispatched on magic bytes."""
    cfg = _cfg(tmp_path)
    m = Model(cfg)
    m.run(2)
    path = write_restart(cfg.setup.restart_dir, m.state, m.calendar,
                         fmt="hdf5")
    assert path.endswith(".nc")
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89HDF\r\n\x1a\n"
    m2 = Model(cfg)
    m2.state, m2.calendar = read_restart(path, m2.state)
    assert m2.calendar.istep == 2
    _assert_state_equal(m.state, m2.state)


def test_driver_continue_from_hdf5(tmp_path):
    """Full restart contract through the driver with restart_format='hdf5':
    5 steps == 3 steps + dump + continue 2 (bit-for-bit)."""
    cfg = _cfg(tmp_path)
    m_ref = Model(cfg)
    m_ref.run(5)

    cfg_h = _cfg(tmp_path, **{"setup.restart_format": "hdf5"})
    m1 = Model(cfg_h)
    m1.run(3)
    m1.write_restart()

    cfg_cont = cfg_h.with_overrides(**{"setup.runtype": "continue"})
    m2 = Model(cfg_cont)
    assert m2.calendar.istep == 3
    m2.run(2)
    _assert_state_equal(m_ref.state, m2.state)


def test_history_hdf5_chunks_deflate(tmp_path):
    """history_format='hdf5' writes chunked, deflated, attributed datasets
    readable by h5py; values match the cdf1 writer's."""
    import h5py
    from scipy.io import netcdf_file

    over = {"setup.histfreq": ("1",), "setup.histfreq_n": (1,),
            "setup.history_format": "hdf5",
            "setup.history_deflate": 4,
            "setup.history_chunksize": (16, 16)}
    cfg = _cfg(tmp_path / "h5", **over)
    m = Model(cfg, enable_history=True)
    m.run(2)
    files = sorted(os.listdir(cfg.setup.history_dir))
    assert len(files) == 2 and files[0].endswith(".nc")
    p = os.path.join(cfg.setup.history_dir, files[0])
    with h5py.File(p, "r") as f:
        aice = f["aice"]
        assert aice.compression == "gzip" and aice.compression_opts == 4
        assert aice.chunks == (1, 16, 16)
        assert aice.attrs["units"]
        h5_vals = np.asarray(aice[0])

    cfg_nc = _cfg(tmp_path / "nc", **{"setup.histfreq": ("1",),
                                      "setup.histfreq_n": (1,)})
    m2 = Model(cfg_nc, enable_history=True)
    m2.run(2)
    fnc = sorted(os.listdir(cfg_nc.setup.history_dir))[0]
    with netcdf_file(os.path.join(cfg_nc.setup.history_dir, fnc),
                     "r", mmap=False) as f:
        nc_vals = np.asarray(f.variables["aice"][0]).copy()
    np.testing.assert_array_equal(h5_vals, nc_vals)
