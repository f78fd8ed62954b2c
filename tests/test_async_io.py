"""Async IO runtime (native pthread writer pool) + netCDF-3 restart backend.

Covers the io_pio2-style latency-hiding writer (SURVEY §2.6: parallel IO off
the model critical path) and the io_netcdf ice_restart analogue
(restart_format='cdf1'): exact round-trips, atomic visibility after flush,
driver-level BFB with async IO enabled.
"""

import os

import jax
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.io.async_writer import AsyncWriter, write_bytes
from cice_tpu.io.restart import read_restart, write_restart
from cice_tpu.model.driver import Model


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


@pytest.mark.parametrize("force_python", [False, True])
def test_async_writer_roundtrip(tmp_path, force_python):
    w = AsyncWriter(2, force_python=force_python)
    if not force_python:
        assert w.native, "native asyncwriter.c should build on this image"
    payloads = {str(tmp_path / f"f{i}.bin"): os.urandom(1000 + 137 * i)
                for i in range(20)}
    for path, data in payloads.items():
        w.submit(path, data)
    assert w.flush() == 0
    for path, data in payloads.items():
        with open(path, "rb") as f:
            assert f.read() == data
    # no stray .tmp files (atomic rename contract)
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
    w.stop()


def test_async_writer_creates_dirs(tmp_path):
    w = AsyncWriter(1)
    p = str(tmp_path / "a" / "b" / "x.bin")
    w.submit(p, b"hello")
    assert w.flush() == 0
    assert open(p, "rb").read() == b"hello"
    w.stop()


def test_write_bytes_sync(tmp_path):
    p = str(tmp_path / "s.bin")
    write_bytes(p, b"abc", None)
    assert open(p, "rb").read() == b"abc"


def test_restart_async_bfb(tmp_path):
    """Restart written through the async pool reads back bit-for-bit."""
    cfg = _cfg(tmp_path)
    m = Model(cfg)
    m.run(2)
    w = AsyncWriter(2)
    path = write_restart(cfg.setup.restart_dir, m.state, m.calendar,
                         writer=w)
    assert w.flush() == 0
    m2 = Model(cfg)
    m2.state, m2.calendar = read_restart(path, m2.state)
    assert m2.calendar.istep == 2
    _assert_state_equal(m.state, m2.state)
    w.stop()


def test_restart_cdf1_bfb(tmp_path):
    """netCDF-3 classic restart (restart_format='cdf1') round-trips exactly,
    including non-netCDF3 dtypes (bool/int64 leaves) via recorded casts."""
    cfg = _cfg(tmp_path)
    m = Model(cfg)
    m.run(2)
    path = write_restart(cfg.setup.restart_dir, m.state, m.calendar,
                         fmt="cdf1")
    assert path.endswith(".nc")
    m2 = Model(cfg)
    m2.state, m2.calendar = read_restart(path, m2.state)
    assert m2.calendar.istep == 2
    _assert_state_equal(m.state, m2.state)


def test_driver_io_async_run_bfb(tmp_path):
    """Full driver with io_async=True: restart-resume stays BFB vs the
    synchronous path, and history files are complete after run() returns."""
    cfg_sync = _cfg(tmp_path / "sync")
    cfg_async = _cfg(tmp_path / "async", **{"setup.io_async": True,
                                            "setup.histfreq": ("1",),
                                            "setup.histfreq_n": (1,)})
    cfg_sync = cfg_sync.with_overrides(**{"setup.histfreq": ("1",),
                                          "setup.histfreq_n": (1,)})

    m1 = Model(cfg_sync, enable_history=True)
    m1.run(3)
    m2 = Model(cfg_async, enable_history=True)
    assert m2.io_writer is not None
    m2.run(3)
    _assert_state_equal(m1.state, m2.state)

    h1 = sorted(os.listdir(cfg_sync.setup.history_dir))
    h2 = sorted(os.listdir(cfg_async.setup.history_dir))
    assert h1 == h2 and len(h2) == 3
    # async-written netCDF history parses and matches the sync bytes
    from scipy.io import netcdf_file
    for fn in h2:
        a = os.path.join(cfg_sync.setup.history_dir, fn)
        b = os.path.join(cfg_async.setup.history_dir, fn)
        assert open(a, "rb").read() == open(b, "rb").read()
        with netcdf_file(b, "r", mmap=False) as f:
            assert "aice" in f.variables

    # restart via async pool, continue run
    p = m2.write_restart()
    m2.flush_io()
    m3 = Model(cfg_async)
    m3.state, m3.calendar = read_restart(p, m3.state)
    _assert_state_equal(m2.state, m3.state)
