"""Exact-restart contract test (reference restart test, SURVEY §4.1:
run N steps; restart from a mid-run dump; final state must be bit-for-bit
identical to the uninterrupted run)."""

import numpy as np
import jax
import pytest

from cice_tpu.config import Config
from cice_tpu.model.driver import Model
from cice_tpu.io.restart import read_restart, write_restart


def _cfg(tmp_path):
    return Config().with_overrides(**{
        "grid.nx_global": 24, "grid.ny_global": 24,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 10, "thermo.nit": 4,
        "setup.dumpfreq": "x",
        "setup.restart_dir": str(tmp_path / "restart"),
        "setup.pointer_file": str(tmp_path / "restart" / "ice.restart_file"),
    })


def _assert_state_equal(s1, s2):
    l1 = jax.tree.leaves(s1)
    l2 = jax.tree.leaves(s2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restart_bfb(tmp_path):
    cfg = _cfg(tmp_path)
    # continuous run: 6 steps
    m1 = Model(cfg)
    m1.run(6)

    # interrupted run: 3 steps, dump, new model, resume, 3 more
    m2 = Model(cfg)
    m2.run(3)
    path = m2.write_restart()
    m3 = Model(cfg)
    m3.state, m3.calendar = read_restart(path, m3.state)
    assert m3.calendar.istep == 3
    m3.run(3)

    assert m3.calendar.timestamp() == m1.calendar.timestamp()
    _assert_state_equal(m1.state, m3.state)


def test_pointer_file(tmp_path):
    cfg = _cfg(tmp_path)
    m = Model(cfg)
    m.run(1)
    p = m.write_restart()
    with open(cfg.setup.pointer_file) as f:
        assert f.read().strip() == p
    # runtype='continue' resumes from the pointer
    cfg2 = cfg.with_overrides(**{"setup.runtype": "continue"})
    m2 = Model(cfg2)
    assert m2.calendar.istep == 1
    _assert_state_equal(m.state, m2.state)
