"""Auxiliary subsystem tests: timers, restoring, QC statistical test."""

import numpy as np
import jax.numpy as jnp

from cice_tpu.cli.qc import qc_compare
from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.model.restoring import (boundary_zone_weight, restore_ice,
                                      restore_sst)
from cice_tpu.model.state import zeros_state
from cice_tpu.utils.timers import Timers


# --- timers -----------------------------------------------------------------

def test_timers_accumulate_and_print():
    t = Timers().init_standard()
    import time
    with t("Dynamics"):
        time.sleep(0.01)
    t.start("Column")
    time.sleep(0.005)
    t.stop("Column")
    assert t.get("Dynamics") >= 0.01
    assert t.get("Column") >= 0.004
    txt = t.print_all(stats=True)
    assert "Dynamics" in txt and "seconds" in txt
    assert dict(t.items())["Dynamics"] > 0


# --- restoring --------------------------------------------------------------

def test_boundary_zone_weight_shape():
    grid = rectgrid(16, 12, kmt_type="none")
    w = np.asarray(boundary_zone_weight(grid, width=3))
    # open NS boundaries carry weight; cyclic EW do not
    assert w[0, 8] == 1.0 and w[-1, 8] == 1.0
    assert w[6, 0] == 0.0                      # cyclic side untouched
    assert w[3, 8] == 0.0                      # interior

def test_restore_ice_pulls_toward_target():
    cfg = Config().with_overrides(**{"forcing.trestore": 1})
    grid = rectgrid(16, 12, kmt_type="none")
    state = zeros_state(cfg, grid)
    ncat = cfg.domain.ncat
    target_a = jnp.full((ncat,) + grid.shape, 0.5)
    target = (target_a, target_a * 2.0, target_a * 0.1)
    out = state
    for _ in range(5):
        out = restore_ice(cfg, grid, out, target, dt=86400.0)
    a = np.asarray(out.aicen)
    assert a[0, 0, 8] > 0.4          # boundary row pulled to target
    assert a[0, 6, 8] == 0.0         # interior untouched


def test_restore_sst():
    cfg = Config().with_overrides(**{"forcing.trestore": 0})
    grid = rectgrid(8, 8, kmt_type="none")
    state = zeros_state(cfg, grid).replace(sst=jnp.full(grid.shape, -1.0))
    out = restore_sst(cfg, state, jnp.full(grid.shape, 2.0), 3600.0)
    np.testing.assert_allclose(np.asarray(out.sst), 2.0)


# --- QC t-test --------------------------------------------------------------

def _series(nt=400, ny=10, nx=10, seed=0, bias=0.0, scale=1.0):
    rng = np.random.default_rng(seed)
    base = 1.5 + 0.5 * np.sin(np.linspace(0, 8 * np.pi, nt))[:, None, None]
    spatial = 1.0 + 0.3 * rng.standard_normal((ny, nx))
    noise = 0.05 * rng.standard_normal((nt, ny, nx))
    return (base * spatial * scale + noise + bias)


def test_qc_identical_passes():
    a = _series(seed=1)
    b = a + 0.01 * np.random.default_rng(2).standard_normal(a.shape)
    res = qc_compare(a, b)
    assert res.passed, str(res)


def test_qc_biased_fails():
    a = _series(seed=3)
    b = _series(seed=3, bias=0.5)      # 50 cm systematic thickness bias
    res = qc_compare(a, b)
    assert not res.stage1_passed, str(res)
    assert not res.passed


def test_qc_pattern_change_fails_stage2():
    a = _series(seed=4)
    rng = np.random.default_rng(5)
    # completely different spatial pattern, same magnitude
    b = _series(seed=6) * (1.0 + 0.5 * rng.standard_normal((1, 10, 10)))
    res = qc_compare(a, b)
    assert not res.passed


def test_perf_suite_harness():
    """perf_suite.ts analogue: rows for sizes/strong/weak sweeps with
    efficiency vs the 1-device anchor (runs tiny shapes on the test mesh)."""
    from cice_tpu.cli.perf import run_perf
    rows = run_perf(sizes=((16, 16),), ndte=2, mesh_devices=(1, 2),
                    weak_tile=(16, 16), out=lambda s: None)
    sweeps = {r["sweep"] for r in rows}
    assert sweeps == {"sizes", "strong", "weak"}
    for r in rows:
        assert r["Mptsub_s"] > 0
        if r["sweep"] != "sizes":
            assert 0 < r["efficiency"] <= 1.5
