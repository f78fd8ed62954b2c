"""Physics options: sealvl ponds, saltflux_option, congel_freeze.

Reference surfaces: tr_pond_sealvl tracer family (set_nml.pondsealvl;
ug_case_settings.rst:490,626), thermo_nml saltflux_option
(ug_case_settings.rst:782), congel_freeze (ug_case_settings.rst:709).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.columns.ponds import compute_ponds_sealvl
from cice_tpu.columns.thermo_vertical import thickness_changes
from cice_tpu.columns import mushy as mush


def _pond_args(shape=(1, 4, 4)):
    z = jnp.zeros(shape)
    return dict(aicen=z + 0.9, vicen=z + 1.8, vsnon=z + 0.0,
                apnd=z + 0.1, hpnd=z + 0.05, ipnd=z,
                Tsf=z - 0.1, meltt=z + 0.02, melts=z,
                frain=z, aice=jnp.zeros(shape[1:]) + 0.9)


def test_sealvl_equilibrium_fraction():
    cfg = Config().with_overrides(**{"ponds.apnd_sl": 0.27,
                                     "ponds.rfracmin": 1.0,
                                     "ponds.rfracmax": 1.0})
    out = compute_ponds_sealvl(cfg.ponds, 3600.0, **_pond_args())
    # pond fraction relaxes to the equilibrium value where water exists
    assert np.allclose(np.asarray(out.apnd), 0.27)
    assert (np.asarray(out.hpnd) > 0.0).all()
    assert np.isfinite(np.asarray(out.dpnd_flush)).all()


def test_sealvl_volume_budget():
    cfg = Config().with_overrides(**{"ponds.rfracmin": 1.0,
                                     "ponds.rfracmax": 1.0,
                                     "ponds.frzpnd": "hlid"})
    a = _pond_args()
    dt = 3600.0
    out = compute_ponds_sealvl(cfg.ponds, dt, **a)
    vol_in = float((a["apnd"] * a["hpnd"])[0, 0, 0]) + \
        float((1.0 * (917.0 * a["meltt"][0, 0, 0]) / 1000.0))
    vol_out = float((out.apnd * out.hpnd + out.dpnd_flush)[0, 0, 0])
    # water in = pond + drained (lid displacement is zero at Tsf=-0.1)
    assert vol_out == pytest.approx(vol_in, rel=1e-5)


def test_sealvl_freeboard_guard():
    """Thin ice cannot hold deep ponds: excess drains immediately."""
    cfg = Config()
    a = _pond_args()
    a["vicen"] = jnp.zeros_like(a["vicen"]) + 0.09     # hi = 0.1 m
    a["hpnd"] = jnp.zeros_like(a["hpnd"]) + 1.0        # absurd 1 m pond
    a["apnd"] = jnp.zeros_like(a["apnd"]) + 0.5
    out = compute_ponds_sealvl(cfg.ponds, 3600.0, **a)
    hi = 0.1
    vol_max = (1026.0 * hi - 917.0 * hi) / 1000.0
    assert float((out.apnd * out.hpnd)[0, 0, 0]) <= vol_max + 1e-6
    assert float(out.dpnd_flush[0, 0, 0]) > 0.3


def test_sealvl_drainage_timescale():
    """Shorter tscale_pnd_drain drains above-sea-level water faster."""
    a = _pond_args()
    a["apnd"] = jnp.zeros_like(a["apnd"]) + 0.5   # deep pond above sea level
    a["hpnd"] = jnp.zeros_like(a["hpnd"]) + 0.5
    slow = Config().with_overrides(**{"ponds.tscale_pnd_drain": 10.0})
    fast = Config().with_overrides(**{"ponds.tscale_pnd_drain": 0.1})
    o_slow = compute_ponds_sealvl(slow.ponds, 3600.0, **a)
    o_fast = compute_ponds_sealvl(fast.ponds, 3600.0, **a)
    assert float(o_fast.dpnd_flush.sum()) > float(o_slow.dpnd_flush.sum())


def _thick_args(nilyr=4, shape=(4, 4)):
    z = jnp.zeros(shape)
    qi = [z - 2.0e8] * nilyr
    qs = [z - 1.1e8]
    salin = [z + 5.0] * nilyr
    Tm = [z - 0.3] * nilyr
    # growth regime: upward conduction away from the bottom boundary
    # (fcondbot strongly negative in the downward-positive convention)
    # exceeds the ocean melt-heat delivery |fbot|:
    # ebot = (fbot - fcondbot)*dt > 0 freezes congelation ice
    return dict(hin=z + 1.0, hsn=z + 0.0, qice=qi, qsno=qs, Tm=Tm,
                salin=salin, Tbot=z - 1.8, fbot=z - 10.0,
                fsurf=z - 5.0, fcondtop=z - 5.0, fcondbot=z - 60.0,
                flat=z, sss=z + 34.0)


def test_saltflux_constant_vs_prognostic():
    dt = 3600.0
    a = _thick_args()
    out_c, _, _ = thickness_changes(dt, 4, 1, **a,
                                    saltflux_option="constant",
                                    ice_ref_salinity=4.0)
    out_p, _, _ = thickness_changes(dt, 4, 1, **a,
                                    saltflux_option="prognostic")
    # bottom growth removes salt from the ocean: negative fsalt
    assert (np.asarray(out_c.congel) > 0.0).all()
    assert (np.asarray(out_c.fsaltn) < 0.0).all()
    # prognostic at S=5 ppt pulls more salt than constant at 4 ppt
    assert (np.asarray(out_p.fsaltn) < np.asarray(out_c.fsaltn)).all()
    ratio = np.asarray(out_p.fsaltn) / np.asarray(out_c.fsaltn)
    assert np.allclose(ratio, 5.0 / 4.0, rtol=1e-5)


def test_congel_freeze_modes():
    Tbot = jnp.asarray(-1.8)
    # two-step: mushy congelation at phi_i_mushy solid fraction
    q2, S2 = mush.new_ice_enthalpy_salinity(Tbot, 34.0, 0.85)
    # one-step: freeze solid immediately
    q1, S1 = mush.new_ice_enthalpy_salinity(Tbot, 34.0, 1.0)
    assert float(S1) < float(S2)         # solid ice holds less brine salt
    assert float(q1) < float(q2)         # more latent heat released (lower q)


def test_model_smoke_sealvl_saltflux():
    """2 coupled steps with pondsealvl + prognostic saltflux stay finite."""
    from cice_tpu.cli.main import OPTION_SETS
    from cice_tpu.model.driver import Model
    over = {"grid.nx_global": 16, "grid.ny_global": 16,
            "grid.grid_format": "rect", "grid.kmt_type": "none",
            "forcing.atm_data_type": "box2001",
            "forcing.ocn_data_type": "box2001",
            "dynamics.ndte": 10, "thermo.nit": 4}
    over.update(OPTION_SETS["pondsealvl"])
    over.update(OPTION_SETS["saltflux"])
    over.update(OPTION_SETS["congel"])
    m = Model(Config().with_overrides(**over))
    m.run(2)
    for leaf in __import__("jax").tree.leaves(m.state):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.sum(m.state.aice)) > 0.0
