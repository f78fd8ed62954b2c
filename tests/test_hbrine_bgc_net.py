"""Brine-height tracer and full skeletal BGC network tests.

Oracles follow the reference semantics (SURVEY.md §2.9 hbrine/zbgc groups):
fbri stays bounded, relaxes toward the hydrostatic sea level, new ice forms
brine-full; the nutrient network conserves sign, consumes nutrients in the
light, and exchanges with the ocean.
"""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import Config
from cice_tpu.columns.hbrine import FBRI_MAX, FBRI_MIN, update_hbrine
from cice_tpu.columns.zbgc import step_bgc_skl_net

SHP = (1, 4, 4)


def _thermo_inputs(hin=1.0, S=5.0, T=-5.0):
    from cice_tpu.columns.mushy import enthalpy_mush
    nilyr = 3
    q = jnp.full((1, nilyr) + SHP[1:], float(enthalpy_mush(T, S)))
    s = jnp.full((1, nilyr) + SHP[1:], S)
    return q, s


def test_hbrine_bounds_and_relaxation():
    q, s = _thermo_inputs(T=-2.0)   # warm ice -> permeable
    a = jnp.full(SHP, 0.9)
    v = jnp.full(SHP, 0.9)          # hin = 1 m
    vs = jnp.zeros(SHP)
    z = jnp.zeros(SHP)
    # start far above sea level: brine must drain downward
    out = update_hbrine(86400.0, aicen=a, vicen=v, vsnon=vs,
                        fbri=jnp.full(SHP, FBRI_MAX), qice=q, sice=s,
                        meltb=z, meltt=z, congel=z)
    h_ocn = 917.0 / 1026.0
    assert np.all(np.asarray(out.fbri) <= FBRI_MAX + 1e-6)
    assert np.asarray(out.fbri).mean() < FBRI_MAX      # drained toward h_ocn
    assert np.asarray(out.fbri).mean() >= h_ocn - 0.05
    # and from below sea level it floods upward
    out2 = update_hbrine(86400.0, aicen=a, vicen=v, vsnon=vs,
                         fbri=jnp.full(SHP, FBRI_MIN), qice=q, sice=s,
                         meltb=z, meltt=z, congel=z)
    assert np.asarray(out2.fbri).mean() > FBRI_MIN


def test_hbrine_cold_ice_impermeable():
    q, s = _thermo_inputs(T=-20.0, S=3.0)   # cold -> phi^3 tiny
    a = jnp.full(SHP, 0.9)
    v = jnp.full(SHP, 0.9)
    z = jnp.zeros(SHP)
    f0 = jnp.full(SHP, 1.1)
    out = update_hbrine(3600.0, aicen=a, vicen=v, vsnon=jnp.zeros(SHP),
                        fbri=f0, qice=q, sice=s, meltb=z, meltt=z, congel=z)
    # nearly no drainage through impermeable ice in an hour
    assert abs(np.asarray(out.fbri).mean() - 1.1) < 1e-3


def test_hbrine_new_ice_full():
    q, s = _thermo_inputs()
    a = jnp.full(SHP, 0.5)
    out = update_hbrine(3600.0, aicen=a, vicen=jnp.full(SHP, 0.5),
                        vsnon=jnp.zeros(SHP), fbri=jnp.zeros(SHP),
                        qice=q, sice=s, meltb=jnp.zeros(SHP),
                        meltt=jnp.zeros(SHP), congel=jnp.zeros(SHP))
    assert np.allclose(np.asarray(out.fbri), 1.0)


def _net_cfg():
    return Config().with_overrides(**{
        "zbgc.skl_bgc": True, "zbgc.tr_bgc_Am": True, "zbgc.tr_bgc_Sil": True,
        "zbgc.tr_bgc_DMS": True, "zbgc.tr_bgc_PON": True,
        "zbgc.n_algae": 2}).zbgc


def _net_trc(val=1.0):
    f = lambda v: jnp.full(SHP, v)
    return dict(bgc_N=f(1.0), bgc_N2=f(0.5), bgc_Nit=f(8.0), bgc_Am=f(1.0),
                bgc_Sil=f(20.0), bgc_DMSPp=f(0.2), bgc_DMSPd=f(0.1),
                bgc_DMS=f(0.05), bgc_PON=f(0.1))


def test_bgc_net_growth_consumes_nutrients():
    z = _net_cfg()
    a = jnp.full(SHP, 0.9)
    kw = dict(aicen=a, Tbot=jnp.full(SHP, -1.8), meltb=jnp.zeros(SHP),
              congel=jnp.zeros(SHP),
              ocean={"bgc_Nit": 0.0, "bgc_Am": 0.0, "bgc_Sil": 0.0,
                     "bgc_DMSPd": 0.0, "bgc_DMS": 0.0})
    lit = step_bgc_skl_net(z, 86400.0, trc=_net_trc(),
                           fswthru=jnp.full(SHP, 30.0), **kw)
    dark = step_bgc_skl_net(z, 86400.0, trc=_net_trc(),
                            fswthru=jnp.zeros(SHP), **kw)
    # light grows algae and draws nutrients down relative to dark
    assert np.asarray(lit.trc["bgc_N"]).mean() > \
        np.asarray(dark.trc["bgc_N"]).mean()
    assert np.asarray(lit.trc["bgc_Nit"]).mean() < \
        np.asarray(dark.trc["bgc_Nit"]).mean()
    assert np.asarray(lit.trc["bgc_Sil"]).mean() < \
        np.asarray(dark.trc["bgc_Sil"]).mean()   # diatoms take silicate
    for k, v in lit.trc.items():
        assert np.all(np.asarray(v) >= 0.0), k
        assert np.all(np.isfinite(np.asarray(v))), k


def test_bgc_net_sulfur_cycle():
    z = _net_cfg()
    a = jnp.full(SHP, 0.9)
    trc = _net_trc()
    trc["bgc_DMS"] = jnp.zeros(SHP)
    out = step_bgc_skl_net(z, 86400.0, aicen=a, trc=trc,
                           fswthru=jnp.full(SHP, 30.0),
                           Tbot=jnp.full(SHP, -1.8), meltb=jnp.zeros(SHP),
                           congel=jnp.zeros(SHP),
                           ocean={"bgc_DMS": 0.0, "bgc_DMSPd": 0.0,
                                  "bgc_Nit": 8.0, "bgc_Am": 1.0,
                                  "bgc_Sil": 20.0})
    # DMSPd conversion produced DMS
    assert np.asarray(out.trc["bgc_DMS"]).mean() > 0.0


def test_model_with_brine_and_full_bgc():
    from cice_tpu.model.driver import Model
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001",
        "dynamics.ndte": 5, "thermo.nit": 3,
        "tracers.tr_brine": True,
        "zbgc.skl_bgc": True, "zbgc.tr_bgc_Am": True,
        "zbgc.tr_bgc_DMS": True, "zbgc.tr_bgc_Sil": True})
    m = Model(cfg)
    m.run(2)
    st = m.state
    for name in ("fbri", "bgc_N", "bgc_Nit", "bgc_Am", "bgc_Sil", "bgc_DMS"):
        assert name in st.trcrn, name
        arr = np.asarray(st.trcrn[name])
        assert np.all(np.isfinite(arr)), name
    # brine fraction bounded where ice exists
    ai = np.asarray(st.aicen)
    fb = np.asarray(st.trcrn["fbri"])
    assert np.all(fb[ai > 1e-6] <= FBRI_MAX + 1e-5)

    from cice_tpu.model.diagnostics import bgc_diags, hbrine_diags
    bd = bgc_diags(m.grid, st)
    hd = hbrine_diags(m.grid, st)
    assert np.isfinite(float(bd["bgc_N_tot"]))
    assert 0.0 <= float(hd["fbri_mean"]) <= FBRI_MAX + 1e-5


def test_bgc_net_reactive_carbon():
    """Skeletal carbon is REACTIVE (round 4; reference zbgc carbon
    family): growth draws DIC down, mortality feeds DOC, bacterial
    remineralization respires DOC back to DIC."""
    z = Config().with_overrides(**{
        "zbgc.skl_bgc": True, "zbgc.tr_bgc_Am": True,
        "zbgc.tr_bgc_C": True}).zbgc
    f = lambda v: jnp.full(SHP, v)
    trc = dict(bgc_N=f(1.0), bgc_Nit=f(8.0), bgc_Am=f(1.0),
               bgc_DOC1=f(10.0), bgc_DOC2=f(10.0), bgc_DIC1=f(1900.0))
    kw = dict(aicen=f(0.9), Tbot=f(-1.8), meltb=jnp.zeros(SHP),
              congel=jnp.zeros(SHP),
              ocean={"bgc_Nit": 0.0, "bgc_Am": 0.0, "bgc_DOC1": 0.0,
                     "bgc_DOC2": 0.0, "bgc_DIC1": 0.0})
    lit = step_bgc_skl_net(z, 86400.0, trc=dict(trc),
                           fswthru=f(30.0), **kw)
    dark = step_bgc_skl_net(z, 86400.0, trc=dict(trc),
                            fswthru=jnp.zeros(SHP), **kw)
    # photosynthetic DIC drawdown only in the light
    assert np.asarray(lit.trc["bgc_DIC1"]).mean() < \
        np.asarray(dark.trc["bgc_DIC1"]).mean()
    # DOC turns over: piston loss + remin vs mortality source; with zero
    # ocean DOC the pools must change (not be advect-passive constants)
    assert not np.allclose(np.asarray(lit.trc["bgc_DOC1"]),
                           np.asarray(trc["bgc_DOC1"]))
    for k, v in lit.trc.items():
        assert np.all(np.isfinite(np.asarray(v))), k
        assert np.all(np.asarray(v) >= 0.0), k


def test_bgc_net_two_iron_classes():
    """2 dissolved + 2 particulate iron classes (reference
    icepack_max_fe=2, zbgc_nml n_fed/n_fep; round 3 carried 1+1):
    each dissolved class scavenges onto its particulate partner, and
    melt releases particulates to the ocean."""
    from cice_tpu.model.state import tracer_registry
    cfg = Config().with_overrides(**{
        "zbgc.skl_bgc": True, "zbgc.tr_bgc_Fe": True,
        "zbgc.n_fed": 2, "zbgc.n_fep": 2})
    names = {s.name for s in tracer_registry(cfg)}
    assert {"bgc_Fed", "bgc_Fep", "bgc_Fed2", "bgc_Fep2"} <= names

    z = cfg.zbgc
    f = lambda v: jnp.full(SHP, v)
    trc = dict(bgc_N=f(1.0), bgc_Nit=f(8.0),
               bgc_Fed=f(1.0), bgc_Fep=f(0.5),
               bgc_Fed2=f(2.0), bgc_Fep2=f(0.2))
    out = step_bgc_skl_net(
        z, 86400.0, aicen=f(0.9), trc=dict(trc), fswthru=jnp.zeros(SHP),
        Tbot=f(-1.8), meltb=f(0.01), congel=jnp.zeros(SHP),
        ocean={"bgc_Nit": 0.0, "bgc_Fed": 0.0, "bgc_Fed2": 0.0})
    # scavenging moves dissolved -> particulate in BOTH classes; melt
    # releases particulate to the ocean (flux reported)
    assert np.asarray(out.trc["bgc_Fed"]).mean() < 1.0
    assert np.asarray(out.trc["bgc_Fed2"]).mean() < 2.0
    assert "bgc_Fep" in out.flux_bgc_ocn and "bgc_Fep2" in out.flux_bgc_ocn
    assert np.asarray(out.flux_bgc_ocn["bgc_Fep"]).mean() > 0.0
    for k, v in out.trc.items():
        assert np.all(np.isfinite(np.asarray(v))), k
