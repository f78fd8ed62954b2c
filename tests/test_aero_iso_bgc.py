"""Aerosol, isotope and skeletal-layer BGC tracer tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config, box2001_config
from cice_tpu.columns.aero_iso import step_aerosols, step_isotopes
from cice_tpu.columns.zbgc import step_bgc_skl

NCAT, NY, NX = 3, 4, 4
SHP = (NCAT, NY, NX)


def _cfg(n_aero=2, n_iso=3):
    return Config().with_overrides(**{
        "domain.n_aero": n_aero, "domain.n_iso": n_iso,
        "tracers.tr_aero": True, "tracers.tr_iso": True})


def test_aerosol_deposition_and_scavenging():
    cfg = _cfg()
    a = jnp.full(SHP, 0.8)
    kw = dict(aicen=a, vicen=a * 1.0, vsnon=a * 0.2,
              aerosno=jnp.zeros((NCAT, 4, NY, NX)),
              aeroice=jnp.zeros((NCAT, 4, NY, NX)),
              snoice=jnp.zeros(SHP), fsnow=jnp.zeros((NY, NX)))
    # deposition only (no melt): burden grows in the snow SSL
    sn, ic, focn = step_aerosols(cfg, 86400.0, melts=jnp.zeros(SHP),
                                 meltt=jnp.zeros(SHP), **kw)
    assert np.all(np.asarray(sn[:, 0]) > 0.0)      # species 0 snow SSL
    assert np.all(np.asarray(focn) == 0.0)
    # strong snow melt: some burden reaches the ocean
    kw2 = dict(kw)
    kw2["aerosno"] = sn
    sn2, ic2, focn2 = step_aerosols(cfg, 86400.0,
                                    melts=jnp.full(SHP, 0.1),
                                    meltt=jnp.zeros(SHP), **kw2)
    assert np.all(np.asarray(focn2) > 0.0)
    # second step deposits one more day's burden, minus scavenging losses
    assert np.asarray(sn2[:, 0]).mean() < np.asarray(sn[:, 0]).mean() * 2.0


def test_isotope_budget_closed():
    cfg = _cfg()
    a = jnp.full(SHP, 0.8)
    sn0 = jnp.full((NCAT, 3, NY, NX), 1.0)
    ic0 = jnp.zeros((NCAT, 3, NY, NX))
    sn, ic, focn = step_isotopes(
        cfg, 3600.0, aicen=a, vsnon=a * 0.2, isosno=sn0, isoice=ic0,
        fsnow=jnp.zeros((NY, NX)), melts=jnp.zeros(SHP),
        snoice=jnp.full(SHP, 0.05))
    # snow-ice formation moved isotope mass from snow to ice, conserving it
    tot0 = np.asarray(sn0 + ic0).sum()
    tot1 = np.asarray(sn + ic).sum()
    np.testing.assert_allclose(tot1, tot0, rtol=1e-6)
    assert np.asarray(ic).sum() > 0.0


def test_bgc_growth_light_and_dark():
    cfg = Config().with_overrides(**{"zbgc.skl_bgc": True})
    a = jnp.full(SHP, 0.9)
    kw = dict(aicen=a, vicen=a * 1.0,
              bgc_N=jnp.full(SHP, 1.0), bgc_Nit=jnp.full(SHP, 10.0),
              Tbot=jnp.full(SHP, -1.8), meltb=jnp.zeros(SHP),
              congel=jnp.zeros(SHP), nit_ocn=10.0)
    lit = step_bgc_skl(cfg.zbgc, 86400.0, fswthru=jnp.full(SHP, 20.0), **kw)
    dark = step_bgc_skl(cfg.zbgc, 86400.0, fswthru=jnp.zeros(SHP), **kw)
    assert np.asarray(lit.bgc_N).mean() > np.asarray(dark.bgc_N).mean()
    # growth consumes nitrate
    assert np.asarray(lit.bgc_Nit).mean() < 10.0 + 1e-6
    assert np.all(np.asarray(lit.bgc_N) >= 0.0)


def test_bgc_bottom_melt_releases():
    cfg = Config().with_overrides(**{"zbgc.skl_bgc": True})
    a = jnp.full(SHP, 0.9)
    out = step_bgc_skl(cfg.zbgc, 3600.0, aicen=a, vicen=a,
                       bgc_N=jnp.full(SHP, 5.0), bgc_Nit=jnp.full(SHP, 5.0),
                       fswthru=jnp.zeros(SHP), Tbot=jnp.full(SHP, -1.8),
                       meltb=jnp.full(SHP, 0.02), congel=jnp.zeros(SHP),
                       nit_ocn=10.0)
    assert np.asarray(out.bgc_N).mean() < 5.0
    assert np.all(np.asarray(out.flux_NO3_ocn) != 0.0)


@pytest.mark.slow
def test_tracers_end_to_end():
    from cice_tpu.model.driver import Model
    cfg = box2001_config(16, 16).with_overrides(**{
        "domain.n_aero": 2, "domain.n_iso": 3,
        "tracers.tr_aero": True, "tracers.tr_iso": True,
        "zbgc.skl_bgc": True,
        "forcing.atm_data_type": "seasonal"})
    m = Model(cfg)
    m.run(4)
    for name in ("aerosno", "aeroice", "isosno", "isoice", "bgc_N",
                 "bgc_Nit"):
        arr = np.asarray(m.state.trcrn[name])
        assert not np.isnan(arr).any(), name
