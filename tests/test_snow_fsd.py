"""Snow physics (tr_snow) and floe-size distribution (tr_fsd) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config, box2001_config
from cice_tpu.columns import fsd as fsd_mod
from cice_tpu.columns import snow as snow_mod

SHP = (3, 4, 4)


# --- snow -------------------------------------------------------------------

def test_wind_compaction_monotone():
    cfg = Config()
    r0 = jnp.zeros((3, 1, 4, 4))
    calm = snow_mod.update_rhos_wind(cfg.snow, 86400.0, r0, jnp.full((1, 4, 4), 5.0))
    storm = snow_mod.update_rhos_wind(cfg.snow, 86400.0, r0, jnp.full((1, 4, 4), 20.0))
    assert np.all(np.asarray(calm) == 0.0)          # below windmin
    assert np.all(np.asarray(storm) > 0.0)
    assert np.all(np.asarray(storm) <= cfg.snow.rhosmax - cfg.snow.rhosmin)


def test_grain_growth_wet_faster_than_dry():
    cfg = Config()
    r = jnp.full(SHP, 100.0)
    smice = jnp.full(SHP, 30.0)
    dry = snow_mod.grain_metamorphism(cfg.snow, 86400.0, r,
                                      jnp.full(SHP, -2.0), smice,
                                      jnp.zeros(SHP))
    wet = snow_mod.grain_metamorphism(cfg.snow, 86400.0, r,
                                      jnp.full(SHP, -0.1), smice,
                                      jnp.full(SHP, 3.0))
    assert np.all(np.asarray(dry) >= 100.0)
    assert np.asarray(wet).mean() > np.asarray(dry).mean()
    cold = snow_mod.grain_metamorphism(cfg.snow, 86400.0, r,
                                       jnp.full(SHP, -30.0), smice,
                                       jnp.zeros(SHP))
    assert np.asarray(cold).mean() < np.asarray(dry).mean()


def test_snow_liquid_budget_melt_refreeze():
    smice = jnp.full(SHP, 30.0)
    smliq = jnp.zeros(SHP)
    a = jnp.full(SHP, 0.8)
    # melting: ice mass -> liquid
    si, sl, dr = snow_mod.snow_liquid_budget(
        3600.0, smice=smice, smliq=smliq, Tsno=jnp.full(SHP, 0.0),
        melts_lyr=jnp.full(SHP, 0.01), frain=jnp.zeros(SHP),
        fsnow=jnp.zeros(SHP), aicen=a)
    assert np.all(np.asarray(si) < 30.0)
    total0 = 30.0
    np.testing.assert_allclose(np.asarray(si + sl + dr), total0, rtol=1e-6)
    # cold: liquid refreezes
    si2, sl2, _ = snow_mod.snow_liquid_budget(
        3600.0, smice=smice, smliq=jnp.full(SHP, 2.0),
        Tsno=jnp.full(SHP, -10.0), melts_lyr=jnp.zeros(SHP),
        frain=jnp.zeros(SHP), fsnow=jnp.zeros(SHP), aicen=a)
    assert np.all(np.asarray(sl2) < 2.0)
    assert np.all(np.asarray(si2) > 30.0)


# --- fsd --------------------------------------------------------------------

def test_fsd_bounds_monotone():
    lo, hi, mid = fsd_mod.fsd_bounds(12)
    assert len(lo) == 12
    assert np.all(hi > lo)
    assert np.all(np.diff(lo) > 0)
    lo2, hi2, _ = fsd_mod.fsd_bounds(16)   # extension path
    assert len(lo2) == 16 and np.all(np.diff(lo2) > 0)


def _uniform_fsd(nfsd=12):
    f = jnp.full((2, nfsd, 3, 3), 1.0 / nfsd)
    return f


def test_fsd_cleanup_normalizes():
    f = _uniform_fsd() * 3.0
    a = jnp.full((2, 3, 3), 0.5)
    out = fsd_mod.fsd_cleanup(f, a)
    np.testing.assert_allclose(np.asarray(jnp.sum(out, axis=1)), 1.0,
                               rtol=1e-6)


def test_fsd_new_ice_enters_smallest_bin():
    nfsd = 12
    f = jnp.zeros((2, nfsd, 3, 3)).at[:, -1].set(1.0)   # all large floes
    a = jnp.full((2, 3, 3), 0.4)
    out = fsd_mod.fsd_new_ice(f, a, jnp.full((2, 3, 3), 0.4), nfsd)
    assert np.allclose(np.asarray(out[:, 0]), 0.5, atol=1e-6)
    assert np.allclose(np.asarray(out[:, -1]), 0.5, atol=1e-6)


def test_fsd_weld_moves_up_when_freezing():
    nfsd = 12
    f = _uniform_fsd(nfsd)
    a = jnp.full((2, 3, 3), 0.9)
    out = fsd_mod.fsd_weld(86400.0, f, a, jnp.full((3, 3), 100.0), nfsd)
    assert np.asarray(out[:, 0]).mean() < np.asarray(f[:, 0]).mean()
    assert np.asarray(out[:, -1]).mean() > np.asarray(f[:, -1]).mean()
    # melting: no welding
    out2 = fsd_mod.fsd_weld(86400.0, f, a, jnp.full((3, 3), -50.0), nfsd)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(f))


def test_wave_fracture_breaks_large_floes():
    cfg = Config().with_overrides(**{"domain.nfsd": 12,
                                     "tracers.tr_fsd": True})
    nfsd = 12
    f = jnp.zeros((2, nfsd, 3, 3)).at[:, -1].set(1.0)
    a = jnp.full((2, 3, 3), 0.8)
    v = a * 1.0
    out = fsd_mod.step_dyn_wave(cfg, 3600.0, fsd=f, aicen=a, vicen=v,
                                hs_wave=jnp.full((3, 3), 3.0),
                                Tp_wave=jnp.full((3, 3), 10.0))
    assert np.asarray(out[:, -1]).mean() < 1.0      # some large floes broke
    assert np.asarray(out[:, :4]).sum() > 0.0       # mass arrived in small bins
    np.testing.assert_allclose(np.asarray(jnp.sum(out, axis=1)), 1.0,
                               rtol=1e-5)
    # calm seas: nothing happens
    out2 = fsd_mod.step_dyn_wave(cfg, 3600.0, fsd=f, aicen=a, vicen=v,
                                 hs_wave=jnp.zeros((3, 3)),
                                 Tp_wave=jnp.full((3, 3), 10.0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(f), atol=1e-6)


def test_wave_spectrum_moments_roundtrip():
    """Bretschneider E(f) on the 25-bin WW3 grid integrates back to the
    prescribed Hs (4 sqrt(m0)) within discretization error."""
    from cice_tpu.model.forcing import (bretschneider_spectrum,
                                        wave_frequencies)
    hs = jnp.full((3, 3), 2.5)
    Tp = jnp.full((3, 3), 9.0)
    E = bretschneider_spectrum(hs, Tp)
    f, df = wave_frequencies(hs.dtype)
    m0 = jnp.sum(E * df[:, None, None], axis=0)
    np.testing.assert_allclose(np.asarray(4.0 * jnp.sqrt(m0)), 2.5,
                               rtol=0.05)
    # spectral peak sits at the bin nearest 1/Tp
    kpk = int(jnp.argmax(E[:, 0, 0]))
    assert abs(float(f[kpk]) - 1.0 / 9.0) < float(df[kpk])


def test_wave_frac_histogram_monochromatic():
    """A single-frequency swell fractures ice into pieces of about half
    its wavelength (strain maxima at each crest/trough): the histogram
    mass lands in the FSD bin containing lambda/2."""
    from cice_tpu.model.forcing import wave_frequencies
    nfsd = 12
    f, df = wave_frequencies(jnp.float32)
    k = 4                                      # f ~ 0.060 Hz, lam ~ 4.3 km?
    lam = 9.80616 / (2 * np.pi * float(f[k]) ** 2)
    # pick a bin whose lam/2 falls inside the resolvable transect (5 km)
    while lam / 2.0 > fsd_mod.NX_TRANSECT * fsd_mod.DX_TRANSECT / 4:
        k += 1
        lam = 9.80616 / (2 * np.pi * float(f[k]) ** 2)
    E = jnp.zeros((25, 2, 2)).at[k].set(2.0 / float(df[k]))  # a ~ 2 m
    W = fsd_mod.wave_frac_histogram(E, df, f, jnp.full((2, 2), 1.5), nfsd)
    lo, hi_b, _ = fsd_mod.fsd_bounds(nfsd)
    tot = np.asarray(W).sum(axis=0)
    assert (tot > 0).all()
    # the dominant histogram bin must contain lambda/2
    dom = int(np.asarray(W)[:, 0, 0].argmax())
    assert float(lo[dom]) < lam / 2.0 <= float(hi_b[dom]) or \
        abs(float(lo[dom]) - lam / 2.0) < lam * 0.5


def test_spectral_fracture_conserves_and_shifts_down():
    """Spectral-path step_dyn_wave: area conserved per category; area moves
    from the largest bin toward smaller bins; calm seas are a no-op."""
    cfg = Config().with_overrides(**{"domain.nfsd": 12,
                                     "tracers.tr_fsd": True,
                                     "forcing.wave_spec_type": "profile"})
    from cice_tpu.model.forcing import bretschneider_spectrum
    nfsd = 12
    f = jnp.zeros((2, nfsd, 3, 3)).at[:, -1].set(1.0)
    a = jnp.full((2, 3, 3), 0.8)
    v = a * 1.2
    hs = jnp.full((3, 3), 3.0)
    Tp = jnp.full((3, 3), 10.0)
    E = bretschneider_spectrum(hs, Tp)
    out = fsd_mod.step_dyn_wave(cfg, 3600.0, fsd=f, aicen=a, vicen=v,
                                hs_wave=hs, Tp_wave=Tp, wave_spectrum=E)
    np.testing.assert_allclose(np.asarray(jnp.sum(out, axis=1)), 1.0,
                               rtol=1e-5)
    assert float(out[:, -1].mean()) < 1.0
    assert float(out[:, :-1].sum()) > 0.0
    out2 = fsd_mod.step_dyn_wave(cfg, 3600.0, fsd=f, aicen=a, vicen=v,
                                 hs_wave=jnp.zeros((3, 3)), Tp_wave=Tp,
                                 wave_spectrum=jnp.zeros_like(E))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(f), atol=1e-6)


@pytest.mark.slow
def test_snow_fsd_end_to_end():
    from cice_tpu.model.driver import Model
    cfg = box2001_config(20, 20).with_overrides(**{
        "tracers.tr_snow": True, "tracers.tr_fsd": True, "domain.nfsd": 12,
        "forcing.atm_data_type": "seasonal",
        "forcing.wave_spec_type": "profile"})
    m = Model(cfg)
    m.run(6)
    st = m.state
    f = np.asarray(st.trcrn["fsd"])
    r = np.asarray(st.trcrn["rsnw"])
    assert not np.isnan(f).any() and not np.isnan(r).any()
    a = np.asarray(st.aicen)
    tot = f.sum(axis=1)[a > 1e-6]
    np.testing.assert_allclose(tot, 1.0, atol=1e-3)
