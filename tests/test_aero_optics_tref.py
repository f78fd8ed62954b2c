"""Aerosol-in-snow dEdd darkening (kaer_tab optics, modal_aero) and
reference-height diagnostics Tref/Qref/Uref (icepack_atmo outputs)."""

import jax.numpy as jnp
import numpy as np

from cice_tpu.columns.atmo import atmo_boundary_layer
from cice_tpu.columns.dedd import shortwave_dEdd
from cice_tpu.config import Config


def _sw_args(shape=(1, 4, 4)):
    z = jnp.zeros(shape)
    return dict(Tsf=z - 10.0, hi=z + 1.5, hs=z + 0.2, hpnd=z,
                apeff=z, swvdr=jnp.zeros(shape[1:]) + 100.0,
                swvdf=jnp.zeros(shape[1:]) + 50.0,
                swidr=jnp.zeros(shape[1:]) + 80.0,
                swidf=jnp.zeros(shape[1:]) + 40.0,
                coszen=jnp.zeros(shape[1:]) + 0.5)


def _albedo(out):
    return float((out.alvdr + out.alvdf + out.alidr + out.alidf).mean()) / 4.0


def test_bc_in_snow_darkens():
    cfg = Config()
    a = _sw_args()
    clean = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1)
    sooty = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                           aero_snow=[jnp.full((1, 4, 4), 5e-5)])  # 50 ug/m^2... 5e-5 kg/m^2 BC
    assert _albedo(sooty) < _albedo(clean)
    # absorbed + albedo still conserves: fswsfc+fswint+fswthru <= incoming
    tot_in = 270.0
    absorbed = float((sooty.fswsfc + sooty.fswint + sooty.fswthru)[0].mean())
    assert 0.0 < absorbed <= tot_in + 1e-3


def test_modal_aero_darkens_more():
    cfg = Config()
    a = _sw_args()
    load = [jnp.full((1, 4, 4), 5e-5)]
    std = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                         aero_snow=load, modal_aero=False)
    modal = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                           aero_snow=load, modal_aero=True)
    assert _albedo(modal) < _albedo(std)


def test_dust_weaker_than_bc():
    cfg = Config()
    a = _sw_args()
    z = jnp.zeros((1, 4, 4))
    m = jnp.full((1, 4, 4), 5e-5)
    bc = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                        aero_snow=[m, z, z])
    dust = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                          aero_snow=[z, z, m])
    assert _albedo(bc) < _albedo(dust) <= _albedo(
        shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1)) + 1e-9


def test_tref_between_surface_and_air():
    shape = (4, 4)
    Tsf = jnp.zeros(shape) - 20.0          # cold surface
    potT = jnp.zeros(shape) + 263.15       # -10 C air
    wind = jnp.zeros(shape) + 6.0
    co = atmo_boundary_layer(Tsf, potT, wind, jnp.zeros(shape), wind,
                             jnp.zeros(shape) + 10.0,
                             jnp.zeros(shape) + 1e-3,
                             jnp.zeros(shape) + 1.3)
    Tref = np.asarray(co.Tref)
    TsfK = -20.0 + 273.15
    assert (Tref > TsfK).all() and (Tref < 263.16).all()
    # 2m value should sit closer to the air temperature than the surface
    assert (Tref > 0.5 * (TsfK + 263.15)).all()
    Qref = np.asarray(co.Qref)
    assert (Qref > 0).all() and (Qref < 1e-2).all()
    assert np.isfinite(np.asarray(co.Uref)).all()


def test_dedd_algae_shading():
    """dEdd_algae: chlorophyll absorption darkens the column (vis band)
    and moves absorbed energy into the bottom ice layer."""
    cfg = Config()
    a = _sw_args()
    a["hs"] = jnp.zeros_like(a["hs"])          # bare ice column
    clean = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1)
    algal = shortwave_dEdd(**a, cfg_sw=cfg.shortwave, nilyr=4, nslyr=1,
                           tau_alg=jnp.full((1, 4, 4), 2.0))
    assert _albedo(algal) <= _albedo(clean) + 1e-9
    # less light reaches the ocean through the shaded bottom layer
    assert float(algal.fswthru.mean()) < float(clean.fswthru.mean())
