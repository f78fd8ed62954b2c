"""Quantitative physics oracles (VALIDATION.md registry).

The reference model can't execute in this environment, so behavior is
pinned against closed-form solutions and published magnitudes instead:
Stefan's congelation law for the implicit conduction solve, Briegleb &
Light (2007) albedo magnitudes for the delta-Eddington solver, liquidus
values for the freezing-point options, and the Hibler (1979) strength
scale. Each assertion here is cited from VALIDATION.md with its
tolerance; companion oracles live in test_vp (free-drift balance,
VP == converged EVP), test_remap_exact (machine-eps conservation,
uniform-flow exactness), test_mushy (drainage marginal stability),
test_budgets (freshwater closure) and test_gridavgchk/test_halo_tripole
(reference unit-test drivers).
"""

import jax.numpy as jnp
import numpy as np

from cice_tpu import constants as cst
from cice_tpu.columns import thermo_vertical as tv


def test_stefan_congelation_law():
    """Congelation growth under a pinned cold surface follows Stefan:
    h(t)^2 = h0^2 + 2 k dT t / (rhoi Leff), within 15% over 20 days
    (discretization + saline-conductivity corrections account for the
    slack). Exercises the BL99 implicit conduction solve + bottom-growth
    bookkeeping (ice_therm_vertical.F90 counterparts)."""
    nilyr, nslyr = 7, 1
    dt = 3600.0
    shape = (2, 2)
    Tair = -21.8                      # 20 K below the -1.8 C bottom
    Tbot = jnp.full(shape, -1.8)
    h0 = 0.3
    hin = jnp.full(shape, h0)
    hsn = jnp.zeros(shape)
    salin = [jnp.full(shape, 0.5)] * nilyr      # nearly fresh: k ~ k_fresh
    Tm = [tv.melting_temps(s) for s in salin]
    # cold linear initial profile
    qice = [tv.enthalpy_ice(jnp.full(shape, -10.0), Tm[k])
            for k in range(nilyr)]
    qsno = [tv.enthalpy_snow(jnp.full(shape, -10.0))] * nslyr
    Tsf = jnp.full(shape, Tair)
    z = jnp.zeros(shape)

    ndays = 20

    import jax

    @jax.jit
    def hour(Tsf, hin, hsn, qice, qsno):
        ts, qsno_new, qice_new = tv.temperature_changes(
            dt, nilyr, nslyr, Tsf=Tsf, qsno=qsno, qice=qice, salin=salin,
            Tm=Tm, hilyr=hin / nilyr, hslyr=hsn / nslyr, Tbot=Tbot,
            fswsfc=z, Iswabs=[z] * nilyr,
            shcoef=jnp.full(shape, 1.0e5),      # pins Tsf ~= potT (=Tair)
            lhcoef=z, potT=jnp.full(shape, Tair + 273.15),
            Qa=z, rhoa=jnp.full(shape, 1.3),
            flw=jnp.full(shape, 260.0), nit=8, ktherm=1)
        th, _, _ = tv.thickness_changes(
            dt, nilyr, nslyr, hin=hin, hsn=hsn, qice=qice_new,
            qsno=qsno_new, Tm=Tm,
            salin=salin, Tbot=Tbot, fbot=z, fsurf=ts.fsurf,
            fcondtop=ts.fcondtop, fcondbot=ts.fcondbot, flat=z,
            sss=jnp.full(shape, 34.0))
        return ts.Tsf, th.hin, th.hsn, th.qice, th.qsno, th

    for _ in range(24 * ndays):
        Tsf, hin, hsn, qice, qsno, th = hour(Tsf, hin, hsn, qice, qsno)

    k_ice = 2.03                                 # fresh-ice conductivity
    Leff = cst.rhoi * cst.Lfresh
    t = ndays * 86400.0
    h_stefan = np.sqrt(h0 ** 2 + 2.0 * k_ice * 20.0 * t / Leff)
    h_model = float(hin[0, 0])
    assert abs(h_model - h_stefan) / h_stefan < 0.15, (h_model, h_stefan)
    # and the sign/structure: pure growth, no melt
    assert float(th.meltb.max()) == 0.0 and float(th.congel.min()) > 0.0


def test_dedd_albedo_magnitudes():
    """Briegleb & Light (2007) table values (tolerance bands): cold dry
    snow visible albedo 0.93-0.99, near-IR 0.65-0.90; thick bare cold ice
    visible 0.68-0.85; melting bare ice darker than cold ice."""
    from cice_tpu.config import Config
    from cice_tpu.columns.dedd import shortwave_dEdd
    cfg = Config()
    SH = (1, 2, 2)
    f = lambda v: jnp.full(SH, v)
    g = lambda v: jnp.full(SH[1:], v)

    def alb(Tsf, hi, hs, hpnd=0.0, apeff=0.0):
        out = shortwave_dEdd(f(Tsf), f(hi), f(hs), f(hpnd), f(apeff),
                             g(100.0), g(50.0), g(80.0), g(40.0), g(0.5),
                             cfg.shortwave, nilyr=7, nslyr=1)
        return float(out.alvdr[0, 0, 0]), float(out.alidr[0, 0, 0])

    vis_snow, nir_snow = alb(-20.0, 1.5, 0.3)
    assert 0.93 < vis_snow < 0.995, vis_snow
    assert 0.65 < nir_snow < 0.93, nir_snow
    vis_ice, nir_ice = alb(-20.0, 2.0, 0.0)
    assert 0.68 < vis_ice < 0.85, vis_ice
    assert nir_ice < vis_ice            # ice darker in the near-IR
    vis_melt, _ = alb(0.0, 2.0, 0.0)
    assert vis_melt <= vis_ice + 1e-6   # melting surface is darker


def test_freezing_point_options():
    """Tf(S=34): linear_salt = -depressT*34 = -1.836 C exactly; the mushy
    liquidus gives -1.85 to -1.95 C (Assur-fit value ~ -1.88)."""
    from cice_tpu.columns.ocean import freezing_temperature
    s = jnp.full((2,), 34.0)
    np.testing.assert_allclose(
        np.asarray(freezing_temperature(s, "linear_salt")),
        -cst.depressT * 34.0, rtol=1e-12)
    tf_mushy = float(freezing_temperature(s, "mushy")[0])
    assert -1.95 < tf_mushy < -1.80, tf_mushy
    np.testing.assert_allclose(
        np.asarray(freezing_temperature(s, "minus1p8")), -1.8)


def test_hibler_strength_scale():
    """P = P* h exp(-C(1-a)): at h=1 m, a=1 the strength is exactly
    P* = 27.5 kN/m (Hibler 1979 as configured in ice_dyn_shared)."""
    from cice_tpu.dynamics.common import ice_strength_hibler
    P = ice_strength_hibler(jnp.ones((2, 2)), jnp.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(P), 27.5e3, rtol=1e-6)
    # compaction sensitivity: a=0.9 weakens by exp(-2)
    P9 = ice_strength_hibler(jnp.full((2, 2), 0.9), jnp.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(P9) / 27.5e3, np.exp(-2.0),
                               rtol=1e-5)
