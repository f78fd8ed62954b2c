"""Vertically-resolved z-tracer BGC (z_tracers / solve_zbgc).

Oracles follow the reference test strategy (SURVEY.md §4): internal
conservation bookkeeping (the transport scheme's ocean flux must explain
the content change exactly), physical-limit invariants (mobility-type
semantics), an independent dense-solver check for the tridiagonal kernel,
and an end-to-end coupled smoke run with the full z network enabled
(set_nml.bgcz analogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.config import Config
from cice_tpu.columns.zbgc_vertical import (
    ZbgcOut, mobility_type, porosity_profile, step_zbgc, tridiag_solve,
    z_tracer_names)


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    nb = 7
    shape = (2, nb, 3, 4)
    lower = jnp.asarray(rng.uniform(-0.3, 0.0, shape))
    upper = jnp.asarray(rng.uniform(-0.3, 0.0, shape))
    diag = jnp.asarray(rng.uniform(1.0, 2.0, shape))
    rhs = jnp.asarray(rng.uniform(0.0, 1.0, shape))
    x = tridiag_solve(lower, diag, upper, rhs)
    # dense reference solve at a sample point
    for (c, y, xx) in [(0, 1, 2), (1, 2, 3)]:
        A = np.zeros((nb, nb))
        for k in range(nb):
            A[k, k] = diag[c, k, y, xx]
            if k > 0:
                A[k, k - 1] = lower[c, k, y, xx]
            if k < nb - 1:
                A[k, k + 1] = upper[c, k, y, xx]
        ref = np.linalg.solve(A, np.asarray(rhs[c, :, y, xx]))
        np.testing.assert_allclose(np.asarray(x[c, :, y, xx]), ref,
                                   rtol=1e-10)


def test_porosity_profile_bounds():
    ncat, nilyr, ny, nx = 2, 4, 3, 3
    # cold ice: qice strongly negative, sice ~ 5 ppt
    qice = jnp.full((ncat, nilyr, ny, nx), -2.5e8)
    sice = jnp.full((ncat, nilyr, ny, nx), 5.0)
    phi = porosity_profile(qice, sice, nblyr=7)
    assert phi.shape == (ncat, 7, ny, nx)
    assert bool(jnp.all(phi >= 0.0)) and bool(jnp.all(phi <= 1.0))


def _setup(nb=7, solve=False, **zover):
    cfg = Config().with_overrides(**{
        "domain.nblyr": nb, "domain.ncat": 2, "domain.nilyr": 4,
        "zbgc.z_tracers": True, "zbgc.solve_zbgc": solve,
        "tracers.tr_brine": True, **zover})
    ncat, ny, nx = 2, 4, 5
    z = jnp.zeros((ncat, ny, nx))
    aicen = z + 0.4
    vicen = aicen * 1.5
    fbri = jnp.ones_like(aicen)
    qice = jnp.full((ncat, 4, ny, nx), -2.0e8)
    sice = jnp.full((ncat, 4, ny, nx), 5.0)
    return cfg, dict(aicen=aicen, vicen=vicen, vsnon=z, fbri=fbri,
                     qice=qice, sice=sice, darcy_V=z, fswthru=z + 20.0,
                     Tbot=z - 1.8, meltt=z, meltb=z, congel=z,
                     frazil=jnp.zeros((ny, nx)))


def test_transport_conservation_against_flux():
    """With reactions off and no growth, the aicen-weighted content change
    must equal -dt * flux_ocn exactly (the scheme's own bookkeeping)."""
    cfg, kw = _setup(solve=False)
    nb = 7
    dt = 3600.0
    C0 = jnp.ones((2, nb, 4, 5)) * 4.0
    f0 = jnp.ones_like(C0)
    out: ZbgcOut = step_zbgc(
        cfg.zbgc, dt, trc={"bgc_Nit": C0}, frac={"bgc_Nit": f0},
        ocean={"bgc_Nit": jnp.zeros((2, 4, 5))}, **kw)
    aicen, vicen, fbri = kw["aicen"], kw["vicen"], kw["fbri"]
    hbr = fbri * vicen / aicen
    content = lambda C: jnp.sum(aicen * hbr * jnp.mean(C, axis=1), axis=0)
    dC = content(C0) - content(out.trc["bgc_Nit"])
    np.testing.assert_allclose(np.asarray(dC),
                               np.asarray(dt * out.flux_ocn["bgc_Nit"]),
                               rtol=1e-5, atol=1e-9)


def test_interior_transport_conserves_with_closed_bottom():
    """Zero velocity, zero ocean exchange (ocn == bottom concentration in
    equilibrium) => diffusion only redistributes; total is conserved up to
    the bottom exchange accounted in flux_ocn."""
    cfg, kw = _setup(solve=False)
    dt = 1800.0
    rng = np.random.default_rng(1)
    C0 = jnp.asarray(rng.uniform(1.0, 5.0, (2, 7, 4, 5)))
    f0 = jnp.ones_like(C0)
    out = step_zbgc(cfg.zbgc, dt, trc={"bgc_PON": C0},
                    frac={"bgc_PON": f0}, **kw)
    aicen, vicen, fbri = kw["aicen"], kw["vicen"], kw["fbri"]
    hbr = fbri * vicen / aicen
    tot0 = jnp.sum(aicen * hbr * jnp.mean(C0, axis=1))
    tot1 = jnp.sum(aicen * hbr * jnp.mean(out.trc["bgc_PON"], axis=1))
    lost = dt * jnp.sum(out.flux_ocn["bgc_PON"])
    np.testing.assert_allclose(float(tot0), float(tot1 + lost), rtol=1e-5)


def test_mobility_semantics():
    """type < 0 stays fully mobile; type = 1 becomes stationary under
    growth (retention) and re-mobilizes under melt (release)."""
    cfg, kw = _setup(solve=False, **{"zbgc.humtype": 1.0,
                                     "zbgc.tau_min": 600.0})
    dt = 3600.0
    C0 = jnp.ones((2, 7, 4, 5))
    f0 = jnp.ones_like(C0)
    # growth phase: congel > 0
    kw_g = dict(kw, congel=kw["congel"] + 0.01)
    out = step_zbgc(cfg.zbgc, dt, trc={"bgc_Nit": C0, "bgc_hum": C0},
                    frac={"bgc_Nit": f0, "bgc_hum": f0}, **kw_g)
    assert bool(jnp.all(out.frac["bgc_Nit"] == 1.0))      # nitratetype=-1
    assert float(out.frac["bgc_hum"].mean()) < 1.0        # humtype=1 retains
    # melt phase re-releases
    f_low = jnp.full_like(f0, 0.2)
    kw_m = dict(kw, meltb=kw["meltb"] + 0.01)
    out2 = step_zbgc(cfg.zbgc, dt, trc={"bgc_hum": C0},
                     frac={"bgc_hum": f_low}, **kw_m)
    assert float(out2.frac["bgc_hum"].mean()) > 0.2


def test_drainage_moves_tracer_down():
    """Downward Darcy drainage (darcy_V < 0) flushes mobile tracer toward
    the bottom/ocean: top layer loses relative to a no-flow run."""
    cfg, kw = _setup(solve=False)
    dt = 3600.0
    C0 = jnp.ones((2, 7, 4, 5)) * 3.0
    f0 = jnp.ones_like(C0)
    still = step_zbgc(cfg.zbgc, dt, trc={"bgc_Nit": C0},
                      frac={"bgc_Nit": f0}, **kw)
    kw_d = dict(kw, darcy_V=kw["darcy_V"] - 5e-7)
    drain = step_zbgc(cfg.zbgc, dt, trc={"bgc_Nit": C0},
                      frac={"bgc_Nit": f0}, **kw_d)
    top_still = float(still.trc["bgc_Nit"][:, 0].mean())
    top_drain = float(drain.trc["bgc_Nit"][:, 0].mean())
    assert top_drain < top_still
    assert float(jnp.sum(drain.flux_ocn["bgc_Nit"])) > \
        float(jnp.sum(still.flux_ocn["bgc_Nit"]))


def test_reactions_grow_algae_in_light():
    cfg, kw = _setup(solve=True, **{"zbgc.n_algae": 1})
    dt = 3600.0
    shape = (2, 7, 4, 5)
    trc = {"bgc_N": jnp.full(shape, 0.5), "bgc_Nit": jnp.full(shape, 10.0)}
    frac = {k: jnp.ones(shape) for k in trc}
    out = step_zbgc(cfg.zbgc, dt, trc=trc, frac=frac, **kw)
    assert float(out.trc["bgc_N"].mean()) > 0.5          # net growth
    assert float(out.grow_net.mean()) > 0.0
    # nitrate is consumed by the same amount class-wise (up to transport)
    assert float(out.trc["bgc_Nit"].mean()) < 10.0


def test_registry_and_names():
    cfg = Config().with_overrides(**{
        "zbgc.z_tracers": True, "zbgc.tr_bgc_DMS": True,
        "zbgc.tr_bgc_hum": True, "zbgc.tr_zaero": True, "zbgc.n_zaero": 2,
        "zbgc.n_algae": 2, "tracers.tr_brine": True, "domain.nblyr": 3})
    names = z_tracer_names(cfg.zbgc)
    assert names == ["bgc_N", "bgc_N2", "bgc_Nit", "bgc_DMSPp",
                     "bgc_DMSPd", "bgc_DMS", "bgc_hum", "zaero1", "zaero2"]
    assert mobility_type(cfg.zbgc, "bgc_Nit") == -1.0
    assert mobility_type(cfg.zbgc, "zaero2") == -1.0
    from cice_tpu.model.state import tracer_registry
    reg = {s.name: s for s in tracer_registry(cfg)}
    assert "bgc_DMS" in reg and reg["bgc_DMS"].nlayers == 3
    assert reg["bgc_DMS"].parent == "fbri"
    assert "bgc_DMS_mf" in reg


@pytest.mark.slow
def test_model_smoke_with_z_tracers():
    """End-to-end: 4 coupled steps with the full bgcz option set."""
    from cice_tpu.cli.main import OPTION_SETS
    from cice_tpu.model.driver import Model
    over = dict(OPTION_SETS["box2001"])
    over.update(OPTION_SETS["bgcz"])
    over.update({"grid.nx_global": 24, "grid.ny_global": 24,
                 "dynamics.ndte": 10, "thermo.nit": 4,
                 "zbgc.tr_zaero": True, "zbgc.n_zaero": 2})
    cfg = Config().with_overrides(**over)
    m = Model(cfg)
    assert "bgc_N3" in m.state.trcrn
    assert m.state.trcrn["bgc_N3"].ndim == 4
    m.run(4)
    for nm in ("bgc_N", "bgc_Nit", "bgc_DMS", "zaero1", "bgc_Nit_mf"):
        v = m.state.trcrn[nm]
        assert bool(jnp.isfinite(v).all()), nm
        assert bool(jnp.all(v >= -1e-6)), nm
    # deposition accumulated some aerosol where there is ice
    assert float(m.state.trcrn["zaero1"].max()) > 0.0


def test_carbon_chain():
    """DOC/DIC family (tr_bgc_C, reference zbgc DOC/DIC pools): algal
    growth draws DIC down, losses feed DOC, bacterial degradation respires
    DOC back toward DIC."""
    cfg, kw = _setup(solve=True, **{
        "zbgc.n_algae": 1, "zbgc.tr_bgc_C": True, "zbgc.n_doc": 2,
        "zbgc.n_dic": 1, "zbgc.tr_bgc_DON": True})
    dt = 3600.0
    shape = (2, 7, 4, 5)
    trc = {"bgc_N": jnp.full(shape, 0.5), "bgc_Nit": jnp.full(shape, 10.0),
           "bgc_DON": jnp.full(shape, 2.0),
           "bgc_DOC1": jnp.full(shape, 10.0),
           "bgc_DOC2": jnp.full(shape, 10.0),
           "bgc_DIC1": jnp.full(shape, 1950.0)}
    frac = {k: jnp.ones(shape) for k in trc}
    out = step_zbgc(cfg.zbgc, dt, trc=trc, frac=frac, **kw)
    for nm in trc:
        assert bool(jnp.isfinite(out.trc[nm]).all()), nm
        assert float(out.trc[nm].min()) >= 0.0, nm
    # growth happened -> DIC drawn below its (closed-layer) initial value
    interior = out.trc["bgc_DIC1"][:, 2:5]
    assert float(interior.mean()) < 1950.0
    # names/registry carry the family
    names = z_tracer_names(cfg.zbgc)
    assert "bgc_DOC1" in names and "bgc_DOC2" in names \
        and "bgc_DIC1" in names
    assert mobility_type(cfg.zbgc, "bgc_DIC1") == -1.0


def test_iron_2plus2_conservation_and_diags():
    """n_fed=n_fep=2 in the z network (VERDICT r4 Missing #3): both iron
    class pairs are registered, scavenging/desorption exchanges within each
    pair conserve total iron (closed column), and the interior diagnostics
    (bTizn/bphizn/zfswin/iDin/ikin + upNO/upNH/PP_net) come back finite
    with the right shapes."""
    cfg, kw = _setup(solve=True, **{
        "zbgc.tr_bgc_Fe": True, "zbgc.n_fed": 2, "zbgc.n_fep": 2,
        "zbgc.k_fe_scav": 10.0})
    names = z_tracer_names(cfg.zbgc)
    for nm in ("bgc_Fed", "bgc_Fed2", "bgc_Fep", "bgc_Fep2"):
        assert nm in names, nm
        assert mobility_type(cfg.zbgc, nm) is not None
    dt = 3600.0
    shape = (2, 7, 4, 5)
    trc = {"bgc_N": jnp.full(shape, 0.5), "bgc_Nit": jnp.full(shape, 10.0),
           "bgc_Fed": jnp.full(shape, 0.6), "bgc_Fed2": jnp.full(shape, 0.2),
           "bgc_Fep": jnp.full(shape, 0.1), "bgc_Fep2": jnp.full(shape, 0.3)}
    frac = {k: jnp.ones(shape) for k in trc}
    # closed column: no flow, ocean matched to suppress bottom exchange
    out = step_zbgc(cfg.zbgc, dt, trc=trc, frac=frac, **kw)
    # strong scavenging moved dissolved -> particulate in BOTH classes
    assert float(out.trc["bgc_Fed"].mean()) < float(trc["bgc_Fed"].mean())
    assert float(out.trc["bgc_Fed2"].mean()) < float(trc["bgc_Fed2"].mean())
    assert float(out.trc["bgc_Fep"].mean()) > float(trc["bgc_Fep"].mean())
    assert float(out.trc["bgc_Fep2"].mean()) > float(trc["bgc_Fep2"].mean())
    # pairwise totals conserved up to the ocean-flux bookkeeping
    aicen, vicen, fbri = kw["aicen"], kw["vicen"], kw["fbri"]
    hbr = fbri * vicen / aicen
    for d, p in (("bgc_Fed", "bgc_Fep"), ("bgc_Fed2", "bgc_Fep2")):
        tot0 = jnp.sum(aicen * hbr * jnp.mean(trc[d] + trc[p], axis=1))
        tot1 = jnp.sum(aicen * hbr * jnp.mean(out.trc[d] + out.trc[p],
                                              axis=1))
        lost = dt * jnp.sum(out.flux_ocn[d] + out.flux_ocn[p])
        np.testing.assert_allclose(float(tot0), float(tot1 + lost),
                                   rtol=1e-4)
    # interior diagnostics: shapes + finiteness
    nb, ny, nx = 7, 4, 5
    for nm in ("bTizn", "bphizn", "zfswin", "iDin", "ikin"):
        v = out.diags[nm]
        assert v.shape == (nb, ny, nx), nm
        assert bool(jnp.isfinite(v).all()), nm
    for nm in ("upNO", "upNH", "PP_net"):
        v = out.diags[nm]
        assert v.shape == (ny, nx), nm
        assert bool(jnp.isfinite(v).all()), nm
    # algae grew in light on nitrate -> nonzero NO3 uptake and production
    assert float(out.diags["upNO"].max()) > 0.0
    assert float(out.diags["PP_net"].max()) > 0.0


def test_snow_reservoir_deposition_and_melt_flush():
    """z-network snow reservoirs (round 5, closes the reference's
    snow_bio_net / X_snow family): deposition lands in the snow
    reservoir while snow is present; snow melt flushes r*melts into the
    top bio layer; the total (snow + brine column + ocean flux) is
    exactly conserved."""
    cfg, kw = _setup(solve=False, **{"zbgc.tr_zaero": True,
                                     "zbgc.n_zaero": 1})
    dt = 3600.0
    shape = (2, 7, 4, 5)
    aicen = kw["aicen"]
    kw["vsnon"] = aicen * 0.2                 # 0.2 m snow everywhere
    C0 = jnp.zeros(shape)
    f0 = jnp.ones(shape)
    r0 = jnp.zeros(aicen.shape)
    dep = {"zaero1": jnp.full(aicen.shape[1:], 2e-7)}

    # step 1: deposit onto snow — everything lands in the reservoir
    out = step_zbgc(cfg.zbgc, dt, trc={"zaero1": C0},
                    frac={"zaero1": f0}, zaero_dep=dep,
                    snow={"zaero1": r0}, melts=jnp.zeros_like(aicen[:1])[0],
                    **{k: v for k, v in kw.items()})
    hs = float((kw["vsnon"] / aicen)[0, 0, 0])
    R1 = out.snow["zaero1"]
    assert float(R1.max()) > 0.0
    # per-category CONTENT equals the deposited amount dep*dt (content
    # semantics are snowfall-dilution-proof, round-5 review fix)
    np.testing.assert_allclose(np.asarray(R1[0]), 2e-7 * dt, rtol=1e-5)
    # nothing reached the ice column yet
    assert float(jnp.abs(out.trc["zaero1"]).max()) < 1e-12

    # step 2: melt half the snow — r*melts flushes into the bio column.
    # vsnon must shrink consistently with the melt (as the real step's
    # thermo does before calling step_zbgc)
    melts = jnp.full_like(aicen, hs * 0.5)
    kw2 = dict(kw)
    kw2["vsnon"] = kw["vsnon"] - melts * aicen
    out2 = step_zbgc(cfg.zbgc, dt, trc=out.trc,
                     frac={"zaero1": f0}, zaero_dep=None,
                     snow={"zaero1": R1}, melts=melts,
                     **{k: v for k, v in kw2.items()})
    vicen, fbri = kw["vicen"], kw["fbri"]
    hbr = fbri * vicen / aicen
    col = jnp.sum(aicen * hbr * jnp.mean(out2.trc["zaero1"], axis=1),
                  axis=0)
    sno = jnp.sum(aicen * out2.snow["zaero1"], axis=0)
    ocn = dt * out2.flux_ocn["zaero1"]
    total0 = jnp.sum(aicen * R1, axis=0)          # content before step 2
    np.testing.assert_allclose(np.asarray(col + sno + ocn),
                               np.asarray(total0), rtol=1e-4)
    # the flushed amount is the melted-volume share
    np.testing.assert_allclose(float((col + ocn).mean() /
                                     total0.mean()), 0.5, rtol=1e-3)
