"""Coupler import/export surface tests (nuopc/cmeps field contract)."""

import jax.numpy as jnp
import numpy as np

from cice_tpu.config import box2001_config
from cice_tpu.model.coupling import CoupledIce


def test_import_export_round():
    cfg = box2001_config(16, 16)
    ice = CoupledIce(cfg)
    shp = ice.model.grid.shape
    ice.import_fields({
        "Sa_u": jnp.full(shp, 5.0), "Sa_v": jnp.zeros(shp),
        "Sa_tbot": jnp.full(shp, 250.0), "Sa_ptem": jnp.full(shp, 250.0),
        "Faxa_lwdn": jnp.full(shp, 180.0),
        "So_t": jnp.full(shp, -1.5), "Fioo_q": jnp.full(shp, 50.0)})
    assert float(ice.model.forcing.Tair[0, 0]) == 250.0
    assert float(ice.model.forcing.wind[0, 0]) == 5.0
    assert float(ice.model.state.frzmlt[0, 0]) == 50.0
    ice.step()
    out = ice.export_fields()
    for key in ("Si_ifrac", "Si_thick", "Faii_sen", "Fioi_melth",
                "Fioi_taux", "Si_avsdr"):
        assert key in out, key
        assert np.isfinite(np.asarray(out[key])).all(), key
    a = np.asarray(out["Si_ifrac"])
    assert a.max() <= 1.0 + 1e-6 and a.min() >= 0.0
    # scaled exports are per-ice-area: zero where no ice
    sen = np.asarray(out["Faii_sen"])
    assert np.all(sen[a < 1e-11] == 0.0)


def test_widened_field_surface():
    """Round-4 coupler widening toward ice_import_export.F90's field
    set: aerosol deposition routing (Faxa_bcph/dst* -> faero_atm ->
    Fioi_bcpho/bcphi/flxdst), Sa_pbot, reference-height exports
    Si_tref/Si_qref/Si_u10, volumes, per-category fractions, floe
    diameter."""
    cfg = box2001_config(16, 16).with_overrides(**{
        "tracers.tr_aero": True, "domain.n_aero": 3})
    ice = CoupledIce(cfg)
    shp = ice.model.grid.shape
    ice.import_fields({
        "Sa_pbot": jnp.full(shp, 1.0e5),
        "Faxa_bcph": jnp.full((3,) + shp, 1e-12),
        "Faxa_dstwet": jnp.full((4,) + shp, 2e-12),
        "Faxa_dstdry": jnp.full((4,) + shp, 1e-12)})
    fc = ice.model.forcing
    assert float(fc.pbot[0, 0]) == 1.0e5
    assert fc.faero_atm.shape == (3,) + shp
    # dust = sum of wet+dry classes
    np.testing.assert_allclose(np.asarray(fc.faero_atm[2]), 12e-12,
                               rtol=1e-5)
    ice.step()
    out = ice.export_fields()
    for key in ("Si_tref", "Si_qref", "Si_u10", "Si_vice", "Si_vsno",
                "Si_ifrac_n", "Si_floediam", "Fioi_bcpho", "Fioi_bcphi",
                "Fioi_flxdst"):
        assert key in out, key
        assert np.isfinite(np.asarray(out[key])).all(), key
    assert out["Si_ifrac_n"].shape == (cfg.domain.ncat,) + shp
    assert float(np.asarray(out["Si_floediam"]).min()) > 0.0


def test_wiso_and_swpen_surface():
    """Round-5 coupler tail (VERDICT r4 Next #7): water-isotope
    import/export variants + per-band/per-category swpen exports
    (ice_import_export.F90:739-770, :1218-1245, :1300-1340, :262)."""
    from cice_tpu.config import Config
    cfg = box2001_config(16, 16).with_overrides(**{
        "tracers.tr_iso": True, "domain.n_iso": 3})
    ice = CoupledIce(cfg)
    shp = ice.model.grid.shape
    ice.import_fields({
        "Sa_u": jnp.full(shp, 5.0), "Sa_v": jnp.zeros(shp),
        "Faxa_snow": jnp.full(shp, 1e-4),
        "Faxa_swvdr": jnp.full(shp, 100.0),
        "Faxa_swvdf": jnp.full(shp, 50.0),
        "Sa_shum_wiso": jnp.full((3,) + shp, 1e-4),
        "Faxa_snow_wiso": jnp.full((3,) + shp, 2e-5),
        "So_roce_wiso": jnp.ones((3,) + shp)})
    # snow-isotope deposition routed into the forcing
    assert ice.model.forcing.fiso_atm.shape == (3,) + shp
    np.testing.assert_allclose(np.asarray(ice.model.forcing.fiso_atm),
                               2e-5)
    ice.step()
    out = ice.export_fields()
    for key in ("Fioi_swpen", "Fioi_swpen_vdr", "Fioi_swpen_vdf",
                "Fioi_swpen_idr", "Fioi_swpen_idf", "Fioi_swpen_ifrac_n",
                "Fioi_meltw_wiso", "Faii_evap_wiso", "Si_qref_wiso"):
        assert key in out, key
        assert np.isfinite(np.asarray(out[key])).all(), key
    # band splits sum back to the total penetration; near-IR is zero
    # under the CCSM3 visible-only-penetration semantics
    tot = np.asarray(out["Fioi_swpen_vdr"]) + \
        np.asarray(out["Fioi_swpen_vdf"])
    np.testing.assert_allclose(tot, np.asarray(out["Fioi_swpen"]),
                               rtol=1e-5, atol=1e-7)
    assert float(np.abs(np.asarray(out["Fioi_swpen_idr"])).max()) == 0.0
    # per-category planes carry the category axis
    assert out["Fioi_swpen_ifrac_n"].shape == (cfg.domain.ncat,) + shp
    assert out["Fioi_meltw_wiso"].shape == (3,) + shp
    assert out["Faii_evap_wiso"].shape == (3,) + shp
