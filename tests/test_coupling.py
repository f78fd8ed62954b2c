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
