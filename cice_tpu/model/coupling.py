"""Coupler import/export surface (the coupled-driver field contract).

Equivalent of the reference's coupled drivers' exchange layer
(drivers/nuopc/cmeps/ice_import_export.F90 — 1946 LoC of field
import/export with regridding & scale factors; drivers/mct/cesm1 cpl
indices; `scale_fluxes` in general/ice_flux.F90). A host earth-system
model embeds the TPU model with:

    ice = CoupledIce(cfg)
    ice.import_fields({"Sa_z": ..., "Sa_tbot": ..., ...})   # per step
    ice.step()
    out = ice.export_fields()    # {"Si_ifrac": ..., "Faii_sen": ..., ...}

Field names follow the CMEPS/CESM convention used by the reference's
nuopc cap so a CICE coupling integration maps 1:1. Fluxes are exported
per unit ice area when `scale_fluxes=True` (reference scale_fluxes
divides by aice for the coupler).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from .. import constants as cst
from .driver import Model

# coupler name -> (Forcing attribute, conversion)
IMPORT_MAP = {
    "Sa_u": "uatm", "Sa_v": "vatm", "Sa_z": "zlvl",
    "Sa_tbot": "Tair", "Sa_ptem": "potT", "Sa_shum": "Qa",
    "Sa_dens": "rhoa",
    "Faxa_lwdn": "flw", "Faxa_rain": "frain", "Faxa_snow": "fsnow",
    "Faxa_swvdr": "swvdr", "Faxa_swvdf": "swvdf",
    "Faxa_swndr": "swidr", "Faxa_swndf": "swidf",
    "So_u": "uocn", "So_v": "vocn", "So_s": "sss", "So_t": "sst_data",
    "So_dhdx": "ss_tltx", "So_dhdy": "ss_tlty",
    "Fioo_q": "frzmlt_in", "So_hmix": "hmix",
}


class CoupledIce:
    """Subroutine-call coupling wrapper (the direct/hadgem3-style driver
    reimagined: same Initialize/Run/Finalize triple, array exchange)."""

    def __init__(self, cfg, scale_fluxes: bool = True):
        self.model = Model(cfg)
        self.scale_fluxes = scale_fluxes

    # -- import (coupler -> ice) -----------------------------------------
    def import_fields(self, fields: Dict[str, jnp.ndarray]):
        fc = self.model.forcing
        upd = {}
        for cname, arr in fields.items():
            attr = IMPORT_MAP.get(cname)
            if attr is None or attr == "frzmlt_in":
                continue
            upd[attr] = jnp.asarray(arr, self.model.cfg.np_dtype)
        if "Sa_u" in fields and "Sa_v" in fields:
            upd["wind"] = jnp.sqrt(jnp.asarray(fields["Sa_u"]) ** 2 +
                                   jnp.asarray(fields["Sa_v"]) ** 2)
        self.model.forcing = fc.replace(**upd)
        if "Fioo_q" in fields:
            self.model.state = self.model.state.replace(
                frzmlt=jnp.asarray(fields["Fioo_q"],
                                   self.model.cfg.np_dtype))

    def step(self):
        self.model.step()

    def run(self, nsteps: int):
        self.model.run(nsteps)

    # -- export (ice -> coupler) -----------------------------------------
    def export_fields(self) -> Dict[str, jnp.ndarray]:
        st = self.model.state
        fl = self.model.flux
        aice = st.aice
        ai = jnp.maximum(aice, cst.puny)
        s = (lambda x: jnp.where(aice > cst.puny, x / ai, 0.0)) \
            if self.scale_fluxes else (lambda x: x)
        out = {
            # states
            "Si_ifrac": aice,
            "Si_imask": (self.model.grid.hm > 0.5).astype(aice.dtype),
            "Si_thick": jnp.where(aice > cst.puny, st.vice / ai, 0.0),
            "Si_snowh": jnp.where(aice > cst.puny, st.vsno / ai, 0.0),
            "Si_u10": st.uvel, "Si_v10": st.vvel,
            "Si_t": (st.trcrn["Tsfcn"] * st.aicen).sum(0) / ai + cst.Tffresh,
            "Si_avsdr": s(fl.alvdr) if fl else aice * 0,
            "Si_avsdf": s(fl.alvdf) if fl else aice * 0,
            "Si_anidr": s(fl.alidr) if fl else aice * 0,
            "Si_anidf": s(fl.alidf) if fl else aice * 0,
        }
        if fl is not None:
            out.update({
                # atm fluxes (per ice area when scaled)
                "Faii_sen": s(fl.fsens), "Faii_lat": s(fl.flat),
                "Faii_lwup": s(fl.flwout), "Faii_evap": s(fl.evap),
                "Faii_swnet": s(fl.fswabs),
                "Faii_taux": s(fl.strairx), "Faii_tauy": s(fl.strairy),
                # ocean fluxes
                "Fioi_melth": fl.fhocn, "Fioi_meltw": fl.fresh,
                "Fioi_salt": fl.fsalt, "Fioi_swpen": fl.fswthru,
                "Fioi_taux": fl.strocnx, "Fioi_tauy": fl.strocny,
            })
        return out
