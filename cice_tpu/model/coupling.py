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
    "Sa_dens": "rhoa", "Sa_pbot": "pbot",
    "Faxa_lwdn": "flw", "Faxa_rain": "frain", "Faxa_snow": "fsnow",
    "Faxa_swvdr": "swvdr", "Faxa_swvdf": "swvdf",
    "Faxa_swndr": "swidr", "Faxa_swndf": "swidf",
    "So_u": "uocn", "So_v": "vocn", "So_s": "sss", "So_t": "sst_data",
    "So_dhdx": "ss_tltx", "So_dhdy": "ss_tlty",
    "Fioo_q": "frzmlt_in", "So_hmix": "hmix",
}

# aerosol deposition routing (ice_import_export.F90 import of
# Faxa_bcph(3)/Faxa_dstwet(4)/Faxa_dstdry(4) into faero_atm): species 1 =
# hydrophobic BC (dry+first bcph class), 2 = hydrophilic BC, 3 = total
# dust. Keys may be the stacked vectors or the per-class planes.
AEROSOL_IMPORTS = ("Faxa_bcph", "Faxa_dstwet", "Faxa_dstdry")

# water-isotope coupling surface (ice_import_export.F90:739-770 imports,
# :1300-1340 exports): species order HDO / H2_16O / H2_18O
WISO_IMPORTS = ("Sa_shum_wiso", "Faxa_snow_wiso", "So_roce_wiso")


class CoupledIce:
    """Subroutine-call coupling wrapper (the direct/hadgem3-style driver
    reimagined: same Initialize/Run/Finalize triple, array exchange)."""

    def __init__(self, cfg, scale_fluxes: bool = True):
        self.model = Model(cfg)
        self.scale_fluxes = scale_fluxes
        # water-isotope coupling state (imported, consumed at export time
        # or by the isotope deposition pathway)
        self.Qa_iso = None       # (3, ny, nx) Sa_shum_wiso
        self.roce_iso = None     # (3, ny, nx) So_roce_wiso ocean ratios

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
        if any(k in fields for k in AEROSOL_IMPORTS):
            dt_np = self.model.cfg.np_dtype
            z = jnp.zeros(self.model.grid.shape, dt_np)

            def vec(key, n):
                if key in fields:
                    return jnp.asarray(fields[key], dt_np)
                return jnp.zeros((n,) + self.model.grid.shape, dt_np)
            bcph = vec("Faxa_bcph", 3)           # (3, ny, nx)
            dst = vec("Faxa_dstwet", 4) + vec("Faxa_dstdry", 4)
            n_aero = self.model.cfg.domain.n_aero
            species = [bcph[0] + (bcph[1] if bcph.shape[0] > 1 else z),
                       bcph[2] if bcph.shape[0] > 2 else z,
                       dst.sum(0)]
            upd["faero_atm"] = jnp.stack(
                (species + [z] * n_aero)[:n_aero]) if n_aero else \
                jnp.zeros((0,) + self.model.grid.shape, dt_np)
        # water-isotope imports (ice_import_export.F90:739-770): snowfall
        # isotopes feed the deposition pathway; humidity/ocean ratios are
        # held for the export-side budgets
        if "Faxa_snow_wiso" in fields:
            dt_np = self.model.cfg.np_dtype
            fiso = jnp.asarray(fields["Faxa_snow_wiso"], dt_np)
            n_iso = self.model.cfg.domain.n_iso
            if n_iso and fiso.shape[0] >= n_iso:
                upd["fiso_atm"] = fiso[:n_iso]
        if "Sw_elevation_spectrum" in fields:
            # wave-model elevation spectrum import (25 frequency bins;
            # ice_import_export.F90 Sw_elevation_spectrum -> FSD fracture)
            upd["wave_spectrum"] = jnp.asarray(
                fields["Sw_elevation_spectrum"], self.model.cfg.np_dtype)
        if "Sa_shum_wiso" in fields:
            self.Qa_iso = jnp.asarray(fields["Sa_shum_wiso"],
                                      self.model.cfg.np_dtype)
        if "So_roce_wiso" in fields:
            self.roce_iso = jnp.asarray(fields["So_roce_wiso"],
                                        self.model.cfg.np_dtype)
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
        # states beyond the core set (ice_import_export.F90 export list):
        # reference heights, total volumes, per-category fractions,
        # representative floe diameter
        out.update({
            "Si_vice": st.vice, "Si_vsno": st.vsno,
            "Si_ifrac_n": st.aicen,
        })
        if fl is not None:
            out.update({"Si_tref": fl.Tref, "Si_qref": fl.Qref,
                        "Si_u10": fl.Uref})
        if "fsd" in st.trcrn:
            from ..columns.fsd import fsd_bounds
            ncat = st.aicen.shape[0]
            nfsd = st.trcrn["fsd"].shape[1]
            mid = jnp.asarray(fsd_bounds(nfsd)[2],
                              aice.dtype)[None, :, None, None]
            rmean = jnp.sum(st.trcrn["fsd"] * mid, axis=1)
            out["Si_floediam"] = 2.0 * jnp.maximum(
                (rmean * st.aicen).sum(0) / ai, 8.0)
        else:
            # reference exports a constant representative diameter when
            # the FSD is off (ice_import_export.F90 floediam default)
            out["Si_floediam"] = jnp.full_like(aice, 300.0)
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
            faero = fl.ncat_fluxes.get("faero_ocn")
            if faero is not None and faero.shape[0] >= 3:
                # species routing mirrors the import side
                out.update({"Fioi_bcpho": faero[0], "Fioi_bcphi": faero[1],
                            "Fioi_flxdst": faero[2]})

            # per-band + per-category SW penetration exports
            # (ice_import_export.F90:1218-1245, :262).  CCSM3 semantics:
            # only the VISIBLE bands penetrate the ice interior (i0_vis),
            # so the band split follows the incident visible partition;
            # the near-IR exports are structurally zero.
            fc = self.model.forcing
            vis = fc.swvdr + fc.swvdf
            wdr = jnp.where(vis > cst.puny,
                            fc.swvdr / jnp.maximum(vis, cst.puny), 0.5)
            out["Fioi_swpen_vdr"] = fl.fswthru * wdr
            out["Fioi_swpen_vdf"] = fl.fswthru * (1.0 - wdr)
            out["Fioi_swpen_idr"] = jnp.zeros_like(fl.fswthru)
            out["Fioi_swpen_idf"] = jnp.zeros_like(fl.fswthru)
            swn = fl.ncat_fluxes.get("fswthrun")
            if swn is not None:
                out["Fioi_swpen_ifrac_n"] = swn

            # water-isotope exports (ice_import_export.F90:1300-1340):
            # meltwater carries the per-species ocean release; sublimation
            # is fractionation-free (solid->vapor), so evaporation carries
            # the snow-reservoir isotope ratio
            fiso = fl.ncat_fluxes.get("fiso_ocn")
            if fiso is not None and fiso.shape[0] > 0:
                out["Fioi_meltw_wiso"] = fiso
                trc = st.trcrn
                if "isosno" in trc:
                    # isosno is a per-CATEGORY-AREA burden (aero_iso.py),
                    # so the snow isotope mass ratio is
                    # sum(aicen*burden) / (rhos * vsno)
                    snow_mass = cst.rhos * jnp.maximum(st.vsno, cst.puny)
                    R = jnp.stack([
                        jnp.sum(trc["isosno"][:, k] * st.aicen, axis=0)
                        / snow_mass
                        for k in range(fiso.shape[0])])
                    out["Faii_evap_wiso"] = fl.evap[None] * R
                if self.Qa_iso is not None:
                    # reference Si_qref_wiso: reference-height humidity
                    # isotopes relax to the imported atmospheric ratio
                    out["Si_qref_wiso"] = self.Qa_iso
        return out
