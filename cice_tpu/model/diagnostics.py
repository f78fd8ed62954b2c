"""Runtime diagnostics: hemispheric totals, conservation, stability checks.

TPU-native analogue of cicecore/cicedyn/analysis/ice_diagnostics.F90
(`runtime_diags`:115 — area/extent/volume/KE sums per hemisphere printed every
diagfreq; `check_umax` instability warning; `diagnostic_abort`). Sums are
single fused jnp reductions (lowering to psum trees on a mesh); the dict of
scalars is the machine-readable equivalent of the reference's log block that
`comparelog.csh` diffs — our regression tests compare these dicts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..core.grid import Grid
from .state import State


def runtime_diags(grid: Grid, state: State) -> Dict[str, jnp.ndarray]:
    """Global & hemispheric diagnostics (all scalars, device-resident)."""
    aice = state.aice
    vice = state.vice
    vsno = state.vsno
    tarea = grid.tarea * grid.hm
    nh = grid.TLAT > 0.0
    sh = ~nh

    def hemi(field, mask):
        return jnp.sum(field * tarea * mask)

    ext_mask = aice > 0.15  # ice extent definition (15% concentration)
    # kinetic energy proxy: 0.5 * integral of |u|^2 dA at U points
    uarea = grid.uarea * grid.uvm
    ke = 0.5 * jnp.sum((state.uvel ** 2 + state.vvel ** 2) * uarea)

    d = {
        "area_nh": hemi(aice, nh), "area_sh": hemi(aice, sh),
        "extent_nh": hemi(ext_mask.astype(aice.dtype), nh),
        "extent_sh": hemi(ext_mask.astype(aice.dtype), sh),
        "volume_nh": hemi(vice, nh), "volume_sh": hemi(vice, sh),
        "snow_nh": hemi(vsno, nh), "snow_sh": hemi(vsno, sh),
        "ke": ke,
        "umax": jnp.max(jnp.sqrt(state.uvel ** 2 + state.vvel ** 2)),
        "aice_max": jnp.max(aice),
        "hmax": jnp.max(jnp.where(aice > cst.puny,
                                  vice / jnp.maximum(aice, cst.puny), 0.0)),
        "sst_mean": jnp.sum(state.sst * tarea) / jnp.maximum(jnp.sum(tarea), 1.0),
    }
    return d


def bgc_diags(grid: Grid, state: State) -> Dict[str, jnp.ndarray]:
    """BGC tracer totals & means (reference bgc_diags,
    analysis/ice_diagnostics_bgc.F90): area-integrated algal N and
    ice-concentration-weighted means of the dissolved pools."""
    tarea = grid.tarea * grid.hm
    d: Dict[str, jnp.ndarray] = {}
    aice_w = jnp.sum(state.aice * tarea)
    for name, trc in state.trcrn.items():
        if not name.startswith("bgc_"):
            continue
        cell = jnp.sum(trc * state.aicen, axis=0)     # cell-mean content
        d[f"{name}_tot"] = jnp.sum(cell * tarea)
        d[f"{name}_mean"] = d[f"{name}_tot"] / jnp.maximum(aice_w, cst.puny)
    return d


def hbrine_diags(grid: Grid, state: State) -> Dict[str, jnp.ndarray]:
    """Brine-height diagnostics (reference hbrine_diags,
    analysis/ice_diagnostics_bgc.F90): mean fbri and mean brine height over
    ice-covered area."""
    if "fbri" not in state.trcrn:
        return {}
    tarea = grid.tarea * grid.hm
    am = jnp.maximum(state.aicen, cst.puny)
    hin = jnp.where(state.aicen > cst.puny, state.vicen / am, 0.0)
    hbri = jnp.sum(state.trcrn["fbri"] * hin * state.aicen, axis=0)
    aice_w = jnp.maximum(jnp.sum(state.aice * tarea), cst.puny)
    return {
        "fbri_mean": jnp.sum(jnp.sum(state.trcrn["fbri"] * state.aicen,
                                     axis=0) * tarea) / aice_w,
        "hbri_mean": jnp.sum(hbri * tarea) / aice_w,
    }


def total_energy(grid: Grid, state: State) -> jnp.ndarray:
    """Total ice+snow enthalpy (J) — conservation oracle
    (reference conserv_check global sums)."""
    qice = state.trcrn["qice"]          # (ncat, nilyr, ny, nx)
    qsno = state.trcrn["qsno"]
    nilyr = qice.shape[1]
    nslyr = qsno.shape[1]
    w = grid.tarea * grid.hm
    e_ice = jnp.sum(qice.mean(axis=1) * state.vicen, axis=0)
    e_sno = jnp.sum(qsno.mean(axis=1) * state.vsnon, axis=0)
    return jnp.sum((e_ice + e_sno) * w)


def total_water_mass(grid: Grid, state: State) -> jnp.ndarray:
    """Total ice+snow water mass (kg) — fresh-water conservation oracle."""
    w = grid.tarea * grid.hm
    return jnp.sum((cst.rhoi * state.vice + cst.rhos * state.vsno) * w)


def total_pond_mass(grid: Grid, state: State,
                    pond_lvl: bool | None = None) -> jnp.ndarray:
    """Melt-pond water mass (kg, liquid + lid water-equivalent) — retained
    fresh water rides the ice budget until it drains (reference
    l_mpond_fresh bookkeeping). Uses the SAME reservoir formula as the
    model step's fresh-flux assembly (columns/ponds.py
    pond_reservoir_mass) so budgets close exactly."""
    from ..columns.ponds import pond_reservoir_mass
    tr = state.trcrn
    if "apnd" not in tr or "hpnd" not in tr:
        return jnp.zeros((), state.aice.dtype)
    if pond_lvl is None:
        pond_lvl = "alvl" in tr
    w = grid.tarea * grid.hm
    pond = pond_reservoir_mass(tr, state.aicen, pond_lvl)
    return jnp.sum(pond * w)


def hemispheric_budgets(grid: Grid, state_pre: State, state_post: State,
                        flux, fc, dt: float,
                        frazil_in_fresh: bool = False,
                        pond_lvl: bool | None = None
                        ) -> Dict[str, jnp.ndarray]:
    """Heat & freshwater budget closure over a step (reference
    ice_diagnostics.F90:243-530 arbud/icebud print_global tables).

    Water: the ice+snow(+pond) mass change must equal the time-integrated
    boundary mass fluxes — snowfall intercepted by ice, condensation/
    sublimation (evap), minus melt/runoff water delivered to the ocean
    (fresh) — with the frazil new-ice mass re-added when update_ocn_f=false
    keeps it out of the coupler fresh flux. This identity is exact in the
    discretization; `water_residual` ~ roundoff, and the driver aborts on
    violation (conserv_check).

    Heat: the enthalpy change against absorbed shortwave, net surface
    turbulent/longwave exchange and the ocean heat sink. The reference's
    table is the same bookkeeping; small residuals remain (sublimated mass
    carries latent enthalpy, snow-ice flooding exchanges with ocean heat
    content), so `heat_residual` is reported, not fatal.
    """
    # accumulate in f64 when available: the identity is tested at the
    # roundoff of the summation, and f32 global totals of ~1e14 kg carry
    # ~1e9 kg of summation noise that would mask real leaks
    acc = jnp.float64 if jax.config.jax_enable_x64 else state_pre.aice.dtype
    w = (grid.tarea * grid.hm).astype(acc)
    nh = grid.TLAT > 0.0
    if pond_lvl is None:
        pond_lvl = "alvl" in state_pre.trcrn

    def tot(f):
        return jnp.sum(f.astype(acc) * w)

    def hemi2(f):
        s = f.astype(acc) * w
        return jnp.sum(jnp.where(nh, s, 0.0)), jnp.sum(jnp.where(nh, 0.0, s))

    def mass_field(state):
        """Per-cell ice+snow+pond mass (kg/m^2). The budget takes the
        pre/post DIFFERENCE per cell before the global sum — subtracting
        two ~1e14 kg totals would put the f32 cancellation noise (~1e10)
        far above any real leak."""
        from ..columns.ponds import pond_reservoir_mass
        pond = jnp.zeros(grid.shape, acc)
        if "apnd" in state.trcrn and "hpnd" in state.trcrn:
            tr_acc = {k: state.trcrn[k].astype(acc)
                      for k in ("apnd", "hpnd", "ipnd", "alvl")
                      if k in state.trcrn}
            pond = pond_reservoir_mass(tr_acc, state.aicen.astype(acc),
                                       pond_lvl)
        return (cst.rhoi * state.vice.astype(acc) +
                cst.rhos * state.vsno.astype(acc) + pond)

    def energy_field(state):
        qice = state.trcrn["qice"].astype(acc)
        qsno = state.trcrn["qsno"].astype(acc)
        return (jnp.sum(qice.mean(axis=1) * state.vicen.astype(acc), axis=0)
                + jnp.sum(qsno.mean(axis=1) * state.vsnon.astype(acc),
                          axis=0))

    aice0 = state_pre.aice
    dM = jnp.sum((mass_field(state_post) - mass_field(state_pre)) * w)
    # boundary mass fluxes (kg/m^2/s, cell means)
    snow_in = tot(fc.fsnow * aice0)
    rain_in = tot(fc.frain * aice0)
    evap_in = tot(flux.evap)
    fresh_out = tot(flux.fresh)
    frazil_mass = tot(flux.frazil) * cst.rhoi / dt   # m/step -> kg/m^2/s
    water_in = dt * (snow_in + rain_in + evap_in - fresh_out)
    if not frazil_in_fresh:
        # update_ocn_f=false keeps frazil mass out of the coupler fresh
        # flux; the new-ice mass still appears in dM — re-add its source
        water_in = water_in + dt * frazil_mass
    water_res = dM - water_in

    dE = jnp.sum((energy_field(state_post) - energy_field(state_pre)) * w)
    sw_abs = tot(flux.fswabs - flux.fswthru)
    lw_net = tot(fc.flw * aice0 + flux.flwout)
    turb = tot(flux.fsens + flux.flat)
    ocn_heat = tot(flux.fhocn)
    # enthalpy carried by the mass exchange: stored enthalpy is measured
    # against melted water at 0 C, so freezing dM kg of water stores
    # ~ -Lfresh*dM without any boundary heat flux (the latent heat went to
    # the ocean/atmosphere as fhocn/fcondtop); the residual left after this
    # term is the sensible part (cp*T*dm, a few % of Lfresh)
    from ..columns.ponds import pond_reservoir_mass

    def pond_field(state):
        if "apnd" not in state.trcrn:
            return jnp.zeros(grid.shape, acc)
        return pond_reservoir_mass(
            {k: state.trcrn[k].astype(acc) for k in state.trcrn},
            state.aicen.astype(acc), pond_lvl)

    dpond = jnp.sum((pond_field(state_post) - pond_field(state_pre)) * w)
    latent_store = -cst.Lfresh * (dM - dpond)
    heat_in = dt * (sw_abs + lw_net + turb - ocn_heat) + latent_store
    heat_res = dE - heat_in

    fresh_nh, fresh_sh = hemi2(flux.fresh)
    fhocn_nh, fhocn_sh = hemi2(flux.fhocn)
    return {
        "dE": dE, "heat_in": heat_in, "heat_residual": heat_res,
        "sw_abs": sw_abs, "lw_net": lw_net, "turb": turb,
        "ocn_heat": ocn_heat,
        "dM": dM, "water_in": water_in, "water_residual": water_res,
        "snow_in": snow_in, "rain_in": rain_in, "evap_in": evap_in,
        "fresh_out": fresh_out, "frazil_mass": frazil_mass,
        "fresh_nh": fresh_nh, "fresh_sh": fresh_sh,
        "fhocn_nh": fhocn_nh, "fhocn_sh": fhocn_sh,
    }


def check_state(state: State, umax_stab: float = 1.0) -> Dict[str, jnp.ndarray]:
    """NaN/instability watchdog (reference check_umax + diagnostic_abort
    philosophy, SURVEY.md §5.3): cheap device-side flags the driver can poll
    to trigger early checkpoint + abort."""
    umax = jnp.max(jnp.sqrt(state.uvel ** 2 + state.vvel ** 2))
    bad = (~jnp.isfinite(state.aicen).all()) | (~jnp.isfinite(state.vicen).all()) \
        | (~jnp.isfinite(state.uvel).all()) | (~jnp.isfinite(state.sst).all())
    return {"umax": umax, "unstable": umax > umax_stab, "nonfinite": bad}


def print_points_state(grid: Grid, state: State, latpnt=(90.0, -65.0),
                       lonpnt=(0.0, -45.0)) -> list:
    """Per-point diagnostic probes (reference print_points / print_state,
    ice_diagnostics.F90:30,115: two configurable lat/lon probe points whose
    full local state prints with the runtime diagnostics)."""
    import numpy as np
    lat = np.asarray(grid.TLAT) * cst.rad_to_deg
    lon = np.asarray(grid.TLON) * cst.rad_to_deg
    out = []
    for plat, plon in zip(latpnt, lonpnt):
        d2 = (lat - plat) ** 2 + (np.mod(lon - plon + 180, 360) - 180) ** 2
        j, i = np.unravel_index(np.argmin(d2), d2.shape)
        out.append(dict(
            j=int(j), i=int(i), lat=float(lat[j, i]), lon=float(lon[j, i]),
            aice=float(state.aice[j, i]), vice=float(state.vice[j, i]),
            vsno=float(state.vsno[j, i]), uvel=float(state.uvel[j, i]),
            vvel=float(state.vvel[j, i]), sst=float(state.sst[j, i]),
            Tsfc=float((state.trcrn["Tsfcn"][:, j, i] *
                        state.aicen[:, j, i]).sum() /
                       max(float(state.aice[j, i]), 1e-11))))
    return out


def debug_ice(grid: Grid, state: State, j: int, i: int, stage: str = "") -> dict:
    """Full column dump at a debug point (reference debug_ice/print_state
    with debug_model_{step,i,j} namelist, ice_diagnostics.F90:38-46,
    CICE_RunMod.F90:186-191): every prognostic variable at (j, i)."""
    import numpy as np
    out = {"stage": stage, "j": j, "i": i}
    out["aicen"] = np.asarray(state.aicen[:, j, i]).tolist()
    out["vicen"] = np.asarray(state.vicen[:, j, i]).tolist()
    out["vsnon"] = np.asarray(state.vsnon[:, j, i]).tolist()
    out["uvel"] = float(state.uvel[j, i])
    out["vvel"] = float(state.vvel[j, i])
    for name, arr in state.trcrn.items():
        out[name] = np.asarray(arr[..., j, i]).tolist()
    return out
