"""Timestep orchestration: the full coupled thermo + dynamics step.

TPU-native analogue of cicecore/cicedyn/general/ice_step_mod.F90 (`step_prep`,
`step_therm1`:224, `step_therm2`:639, `update_state`:780,
`step_dyn_horiz`:969, `step_dyn_ridge`:1062, `step_radiation`:1292,
`ocean_mixed_layer`:1485) and the loop body of CICE_RunMod.F90 `ice_step`:139.

The reference iterates blocks and calls per-point Icepack; here each phase is
a dense array transformation over the global (ncat, ny, nx) state, and the
entire `model_step` composes into ONE jittable function — the unit the driver
jits, shards with `shard_map`, and the benchmark times.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..core.grid import Grid, grid_average_X2Y
from ..columns import itd as itd_mod
from ..columns.atmo import atmo_boundary_layer, atmo_boundary_const
from ..columns.ocean import ocean_mixed_layer
from ..columns.ridging import ice_strength, ridge_ice
from ..columns.shortwave import shortwave_ccsm3
from ..columns.ponds import step_ponds
from ..columns.thermo_itd import step_therm2
from ..columns.thermo_vertical import (adjust_enthalpy, bl99_salinity,
                                       melting_temps, temp_from_enthalpy_snow,
                                       temperature_changes, thickness_changes)
from ..dynamics.common import DynPrep, dyn_prep, evp_params
from ..dynamics.evp import evp_ocean_stress, evp_solve
from ..dynamics.common import deformations_B
from ..dynamics.transport import transport_remap, transport_upwind
from .flux import FluxOut, Forcing, zeros_fluxout
from .state import State, tracer_registry


@dataclass(frozen=True)
class ModelStatic:
    """Hashable per-run constants (static argument to jit)."""
    cfg: object
    hin_max: Tuple[float, ...]
    registry: tuple
    mesh: object = None   # jax.sharding.Mesh for explicit-comm paths
                          # (evp_algorithm='wide_halo'); None = GSPMD only

    @classmethod
    def build(cls, cfg, mesh=None):
        hin_max = tuple(itd_mod.category_bounds(
            cfg.domain.ncat, cfg.grid.kcatbound, cfg.domain.nilyr,
            cfg.thermo.kitd))
        return cls(cfg=cfg, hin_max=hin_max, registry=tracer_registry(cfg),
                   mesh=mesh)


# ---------------------------------------------------------------------------
# step_therm1: per-category vertical thermodynamics (dense over categories)
# ---------------------------------------------------------------------------

def step_therm1(ms: ModelStatic, grid: Grid, state: State, fc: Forcing,
                dt: float):
    """Vertical thermo for ALL categories in one dense pass: the category
    axis is a leading broadcast dim of every (ncat, ny, nx) array, so the
    whole solve traces once (reference step_therm1:224 loops blocks and
    calls icepack_step_therm1 per point per category — SURVEY §7.1)."""
    cfg = ms.cfg
    ncat = cfg.domain.ncat
    nilyr = cfg.domain.nilyr
    nslyr = cfg.domain.nslyr

    mushy = cfg.thermo.ktherm == 2
    salin = bl99_salinity(nilyr)
    Tmlt = melting_temps(salin)

    aice = state.aice
    # bottom boundary: ocean heat flux & bottom temperature.
    # ustar from the ice-ocean drag law on the relative velocity at T points
    du = grid_average_X2Y("S", state.uvel, "U", "T", grid) - fc.uocn
    dv = grid_average_X2Y("S", state.vvel, "U", "T", grid) - fc.vocn
    ustar = jnp.maximum(cst.ustar_min,
                        jnp.sqrt(cst.dragio * (du * du + dv * dv)))
    fbot = cst.cprho * cst.ch_mixed * ustar * (fc.Tf - state.sst)
    fbot = jnp.minimum(fbot, 0.0)                       # melting only
    fbot = jnp.maximum(fbot, -FBOT_MAX)
    Tbot = fc.Tf                                        # (ny, nx), broadcasts

    trcrn = dict(state.trcrn)
    Tsf_all = trcrn["Tsfcn"]          # (ncat, ny, nx)
    qice_all = trcrn["qice"]          # (ncat, nilyr, ny, nx)
    qsno_all = trcrn["qsno"]

    an, vin, vsn = state.aicen, state.vicen, state.vsnon
    mask = an > cst.puny
    am = jnp.maximum(an, cst.puny)
    hin = jnp.where(mask, vin / am, 0.0)
    hsn = jnp.where(mask, vsn / am, 0.0)
    hicen_old = hin
    Tsf = jnp.where(mask, Tsf_all, 0.0)
    qice = [jnp.where(mask, qice_all[:, k], -cst.rhoi * cst.Lfresh)
            for k in range(nilyr)]
    qsno = [jnp.where(mask, qsno_all[:, k], -cst.rhos * cst.Lfresh)
            for k in range(nslyr)]

    # shortwave partition (all categories at once)
    if cfg.shortwave.shortwave.startswith("dEdd"):
        from ..columns.dedd import shortwave_dEdd
        from ..columns.ponds import pond_exposure
        apeff_rad = pond_exposure(cfg, aicen=an, vsnon=vsn, trcrn=trcrn)
        hpnd_rad = trcrn.get("hpnd", jnp.zeros_like(an))
        aero_snow = None
        if cfg.tracers.tr_aero and "aerosno" in trcrn:
            # per-species snow loadings (SSL + interior strata) darken the
            # top snow layer in dEdd (kaer_tab optics; modal_aero variant)
            asn = trcrn["aerosno"]
            aero_snow = [asn[:, 2 * s] + asn[:, 2 * s + 1]
                         for s in range(cfg.domain.n_aero)]
        tau_alg = None
        if cfg.zbgc.dEdd_algae and "bgc_N" in trcrn:
            # ice-algal chlorophyll shades the bottom ice layer
            # (zbgc_nml dEdd_algae; chl = N * ratio_chl2N, tau = kalg*chl)
            chla = trcrn["bgc_N"] * cfg.zbgc.ratio_chl2N_diatoms
            tau_alg = cfg.shortwave.kalg * jnp.maximum(chla, 0.0)
        sw = shortwave_dEdd(Tsf, hin, hsn, hpnd_rad, apeff_rad,
                            fc.swvdr, fc.swvdf, fc.swidr, fc.swidf,
                            fc.coszen, cfg.shortwave, nilyr, nslyr,
                            aero_snow=aero_snow,
                            modal_aero=cfg.shortwave.modal_aero,
                            tau_alg=tau_alg)
    else:
        sw = shortwave_ccsm3(Tsf, hin, hsn, fc.swvdr, fc.swvdf, fc.swidr,
                             fc.swidf, cfg.shortwave, nilyr)

    # turbulent transfer coefficients
    if cfg.forcing.atmbndy == "constant":
        co = atmo_boundary_const(Tsf, fc.uatm, fc.vatm, fc.wind, fc.rhoa, fc.Qa)
    else:
        Cdn = None
        if cfg.forcing.formdrag:
            from ..columns.formdrag import drag_from_state
            Cdn = drag_from_state(state, cfg).Cdn_atm
        ua, va, wnd = fc.uatm, fc.vatm, fc.wind
        if cfg.forcing.highfreq:
            # high-frequency coupling: boundary layer sees the wind RELATIVE
            # to the moving ice (forcing_nml highfreq)
            uT = grid_average_X2Y("S", state.uvel, "U", "T", grid)
            vT = grid_average_X2Y("S", state.vvel, "U", "T", grid)
            ua, va = ua - uT, va - vT
            wnd = jnp.sqrt(ua * ua + va * va)
        co = atmo_boundary_layer(Tsf, fc.potT, ua, va, wnd,
                                 fc.zlvl, fc.Qa, fc.rhoa,
                                 natmiter=cfg.forcing.natmiter, Cdn_atm=Cdn,
                                 atmiter_conv=cfg.forcing.atmiter_conv)

    hin_solve = jnp.maximum(hin, cfg.thermo.hi_min)
    hilyr = hin_solve / nilyr
    hslyr = hsn / nslyr
    Isw = [sw.Iswabs[:, k] for k in range(nilyr)]

    if mushy:
        from ..columns import mushy as mush
        sice_all = trcrn["sice"]              # (ncat, nilyr, ny, nx)
        S_lay = [jnp.where(mask, sice_all[:, k], float(salin[k]))
                 for k in range(nilyr)]
        Tm_lay = [mush.liquidus_temperature(S) for S in S_lay]
        salin_arg, Tm_arg = S_lay, Tm_lay
        # congel_freeze='one-step' freezes congelation ice solid at once
        # (phi_init -> 1), 'two-step' forms mush at phi_i_mushy
        # (ug_case_settings.rst:709)
        phi_new = (1.0 if cfg.thermo.congel_freeze == "one-step"
                   else cfg.thermo.phi_i_mushy)
        qbot_new, S_bot_new = mush.new_ice_enthalpy_salinity(
            Tbot, fc.sss, phi_new)
    else:
        salin_arg = [float(s) for s in salin]
        Tm_arg = [float(t) for t in Tmlt]
        qbot_new = None

    ts, qsno_new, qice_new = temperature_changes(
        dt, nilyr, nslyr, Tsf=Tsf, qsno=qsno, qice=qice,
        salin=salin_arg, Tm=Tm_arg,
        hilyr=hilyr, hslyr=hslyr, Tbot=Tbot, fswsfc=sw.fswsfc,
        Iswabs=Isw, shcoef=co.shcoef, lhcoef=co.lhcoef,
        potT=fc.potT, Qa=fc.Qa, rhoa=fc.rhoa, flw=fc.flw,
        conduct=cfg.thermo.conduct, nit=cfg.thermo.nit,
        ktherm=cfg.thermo.ktherm)

    th, dzi, dzs = thickness_changes(
        dt, nilyr, nslyr, hin=hin_solve * jnp.where(mask, 1.0, 0.0),
        hsn=hsn, qice=qice_new, qsno=qsno_new,
        Tm=Tm_arg, salin=salin_arg,
        Tbot=Tbot, fbot=fbot, fsurf=ts.fsurf, fcondtop=ts.fcondtop,
        fcondbot=ts.fcondbot, flat=ts.flat, sss=fc.sss,
        qbot_new=qbot_new,
        saltflux_option=(cfg.thermo.saltflux_option if mushy else "constant"),
        ice_ref_salinity=cfg.thermo.ice_ref_salinity)

    # snowfall accumulation (step_therm1 snow addition)
    dhs_snow = jnp.where(mask, fc.fsnow * dt / cst.rhos, 0.0)
    hsn_new = th.hsn + dhs_snow
    qsnow_new = -cst.rhos * (cst.Lfresh - cst.cp_ice *
                             jnp.minimum(fc.Tair - cst.Tffresh, 0.0))
    # falling snow joins the top snow layer enthalpy-weighted
    qs_list = list(th.qsno)
    den = dzs[0] + dhs_snow
    qs_list[0] = jnp.where(den > cst.puny,
                           (th.qsno[0] * dzs[0] + qsnow_new * dhs_snow) /
                           jnp.maximum(den, cst.puny), th.qsno[0])
    dzs0 = list(dzs)
    dzs0[0] = den

    # vertical remap to uniform layers
    qice_r = adjust_enthalpy(dzi, th.qice, nilyr, th.hin)
    qsno_r = adjust_enthalpy(dzs0, qs_list, nslyr, hsn_new)

    fsalt_drain = jnp.zeros(grid.shape, an.dtype)
    if mushy:
        # bottom congelation carries the new-ice salinity into the bottom
        # layer, then remap + two-mode gravity drainage (Turner&Hunke 2015)
        from ..columns.thermo_vertical import safe_mix
        S_mix = list(S_lay)
        S_mix[-1] = safe_mix(S_mix[-1], hilyr, S_bot_new, th.congel)
        sice_r = adjust_enthalpy(dzi, S_mix, nilyr, th.hin)
        T_r = [mush.temperature_mush(qice_r[k], sice_r[k])
               for k in range(nilyr)]
        sice_r, fsalt_d = mush.drain_salinity(
            cfg.thermo, dt, S_layers=sice_r, T_layers=T_r,
            hilyr=th.hin / nilyr, sss=fc.sss, nilyr=nilyr)
        trcrn["sice"] = jnp.stack(
            [jnp.where(mask, s, sice_all[:, k])
             for k, s in enumerate(sice_r)], axis=1)
        # drained brine salt reaches the ocean (category-area weighted below)
        fsalt_drain = jnp.sum(jnp.where(mask, an, 0.0) * fsalt_d, axis=0)

    hin_f = jnp.where(mask, th.hin, 0.0)
    hsn_f = jnp.where(mask, hsn_new, 0.0)
    aicen_out = an
    vicen_out = jnp.where(mask, hin_f * an, vin)
    vsnon_out = jnp.where(mask, hsn_f * an, vsn)
    trcrn["Tsfcn"] = jnp.where(mask, ts.Tsf, Tsf_all)
    trcrn["qice"] = jnp.stack(
        [jnp.where(mask, q, qice_all[:, k]) for k, q in enumerate(qice_r)],
        axis=1)
    trcrn["qsno"] = jnp.stack(
        [jnp.where(mask, q, qsno_all[:, k]) for k, q in enumerate(qsno_r)],
        axis=1)
    if "iage" in trcrn:
        trcrn["iage"] = trcrn["iage"] + dt

    # melt ponds (icepack_meltpond_* inside icepack_step_therm1)
    if "apnd" in trcrn:
        trcrn, apeff, pond_flush, pond_diag = step_ponds(
            cfg, dt, aicen=an, vicen=vicen_out, vsnon=vsnon_out,
            trcrn=trcrn, Tsf=trcrn["Tsfcn"], meltt=th.meltt, melts=th.melts,
            frain=fc.frain, aice=aice, return_diag=True)
    else:
        apeff = jnp.zeros_like(an)
        pond_flush = jnp.zeros_like(an)
        pond_diag = {k: jnp.zeros_like(an)
                     for k in ("dpnd_flush", "dpnd_initial", "dpnd_expon",
                               "dpnd_freebd", "dpnd_dlid")}

    # aerosol / isotope tracer physics (icepack_aerosol / icepack_isotope)
    if cfg.tracers.tr_aero and "aerosno" in trcrn:
        from ..columns.aero_iso import step_aerosols
        # coupler-imported per-species deposition when present (empty
        # faero_atm = standalone defaults; ice_import_export Faxa_bcph)
        fa = (fc.faero_atm
              if fc.faero_atm.shape[0] == cfg.domain.n_aero else None)
        sn_a, ic_a, faero_ocn = step_aerosols(
            cfg, dt, aicen=an, vicen=vicen_out, vsnon=vsnon_out,
            aerosno=trcrn["aerosno"], aeroice=trcrn["aeroice"],
            melts=th.melts, meltt=th.meltt, snoice=th.snoice,
            fsnow=fc.fsnow, faero_atm=fa)
        trcrn["aerosno"], trcrn["aeroice"] = sn_a, ic_a
    fiso_ocn = None
    if cfg.tracers.tr_iso and "isosno" in trcrn:
        from ..columns.aero_iso import step_isotopes
        fi = (fc.fiso_atm
              if fc.fiso_atm.shape[0] == cfg.domain.n_iso else None)
        sn_i, ic_i, fiso_ocn = step_isotopes(
            cfg, dt, aicen=an, vsnon=vsnon_out, isosno=trcrn["isosno"],
            isoice=trcrn["isoice"], fsnow=fc.fsnow, melts=th.melts,
            snoice=th.snoice, fiso_atm=fi)
        trcrn["isosno"], trcrn["isoice"] = sn_i, ic_i

    # brine height tracer (icepack update_hbrine; SURVEY §2.9 hbrine group)
    zbgc_diags: dict = {}
    if cfg.tracers.tr_brine and "fbri" in trcrn:
        from ..columns.hbrine import update_hbrine
        hb = update_hbrine(
            dt, aicen=an, vicen=vicen_out, vsnon=vsnon_out,
            fbri=trcrn["fbri"], qice=trcrn["qice"], sice=trcrn["sice"],
            meltb=th.meltb, meltt=th.meltt, congel=th.congel)
        trcrn["fbri"] = hb.fbri

        # vertically-resolved biogeochemistry on the brine column
        # (z_tracers/solve_zbgc; reference biogeochemistry phase between
        # step_therm1 and step_therm2, ice_step_mod.F90:1634-1782)
        if cfg.zbgc.z_tracers:
            from ..columns.zbgc_vertical import step_zbgc, z_tracer_names
            znames = [n for n in z_tracer_names(cfg.zbgc) if n in trcrn]
            if znames:
                zdep = None
                if cfg.zbgc.tr_zaero and cfg.zbgc.n_zaero > 0:
                    # standalone deposition defaults (faero_default,
                    # ice_forcing_bgc.F90): BC1, BC2, then dust species
                    from ..columns.aero_iso import FAERO_DEFAULT
                    zdep = {
                        f"zaero{i+1}": jnp.full(
                            aice.shape,
                            FAERO_DEFAULT[min(i, len(FAERO_DEFAULT) - 1)],
                            aice.dtype)
                        for i in range(cfg.zbgc.n_zaero)}
                zout = step_zbgc(
                    cfg.zbgc, dt, aicen=an, vicen=vicen_out,
                    vsnon=vsnon_out, fbri=trcrn["fbri"],
                    qice=trcrn["qice"], sice=trcrn["sice"],
                    trc={n: trcrn[n] for n in znames},
                    frac={n: trcrn[n + "_mf"] for n in znames},
                    darcy_V=hb.darcy_V,
                    fswthru=sw.fswint + sw.fswthru, Tbot=Tbot,
                    meltt=th.meltt, meltb=th.meltb, congel=th.congel,
                    frazil=jnp.zeros_like(aice), zaero_dep=zdep,
                    snow={n: trcrn[n + "_sn"] for n in znames
                          if n + "_sn" in trcrn},
                    melts=th.melts)
                for n in znames:
                    trcrn[n] = zout.trc[n]
                    trcrn[n + "_mf"] = zout.frac[n]
                    if n in zout.snow:
                        trcrn[n + "_sn"] = zout.snow[n]
                # interior-state + uptake diagnostics for history
                # (bTizn/bphizn/zfswin/iDin/ikin 3Db, upNO/upNH/PP_net 2D)
                zbgc_diags.update(zout.diags)
                # net ice->ocean fluxes per z tracer (reference flux_bio;
                # history fzaero/fN/fNit... families)
                zbgc_diags.update({f"fzbgc_{n}": v
                                   for n, v in zout.flux_ocn.items()})

    # advanced snow physics (icepack_step_snow; reference calls it as its
    # own phase after dynamics — here it rides with therm1 where the
    # per-category melt and snow temperature are in hand)
    fsloss_n = None
    if cfg.tracers.tr_snow:
        from ..columns.snow import step_snow
        Tsno_top = jnp.stack([temp_from_enthalpy_snow(q)
                              for q in [trcrn["qsno"][:, 0]]], axis=0)[0]
        trcrn, meltsliq, vsnon_out, fsloss_n = step_snow(
            cfg, dt, vsnon=vsnon_out, aicen=an, trcrn=trcrn,
            Tsno=Tsno_top, melts=th.melts, frain=fc.frain, fsnow=fc.fsnow,
            wind=fc.wind)

    # aggregate cell-mean fluxes (weight: category area; sum over categories)
    w = jnp.where(mask, an, 0.0)
    ws = lambda x: jnp.sum(w * x, axis=0)
    # the hi_min floor before the vertical solve adds (hi_min - hin) of ice
    # to thin masked categories; that mass is drawn from the ocean so the
    # freshwater identity stays exact (negative fresh contribution)
    fresh_clamp = -cst.rhoi * jnp.where(mask, hin_solve - hin, 0.0) / dt
    agg = dict(
        fsens=ws(ts.fsens), flat=ws(ts.flat), flwout=ws(ts.flwout),
        evap=ws(th.evapn),
        fsalt_drain=fsalt_drain,
        fswabs=ws(sw.fswsfc + sw.fswint + sw.fswthru),
        fhocn=ws(th.fhocn), fresh=ws(th.freshn + fresh_clamp),
        fsalt=ws(th.fsaltn),
        fswthru=ws(sw.fswthru), meltt=ws(th.meltt), meltb=ws(th.meltb),
        melts=ws(th.melts), congel=ws(th.congel), snoice=ws(th.snoice),
        alvdr=ws(sw.alvdr), alvdf=ws(sw.alvdf), alidr=ws(sw.alidr),
        alidf=ws(sw.alidf), fsurf=ws(ts.fsurf), fcondtop=ws(ts.fcondtop),
        apond=ws(apeff), fpond=ws(pond_flush) * cst.rhofresh / dt,
        fcondbot=ws(ts.fcondbot), fswint=ws(sw.fswint),
        meltsliq=(ws(meltsliq) if cfg.tracers.tr_snow
                  else jnp.zeros(grid.shape, an.dtype)),
    )
    # snow-covered fraction + broadband albedo partition by surface type
    # (reference albice/albsno/albpnd diagnostics from icepack shortwave;
    # delta: partition weights are the CCSM3-style snow patchiness fraction
    # and the radiatively-effective pond fraction rather than dEdd's
    # internal sub-column areas)
    asnow = hsn_f / (hsn_f + cst.snowpatch)
    alb_bb = (cst.awtvdr * sw.alvdr + cst.awtidr * sw.alidr +
              cst.awtvdf * sw.alvdf + cst.awtidf * sw.alidf)
    fr_pond = jnp.clip(apeff, 0.0, 1.0)
    fr_snow = jnp.clip(asnow, 0.0, 1.0 - fr_pond)
    fr_bare = jnp.clip(1.0 - fr_snow - fr_pond, 0.0, 1.0)
    agg["snowfrac"] = ws(asnow)
    agg["albsno"] = ws(alb_bb * fr_snow)
    agg["albpnd"] = ws(alb_bb * fr_pond)
    agg["albice"] = ws(alb_bb * fr_bare)
    # per-category boundary-layer wind stress aggregated per unit CELL
    # area (Σ aicen * strair_n — the reference's strairxT convention,
    # icepack_step_therm1 via ice_step_mod.F90:401-614: "rotated on u grid
    # and multiplied by aice", ice_dyn_evp.F90:252). The cell-area scaling
    # is load-bearing: the momentum balance's water drag also scales with
    # aiU, so a near-empty fringe cell feels dust-sized wind force; a
    # per-ice-area stress there would amplify to ~30 m/s dust velocities
    agg["strairx"] = ws(co.strx)
    agg["strairy"] = ws(co.stry)
    # per-category cell-mean flux planes (reference 3Dc *_ai history fields)
    agg["ncat_fluxes"] = dict(
        fsurfn=w * ts.fsurf, fcondtopn=w * ts.fcondtop, flatn=w * ts.flat,
        fsensn=w * ts.fsens, melttn=w * th.meltt,
        # net surface heat flux causing melt (>=0, only when the surface
        # sits at the melting point — reference fmeltt/fmelttn_ai,
        # ice_history.F90:1384)
        fmelttn=w * jnp.where(ts.Tsf > -cst.puny,
                              jnp.maximum(ts.fsurf - ts.fcondtop, 0.0), 0.0),
        # surface-to-top-layer conductance per category (raw 3Dc plane;
        # reference keffn_top, ice_history.F90:1922)
        keffn_top=jnp.where(mask, ts.keff_top, 0.0),
        # snow-sublimation mass flux (reference evaps -> sisndmasssubl)
        evaps=ws(th.evapsn),
        # radiatively-effective pond fraction per category (raw 3Dc plane;
        # reference apeffn, ice_history_pond.F90:410)
        apeffn=apeff,
        # per-category SW penetration to the ocean (coupler
        # Fioi_swpen_ifrac_n export, ice_import_export.F90:262)
        fswthrun=w * sw.fswthru,
        # per-category pond water budget planes (f_dpnd_*n)
        **{k + "n": w * v for k, v in pond_diag.items()})
    # shortwave scaling factor (reference icepack_prep_radiation
    # scale_factor: net SW at current forcing/albedos over the absorbed SW
    # of the radiation pass; ==1 when radiation runs in-step, as here)
    nsw = ((fc.swvdr + fc.swvdf + fc.swidr + fc.swidf) * jnp.sum(w, axis=0)
           - (fc.swvdr * ws(sw.alvdr) + fc.swvdf * ws(sw.alvdf)
              + fc.swidr * ws(sw.alidr) + fc.swidf * ws(sw.alidf)))
    agg["ncat_fluxes"]["scale_factor"] = jnp.where(
        agg["fswabs"] > cst.puny, nsw / jnp.maximum(agg["fswabs"], cst.puny),
        1.0)
    # wind-blown snow mass lost to leads (reference fsloss/sisndmasswind)
    agg["ncat_fluxes"]["fsloss"] = (
        jnp.sum(fsloss_n, axis=0) if fsloss_n is not None
        else jnp.zeros(grid.shape, an.dtype))
    # z-network interior diagnostics (empty dict when z_tracers off)
    agg["ncat_fluxes"].update(zbgc_diags)
    if cfg.tracers.tr_aero and "aerosno" in trcrn:
        # per-species aerosol flux to ocean (kg/m^2/s) for the coupler
        # exports Fioi_bcpho/bcphi/flxdst (ice_import_export.F90)
        agg["ncat_fluxes"]["faero_ocn"] = faero_ocn
    if fiso_ocn is not None:
        # per-species isotope flux to ocean (reference fiso_ocn history)
        agg["ncat_fluxes"]["fiso_ocn"] = fiso_ocn
    # cell-mean pond water budget terms (f_dpnd_*)
    for k, v in pond_diag.items():
        agg[k] = ws(v)
    # 2m/10m reference diagnostics: ice-area-weighted over categories with
    # the open-water fraction taking the free-air values (f_Tref/f_Qref)
    ow = jnp.clip(1.0 - aice, 0.0, 1.0)
    if co.Tref is not None:
        agg["Tref"] = ws(co.Tref) + ow * fc.potT
        agg["Qref"] = ws(co.Qref) + ow * fc.Qa
        agg["Uref"] = ws(co.Uref) + ow * fc.wind
    else:
        agg["Tref"] = fc.potT
        agg["Qref"] = fc.Qa
        agg["Uref"] = fc.wind
    # ocean heat consumed at the ice bottom (per unit cell area); it is
    # drawn from the mixed layer inside ocean_mixed_layer's budget
    agg["fbot_used"] = jnp.where(aice > cst.puny, fbot * aice, 0.0)

    new_state = state.replace(aicen=aicen_out, vicen=vicen_out,
                              vsnon=vsnon_out, trcrn=trcrn)
    return new_state, agg, hicen_old


FBOT_MAX = 1000.0


# ---------------------------------------------------------------------------
# dynamics phase (step_dyn_horiz:969)
# ---------------------------------------------------------------------------

def _en_stress_splits(prepc, extra, uvelE, vvelE, uvelN, vvelN):
    """E/N-point momentum-balance splits for history (reference
    strair*/strcor*/strtlt* E/N registrations, ice_history.F90 CD-grid
    section).  The prep stage folds air stress + geostrophic tilt into
    forcexE/forceyN; unfold them here and evaluate Coriolis at the final
    velocities.  `extra` (CD only) provides the cross-component forcings."""
    fmE, fmN = prepc.fmE, prepc.fmN
    out = {
        "strairxE": prepc.forcexE + fmE * prepc.vocnE,
        "strtltxE": -fmE * prepc.vocnE,
        "strairyN": prepc.forceyN - fmN * prepc.uocnN,
        "strtltyN": fmN * prepc.uocnN,
    }
    if vvelE is not None:
        out["strcorxE"] = fmE * vvelE
    if uvelN is not None:
        out["strcoryN"] = -fmN * uvelN
    if extra is not None:
        out.update({
            "strairyE": extra.forceyE - fmE * prepc.uocnE,
            "strtltyE": fmE * prepc.uocnE,
            "strcoryE": -fmE * uvelE,
            "strairxN": extra.forcexN + fmN * prepc.vocnN,
            "strtltxN": -fmN * prepc.vocnN,
            "strcorxN": fmN * vvelN,
        })
    return out


def step_dyn_horiz(ms: ModelStatic, grid: Grid, state: State, fc: Forcing,
                   strairx_T, strairy_T, dt: float):
    """Horizontal dynamics dispatch (reference step_dyn_horiz:969):
    kdyn=1 EVP (B or C grid), 2 EAP, 3 implicit VP."""
    cfg = ms.cfg
    d = cfg.dynamics
    p = evp_params(d, dt)

    strength = ice_strength(state.aicen, state.vicen, state.aice, state.vice, d)

    if cfg.grid.grid_ice == "CD" and d.kdyn == 1:
        from ..dynamics.evp_c import (CDEvpState, dyn_prep_c, dyn_prep_cd,
                                      evp_cd_solve)
        prepc = dyn_prep_c(grid, d, dt, aice=state.aice, vice=state.vice,
                           vsno=state.vsno, uvelE=state.uvelE,
                           vvelN=state.vvelN, strairxT=strairx_T,
                           strairyT=strairy_T, uocn_T=fc.uocn, vocn_T=fc.vocn)
        extra = dyn_prep_cd(grid, d, dt, prepc, vvelE=state.vvelE,
                            uvelN=state.uvelN, strairxT=strairx_T,
                            strairyT=strairy_T)
        init = CDEvpState(
            uvelE=prepc.uvelE_init, vvelE=extra.vvelE_init,
            uvelN=extra.uvelN_init, vvelN=prepc.vvelN_init,
            stresspT=jnp.where(prepc.iceTmask, state.stressp[0], 0.0),
            stressmT=jnp.where(prepc.iceTmask, state.stressm[0], 0.0),
            stress12T=jnp.where(prepc.iceTmask, state.stress12[0], 0.0),
            stresspU=state.stressp[1], stressmU=state.stressm[1],
            stress12U=state.stress12[1])
        final, uU, vU = evp_cd_solve(grid, p, prepc, extra, strength, init)
        sp = state.stressp.at[0].set(final.stresspT).at[1].set(final.stresspU)
        sm = state.stressm.at[0].set(final.stressmT).at[1].set(final.stressmU)
        s12 = state.stress12.at[0].set(final.stress12T).at[1].set(
            final.stress12U)
        from ..dynamics.evp_c import c_dyn_finish, deformations_C
        divu, shear, Delta = deformations_C(grid, final.uvelE, final.vvelN, p)
        state = state.replace(uvel=uU, vvel=vU, uvelE=final.uvelE,
                              vvelE=final.vvelE, uvelN=final.uvelN,
                              vvelN=final.vvelN, stressp=sp, stressm=sm,
                              stress12=s12)
        fin = c_dyn_finish(grid, prepc, final.uvelE, final.vvelN,
                           final.stresspT, final.stressmT, final.stress12U,
                           vvelE=final.vvelE, uvelN=final.uvelN)
        return state, dict(strintx=fin["strintx"], strinty=fin["strinty"],
                           taubx=fin["taubx"], tauby=fin["tauby"],
                           strocnx=fin["strocnx"], strocny=fin["strocny"],
                           divu=divu, shear=shear, Delta=Delta,
                           strength=strength,
                           **_en_stress_splits(prepc, extra, final.uvelE,
                                               final.vvelE, final.uvelN,
                                               final.vvelN))

    if cfg.grid.grid_ice == "C" and d.kdyn == 1:
        from ..dynamics.evp_c import dyn_prep_c, evp_c_solve
        prepc = dyn_prep_c(grid, d, dt, aice=state.aice, vice=state.vice,
                           vsno=state.vsno, uvelE=state.uvelE,
                           vvelN=state.vvelN, strairxT=strairx_T,
                           strairyT=strairy_T, uocn_T=fc.uocn, vocn_T=fc.vocn)
        if d.evp_algorithm == "wide_halo":
            from ..parallel.evp_wide import evp_c_solve_wide
            final, uU, vU = evp_c_solve_wide(
                grid, p, prepc, strength, state.stressp[0],
                state.stressm[0], state.stress12[0], mesh=ms.mesh,
                k_fuse=d.evp_wide_k)
        else:
            final, uU, vU = evp_c_solve(grid, p, prepc, strength,
                                        state.stressp[0], state.stressm[0],
                                        state.stress12[0])
        # keep the T/U stress state in the 4-corner slots (slot 0 = C fields)
        sp = state.stressp.at[0].set(final.stresspT)
        sm = state.stressm.at[0].set(final.stressmT)
        s12 = state.stress12.at[0].set(final.stress12U)
        from ..dynamics.evp_c import c_dyn_finish, deformations_C
        divu, shear, Delta = deformations_C(grid, final.uvelE, final.vvelN, p)
        state = state.replace(uvel=uU, vvel=vU, uvelE=final.uvelE,
                              vvelN=final.vvelN, stressp=sp, stressm=sm,
                              stress12=s12)
        fin = c_dyn_finish(grid, prepc, final.uvelE, final.vvelN,
                           final.stresspT, final.stressmT, final.stress12U)
        return state, dict(strintx=fin["strintx"], strinty=fin["strinty"],
                           taubx=fin["taubx"], tauby=fin["tauby"],
                           strocnx=fin["strocnx"], strocny=fin["strocny"],
                           divu=divu, shear=shear, Delta=Delta,
                           strength=strength,
                           **_en_stress_splits(
                               prepc, None, final.uvelE,
                               grid_average_X2Y("S", final.vvelN, "N", "E",
                                                grid),
                               grid_average_X2Y("S", final.uvelE, "E", "N",
                                                grid),
                               final.vvelN))

    CwU = None
    if cfg.forcing.formdrag:
        from ..columns.formdrag import drag_from_state
        dragc = drag_from_state(state, cfg)
        CwU = grid_average_X2Y("S", dragc.Cdn_ocn, "T", "U", grid)
        CwU = jnp.maximum(CwU, 1e-4)
    prep = dyn_prep(grid, d, dt, aice=state.aice, vice=state.vice,
                    vsno=state.vsno, aiceU_prev_mask=state.iceUmask,
                    uvel=state.uvel, vvel=state.vvel,
                    strairxT=strairx_T, strairyT=strairy_T,
                    uocn_T=fc.uocn, vocn_T=fc.vocn,
                    ss_tltx_T=fc.ss_tltx, ss_tlty_T=fc.ss_tlty, Cw_in=CwU)

    uocnU = grid_average_X2Y("S", fc.uocn, "T", "U", grid)
    vocnU = grid_average_X2Y("S", fc.vocn, "T", "U", grid)

    if d.kdyn == 3:
        from ..dynamics.vp import implicit_solver
        (u, v, sp, sm, s12, strintx, strinty, taubx, tauby, _res) = \
            implicit_solver(grid, d, prep, strength, uocn=uocnU, vocn=vocnU,
                            dt=dt)
    elif d.kdyn == 2:
        from ..dynamics.eap import eap_solve
        (u, v, sp, sm, s12, strintx, strinty, taubx, tauby,
         a11, a12, yieldstress) = eap_solve(
            grid, p, prep, strength, state.stressp, state.stressm,
            state.stress12, uocn=uocnU, vocn=vocnU,
            a11=state.a11, a12=state.a12)
        state = state.replace(a11=a11, a12=a12)
    elif d.evp_algorithm == "fused_pallas":
        from ..kernels.evp_pallas import evp_solve_fused
        u, v, sp, sm, s12, strintx, strinty, taubx, tauby = evp_solve_fused(
            grid, p, prep, strength, state.stressp, state.stressm,
            state.stress12, uocn=uocnU, vocn=vocnU)
    elif d.evp_algorithm == "wide_halo":
        from ..parallel.evp_wide import evp_solve_wide
        u, v, sp, sm, s12, strintx, strinty, taubx, tauby = evp_solve_wide(
            grid, p, prep, strength, state.stressp, state.stressm,
            state.stress12, uocn=uocnU, vocn=vocnU, mesh=ms.mesh,
            k_fuse=d.evp_wide_k)
    else:
        u, v, sp, sm, s12, strintx, strinty, taubx, tauby = evp_solve(
            grid, p, prep, strength, state.stressp, state.stressm,
            state.stress12, uocn=uocnU, vocn=vocnU)

    strocnx, strocny = evp_ocean_stress(prep, u, v, uocnU, vocnU)
    divu, shear, Delta = deformations_B(grid, u, v, p, dt)

    state = state.replace(uvel=u, vvel=v, stressp=sp, stressm=sm,
                          stress12=s12, iceUmask=prep.iceUmask)
    dyn_diags = dict(strintx=strintx, strinty=strinty, taubx=taubx,
                     tauby=tauby, strocnx=strocnx, strocny=strocny,
                     divu=divu, shear=shear, Delta=Delta, strength=strength)
    if d.kdyn == 2:
        dyn_diags.update(yieldstress)
    return state, dyn_diags


# ---------------------------------------------------------------------------
# the full model step
# ---------------------------------------------------------------------------

def model_step(ms: ModelStatic, grid: Grid, state: State, fc: Forcing,
               dt: float):
    """One full thermo+dyn timestep. Returns (state, FluxOut, scalars)."""
    cfg = ms.cfg
    registry = ms.registry
    hin_max = np.asarray(ms.hin_max)

    # --- wind stress on ice (T grid) -----------------------------------
    # calc_strair=True: the stress comes from the per-category
    # Monin-Obukhov boundary layer computed in step_therm1 (stability-
    # dependent; reference icepack_atm_boundary via step_therm1 +
    # prepare_forcing, ice_forcing.F90:1603+) and is bound after the
    # thermo phase below. calc_strair=False: data stresses pass through.
    if not cfg.forcing.calc_strair:
        strairx_T = fc.strax
        strairy_T = fc.stray

    # tendency bookkeeping (init_history_therm/_dyn saved copies,
    # ice_flux.F90: daidtt/dvidtt thermo vs daidtd/dvidtd dynamics rates)
    aice_init, vice_init = state.aice, state.vice
    vsno_init = state.vsno

    # pond freshwater reservoir before the thermo phases: the coupler
    # fresh flux below carries rain-on-ice minus the reservoir change so
    # the freshwater identity closes exactly (reference fpond bookkeeping,
    # ice_flux.F90 / ice_diagnostics.F90:243-530 arbud)
    from ..columns.ponds import pond_reservoir_mass
    pond_lvl = cfg.tracers.tr_pond_lvl
    pond_mass_pre = pond_reservoir_mass(state.trcrn, state.aicen, pond_lvl)

    def _mean_age(st):
        if "iage" not in st.trcrn:
            return jnp.zeros_like(st.aice)
        return jnp.sum(st.trcrn["iage"] * st.aicen, axis=0) / \
            jnp.maximum(st.aice, cst.puny)
    age_init = _mean_age(state)

    # --- thermodynamics -------------------------------------------------
    state, agg, hicen_old = step_therm1(ms, grid, state, fc, dt)

    if cfg.forcing.calc_strair:
        strairx_T = agg["strairx"]
        strairy_T = agg["strairy"]

    aicen_pre = state.aicen
    t2 = step_therm2(cfg, grid, state.aicen, state.vicen, state.vsnon,
                     state.trcrn, hicen_old=hicen_old, frzmlt=state.frzmlt,
                     Tf=fc.Tf, sst=state.sst, dt=dt,
                     hin_max=hin_max, registry=registry)
    state = state.replace(aicen=t2.aicen, vicen=t2.vicen, vsnon=t2.vsnon,
                          trcrn=t2.trcrn)

    # FSD: thermodynamic evolution + wave fracture (step_dyn_wave)
    fsd_tend = {}
    if cfg.tracers.tr_fsd and "fsd" in state.trcrn:
        from ..columns.fsd import step_dyn_wave, step_fsd_thermo
        da_new = jnp.maximum(t2.aicen - aicen_pre, 0.0)
        G_rad = jnp.sign(state.frzmlt) * jnp.abs(state.frzmlt) * 1.0e-8
        trc = dict(state.trcrn)
        f, fsd_tend = step_fsd_thermo(cfg, dt, fsd=trc["fsd"],
                                      aicen=t2.aicen,
                                      da_new=da_new, G_rad=G_rad[None],
                                      frzmlt=state.frzmlt,
                                      return_tend=True)
        f, wtend = step_dyn_wave(cfg, dt, fsd=f, aicen=t2.aicen,
                                 vicen=t2.vicen, hs_wave=fc.wave_hs,
                                 Tp_wave=fc.wave_Tp,
                                 wave_spectrum=(fc.wave_spectrum
                                                if cfg.forcing.wave_spec_type
                                                in ("profile", "constant",
                                                    "random") else None),
                                 return_tend=True)
        fsd_tend.update(wtend)
        trc["fsd"] = f
        state = state.replace(trcrn=trc)

    # --- biogeochemistry (skeletal-layer; reference biogeochemistry:1634)
    if cfg.zbgc.skl_bgc and "bgc_N" in state.trcrn:
        from ..columns.zbgc import step_bgc_skl_net
        trc = dict(state.trcrn)
        bgc_keys = [k for k in trc if k.startswith("bgc_")]
        aice_safe = jnp.maximum(state.aice, cst.puny)
        z = cfg.zbgc
        ocean = {"bgc_Nit": z.nit_data, "bgc_Am": z.amm_data,
                 "bgc_Sil": z.sil_data, "bgc_DMSPd": z.dms_data,
                 "bgc_DMS": z.dms_data, "bgc_DON": 0.0,
                 "bgc_hum": z.hum_data,
                 "bgc_Fed": z.fed_data, "bgc_Fed2": z.fed_data,
                 **{f"bgc_DOC{i+1}": z.doc_data for i in range(z.n_doc)},
                 **{f"bgc_DIC{i+1}": z.dic_data for i in range(z.n_dic)}}
        bout = step_bgc_skl_net(
            z, dt, aicen=state.aicen,
            trc={k: trc[k] for k in bgc_keys},
            fswthru=(agg["fswthru"] / aice_safe)[None],
            Tbot=fc.Tf[None], meltb=(agg["meltb"] / aice_safe)[None],
            congel=(agg["congel"] / aice_safe)[None], ocean=ocean)
        trc.update(bout.trc)
        state = state.replace(trcrn=trc)
        # ice->ocean bgc fluxes + net growth for history/coupler
        # (reference flux_bio / grow_net diagnostics)
        agg["ncat_fluxes"].update(
            {f"fbgc_{k[4:]}": v for k, v in bout.flux_bgc_ocn.items()})
        agg["ncat_fluxes"]["grow_net"] = jnp.sum(
            bout.grow_net * state.aicen, axis=0) / aice_safe
        # uptake/production diagnostics (reference upNO/upNH/PP_net)
        for nm, v in (("upNO", bout.upNO), ("upNH", bout.upNH),
                      ("PP_net", bout.PP_net)):
            agg["ncat_fluxes"][nm] = jnp.sum(v * state.aicen, axis=0)

    # pond reservoir change over the thermo phases (therm1 pond update +
    # therm2 lateral melt/ITD changes of the pond-bearing area): positive
    # = water retained on the ice, deducted from the coupler fresh flux.
    # Rain over ice enters the ice system here; the uncaptured remainder
    # runs off to the ocean (reference prepare_forcing / icepack therm1)
    pond_mass_post = pond_reservoir_mass(state.trcrn, state.aicen, pond_lvl)
    fpond_net = (pond_mass_post - pond_mass_pre) / dt     # kg/m^2/s
    rain_on_ice = fc.frain * aice_init

    daidtt = (state.aice - aice_init) / dt
    dvidtt = (state.vice - vice_init) / dt
    dvsdtt = (state.vsno - vsno_init) / dt
    dagedtt = (_mean_age(state) - age_init) / dt
    aice_posttherm, vice_posttherm = state.aice, state.vice
    vsno_posttherm = state.vsno
    age_posttherm = _mean_age(state)

    # --- dynamics + transport + ridging ---------------------------------
    # ndtd supercycling: the dynamics/transport/ridge sequence runs ndtd
    # times per thermo step at dt/ndtd (reference do k=1,ndtd loop,
    # CICE_RunMod.F90:287-322); ndtd is static so this unrolls at trace time
    tchecks: dict = {}
    zf0 = jnp.zeros(grid.shape, state.aicen.dtype)
    clean = dict(fresh=zf0, fsalt=zf0, fhocn=zf0)   # ridging cleanup losses
    if cfg.dynamics.kdyn >= 1:
        dt_dyn = dt / max(cfg.setup.ndtd, 1)
        for _ in range(max(cfg.setup.ndtd, 1)):
            state, dyn = step_dyn_horiz(ms, grid, state, fc, strairx_T,
                                        strairy_T, dt_dyn)
            if cfg.dynamics.ktransport >= 1:
                if cfg.dynamics.advection == "remap":
                    from ..dynamics.remap_exact import (
                        build_flat_table, fused_full_eligible,
                        fused_kernel_eligible, horizontal_remap_exact)
                    fk = cfg.dynamics.remap_kernel
                    if fk == "auto":
                        # fused kernels only where they are the measured
                        # win and compile natively: real TPU, f32 state,
                        # no explicit-comm mesh (GSPMD sharding would
                        # split the pallas_call), within VMEM budgets.
                        # Preference: full fused transport (construct +
                        # flux + update one-pass, ~3x the flux kernel's
                        # win) > flux-only kernel > XLA.
                        import jax as _jax
                        fk = "xla"
                        if (_jax.default_backend() == "tpu"
                                and ms.mesh is None
                                and _jax.device_count() == 1):
                            NTf = len(build_flat_table(registry))
                            dt_ = state.aicen.dtype
                            if fused_full_eligible(grid, NTf, dt_)[0]:
                                fk = "fused_full"
                            elif fused_kernel_eligible(grid, NTf,
                                                       dt_)[0]:
                                fk = "fused_pallas"
                    state, td = horizontal_remap_exact(
                        grid, state, registry, fc.Tf, dt_dyn,
                        grid_ice=cfg.grid.grid_ice,
                        l_dp_midpt=cfg.dynamics.l_dp_midpt,
                        conserv_check=cfg.setup.conserv_check,
                        monotonicity_check=cfg.dynamics.monotonicity_check,
                        flux_kernel=fk)
                    for k, v in td.items():
                        prev = tchecks.get(k)
                        tchecks[k] = v if prev is None else \
                            (prev | v if v.dtype == bool
                             else jnp.maximum(prev, v))
                else:
                    from ..dynamics.transport import transport_vanleer
                    advect = {"remap_q": transport_remap,
                              "vanleer": transport_vanleer}.get(
                                  cfg.dynamics.advection, transport_upwind)
                    state = advect(grid, state, registry, fc.Tf, dt_dyn,
                                   grid_ice=cfg.grid.grid_ice)
            if cfg.dynamics.kridge >= 1:
                aicen, vicen, vsnon, trcrn, rdg = ridge_ice(
                    cfg, state.aicen, state.vicen, state.vsnon, state.trcrn,
                    divu=dyn["divu"], Delta=dyn["Delta"], dt=dt_dyn,
                    hin_max=hin_max, registry=registry)
                state = state.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                                      trcrn=trcrn)
                for k in clean:
                    # dt-weighted: cleanup rates are per dt_dyn sub-step
                    clean[k] = clean[k] + rdg.pop(f"{k}_cleanup") * \
                        (dt_dyn / dt)
                dyn.update(rdg)
    else:
        _z = jnp.zeros(grid.shape, state.aicen.dtype)
        dyn = dict(strocnx=_z, strocny=_z, divu=_z, shear=_z, Delta=_z,
                   strintx=_z, strinty=_z, taubx=_z, tauby=_z, strength=_z)

    # --- ocean mixed layer / frzmlt -------------------------------------
    fbot_used = agg.pop("fbot_used")
    fhocn_ice = agg["fhocn"] + t2.fhocn + fbot_used + clean["fhocn"]
    if cfg.forcing.oceanmixed_ice:
        sst_new, frzmlt = ocean_mixed_layer(
            dt, sst=state.sst, Tf=fc.Tf, hmix=fc.hmix, qdp=fc.qdp,
            frzmlt_old=state.frzmlt, aice=state.aice,
            fhocn_ice=fhocn_ice, fswthru_ice=agg["fswthru"],
            fresh_unused=0.0, flw=fc.flw, swvdr=fc.swvdr, swvdf=fc.swvdf,
            swidr=fc.swidr, swidf=fc.swidf, potT=fc.potT, Qa=fc.Qa,
            rhoa=fc.rhoa, wind=fc.wind, uatm=fc.uatm, vatm=fc.vatm,
            zlvl=fc.zlvl)
    else:
        # oceanmixed_ice=False: SST comes from data/coupler; the freezing/
        # melting potential is diagnosed from it (reference standalone vs
        # coupled frzmlt handling)
        sst_new = fc.sst_data
        frzmlt = jnp.clip(cst.cprho * (fc.Tf - sst_new) * fc.hmix / dt,
                          -1000.0, 1000.0)
    # melt/freeze onset day-of-year (f_mlt_onset/f_frz_onset: stamp the
    # first day surface melt / frazil formation occurs; yearly reset is
    # host-side in the driver)
    mlt_onset = jnp.where((state.mlt_onset <= 0.0) & (agg["meltt"] > 0.0),
                          fc.yday, state.mlt_onset)
    frz_onset = jnp.where((state.frz_onset <= 0.0) & (t2.frazil > 0.0),
                          fc.yday, state.frz_onset)
    state = state.replace(sst=sst_new, frzmlt=frzmlt,
                          mlt_onset=mlt_onset, frz_onset=frz_onset)

    zf = jnp.zeros(grid.shape, state.aicen.dtype)
    flux = zeros_fluxout(grid.shape, state.aicen.dtype).replace(
        fsens=agg["fsens"], flat=agg["flat"], flwout=agg["flwout"],
        evap=agg["evap"], fswabs=agg["fswabs"],
        strairx=strairx_T, strairy=strairy_T,
        fhocn=fhocn_ice,
        # update_ocn_f=False: frazil mass fluxes stay out of the coupler
        # fresh/salt budget (forcing_nml update_ocn_f)
        fresh=agg["fresh"] + rain_on_ice - fpond_net + clean["fresh"] +
              (t2.freshn if cfg.forcing.update_ocn_f
               else t2.freshn - t2.freshn_frazil),
        fsalt=agg["fsalt"] + agg["fsalt_drain"] + clean["fsalt"] +
              (t2.fsaltn if cfg.forcing.update_ocn_f
               else t2.fsaltn - t2.fsaltn_frazil),
        fswthru=agg["fswthru"],
        strocnx=dyn["strocnx"], strocny=dyn["strocny"],
        meltt=agg["meltt"], meltb=agg["meltb"], melts=agg["melts"],
        meltl=t2.meltl, congel=agg["congel"], frazil=t2.frazil,
        snoice=agg["snoice"], alvdr=agg["alvdr"], alvdf=agg["alvdf"],
        alidr=agg["alidr"], alidf=agg["alidf"],
        albice=agg["albice"],
        fsurf=agg["fsurf"], fcondtop=agg["fcondtop"],
        fbot=fbot_used, fcondbot=agg["fcondbot"], fswint=agg["fswint"],
        fpond=fpond_net, apeff=agg["apond"], meltsliq=agg["meltsliq"],
        snowfrac=agg["snowfrac"], albsno=agg["albsno"],
        albpnd=agg["albpnd"], dvsdtd=(state.vsno - vsno_posttherm) / dt,
        dvsdtt=dvsdtt, dagedtt=dagedtt,
        dagedtd=(_mean_age(state) - age_posttherm) / dt,
        dpnd_initial=agg["dpnd_initial"], dpnd_expon=agg["dpnd_expon"],
        dpnd_freebd=agg["dpnd_freebd"], dpnd_dlid=agg["dpnd_dlid"],
        ncat_fluxes={**agg["ncat_fluxes"], **fsd_tend,
                     **{k: dyn[k] for k in
                        ("dardg1ndt", "dardg2ndt", "dvirdgndt", "aparticn",
                         "krdgn", "aredistn", "vredistn",
                         # native E/N-point stress planes (C/CD history
                         # fields strintxE/taubxN/strocnxE..., reference
                         # ice_history grid-variant registrations)
                         "strintxE", "strintyN", "strintyE", "strintxN",
                         "taubxE", "taubyN", "taubyE", "taubxN",
                         "strocnxE", "strocnyE", "strocnxN", "strocnyN",
                         # momentum-balance splits at E/N (air/Coriolis/
                         # tilt; _en_stress_splits)
                         "strairxE", "strairyE", "strairxN", "strairyN",
                         "strcorxE", "strcoryE", "strcorxN", "strcoryN",
                         "strtltxE", "strtltyE", "strtltxN", "strtltyN",
                         # rafting split + pond-water ridging loss
                         "araftn", "vraftn", "dpnd_ridge",
                         # EAP yield-surface stress diagnostic
                         "yieldstress11", "yieldstress12", "yieldstress22")
                        if k in dyn},
                     "dpnd_melt": t2.dpnd_melt,
                     "aice_init": aice_init},
        divu=dyn["divu"], shear=dyn["shear"], Delta=dyn["Delta"],
        strintx=dyn["strintx"], strinty=dyn["strinty"],
        taubx=dyn["taubx"], tauby=dyn["tauby"], strength=dyn["strength"],
        dardg1dt=dyn.get("dardg1dt", zf), dardg2dt=dyn.get("dardg2dt", zf),
        dvirdgdt=dyn.get("dvirdgdt", zf), opening=dyn.get("opening", zf),
        transport_checks=tchecks,
        daidtt=daidtt, dvidtt=dvidtt,
        daidtd=(state.aice - aice_posttherm) / dt,
        dvidtd=(state.vice - vice_posttherm) / dt,
        Tref=agg["Tref"], Qref=agg["Qref"], Uref=agg["Uref"])

    return state, flux
