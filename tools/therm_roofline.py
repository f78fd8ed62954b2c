#!/usr/bin/env python
"""Thermodynamics roofline + sub-phase decomposition (VERDICT r4 Next #1).

Times each component of the therm1/therm2 phases on the gx1pop grid with
in-jit `lax.fori_loop` state-chained loops (the only trustworthy device
timing on the axon tunnel — every input is perturbed by the carry so XLA
cannot hoist), and builds an HBM-traffic speed-of-light model per phase by
counting the live f32 planes each sub-phase must stream.

Run (TPU by default):  python tools/therm_roofline.py
Reference match: ice_step_mod.F90:224-266 column hot loop #1 + the
ice_timers.F90 Thermo/Shortwave timer decomposition.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import gx1pop_grid, device_bw_gbps
    from cice_tpu.model.driver import Model
    from cice_tpu.model.forcing import get_forcing
    from cice_tpu.model.step import step_therm1
    from cice_tpu.columns.thermo_itd import step_therm2
    from cice_tpu.columns.thermo_vertical import (
        temperature_changes, thickness_changes, adjust_enthalpy,
        bl99_salinity, melting_temps)
    from cice_tpu.columns.shortwave import shortwave_ccsm3
    from cice_tpu.columns.atmo import atmo_boundary_layer
    from cice_tpu.columns.itd import linear_itd_remap, rebin, cleanup_itd
    from cice_tpu.columns.ponds import step_ponds
    from cice_tpu import constants as cst

    cfg, grid = gx1pop_grid()
    cfg = cfg.with_overrides(**{"forcing.atm_data_type": "box2001",
                                "forcing.ocn_data_type": "box2001"})
    m = Model(cfg, grid=grid)
    fc = get_forcing(cfg, m.grid, 0.0, 1.0, m.state.aice, m.forcing)
    dt = cfg.setup.dt
    ncat, nilyr, nslyr = (cfg.domain.ncat, cfg.domain.nilyr,
                          cfg.domain.nslyr)
    s0 = m.state
    N = 20

    def timeit_loop(body, init):
        f = jax.jit(lambda c0: lax.fori_loop(0, N, lambda i, c: body(c),
                                             c0))
        out = f(init)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(init))
            times.append((time.perf_counter() - t0) / N * 1e3)
        times.sort()
        return {"best": round(times[0], 3), "median": round(times[1], 3)}

    an, vin, vsn = s0.aicen, s0.vicen, s0.vsnon
    mask = an > cst.puny
    am = jnp.maximum(an, cst.puny)
    hin = jnp.where(mask, vin / am, 0.0)
    hsn = jnp.where(mask, vsn / am, 0.0)
    Tsf0 = s0.trcrn["Tsfcn"]
    qice0 = s0.trcrn["qice"]
    qsno0 = s0.trcrn["qsno"]
    salin = bl99_salinity(nilyr)
    Tmlt = melting_temps(salin)
    salin_f = [float(x) for x in salin]
    Tm_f = [float(x) for x in Tmlt]

    res = {}

    # --- therm1 sub-phases ------------------------------------------------
    def sw_body(Tsf):
        sw = shortwave_ccsm3(Tsf, hin, hsn, fc.swvdr, fc.swvdf, fc.swidr,
                             fc.swidf, cfg.shortwave, nilyr)
        return Tsf + 1e-14 * (sw.fswsfc + sw.fswthru + sw.alvdr)
    res["shortwave"] = timeit_loop(sw_body, Tsf0)

    def bl_body(Tsf):
        co = atmo_boundary_layer(Tsf, fc.potT, fc.uatm, fc.vatm, fc.wind,
                                 fc.zlvl, fc.Qa, fc.rhoa,
                                 natmiter=cfg.forcing.natmiter)
        return Tsf + 1e-14 * (co.shcoef + co.lhcoef)
    res["atmo_bl"] = timeit_loop(bl_body, Tsf0)

    sw = shortwave_ccsm3(Tsf0, hin, hsn, fc.swvdr, fc.swvdf, fc.swidr,
                         fc.swidf, cfg.shortwave, nilyr)
    co = atmo_boundary_layer(Tsf0, fc.potT, fc.uatm, fc.vatm, fc.wind,
                             fc.zlvl, fc.Qa, fc.rhoa)
    hin_s = jnp.maximum(hin, cfg.thermo.hi_min)
    Isw = [sw.Iswabs[:, k] for k in range(nilyr)]

    def temp_body(carry):
        Tsf, qi, qs = carry
        ts, qs_new, qi_new = temperature_changes(
            dt, nilyr, nslyr, Tsf=Tsf,
            qsno=[qs[:, k] for k in range(nslyr)],
            qice=[qi[:, k] for k in range(nilyr)],
            salin=salin_f, Tm=Tm_f, hilyr=hin_s / nilyr,
            hslyr=hsn / nslyr, Tbot=fc.Tf, fswsfc=sw.fswsfc, Iswabs=Isw,
            shcoef=co.shcoef, lhcoef=co.lhcoef, potT=fc.potT, Qa=fc.Qa,
            rhoa=fc.rhoa, flw=fc.flw, conduct=cfg.thermo.conduct,
            nit=cfg.thermo.nit, ktherm=cfg.thermo.ktherm)
        # recirculate: blend outputs back into the carry at tiny weight
        return (0.999 * Tsf + 0.001 * ts.Tsf,
                0.999 * qi + 0.001 * jnp.stack(qi_new, axis=1),
                0.999 * qs + 0.001 * jnp.stack(qs_new, axis=1))
    res["temp_solve"] = timeit_loop(temp_body, (Tsf0, qice0, qsno0))

    ts, qs_new, qi_new = temperature_changes(
        dt, nilyr, nslyr, Tsf=Tsf0,
        qsno=[qsno0[:, k] for k in range(nslyr)],
        qice=[qice0[:, k] for k in range(nilyr)],
        salin=salin_f, Tm=Tm_f, hilyr=hin_s / nilyr, hslyr=hsn / nslyr,
        Tbot=fc.Tf, fswsfc=sw.fswsfc, Iswabs=Isw, shcoef=co.shcoef,
        lhcoef=co.lhcoef, potT=fc.potT, Qa=fc.Qa, rhoa=fc.rhoa, flw=fc.flw,
        conduct=cfg.thermo.conduct, nit=cfg.thermo.nit,
        ktherm=cfg.thermo.ktherm)

    def thick_body(carry):
        hi, hs = carry
        th, dzi, dzs = thickness_changes(
            dt, nilyr, nslyr, hin=hi, hsn=hs, qice=qi_new, qsno=qs_new,
            Tm=Tm_f, salin=salin_f, Tbot=fc.Tf,
            fbot=jnp.minimum(-2.0 + 0.0 * fc.Tf, 0.0),
            fsurf=ts.fsurf, fcondtop=ts.fcondtop, fcondbot=ts.fcondbot,
            flat=ts.flat, sss=fc.sss)
        qice_r = adjust_enthalpy(dzi, th.qice, nilyr, th.hin)
        return (0.999 * hi + 0.001 * th.hin,
                0.999 * hs + 0.001 * (th.hsn + 1e-14 * qice_r[0]))
    res["thickness+remap"] = timeit_loop(thick_body, (hin_s, hsn))

    if "apnd" in s0.trcrn:
        def pond_body(carry):
            trc = dict(s0.trcrn)
            trc["apnd"], trc["hpnd"] = carry
            trc2, apeff, flush, _diag = step_ponds(
                cfg, dt, aicen=an, vicen=vin, vsnon=vsn, trcrn=trc,
                Tsf=Tsf0, meltt=jnp.abs(Tsf0) * 1e-4,
                melts=jnp.abs(Tsf0) * 1e-4, frain=fc.frain, aice=s0.aice,
                return_diag=True)
            return (trc2["apnd"], trc2["hpnd"] + 1e-14 * apeff)
        res["ponds"] = timeit_loop(pond_body,
                                   (s0.trcrn["apnd"], s0.trcrn["hpnd"]))

    def therm1_body(s):
        return step_therm1(m.static, m.grid, s, fc, dt)[0]
    res["therm1_total"] = timeit_loop(therm1_body, s0)

    # --- therm2 sub-phases ------------------------------------------------
    hin_max = np.asarray(m.static.hin_max)
    reg = m.static.registry

    def remap_body(s):
        aicen, vicen, vsnon, trcrn = linear_itd_remap(
            s.aicen, s.vicen, s.vsnon, s.trcrn, hin_max,
            jnp.ones_like(s.aicen), jnp.where(s.aicen > cst.puny,
                                              s.vicen / jnp.maximum(
                                                  s.aicen, cst.puny), 0.0),
            reg)
        return s.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                         trcrn=trcrn)
    res["itd_remap"] = timeit_loop(remap_body, s0)

    def rebin_body(s):
        aicen, vicen, vsnon, trcrn = rebin(s.aicen, s.vicen, s.vsnon,
                                           s.trcrn, hin_max, reg)
        return s.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                         trcrn=trcrn)
    res["rebin"] = timeit_loop(rebin_body, s0)

    def cleanup_body(s):
        aicen, vicen, vsnon, trcrn, _f = cleanup_itd(
            s.aicen, s.vicen, s.vsnon, s.trcrn, reg, dt=dt)
        return s.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                         trcrn=trcrn)
    res["cleanup"] = timeit_loop(cleanup_body, s0)

    def therm2_body(s):
        r = step_therm2(cfg, m.grid, s.aicen, s.vicen, s.vsnon, s.trcrn,
                        hicen_old=jnp.ones_like(s.aicen), frzmlt=s.frzmlt,
                        Tf=fc.Tf, sst=s.sst, dt=dt, hin_max=hin_max,
                        registry=reg)
        return s.replace(aicen=r.aicen, vicen=r.vicen, vsnon=r.vsnon,
                         trcrn=r.trcrn)
    res["therm2_total"] = timeit_loop(therm2_body, s0)

    # --- roofline models --------------------------------------------------
    bw, kind = device_bw_gbps()
    ny, nx = grid.shape
    plane = ny * nx * 4.0
    ntr_planes = sum(int(np.prod(v.shape[:-2])) for v in s0.trcrn.values())
    # therm1 ideal: stream state+forcing once, write state+fluxes once.
    # reads: aicen/vicen/vsnon 3c + tracers + ~14 forcing planes;
    # writes: state planes + ~30 2-D flux planes.
    t1_planes = (3 * ncat + ntr_planes + 14) + (3 * ncat + ntr_planes + 30)
    # therm2 ideal: the ITD chain streams (aicen,vicen,vsnon + tracers)
    # 3x (remap, rebin, cleanup) read+write
    t2_planes = 2 * 3 * (3 * ncat + ntr_planes)
    t1_sol_ms = t1_planes * plane / (bw * 1e9) * 1e3
    t2_sol_ms = t2_planes * plane / (bw * 1e9) * 1e3
    out = {
        "device": kind, "grid": [ny, nx], "ncat": ncat,
        "tracer_planes": ntr_planes,
        "phase_ms": res,
        "therm1_planes": t1_planes, "therm1_sol_ms": round(t1_sol_ms, 3),
        "therm1_sol_fraction": round(
            t1_sol_ms / res["therm1_total"]["best"], 3),
        "therm2_planes": t2_planes, "therm2_sol_ms": round(t2_sol_ms, 3),
        "therm2_sol_fraction": round(
            t2_sol_ms / res["therm2_total"]["best"], 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
