"""Command-line interface: case creation, runs, tests, suites.

Python analogue of the reference's csh tooling (cice.setup:70-120 —
--case/--test/--suite flows; configuration/scripts/options/set_nml.*
composition; tests/*.ts suite tables, SURVEY §2.8/§4). A "case" is a
directory holding a JSON config overlay + pointers for restart/history;
tests are the smoke/restart/decomp types with PASS/FAIL verdicts.

Usage:
  python -m cice_tpu.cli run   [--set k=v ...] [--steps N]
  python -m cice_tpu.cli case  --dir DIR [--set k=v ...]
  python -m cice_tpu.cli test  --type smoke|restart [--set k=v ...]
  python -m cice_tpu.cli suite --name quick
  python -m cice_tpu.cli bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


# option fragments (set_nml.* analogues)
OPTION_SETS = {
    "box2001": {"grid.nx_global": 80, "grid.ny_global": 80,
                "grid.grid_format": "rect", "grid.kmt_type": "none",
                "forcing.atm_data_type": "box2001",
                "forcing.ocn_data_type": "box2001"},
    "gridc": {"grid.grid_ice": "C"},
    "dynpicard": {"dynamics.kdyn": 3},
    "eap": {"dynamics.kdyn": 2},
    "upwind": {"dynamics.advection": "upwind"},
    "nodyn": {"dynamics.kdyn": 0},
    "ndte120": {"dynamics.ndte": 120},
    "debugthermo": {"thermo.nit": 30},
    "seasonal": {"forcing.atm_data_type": "seasonal"},
    # physics option fragments added with the full column-physics set
    "gridcd": {"grid.grid_ice": "CD"},
    "dynanderson": {"dynamics.kdyn": 3, "dynamics.algo_nonlin": "anderson"},
    "mushy": {"thermo.ktherm": 2, "thermo.tfrz_option": "mushy"},
    "bl99": {"thermo.ktherm": 1},
    "dedd": {"shortwave.shortwave": "dEdd"},
    "ccsm3sw": {"shortwave.shortwave": "ccsm3"},
    "snwgrain": {"tracers.tr_snow": True, "snow.snwgrain": True,
                 "snow.snwredist": "bulk"},
    "fsd12": {"tracers.tr_fsd": True, "domain.nfsd": 12,
              "forcing.wave_spec_type": "profile"},
    "pondtopo": {"tracers.tr_pond_lvl": False, "tracers.tr_pond_topo": True},
    "pondsealvl": {"tracers.tr_pond_lvl": False,
                   "tracers.tr_pond_topo": False,
                   "tracers.tr_pond_sealvl": True,
                   "ponds.apnd_sl": 0.27, "ponds.rfracmin": 1.0,
                   "ponds.rfracmax": 1.0, "ponds.tscale_pnd_drain": 0.5},
    "saltflux": {"thermo.ktherm": 2, "thermo.saltflux_option": "prognostic"},
    "modal": {"shortwave.shortwave": "dEdd", "tracers.tr_aero": True,
              "domain.n_aero": 3, "shortwave.modal_aero": True},
    "congel": {"thermo.congel_freeze": "one-step"},
    "pondlvl": {"tracers.tr_pond_lvl": True, "tracers.tr_pond_topo": False},
    "bgcskl": {"zbgc.skl_bgc": True},
    # vertically-resolved z-tracer BGC on the brine column (set_nml.bgcz)
    "bgcz": {"zbgc.z_tracers": True, "zbgc.solve_zbgc": True,
             "tracers.tr_brine": True, "domain.nblyr": 7,
             "zbgc.tr_bgc_Am": True, "zbgc.tr_bgc_Sil": True,
             "zbgc.tr_bgc_DMS": True, "zbgc.tr_bgc_PON": True,
             "zbgc.tr_bgc_DON": True, "zbgc.tr_bgc_Fe": True,
             "zbgc.tr_bgc_C": True, "zbgc.n_doc": 2, "zbgc.n_dic": 1,
             "zbgc.n_algae": 3},
    "zaero": {"zbgc.z_tracers": True, "tracers.tr_brine": True,
              "domain.nblyr": 7, "zbgc.tr_zaero": True, "zbgc.n_zaero": 3},
    "isotope": {"tracers.tr_iso": True, "domain.n_iso": 3},
    "aerosol": {"tracers.tr_aero": True, "domain.n_aero": 3},
    "alt01": {"tracers.tr_iage": False, "tracers.tr_FY": False},
    "revp": {"dynamics.revised_evp": True},
    "evp1d": {"dynamics.evp_algorithm": "fused_pallas"},
    "evpwide": {"dynamics.evp_algorithm": "wide_halo"},
    "jra55": {"forcing.atm_data_type": "jra55"},
    "ncar": {"forcing.atm_data_type": "ncar"},
    "vanleer": {"dynamics.advection": "vanleer"},
    "seabedLKD": {"dynamics.seabed_stress": True,
                  "dynamics.seabed_stress_method": "LKD"},
    # grid-size presets (gx3/gx1 dimensions on the synthetic grid; real POP
    # grid files plug in via grid.grid_format='pop_nc' + paths)
    "gx3": {"grid.nx_global": 100, "grid.ny_global": 116},
    "gx1": {"grid.nx_global": 320, "grid.ny_global": 384},
    # --- BASELINE config matrix: format-true POP fixture grids + file
    # forcing (io.fixtures; "{FIX}" resolves to the fixture cache root).
    # These are the five BASELINE.json configs as runnable option sets.
    "gx3pop": {"grid.nx_global": 100, "grid.ny_global": 116,
               "grid.grid_format": "pop_bin",
               "grid.grid_type": "displaced_pole",
               "grid.grid_file": "{FIX}/grids/gx3_grid.bin",
               "grid.kmt_file": "{FIX}/grids/gx3_kmt.bin",
               "grid.ew_boundary_type": "cyclic",
               "forcing.atm_data_type": "ncar",
               "forcing.atm_data_dir": "{FIX}/forcing/gx3",
               "forcing.ocn_data_type": "clim",
               "forcing.ocn_data_dir": "{FIX}/forcing/gx3",
               "dynamics.seabed_stress": True,
               "setup.npt_unit": "d", "setup.npt": 5,
               "setup.dumpfreq": "d", "setup.diagfreq": 6,
               "setup.histfreq": ("d", "x", "x", "x", "x")},
    "gx1pop": {"grid.nx_global": 320, "grid.ny_global": 384,
               "grid.grid_format": "pop_bin",
               "grid.grid_type": "displaced_pole",
               "grid.grid_file": "{FIX}/grids/gx1_grid.bin",
               "grid.kmt_file": "{FIX}/grids/gx1_kmt.bin",
               "grid.ew_boundary_type": "cyclic",
               # JRA55 3-hourly file forcing; the fixture materializes
               # records 0..55, so start on day 2 (no pre-record-0 reads)
               "forcing.atm_data_type": "jra55",
               "forcing.atm_data_dir": "{FIX}/forcing/gx1",
               "forcing.ocn_data_type": "clim",
               "forcing.ocn_data_dir": "{FIX}/forcing/gx1",
               "setup.day_init": 2,
               "dynamics.seabed_stress": True,
               "setup.npt_unit": "d", "setup.npt": 5,
               "setup.dumpfreq": "d", "setup.diagfreq": 12,
               "setup.histfreq": ("d", "x", "x", "x", "x")},
    "tx1pop": {"grid.nx_global": 360, "grid.ny_global": 240,
               "grid.grid_format": "pop_bin", "grid.grid_type": "tripole",
               "grid.grid_file": "{FIX}/grids/tx1_grid.bin",
               "grid.kmt_file": "{FIX}/grids/tx1_kmt.bin",
               "grid.ew_boundary_type": "cyclic",
               "grid.ns_boundary_type": "tripole",
               "forcing.atm_data_type": "ncar",
               "forcing.atm_data_dir": "{FIX}/forcing/tx1",
               "forcing.ocn_data_type": "clim",
               "forcing.ocn_data_dir": "{FIX}/forcing/tx1",
               "dynamics.seabed_stress": True,
               "setup.npt_unit": "d", "setup.npt": 5,
               "setup.dumpfreq": "d", "setup.diagfreq": 6,
               "setup.histfreq": ("d", "x", "x", "x", "x")},
    "iopio": {"setup.restart_format": "pio"},
    "diag1": {"setup.diagfreq": 1},
    "histinst": {"setup.hist_avg": False},
    "histdaily": {"setup.histfreq": ("d", "x", "x", "x", "x")},
    "dumpd": {"setup.dumpfreq": "d"},
    "run10day": {"setup.npt_unit": "d", "setup.npt": 10},
    "day1": {"setup.npt_unit": "d", "setup.npt": 1},
    "hours3": {"setup.npt_unit": "1", "setup.npt": 3},
    "run1year": {"setup.npt_unit": "y", "setup.npt": 1},
    "prescribed": {"setup.prescribed_ice": True, "dynamics.kdyn": 0},
    "ktherm1": {"thermo.ktherm": 1},
    "fdrag": {"forcing.formdrag": True},
    "leap": {"setup.calendar_type": "gregorian"},
    "cal360": {"setup.calendar_type": "360day", "setup.days_per_year": 360},
    # --- alternate-physics composites (reference set_nml.alt02..alt07) ----
    "alt02": {"domain.ncat": 1, "grid.kcatbound": -1, "thermo.kitd": 0,
              "domain.distribution_type": "sectrobin",
              "tracers.tr_iage": True, "tracers.tr_FY": True,
              "tracers.tr_lvl": True, "tracers.tr_pond_lvl": False,
              "tracers.tr_pond_topo": False,
              "dynamics.kdyn": 1, "dynamics.revised_evp": True,
              "dynamics.kstrength": 0, "dynamics.krdg_partic": 0,
              "dynamics.krdg_redist": 0,
              "shortwave.shortwave": "ccsm3",
              "shortwave.albedo_type": "ccsm3",
              "forcing.calc_Tsfc": True},
    "alt03": {"domain.ncat": 6, "grid.kcatbound": 2,
              "domain.distribution_type": "sectcart",
              "setup.conserv_check": True,
              "tracers.tr_iage": False, "tracers.tr_FY": False,
              "tracers.tr_lvl": False, "tracers.tr_pond_topo": True,
              "tracers.tr_pond_lvl": False, "tracers.tr_aero": True,
              "domain.n_aero": 3, "forcing.calc_Tsfc": False,
              "dynamics.kdyn": 2, "thermo.ktherm": 1,
              "thermo.sw_redist": True, "thermo.sw_frac": 0.9,
              "thermo.sw_dtemp": 0.02, "thermo.tfrz_option": "linear_salt",
              "dynamics.revised_evp": False, "dynamics.Ktens": 0.0,
              "dynamics.e_yieldcurve": 2.0, "dynamics.seabed_stress": True,
              "forcing.l_mpond_fresh": True},
    "alt04": {"domain.distribution_type": "rake",
              "domain.processor_shape": "slenderX2",
              "domain.distribution_wght": "block",
              "tracers.tr_iage": True, "tracers.tr_FY": True,
              "tracers.tr_lvl": True, "tracers.tr_pond_lvl": True,
              "tracers.tr_aero": True, "domain.n_aero": 3,
              "thermo.kitd": 0, "thermo.hi_min": 0.1, "thermo.ktherm": 1,
              "thermo.sw_redist": True, "thermo.sw_frac": 0.9,
              "thermo.sw_dtemp": 0.02, "thermo.conduct": "MU71",
              "dynamics.kdyn": 1, "dynamics.evp_algorithm": "fused_pallas",
              "forcing.fbot_xfer_type": "Cdn_ocn",
              "shortwave.shortwave": "dEdd", "forcing.formdrag": True,
              "dynamics.advection": "upwind", "dynamics.kstrength": 0,
              "dynamics.krdg_partic": 0, "dynamics.krdg_redist": 0,
              "ponds.frzpnd": "ccsm", "forcing.natmiter": 20,
              "thermo.tfrz_option": "linear_salt"},
    "alt05": {"tracers.tr_iage": False, "tracers.tr_FY": False,
              "tracers.tr_lvl": False, "tracers.tr_pond_lvl": False,
              "tracers.tr_pond_topo": False,
              "shortwave.shortwave": "dEdd"},
    "alt06": {"domain.ncat": 7, "grid.kcatbound": 3, "domain.nslyr": 3,
              "thermo.tfrz_option": "mushy"},
    "alt07": {"dynamics.kdyn": 1, "dynamics.evp_algorithm": "standard_2d",
              "dynamics.ndte": 300, "dynamics.capping_method": "sum",
              "dynamics.visc_method": "avg_strength"},
    # --- box / idealized-grid configurations -------------------------------
    "boxadv": {"domain.nilyr": 1, "grid.kcatbound": 2,
               "grid.ew_boundary_type": "cyclic",
               "grid.ns_boundary_type": "cyclic",
               "forcing.atm_data_type": "box2001",
               "forcing.ocn_data_type": "box2001",
               "tracers.tr_iage": True, "tracers.tr_FY": False,
               "tracers.tr_lvl": True, "thermo.kitd": 1, "thermo.ktherm": 1,
               "dynamics.kdyn": 2, "dynamics.kstrength": 0,
               "dynamics.krdg_partic": 0, "dynamics.krdg_redist": 0,
               "shortwave.shortwave": "ccsm3",
               "shortwave.albedo_type": "constant",
               "thermo.tfrz_option": "mushy"},
    "boxnodyn": {"dynamics.kdyn": 0, "forcing.atm_data_type": "box2001",
                 "forcing.ocn_data_type": "box2001",
                 "grid.grid_format": "rect", "grid.kmt_type": "none"},
    "boxslotcyl": {"domain.nilyr": 1, "setup.dt": 3600.0, "setup.npt": 288,
                   "grid.grid_format": "rect", "grid.kmt_type": "none",
                   "grid.dxrect": 10.e5, "grid.dyrect": 10.e5,
                   "grid.kcatbound": 2,
                   "grid.ew_boundary_type": "closed",
                   "grid.ns_boundary_type": "closed",
                   "tracers.tr_lvl": False, "tracers.tr_pond_lvl": False,
                   "thermo.ktherm": -1, "dynamics.kdyn": -1,
                   "dynamics.kridge": -1, "dynamics.ktransport": 1,
                   "forcing.atm_data_type": "calm",
                   "forcing.ocn_data_type": "box2001"},
    "gbox12": {"grid.nx_global": 12, "grid.ny_global": 12,
               "grid.grid_format": "rect", "grid.kmt_type": "none",
               "forcing.atm_data_type": "box2001",
               "forcing.ocn_data_type": "box2001"},
    "gbox80": {"grid.nx_global": 80, "grid.ny_global": 80,
               "grid.grid_format": "rect", "grid.kmt_type": "none",
               "grid.dxrect": 5.e5, "grid.dyrect": 5.e5,
               "forcing.atm_data_type": "box2001",
               "forcing.ocn_data_type": "box2001"},
    "gbox128": {"grid.nx_global": 128, "grid.ny_global": 128,
                "grid.grid_format": "rect", "grid.kmt_type": "none",
                "forcing.atm_data_type": "box2001",
                "forcing.ocn_data_type": "box2001"},
    "gbox180": {"grid.nx_global": 180, "grid.ny_global": 180,
                "grid.grid_format": "rect", "grid.kmt_type": "none",
                "forcing.atm_data_type": "box2001",
                "forcing.ocn_data_type": "box2001"},
    "kmtislands": {"grid.kmt_type": "boxislands"},
    "boxclosed": {"grid.ew_boundary_type": "closed",
                  "grid.ns_boundary_type": "closed"},
    "boxopen": {"grid.ew_boundary_type": "open",
                "grid.ns_boundary_type": "open"},
    "bccyclic": {"grid.ew_boundary_type": "cyclic",
                 "grid.ns_boundary_type": "cyclic"},
    "bcclosed": {"grid.ew_boundary_type": "closed",
                 "grid.ns_boundary_type": "closed"},
    "bcopen": {"grid.ew_boundary_type": "open",
               "grid.ns_boundary_type": "open"},
    # --- grids -------------------------------------------------------------
    "tx1": {"grid.nx_global": 360, "grid.ny_global": 240,
            "grid.grid_type": "tripole", "grid.grid_format": "tripole_synth"},
    "vargrid": {"grid.scale_dxdy": True, "grid.dxscale": 1.02,
                "grid.dyscale": 1.02},
    "gx3ncarbulk": {"forcing.atm_data_type": "ncar"},
    "gx1apr": {"setup.year_init": 2005, "setup.month_init": 4,
               "setup.day_init": 1, "setup.sec_init": 0},
    "gx1prod": {"setup.year_init": 2005, "setup.npt_unit": "y",
                "setup.npt": 1, "setup.dumpfreq": "m",
                "forcing.fyear_init": 2005},
    # --- timestep / run-length ---------------------------------------------
    "dt1hr": {"setup.dt": 3600.0},
    "dt30min": {"setup.dt": 1800.0},
    "dt3456s": {"setup.dt": 3456.0},
    "run1day": {"setup.npt_unit": "d", "setup.npt": 1},
    "run2day": {"setup.npt_unit": "d", "setup.npt": 2},
    "run3day": {"setup.npt_unit": "d", "setup.npt": 3},
    "run5day": {"setup.npt_unit": "d", "setup.npt": 5},
    "run60day": {"setup.npt_unit": "d", "setup.npt": 60},
    "run90day": {"setup.npt_unit": "d", "setup.npt": 90},
    "run8year": {"setup.npt_unit": "y", "setup.npt": 8},
    "run10year": {"setup.npt_unit": "y", "setup.npt": 10},
    # --- decomposition-analysis fragments (domain_nml; PARITY 2.2 Δ) -------
    "droundrobin": {"domain.distribution_type": "roundrobin"},
    "dsectcart": {"domain.distribution_type": "sectcart"},
    "dsectrobin": {"domain.distribution_type": "sectrobin"},
    "dspiralcenter": {"domain.distribution_type": "spiralcenter"},
    "dspacecurve": {"domain.distribution_type": "spacecurve"},
    "drake": {"domain.distribution_type": "rake"},
    "dwblock": {"domain.distribution_wght": "block"},
    "dwlat": {"domain.distribution_wght": "latitude"},
    "dslenderX1": {"domain.processor_shape": "slenderX1"},
    "dslenderX2": {"domain.processor_shape": "slenderX2"},
    "dsquareice": {"domain.processor_shape": "square-ice"},
    "dsquarepop": {"domain.processor_shape": "square-pop"},
    # --- diagnostics / history ---------------------------------------------
    "diag24": {"setup.diagfreq": 24},
    "diagpt1": {"setup.print_points": True},
    "bigdiag": {"setup.print_points": True, "setup.conserv_check": True,
                "setup.debug_model": True},
    "histhrly": {"setup.histfreq": ("h", "x", "x", "x", "x")},
    "histmon": {"setup.histfreq": ("m", "x", "x", "x", "x")},
    "timerstats": {},     # timers always collect min/max/mean (utils/timers)
    # --- initial condition / forcing ---------------------------------------
    "icdefault": {"setup.ice_ic": "default"},
    "icnone": {"setup.ice_ic": "none"},
    "jra55do": {"forcing.atm_data_type": "jra55"},
    "atmbndyconstant": {"forcing.atmbndy": "constant"},
    "atmbndymixed": {"forcing.atmbndy": "mixed"},
    "restore5": {"forcing.restore_ice": True, "forcing.trestore": 3},
    "bdyrestore": {"forcing.restore_ice": True, "forcing.restore_ocn": True},
    "yi2008": {"setup.year_init": 2008, "forcing.fyear_init": 2008},
    # --- dynamics / solver variants ----------------------------------------
    "nonlin5000": {"dynamics.kdyn": 3, "dynamics.maxits_nonlin": 5000},
    "seabedprob": {"dynamics.seabed_stress": True,
                   "dynamics.seabed_stress_method": "probabilistic"},
    # --- column-physics variants -------------------------------------------
    "fsd1": {"tracers.tr_fsd": True, "domain.nfsd": 1},
    "fsd12ww3": {"tracers.tr_fsd": True, "domain.nfsd": 12,
                 "forcing.wave_spec_type": "constant"},
    "snw30percent": {"tracers.tr_snow": True, "snow.snwredist": "bulk",
                     "snow.snwlvlfac": 0.3, "domain.nslyr": 5},
    "snwitdrdg": {"tracers.tr_snow": True, "snow.snwredist": "ITDrdg",
                  "domain.nslyr": 5, "snow.rhosnew": 100.0,
                  "snow.rhosmin": 100.0, "snow.rhosmax": 450.0,
                  "snow.windmin": 10.0, "snow.drhosdwind": 27.3,
                  "snow.snwlvlfac": 0.3},
    "bgcsklclim": {"zbgc.skl_bgc": True, "zbgc.nit_data": "clim",
                   "zbgc.sil_data": "clim"},
    "bgczclim": {"zbgc.z_tracers": True, "zbgc.solve_zbgc": True,
                 "tracers.tr_brine": True, "domain.nblyr": 7,
                 "zbgc.nit_data": "clim", "zbgc.sil_data": "clim"},
    # --- IO / precision -----------------------------------------------------
    "iocdf1": {"setup.restart_format": "cdf1"},
    "ionetcdf": {"setup.restart_format": "cdf1"},
    "iopio2": {"setup.restart_format": "pio"},
    "iohdf5": {"setup.restart_format": "hdf5",
               "setup.history_format": "hdf5"},
    "histhdf5": {"setup.history_format": "hdf5"},
    "resthdf5": {"setup.restart_format": "hdf5"},
    "histchunk": {"setup.history_chunksize": (64, 64)},
    "ioasync": {"setup.io_async": True},
    "precision8": {"dtype": "float64"},
    "cmip": {"setup.hist_cmip": True},
    # --- QC (5-year daily-output statistical acceptance run, set_nml.qc) ---
    "qc": {"setup.npt_unit": "y", "setup.npt": 5, "setup.year_init": 2005,
           "setup.diagfreq": 24, "setup.dumpfreq": "m",
           "setup.histfreq": ("d", "x", "x", "x", "x"),
           "setup.hist_avg": False, "forcing.fyear_init": 2005,
           "forcing.ycycle": 1},
}


def _parse_sets(pairs):
    out = {}
    for kv in pairs or []:
        k, _, v = kv.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def _resolve_fixtures(overrides: dict) -> dict:
    """Substitute the '{FIX}' placeholder with the fixture cache root,
    materializing the BASELINE fixture files on first use (io.fixtures)."""
    if not any(isinstance(v, str) and "{FIX}" in v
               for v in overrides.values()):
        return overrides
    from ..io.fixtures import ensure_baseline_fixtures, fixtures_root
    ensure_baseline_fixtures()
    root = fixtures_root()
    return {k: (v.replace("{FIX}", root)
                if isinstance(v, str) and "{FIX}" in v else v)
            for k, v in overrides.items()}


def build_config(args):
    from ..config import Config
    cfg = Config()
    for opt in (args.opts or "").split(","):
        if opt:
            if opt not in OPTION_SETS:
                sys.exit(f"unknown option set '{opt}' "
                         f"(available: {', '.join(OPTION_SETS)})")
            cfg = cfg.with_overrides(**_resolve_fixtures(OPTION_SETS[opt]))
    cfg = cfg.with_overrides(**_resolve_fixtures(_parse_sets(args.set)))
    return cfg


def cmd_run(args):
    from ..model.driver import Model
    cfg = build_config(args)
    m = Model(cfg, enable_history=args.history)
    n = args.steps if args.steps else None
    t0 = time.time()
    if getattr(args, "profile", None):
        # SURVEY §5.1 TPU plan: jax profiler trace of the time loop alongside
        # the phase-timer dict. View with tensorboard/xprof or perfetto.
        import jax
        with jax.profiler.trace(args.profile):
            m.run(n)
    else:
        m.run(n)
    wall = time.time() - t0
    from ..model.diagnostics import runtime_diags
    d = {k: float(v) for k, v in runtime_diags(m.grid, m.state).items()}
    print(json.dumps({"istep": m.calendar.istep, "wall_s": round(wall, 2),
                      "timers": {k: round(v, 2) for k, v in m.timers.items()},
                      "diags": d}))
    return 0


def cmd_case(args):
    os.makedirs(args.dir, exist_ok=True)
    overlay = {}
    for opt in (args.opts or "").split(","):
        if opt:
            overlay.update(OPTION_SETS[opt])
    overlay.update(_parse_sets(args.set))
    with open(os.path.join(args.dir, "config.json"), "w") as f:
        json.dump(overlay, f, indent=2)
    runner = os.path.join(args.dir, "run.py")
    with open(runner, "w") as f:
        f.write(
            "#!/usr/bin/env python\n"
            "import json, os, sys\n"
            "sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))\n"
            "from cice_tpu.config import Config\n"
            "from cice_tpu.model.driver import Model\n"
            "cfg = Config().with_overrides(**json.load(open(os.path.join(os.path.dirname(__file__), 'config.json'))))\n"
            "m = Model(cfg, enable_history=True)\n"
            "m.run()\n"
            "print('done at', m.calendar.timestamp())\n")
    os.chmod(runner, 0o755)
    print(f"case created: {args.dir}")
    return 0


def _diag_series(cfg, nsteps=6):
    """Run nsteps and collect per-step global diagnostics — the numerical
    fingerprint the reference's comparelog.csh greps from the log
    (per-step 'total ice area' block, comparelog.csh:60-70)."""
    from ..model.diagnostics import runtime_diags
    from ..model.driver import Model
    m = Model(cfg)
    series = []
    for _ in range(nsteps):
        m.step()
        d = runtime_diags(m.grid, m.state)
        series.append({k: float(v) for k, v in d.items()})
    return m, series


def compare_series(a, b, rtol=0.0):
    """comparelog.csh analogue: per-step global sums must match (BFB by
    default). Returns list of (step, key, va, vb) mismatches."""
    errs = []
    if len(a) != len(b):
        errs.append((-1, "nsteps", float(len(a)), float(len(b))))
    for i, (ra, rb) in enumerate(zip(a, b)):
        for k, va in ra.items():
            vb = rb.get(k)
            if vb is None:
                errs.append((i, k, va, float("nan")))
            elif abs(va - vb) > rtol * max(abs(va), abs(vb)):
                errs.append((i, k, va, vb))
    return errs


def _test_smoke(cfg) -> bool:
    import numpy as np
    from ..model.driver import Model
    m = Model(cfg)
    m.run(min(24, 6))
    ok = bool(np.isfinite(np.asarray(m.state.vice)).all())
    ok &= float(m.state.aice.max()) <= 1.0 + 1e-6
    return ok


def _force_cpu_devices(n=8):
    """Re-init jax on an n-device virtual CPU backend (decomp testing on a
    box with one real chip; mirrors __graft_entry__.dryrun_multichip)."""
    import jax
    if len(jax.devices()) >= n and jax.devices()[0].platform == "cpu":
        return
    from jax.extend import backend as _b
    _b.clear_backends()
    jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_platforms", "cpu")


def _test_decomp(cfg) -> bool:
    """Decomposition-invariance test (test_decomp.script / decomp_suite.ts
    analogue): the same run on a 1-device vs 2x4 vs 4x2 mesh must agree to
    roundoff — the distributed-correctness oracle (SURVEY §4.3).

    Contract delta vs the reference: MPI decompositions are BFB because the
    per-point arithmetic is literally the same instructions; XLA recompiles
    per sharding (different fusion/fma choices), so bitwise equality across
    meshes is not an XLA guarantee. The oracle here is f64 state with a
    1e-4 scaled-difference bound after 2 coupled steps — real halo/stencil
    bugs produce O(1) tile-edge errors; roundoff reassociation produces
    ~1e-10 directly (measured) and up to ~1e-5 where a cell sits exactly on
    the iceUmask threshold (dyn_prep aiU>1e-11 cut), so the margin stays
    ~4 orders of magnitude."""
    import numpy as np
    import jax
    _force_cpu_devices(8)
    jax.config.update("jax_enable_x64", True)
    cfg = cfg.with_overrides(dtype="float64")
    from ..model.driver import Model
    from ..parallel.mesh import make_mesh, shard_state
    results = []
    for shape in [None, (2, 4), (4, 2)]:
        m = Model(cfg)
        if shape is not None:
            mesh = make_mesh(shape=shape)
            m.state = shard_state(mesh, m.state)
            m.forcing = shard_state(mesh, m.forcing)
        m.run(2)
        results.append(
            [(jax.tree_util.keystr(p), np.asarray(x))
             for p, x in jax.tree_util.tree_flatten_with_path(m.state)[0]])
    ok = True
    for r in results[1:]:
        for (name, a), (_, b) in zip(results[0], r):
            if a.dtype.kind == "f":
                scale = float(np.abs(a).max())
                if scale > 1e-6:     # skip essentially-zero fields
                    d = float(np.abs(a - b).max())
                    if d > 1e-4 * scale:
                        print(f"  decomp mismatch {name}: "
                              f"{d:.3e} vs scale {scale:.3e}")
                        ok = False
            elif not np.array_equal(a, b):
                print(f"  decomp mismatch {name} (int/bool)")
                ok = False
    return ok


def _test_restart(cfg) -> bool:
    import numpy as np
    import jax
    import tempfile
    from ..model.driver import Model
    from ..io.restart import read_restart
    with tempfile.TemporaryDirectory() as td:
        cfg = cfg.with_overrides(**{
            "setup.restart_dir": td,
            "setup.pointer_file": os.path.join(td, "ice.restart_file")})
        m1 = Model(cfg)
        m1.run(6)
        m2 = Model(cfg)
        m2.run(3)
        path = m2.write_restart()
        m2.flush_io()                 # durability barrier (io_async)
        m3 = Model(cfg)
        if cfg.setup.restart_format == "pio":
            from ..io.pio import read_restart_sharded
            m3.state, m3.calendar = read_restart_sharded(path, m3.state)
        else:
            m3.state, m3.calendar = read_restart(path, m3.state)
        m3.run(3)
        for a, b in zip(jax.tree.leaves(m1.state), jax.tree.leaves(m3.state)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return False
    return True


def _test_baseline(cfg, label="baseline") -> bool:
    """Full-length coupled run of a BASELINE config (grid files + file
    forcing + history + restart), with the per-step diagnostics series
    archived under {FIX}/baselines/ — the comparelog-style oracle for the
    five BASELINE.json configs (run via `suite --name baseline`)."""
    import numpy as np
    from ..io.fixtures import fixtures_root
    from ..model.diagnostics import runtime_diags
    from ..model.driver import Model
    m = Model(cfg, enable_history=True)
    m.run()
    d = {k: float(v) for k, v in runtime_diags(m.grid, m.state).items()}
    ok = bool(np.isfinite(np.asarray(m.state.vice)).all())
    ok &= float(m.state.aice.max()) <= 1.0 + 1e-6
    # a 5-day global run must carry ice in both hemispheres
    ok &= d.get("extent_nh", 0.0) > 0.0 and d.get("extent_sh", 0.0) > 0.0
    bdir = os.environ.get("CICE_TPU_BASELINE_DIR") or \
        os.path.join(fixtures_root(), "baselines")
    os.makedirs(bdir, exist_ok=True)
    with open(os.path.join(bdir, f"{label}.json"), "w") as f:
        json.dump({"final": d, "series": m.diag_log,
                   "timers": {k: round(float(v), 2)
                              for k, v in m.timers.items()}}, f)
    print(f"    {label}: steps={m.calendar.istep} "
          f"extent_nh={d.get('extent_nh', 0):.3e} "
          f"extent_sh={d.get('extent_sh', 0):.3e} "
          f"archived -> {bdir}/{label}.json")
    # cross-round regression anchor (cice.setup --bcmp semantics): compare
    # the diagnostics series against a COMMITTED baseline dir when given
    # (repo baselines/rNN); report-only unless strict — physics fixes
    # between rounds legitimately change the climate (then the new series
    # becomes the next committed baseline, like the reference's bgen)
    cmp_dir = os.environ.get("CICE_TPU_BCMP_DIR")
    if cmp_dir:
        ref_path = os.path.join(cmp_dir, f"{label}.json")
        if os.path.exists(ref_path):
            with open(ref_path) as f:
                base = json.load(f)["series"]
            rtol = float(os.environ.get("CICE_TPU_BCMP_RTOL", "1e-3"))
            errs = compare_series(base, m.diag_log, rtol=rtol)
            verdict = "PASS" if not errs else "DIFF"
            print(f"    bcmp[{label}] vs {ref_path}: {verdict} "
                  f"({len(errs)} deltas at rtol={rtol})")
            for i, k, va, vb in errs[:5]:
                print(f"      step {i} {k}: baseline {va!r} vs run {vb!r}")
            if os.environ.get("CICE_TPU_BCMP_STRICT"):
                ok &= not errs
        else:
            print(f"    bcmp[{label}]: no committed baseline at {ref_path}")
    return ok


def _default_test_cfg(args, cfg):
    if getattr(args, "type", None) == "baseline" or cfg.grid.grid_file:
        return cfg          # BASELINE configs run at their true size
    if not args.set or not any("nx_global" in s for s in args.set):
        cfg = cfg.with_overrides(**{
            "grid.nx_global": 32, "grid.ny_global": 32,
            "grid.grid_format": "rect", "grid.kmt_type": "none",
            "forcing.atm_data_type": "box2001",
            "forcing.ocn_data_type": "box2001",
            "dynamics.ndte": 20, "thermo.nit": 4})
    return cfg


def cmd_test(args):
    cfg = _default_test_cfg(args, build_config(args))
    t0 = time.time()
    bgen = getattr(args, "bgen", None)
    bcmp = getattr(args, "bcmp", None)
    if bgen or bcmp:
        # baseline generate/compare (cice.setup --bgen/--bcmp,
        # ug_testing.rst:70-86): the stored artifact is the per-step global
        # diagnostics series — the comparelog oracle
        key = f"{args.type}_{(args.opts or 'base').replace(',', '+')}.json"
        _, series = _diag_series(cfg)
        if bgen:
            os.makedirs(bgen, exist_ok=True)
            with open(os.path.join(bgen, key), "w") as f:
                json.dump(series, f)
            print(f"BGEN  {key} ({time.time()-t0:.1f}s)")
            return 0
        with open(os.path.join(bcmp, key)) as f:
            base = json.load(f)
        errs = compare_series(base, series)
        verdict = "PASS" if not errs else "FAIL"
        print(f"{verdict} bcmp_{args.type} vs {key} "
              f"({len(errs)} mismatches, {time.time()-t0:.1f}s)")
        for i, k, va, vb in errs[:10]:
            print(f"    step {i} {k}: baseline {va!r} vs run {vb!r}")
        return 0 if not errs else 1
    if args.type == "baseline":
        ok = _test_baseline(cfg, label=(args.opts or "base").replace(",", "+"))
    else:
        fn = {"smoke": _test_smoke, "restart": _test_restart,
              "decomp": _test_decomp}[args.type]
        ok = fn(cfg)
    verdict = "PASS" if ok else "FAIL"
    print(f"{verdict} test_{args.type} ({time.time()-t0:.1f}s)")
    return 0 if ok else 1


# suite tables (tests/*.ts analogue). Rows: (type, opts[, bfbcomp-opts]) —
# the optional 3rd column makes another row's diagnostics series the BFB
# oracle for this row (base_suite.ts 5th column semantics).
SUITES = {
    "quick": [("smoke", ""), ("restart", "")],
    "dynamics": [("smoke", ""), ("smoke", "gridc"), ("smoke", "dynpicard"),
                 ("smoke", "eap"), ("smoke", "nodyn"), ("smoke", "upwind")],
    "base": [("smoke", ""), ("restart", ""), ("smoke", "gridc"),
             ("smoke", "dynpicard"), ("smoke", "upwind"),
             ("restart", "upwind"), ("smoke", "seasonal")],
    "decomp": [("decomp", ""), ("decomp", "upwind")],
    "reprosum": [("smoke", "", ""), ("smoke", "ndte120")],
    # alternate-physics sweep (base_suite.ts alt* rows)
    "alt": [("smoke", "alt01"), ("smoke", "alt02"), ("smoke", "alt03"),
            ("smoke", "alt05"), ("smoke", "alt06"), ("smoke", "alt07")],
    # IO backends x restart exactness (io_suite.ts)
    "io": [("restart", ""), ("restart", "iocdf1"), ("restart", "iopio"),
           ("restart", "ioasync"), ("smoke", "histdaily"),
           ("smoke", "histinst")],
    # column-physics option sweep
    "column": [("smoke", "mushy"), ("smoke", "bl99"), ("smoke", "dedd"),
               ("smoke", "pondlvl"), ("smoke", "pondtopo"),
               ("smoke", "pondsealvl"), ("smoke", "snwgrain"),
               ("smoke", "fsd12"), ("smoke", "saltflux"),
               ("smoke", "congel")],
    # --- the five BASELINE.json configs, end-to-end at production size ---
    # 1. gx3 displaced-pole 5-day smoke (EVP + mushy, NCAR bulk + ocean clim)
    # 2. gx1 displaced-pole 5-day (EVP + incremental remap, JRA55 3-hourly)
    # 3. tx1 tripole (seam fold + land mask, NCAR)
    # 4. gx1 implicit VP (Picard + FGMRES) in place of EVP
    # 5. gx1 C-grid EVP
    "baseline": [("baseline", "gx3pop"), ("baseline", "gx1pop"),
                 ("baseline", "tx1pop"), ("baseline", "gx1pop,dynpicard"),
                 ("baseline", "gx1pop,gridc")],
    # CI-budget variant: the gx3 config runs its full 5 days; the gx1/tx1
    # rows exercise the same configs end-to-end with shortened clocks
    # (CPU runners spend ~45 s/step at gx1 — the 5-day versions are the
    # TPU-side `suite --name baseline`)
    "baseline_ci": [("baseline", "gx3pop"), ("baseline", "gx1pop,hours3"),
                    ("baseline", "tx1pop,day1"),
                    ("baseline", "gx1pop,dynpicard,hours3"),
                    ("baseline", "gx1pop,gridc,hours3")],
}


def cmd_suite(args):
    rows = SUITES.get(args.name)
    if rows is None:
        sys.exit(f"unknown suite '{args.name}' (available: {', '.join(SUITES)})")
    results = []
    series_cache = {}
    for row in rows:
        ttype, opts = row[0], row[1]
        bfb_ref = row[2] if len(row) > 2 else None
        if bfb_ref is not None and ttype == "smoke":
            # bfb-compare flow: run this config's series, compare against the
            # referenced config's series (computing & caching it on demand)
            if bfb_ref not in series_cache:
                nsr = argparse.Namespace(opts=bfb_ref, set=args.set)
                cfgr = _default_test_cfg(nsr, build_config(nsr))
                _, series_cache[bfb_ref] = _diag_series(cfgr)
            ns = argparse.Namespace(opts=opts, set=args.set)
            cfg = _default_test_cfg(ns, build_config(ns))
            _, series = _diag_series(cfg)   # ref==opts ⇒ run-to-run repro
            ok = not compare_series(series_cache[bfb_ref], series)
            series_cache[opts] = series
        else:
            ns = argparse.Namespace(opts=opts, set=args.set, type=ttype)
            try:
                ok = cmd_test(ns) == 0
            except Exception as e:     # a crashed row fails, suite goes on
                print(f"  ERROR {ttype} {opts}: {type(e).__name__}: {e}")
                ok = False
        results.append((ttype, opts, ok))
    npass = sum(1 for *_, ok in results if ok)
    for ttype, opts, ok in results:
        print(f"  {'PASS' if ok else 'FAIL'}  {ttype:8s} {opts}")
    print(f"{npass}/{len(results)} passed")
    return 0 if npass == len(results) else 1


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cice_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run the model")
    p_run.add_argument("--steps", type=int, default=None)
    p_run.add_argument("--opts", "-s", default="",
                       help="comma-separated option sets")
    p_run.add_argument("--set", action="append", metavar="KEY=VAL")
    p_run.add_argument("--history", action="store_true")
    p_run.add_argument("--profile", metavar="DIR", default=None,
                       help="write a jax.profiler trace of the time loop "
                            "to DIR (tensorboard/perfetto viewable)")
    p_run.set_defaults(fn=cmd_run)

    p_case = sub.add_parser("case", help="create a case directory")
    p_case.add_argument("--dir", required=True)
    p_case.add_argument("--opts", "-s", default="")
    p_case.add_argument("--set", action="append", metavar="KEY=VAL")
    p_case.set_defaults(fn=cmd_case)

    p_test = sub.add_parser("test", help="run a single test")
    p_test.add_argument("--type", choices=["smoke", "restart", "decomp",
                                           "baseline"],
                        default="smoke")
    p_test.add_argument("--opts", "-s", default="")
    p_test.add_argument("--set", action="append", metavar="KEY=VAL")
    p_test.add_argument("--bgen", default=None, metavar="DIR",
                        help="generate a baseline diagnostics series")
    p_test.add_argument("--bcmp", default=None, metavar="DIR",
                        help="compare against a stored baseline (BFB)")
    p_test.set_defaults(fn=cmd_test)

    p_suite = sub.add_parser("suite", help="run a test suite")
    p_suite.add_argument("--name", default="quick")
    p_suite.add_argument("--set", action="append", metavar="KEY=VAL")
    p_suite.set_defaults(fn=cmd_suite)

    def _perf(a):
        from .perf import run_perf
        sizes = tuple(tuple(int(v) for v in s.split("x"))
                      for s in a.sizes.split(","))
        run_perf(sizes=sizes, ndte=a.ndte,
                 mesh_devices=tuple(int(v) for v in a.mesh.split(",")),
                 weak_tile=tuple(int(v) for v in a.weak_tile.split("x")))
        return 0

    p_perf = sub.add_parser(
        "perf", help="EVP performance suite: grid-size sweep + strong/weak "
        "mesh scaling (perf_suite.ts analogue)")
    p_perf.add_argument("--sizes", default="192x160,384x320,768x640",
                        help="comma list of NYxNX grid sizes")
    p_perf.add_argument("--ndte", type=int, default=120)
    p_perf.add_argument("--mesh", default="1,2,4,8",
                        help="device counts for the scaling sweeps")
    p_perf.add_argument("--weak-tile", default="192x160",
                        help="per-device tile for the weak-scaling sweep")
    p_perf.set_defaults(fn=_perf)

    p_qc = sub.add_parser(
        "qc", help="two-stage statistical QC comparison of two runs")
    p_qc.add_argument("dir_a")
    p_qc.add_argument("dir_b")
    p_qc.add_argument("--var", default="hi")
    p_qc.set_defaults(fn=lambda a: __import__(
        "cice_tpu.cli.qc", fromlist=["main"]).main(
            [a.dir_a, a.dir_b, a.var]))

    p_p2 = sub.add_parser("plot2d", help="map plot of a history field "
                          "(ciceplots2d.py analogue)")
    p_p2.add_argument("paths", nargs="+")
    p_p2.add_argument("--field", "-f", default="aice")
    p_p2.add_argument("--out", default=None)
    p_p2.set_defaults(fn=lambda a: print("\n".join(__import__(
        "cice_tpu.cli.plots", fromlist=["plot2d"]).plot2d(
            a.paths, a.field, a.out))) or 0)

    p_ts = sub.add_parser("timeseries", help="diagnostics time-series plot "
                          "(timeseries.py analogue)")
    p_ts.add_argument("diag_path")
    p_ts.add_argument("--keys", "-k", action="append", default=None)
    p_ts.add_argument("--out", default=None)
    p_ts.set_defaults(fn=lambda a: print(__import__(
        "cice_tpu.cli.plots", fromlist=["timeseries"]).timeseries(
            a.diag_path, a.keys, a.out)) or 0)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
