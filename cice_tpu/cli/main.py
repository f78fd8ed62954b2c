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
    "pondlvl": {"tracers.tr_pond_lvl": True, "tracers.tr_pond_topo": False},
    "bgcskl": {"zbgc.skl_bgc": True},
    # vertically-resolved z-tracer BGC on the brine column (set_nml.bgcz)
    "bgcz": {"zbgc.z_tracers": True, "zbgc.solve_zbgc": True,
             "tracers.tr_brine": True, "domain.nblyr": 7,
             "zbgc.tr_bgc_Am": True, "zbgc.tr_bgc_Sil": True,
             "zbgc.tr_bgc_DMS": True, "zbgc.tr_bgc_PON": True,
             "zbgc.tr_bgc_DON": True, "zbgc.tr_bgc_Fe": True,
             "zbgc.n_algae": 3},
    "zaero": {"zbgc.z_tracers": True, "tracers.tr_brine": True,
              "domain.nblyr": 7, "zbgc.tr_zaero": True, "zbgc.n_zaero": 3},
    "isotope": {"tracers.tr_iso": True, "domain.n_iso": 3},
    "aerosol": {"tracers.tr_aero": True, "domain.n_aero": 3},
    "alt01": {"tracers.tr_iage": False, "tracers.tr_FY": False},
    "revp": {"dynamics.revised_evp": True},
    "evp1d": {"dynamics.evp_algorithm": "fused_pallas"},
    "jra55": {"forcing.atm_data_type": "jra55"},
    "ncar": {"forcing.atm_data_type": "ncar"},
    "vanleer": {"dynamics.advection": "vanleer"},
    "seabedLKD": {"dynamics.seabed_stress": True,
                  "dynamics.seabed_stress_method": "LKD"},
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


def build_config(args):
    from ..config import Config
    cfg = Config()
    for opt in (args.opts or "").split(","):
        if opt:
            if opt not in OPTION_SETS:
                sys.exit(f"unknown option set '{opt}' "
                         f"(available: {', '.join(OPTION_SETS)})")
            cfg = cfg.with_overrides(**OPTION_SETS[opt])
    cfg = cfg.with_overrides(**_parse_sets(args.set))
    return cfg


def cmd_run(args):
    from ..model.driver import Model
    cfg = build_config(args)
    m = Model(cfg, enable_history=args.history)
    n = args.steps if args.steps else None
    t0 = time.time()
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


def _test_smoke(cfg) -> bool:
    import numpy as np
    from ..model.driver import Model
    m = Model(cfg)
    m.run(min(24, 6))
    ok = bool(np.isfinite(np.asarray(m.state.vice)).all())
    ok &= float(m.state.aice.max()) <= 1.0 + 1e-6
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
        m3 = Model(cfg)
        m3.state, m3.calendar = read_restart(path, m3.state)
        m3.run(3)
        for a, b in zip(jax.tree.leaves(m1.state), jax.tree.leaves(m3.state)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return False
    return True


def cmd_test(args):
    cfg = build_config(args)
    # small default test shape
    if not args.set or not any("nx_global" in s for s in args.set):
        cfg = cfg.with_overrides(**{
            "grid.nx_global": 32, "grid.ny_global": 32,
            "grid.grid_format": "rect", "grid.kmt_type": "none",
            "forcing.atm_data_type": "box2001",
            "forcing.ocn_data_type": "box2001",
            "dynamics.ndte": 20, "thermo.nit": 4})
    fn = {"smoke": _test_smoke, "restart": _test_restart}[args.type]
    t0 = time.time()
    ok = fn(cfg)
    verdict = "PASS" if ok else "FAIL"
    print(f"{verdict} test_{args.type} ({time.time()-t0:.1f}s)")
    return 0 if ok else 1


SUITES = {
    "quick": [("smoke", ""), ("restart", "")],
    "dynamics": [("smoke", ""), ("smoke", "gridc"), ("smoke", "dynpicard"),
                 ("smoke", "eap"), ("smoke", "nodyn"), ("smoke", "upwind")],
    "base": [("smoke", ""), ("restart", ""), ("smoke", "gridc"),
             ("smoke", "dynpicard"), ("smoke", "upwind"),
             ("restart", "upwind"), ("smoke", "seasonal")],
}


def cmd_suite(args):
    rows = SUITES.get(args.name)
    if rows is None:
        sys.exit(f"unknown suite '{args.name}' (available: {', '.join(SUITES)})")
    results = []
    for ttype, opts in rows:
        ns = argparse.Namespace(opts=opts, set=args.set, type=ttype)
        rc = cmd_test(ns)
        results.append((ttype, opts, rc == 0))
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
    p_run.set_defaults(fn=cmd_run)

    p_case = sub.add_parser("case", help="create a case directory")
    p_case.add_argument("--dir", required=True)
    p_case.add_argument("--opts", "-s", default="")
    p_case.add_argument("--set", action="append", metavar="KEY=VAL")
    p_case.set_defaults(fn=cmd_case)

    p_test = sub.add_parser("test", help="run a single test")
    p_test.add_argument("--type", choices=["smoke", "restart"], default="smoke")
    p_test.add_argument("--opts", "-s", default="")
    p_test.add_argument("--set", action="append", metavar="KEY=VAL")
    p_test.set_defaults(fn=cmd_test)

    p_suite = sub.add_parser("suite", help="run a test suite")
    p_suite.add_argument("--name", default="quick")
    p_suite.add_argument("--set", action="append", metavar="KEY=VAL")
    p_suite.set_defaults(fn=cmd_suite)

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
