"""Annual-cycle validation run on the gx3 production grid.

Committed artifact: `--days 730` (two years, 17,520 hourly coupled steps
on TPU, ~23 min on v5e-1); the phase/amplitude summary analyzes the FINAL
365 days so year 1 absorbs the spin-up transient of the idealized initial
state.

The reference's production-acceptance evidence is multi-year gx1/gx3 runs
whose seasonal extent/volume cycles are inspected (ug_testing.rst QC
protocol runs 5 years; the consortium's release validation is multi-decade).
This tool runs ONE full seasonal cycle — 8760 hourly steps — on the gx3
displaced-pole POP fixture grid with NCAR-bulk monthly forcing + monthly
ocean climatology (both carry the full seasonal cycle; io/fixtures.py), and
archives the daily hemispheric diagnostics series plus a phase/amplitude
summary.

Checks encoded in the summary (asserted by
tests/test_annual_cycle_artifact.py against the committed artifact):
  * every diagnostic finite for all 365 days (no NaN source over a full
    seasonal sweep — melt season, freeze-up, polar night in both
    hemispheres);
  * NH extent maximum lands in late winter (Jan-Apr) and minimum in late
    summer (Aug-Oct); SH in antiphase (max Jul-Nov, min Dec-Apr) — the
    phase structure of the observed cycle;
  * a nontrivial seasonal amplitude in both hemispheres (max/min extent
    ratio > 1.3);
  * velocity/thickness watchdog bounds hold all year (umax < 1.5 m/s,
    hmax < 20 m — reference check_umax / diagnostic_abort limits).

Usage:  python tools/annual_cycle.py [--days 365] [--out PATH]
Runs on whatever backend JAX selects (TPU via the default env; ~2-4 min).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MONTH_END_DOY = [31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365]


def month_of_day(doy1):
    """1-based day-of-year -> 1-based month (noleap)."""
    for m, e in enumerate(MONTH_END_DOY, start=1):
        if doy1 <= e:
            return m
    return 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--dt", type=float, default=3600.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baselines", "r05", "annual_gx3.json"))
    args = ap.parse_args()

    from cice_tpu.cli.main import OPTION_SETS, _resolve_fixtures
    from cice_tpu.config import Config
    from cice_tpu.model.driver import Model

    per_day = int(round(86400.0 / args.dt))
    opts = dict(OPTION_SETS["gx3pop"])
    opts.update({
        "setup.dt": args.dt, "setup.npt": args.days, "setup.npt_unit": "d",
        "setup.diagfreq": per_day,          # one diagnostics record per day
        "setup.dumpfreq": "x", "setup.dump_last": False,
        "setup.histfreq": ("x",) * 5,
        "setup.conserv_check": False,       # per-day diags only (speed)
    })
    cfg = Config().with_overrides(**_resolve_fixtures(opts))

    t0 = time.time()
    m = Model(cfg, enable_history=False)
    t_init = time.time() - t0
    t0 = time.time()
    m.run()
    t_run = time.time() - t0
    series = m.diag_log
    assert len(series) >= args.days - 1, (len(series), args.days)

    import numpy as np
    keys = sorted(series[0])
    arr = {k: np.array([r[k] for r in series]) for k in keys}
    finite = {k: bool(np.isfinite(v).all()) for k, v in arr.items()}

    # phase analysis over the FINAL 365 days: with --days 730 the first
    # year absorbs the spin-up transient from the idealized initial state
    # (whose extent minimum otherwise lands on day 1)
    nwin = min(365, len(series))
    w0 = len(series) - nwin

    def phase(v):
        vw = v[w0:]
        imax, imin = int(np.argmax(vw)), int(np.argmin(vw))
        dmax = (w0 + imax) % 365 + 1          # day-of-year (noleap)
        dmin = (w0 + imin) % 365 + 1
        return {"max": float(vw[imax]), "max_day": dmax,
                "max_month": month_of_day(dmax),
                "min": float(vw[imin]), "min_day": dmin,
                "min_month": month_of_day(dmin)}

    summary = {
        "days": len(series), "dt_s": args.dt,
        "steps": len(series) * per_day,
        "grid": "gx3 100x116 displaced-pole POP fixture",
        "forcing": "NCAR bulk monthly + ocean clim (seasonal fixtures)",
        "all_finite": all(finite.values()),
        "nonfinite_keys": [k for k, ok in finite.items() if not ok],
        "extent_nh": phase(arr["extent_nh"]),
        "extent_sh": phase(arr["extent_sh"]),
        "volume_nh": phase(arr["volume_nh"]),
        "volume_sh": phase(arr["volume_sh"]),
        "umax_year": float(arr["umax"].max()),
        "hmax_year": float(arr["hmax"].max()),
        "init_s": round(t_init, 1), "run_s": round(t_run, 1),
        "ms_per_step": round(1e3 * t_run / (len(series) * per_day), 2),
        "device": str(__import__("jax").devices()[0].platform),
    }
    out = {"summary": summary, "series": series}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
