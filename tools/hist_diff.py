#!/usr/bin/env python
"""Reproducible history-field parity diff vs the reference registry.

Extracts every ``call define_hist_field`` registration from the reference's
``cicecore/cicedyn/analysis/ice_history*.F90`` (literal second-argument names
plus the species-loop ``write(vname_in,'(a,a)') 'BASE', trim(nchar)`` form,
collapsed to BASE — numbered species instances like ``algal_N001`` are one
capability, not many), dedupes, and diffs the result against this package's
``build_fields`` with every capability flag enabled.

This is the single source of truth for PARITY.md's history numbers (VERDICT r4
Weak #5 / Next #2: the previous 378/329/85 claim did not reproduce).  Run:

    python tools/hist_diff.py            # table + summary to stdout
    python tools/hist_diff.py --check    # exit 1 if PARITY.md's numbers drift

Reference: ice_history.F90 / ice_history_{shared,bgc,pond,snow,mechred,fsd,
drag}.F90 `define_hist_field` call sites (`ice_history_shared.F90:918`).
"""
from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
REF_ANALYSIS = Path("/root/reference/cicecore/cicedyn/analysis")
VENDORED = REPO / "tools" / "reference_hist_names.txt"

# Names we classify as "physics structurally absent" — every entry must carry
# a justification.  Everything else in the residual is reachable work.
# Round 5 closed the last class (the X_snow family) by adding per-tracer
# snow reservoirs to the z network (zbgc_vertical.step_zbgc `snow`), so the
# residual is empty; the dict stays as the mechanism for future rounds.
ABSENT_JUSTIFIED: dict[str, str] = {}


def extract_reference_names() -> set[str]:
    """Parse define_hist_field registrations out of the reference Fortran."""
    names: set[str] = set()
    for path in sorted(REF_ANALYSIS.glob("ice_history*.F90")):
        text = path.read_text(errors="replace")
        # Join continuation lines so each statement is one logical line.
        lines = text.split("\n")
        logical: list[str] = []
        for ln in lines:
            code = ln.split("!")[0].rstrip()
            if logical and logical[-1].endswith("&"):
                logical[-1] = logical[-1][:-1] + " " + code.lstrip()
            else:
                logical.append(code)
        last_vname = None
        for stmt in logical:
            m = re.search(r"write\s*\(\s*vname_in.*?\)\s*'([A-Za-z0-9_]+)'", stmt)
            if m:
                last_vname = m.group(1)
                continue
            m = re.search(r"vname_in\s*=\s*'([A-Za-z0-9_]+)'", stmt)
            if m:
                last_vname = m.group(1)
                continue
            if "define_hist_field" not in stmt or "subroutine" in stmt:
                continue
            # Second arg is either a "literal" or vname_in; the first arg is an
            # identifier (possibly subscripted, e.g. n_bgc_Fed(n,:)) and never
            # contains quotes, so the first quote / vname_in token after the
            # call-open is the name argument.
            if re.search(r"define_hist_field\s*\([^\"']*?\bvname_in\b", stmt):
                if last_vname:
                    names.add(last_vname)
                continue
            m = re.search(r"define_hist_field\s*\([^\"']*?\"([^\"]+)\"", stmt)
            if m:
                names.add(m.group(1))
    return names


def repo_names() -> set[str]:
    """Every name build_fields can register, union over all flag settings."""
    from cice_tpu.config import Config
    from cice_tpu.io.history import build_fields

    base = Config().with_overrides(**{
        "tracers.tr_iage": True, "tracers.tr_FY": True, "tracers.tr_lvl": True,
        "tracers.tr_pond_lvl": True, "tracers.tr_snow": True,
        "tracers.tr_fsd": True, "tracers.tr_iso": True,
        "tracers.tr_aero": True, "tracers.tr_brine": True,
        "setup.hist_cmip": True, "forcing.formdrag": True,
        "forcing.wave_spec_type": "constant",
        "domain.n_aero": 3, "domain.n_iso": 3, "domain.nfsd": 12,
        "domain.nblyr": 7, "domain.nslyr": 2,
    })
    all_bgc = {
        "zbgc.tr_bgc_N": True, "zbgc.tr_bgc_Nit": True, "zbgc.tr_bgc_Am": True,
        "zbgc.tr_bgc_Sil": True, "zbgc.tr_bgc_DMS": True,
        "zbgc.tr_bgc_PON": True, "zbgc.tr_bgc_DON": True,
        "zbgc.tr_bgc_Fe": True, "zbgc.tr_bgc_C": True, "zbgc.tr_bgc_hum": True,
        "zbgc.n_algae": 3, "zbgc.n_doc": 3, "zbgc.n_dic": 1,
        "zbgc.n_fed": 2, "zbgc.n_fep": 2,
    }
    cfgs = [
        base.with_overrides(**{"zbgc.skl_bgc": True, "grid.grid_ice": "CD",
                               **all_bgc}),
        base.with_overrides(**{"zbgc.z_tracers": True, "zbgc.solve_zbgc": True,
                               "zbgc.tr_zaero": True, "zbgc.n_zaero": 6,
                               "dynamics.kdyn": 2, **all_bgc}),
        base.with_overrides(**{"tracers.tr_pond_topo": True,
                               "grid.grid_ice": "C"}),
        base.with_overrides(**{"tracers.tr_pond_sealvl": True}),
    ]
    names: set[str] = set()
    for cfg in cfgs:
        for f in build_fields(cfg):
            names.add(f.name)
    return names


# The reference's numbered-species names collapse to these bases; our registry
# uses the same base-name convention (one capability per base).
_NUM_SUFFIX = re.compile(r"^(.*?)(\d{3})$")


def collapse(names: set[str]) -> set[str]:
    out = set()
    for n in names:
        m = _NUM_SUFFIX.match(n)
        out.add(m.group(1) if m else n)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify PARITY.md quotes the regenerated numbers")
    ap.add_argument("--write-vendored", action="store_true",
                    help="rewrite tools/reference_hist_names.txt from the reference tree")
    args = ap.parse_args(argv)

    if REF_ANALYSIS.exists() and (args.write_vendored or not VENDORED.exists()):
        ref = extract_reference_names()
        VENDORED.write_text("\n".join(sorted(ref)) + "\n")
    ref = set(VENDORED.read_text().split())

    ours = collapse(repo_names())
    ref_c = collapse(ref)
    shared = ours & ref_c
    missing = ref_c - ours
    extra = ours - ref_c

    print(f"reference registrations (collapsed bases): {len(ref_c)}")
    print(f"repo build_fields (all flags, collapsed):  {len(ours)}")
    print(f"shared:                                    {len(shared)}")
    print(f"reference-only (residual):                 {len(missing)}")
    print(f"repo-only (TPU-native extras):             {len(extra)}")
    unclassified = [n for n in missing if n not in ABSENT_JUSTIFIED]
    print(f"residual classified structurally-absent:   "
          f"{len(missing) - len(unclassified)}")
    print(f"residual unclassified (reachable work):    {len(unclassified)}")
    print(f"\nPARITY tag: hist_diff: {len(ours)}/{len(shared)}/{len(missing)}")
    print("\n-- reference-only names --")
    for n in sorted(missing):
        just = ABSENT_JUSTIFIED.get(n, "")
        print(f"  {n}" + (f"   [{just}]" if just else ""))
    print("\n-- repo-only names --")
    for n in sorted(extra):
        print(f"  {n}")

    if args.check:
        parity = (REPO / "PARITY.md").read_text()
        tag = f"hist_diff: {len(ours)}/{len(shared)}/{len(missing)}"
        if tag not in parity:
            print(f"\nPARITY.md does not contain the regenerated tag '{tag}'",
                  file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
