"""Exact incremental remapping — Green's-theorem dense TPU formulation.

Faithful re-implementation of the reference's incremental remapping
(cicecore/cicedyn/dynamics/ice_transport_remap.F90: construct_fields:1009,
limited_gradient:1295, departure_points:1449, locate_triangles:1633,
triangle_coordinates:3077, transport_integrals:3188, update_fields:3480;
Dukowicz & Baumgardner 2000, Lipscomb & Hunke 2004), with the *same*
departure regions and *exact* integrals, but TPU-native geometry:

The reference decomposes each edge's swept region (the pentagon
CL->CR->DR->DM->DL in edge-local scaled coordinates, where CL/CR are the
edge endpoints, DL/DR their backward-trajectory departure points and DM
the - optionally Bentsen-adjusted - midpoint) into up to 5 of 20
candidate triangles via ~1400 lines of branchy geometry, then applies
cubic-exact triangle quadrature. Here the *same signed region* is
integrated per candidate donor cell with zero control flow:

  For each candidate cell (6 per edge: two rows x three columns), the
  region is  pentagon ∩ {y-halfplane} ∩ {x-column}.  By Green's theorem
  with the 1-form  w = -G(x,y) dx,  G(x,y) = ∫_0^y f(x,s) ds:
    - along the edge line y=0:  G = 0, so no contribution;
    - along the column boundaries x = ±1/2 (vertical): dx = 0, ditto;
  hence  ∬_region f dA = -Σ_segments ∫ G dx  over the *pentagon's own
  segments clamped to the region* - a per-segment parametric interval
  clamp (two linear inequalities) followed by 3-point Gauss-Legendre in
  the segment parameter (exact: the integrand is degree <= 4 for the
  cubic f's needed by type-2 tracers). No triangles, no clipping buffers,
  no branches; identical regions and integrals to the reference, so the
  scheme is the same discretization evaluated exactly.

Reconstruction, tracer typing (1/2/3 with mass-centroid / mass-tracer-
centroid offsets), the van-Leer-style 9-cell limiter, the snow-enthalpy
offset, negative-mass abort semantics, monotonicity and global
conservation checks all mirror the reference routines cited above.

Coordinates are the reference's scaled coordinates (each cell locally the
unit square; departure displacements scaled by dxU/dyU at their corner;
physical areas restored via earea/narea) — like the post-2023 reference,
metric variation within the 3x2 candidate neighborhood is neglected.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as cst
from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_NECORNER,
                         FIELD_TYPE_SCALAR, FIELD_TYPE_VECTOR)
from ..core.grid import Grid
from ..core.halo import shift
from ..model.state import DEP_AICE, DEP_VICE, DEP_VSNO, State

# monomial order for region moments: x^p y^q
MONO: Tuple[Tuple[int, int], ...] = ((0, 0), (1, 0), (0, 1), (2, 0), (1, 1),
                                     (0, 2), (3, 0), (2, 1), (1, 2), (0, 3))
MIDX = {pq: k for k, pq in enumerate(MONO)}

# 3-point Gauss-Legendre on [-1, 1]
_GL_X = (-math.sqrt(3.0 / 5.0), 0.0, math.sqrt(3.0 / 5.0))
_GL_W = (5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0)

# candidate donor cells in a fixed order (row, col): row 'T' = the y>0
# half-plane, 'B' = y<0; col -1/0/+1 the x column relative to the edge
CANDS: Tuple[Tuple[str, int], ...] = (("T", -1), ("T", 0), ("T", 1),
                                      ("B", -1), ("B", 0), ("B", 1))

# region axis order for the vectorized moment engine: (sy, col-constraint)
# with col 'inf' (no x clamp), 'm' (x >= -1/2), 'p' (x >= +1/2)
_REGIONS: Tuple[Tuple[float, str], ...] = ((1.0, "inf"), (1.0, "m"),
                                           (1.0, "p"), (-1.0, "inf"),
                                           (-1.0, "m"), (-1.0, "p"))
_LARGE = 1.0e30


import numpy as _np

# static monomial index/scale vectors: moment k integrates x^p y^q via
# G = x^p y^(q+1)/(q+1) (see module docstring)
_P_IDX = _np.array([p for p, q in MONO])
_Q_IDX = _np.array([q for p, q in MONO])
_Q_DIV = _np.array([1.0 / (q + 1.0) for p, q in MONO])


def _translate_matrix(cx: float, cy: float) -> _np.ndarray:
    """Static (10, 10) matrix T with (x-cx)^p (y-cy)^q moments = T @ M."""
    T = _np.zeros((len(MONO), len(MONO)))
    for k, (p, q) in enumerate(MONO):
        for r in range(p + 1):
            for s in range(q + 1):
                T[k, MIDX[(r, s)]] += (math.comb(p, r) * math.comb(q, s) *
                                       (-cx) ** (p - r) * (-cy) ** (q - s))
    return T


# per-candidate translation matrices (candidate-local origin at its center)
_T_CAND = _np.stack([_translate_matrix(float(col), 0.5 if row == "T" else -0.5)
                     for row, col in CANDS])


# ---------------------------------------------------------------------------
# flat tracer table (reference ice_transport_driver init_transport:76-237)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FlatTracer:
    name: str            # registry name (or 'hi'/'hs')
    layer: int           # layer index within the registry tracer (0 if 2-D)
    ttype: int           # 1, 2 or 3 (reference tracer_type)
    parent: int          # flat index of parent tracer (-1 for type 1)
    has_dependents: bool
    # physical value range from the TracerSpec (registry), enforced after
    # the new-value chain solve: the signed-fragment flux decomposition is
    # not convex at knife-edge denominators, so without the rail a tiny
    # weight chain (e.g. sub-hs_min snow) amplifies its tracer value
    # multiplicatively every step (round-5 annual-run root cause)
    lo: float = 0.0
    hi: float = float("inf")


def build_flat_table(registry) -> Tuple[FlatTracer, ...]:
    """Flatten the tracer registry into the remap tracer table with
    reference tracer_type / depend semantics
    (ice_transport_driver.F90:117-150), GROUPED by tracer type (all
    type-1 entries first, then type 2, then type 3; stable within each
    group, hi/hs leading the type-1 block).

    The grouping is a TPU layout decision: construct_fields and
    update_fields batch their per-type passes as contiguous static
    slices along the flat-tracer axis instead of NT-sized gathers (which
    lower to slow TPU gather ops / one-hot matmuls). state_to_tracers /
    tracers_to_state derive the packing order from the table itself, so
    the order is an internal contract of this module."""
    entries: List[dict] = [
        dict(name="hi", layer=0, parent=-1, lo=0.0, hi=float("inf")),
        dict(name="hs", layer=0, parent=-1, lo=0.0, hi=float("inf")),
    ]
    first_flat: Dict[str, int] = {"hi": 0, "hs": 1}
    for spec in registry:
        nlay = spec.nlayers if getattr(spec, "nlayers", 0) else 1
        if spec.parent is not None:
            parent = first_flat[spec.parent]
        elif spec.depend == DEP_VICE:
            parent = 0
        elif spec.depend == DEP_VSNO:
            parent = 1
        else:
            parent = -1
        first_flat[spec.name] = len(entries)
        for lay in range(nlay):
            entries.append(dict(name=spec.name, layer=lay, parent=parent,
                                lo=getattr(spec, "lo", 0.0),
                                hi=getattr(spec, "hi", float("inf"))))

    def depth(k: int) -> int:
        d, p = 1, entries[k]["parent"]
        while p >= 0:
            d += 1
            p = entries[p]["parent"]
        return d

    has_dep = [False] * len(entries)
    for e in entries:
        if e["parent"] >= 0:
            has_dep[e["parent"]] = True

    types = [min(depth(k), 3) for k in range(len(entries))]
    # stable permutation grouping by type; layers of one tracer share a
    # type, so each tracer's layer run stays contiguous
    perm = sorted(range(len(entries)), key=lambda k: types[k])
    inv = {old: new for new, old in enumerate(perm)}
    return tuple(FlatTracer(entries[o]["name"], entries[o]["layer"],
                            types[o],
                            inv[entries[o]["parent"]]
                            if entries[o]["parent"] >= 0 else -1,
                            has_dep[o],
                            entries[o]["lo"], entries[o]["hi"])
                 for o in perm)


def _table_runs(table) -> List[Tuple[str, int, int]]:
    """Contiguous (name, start, nlayers) runs of the flat table."""
    runs: List[Tuple[str, int, int]] = []
    k = 0
    while k < len(table):
        name = table[k].name
        n = 1
        while k + n < len(table) and table[k + n].name == name:
            n += 1
        runs.append((name, k, n))
        k += n
    return runs


def _spec_nlayers(spec) -> int:
    return spec.nlayers if getattr(spec, "nlayers", 0) else 0


def state_to_tracers(state: State, registry, table) -> Tuple[jnp.ndarray,
                                                             jnp.ndarray]:
    """Pack State into (am, trm): am (ncat+1, ny, nx) mean mass (aice0 +
    aicen); trm (ncat, NT, ny, nx) mean tracers (hi, hs, then registry
    tracers; snow enthalpy offset by +rhos*Lfresh so it is positive —
    reference state_to_tracers ice_transport_driver.F90:890-1007)."""
    aicen = state.aicen
    ncat = aicen.shape[0]
    am = jnp.concatenate([state.aice0[None], aicen], axis=0)
    w = jnp.where(aicen > cst.puny, 1.0 / jnp.maximum(aicen, cst.puny), 0.0)
    # whole-block concat along the flat-tracer axis (per-layer slicing +
    # restacking lowers to thousands of small strided copies on TPU —
    # ~7x slower than these contiguous block copies). Block order follows
    # the table's type-grouped runs (see build_flat_table).
    blocks = []
    for name, _k0, nlay in _table_runs(table):
        if name == "hi":
            blocks.append((state.vicen * w)[:, None])
        elif name == "hs":
            blocks.append((state.vsnon * w)[:, None])
        else:
            t = state.trcrn[name]
            off = cst.rhos * cst.Lfresh if name == "qsno" else 0.0
            t = t + off
            blocks.append(t if t.ndim == 4 else t[:, None])
        assert blocks[-1].shape[1] == nlay, (name, nlay)
    trm = jnp.concatenate(blocks, axis=1)               # (ncat, NT, ny, nx)
    assert trm.shape[1] == len(table)
    return am, trm


def tracers_to_state(am, trm, state: State, registry, tmask, Tf,
                     table) -> State:
    """Unpack back into State (reference tracers_to_state:1015-1115):
    vicen = hi*aicen, vsnon = hs*aicen, snow enthalpy un-offset, vanished
    categories zeroed except Tsfcn -> Tf."""
    ncat = state.aicen.shape[0]
    # aice0 is a derived property (1 - sum aicen); the advected copy is
    # dropped, matching the reference (tracers_to_state recomputes aice0
    # from aice after cleanup)
    aicen = am[1:] * tmask[None]
    alive = aicen > 0.0
    nlayers = {spec.name: _spec_nlayers(spec) for spec in registry}
    vicen = vsnon = None
    tr_new = {}
    for name, k, nrun in _table_runs(table):
        if name == "hi":
            vicen = jnp.where(alive, trm[:, k] * aicen, 0.0)
        elif name == "hs":
            vsnon = jnp.where(alive, trm[:, k] * aicen, 0.0)
        elif nlayers[name]:
            off = cst.rhos * cst.Lfresh if name == "qsno" else 0.0
            tr_new[name] = jnp.where(alive[:, None],
                                     trm[:, k:k + nrun] - off, 0.0)
        else:
            val = jnp.where(alive, trm[:, k], 0.0)
            if name == "Tsfcn":
                val = jnp.where(alive, val, Tf[None])
            tr_new[name] = val
    return state.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                         trcrn=tr_new)


# ---------------------------------------------------------------------------
# reconstruction (reference construct_fields:1009, limited_gradient:1295)
# ---------------------------------------------------------------------------

def limited_gradient(bc, phi, phimask, cnx, cny):
    """Barth-Jespersen-style limited gradient in scaled coordinates about
    the displaced center (cnx, cny) (reference limited_gradient:1295).
    phi: (..., ny, nx); masked neighbors take the home value."""
    sh = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)
    shm = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)

    # running min/max over the 8 masked neighbors + home value (stacking
    # the 9 planes materializes a 9x temporary; these chains fuse)
    pmn = phi
    pmx = phi
    axis_nbrs = {}
    for (dj, di) in ((1, -1), (1, 0), (1, 1), (0, -1), (0, 1),
                     (-1, -1), (-1, 0), (-1, 1)):
        pm = shm(phimask, dj, di)
        v = pm * sh(phi, dj, di) + (1.0 - pm) * phi
        if dj == 0 or di == 0:
            axis_nbrs[(dj, di)] = v
        pmn = jnp.minimum(pmn, v)
        pmx = jnp.maximum(pmx, v)

    gx = (axis_nbrs[(0, 1)] - axis_nbrs[(0, -1)]) * 0.5
    gy = (axis_nbrs[(1, 0)] - axis_nbrs[(-1, 0)]) * 0.5
    pmn = pmn - phi
    pmx = pmx - phi

    # deviations at the 4 cell corners relative to (cnx, cny)
    w1 = (0.5 - cnx) * gx + (0.5 - cny) * gy
    w2 = (0.5 - cnx) * gx - (0.5 + cny) * gy
    w3 = -(0.5 + cnx) * gx - (0.5 + cny) * gy
    w4 = (0.5 - cny) * gy - (0.5 + cnx) * gx
    qmn = jnp.minimum(jnp.minimum(w1, w2), jnp.minimum(w3, w4))
    qmx = jnp.maximum(jnp.maximum(w1, w2), jnp.maximum(w3, w4))

    lim1 = jnp.where(jnp.abs(qmn) > jnp.abs(pmn),
                     jnp.maximum(0.0, pmn / jnp.where(qmn != 0.0, qmn, 1.0)),
                     1.0)
    lim2 = jnp.where(jnp.abs(qmx) > jnp.abs(pmx),
                     jnp.maximum(0.0, pmx / jnp.where(qmx != 0.0, qmx, 1.0)),
                     1.0)
    lim = jnp.minimum(lim1, lim2) * phimask
    return lim * gx, lim * gy


def construct_fields(grid: Grid, am, trm, table, hm):
    """Reconstruct mass and tracer fields (reference construct_fields).

    Returns (mc, mx, my) for the (ncat+1) mass fields and (tc, tx, ty)
    for the (ncat, NT) tracers, all in scaled cell-local coordinates
    about the geometric center."""
    bc = grid.bc
    mmask = (am > cst.puny).astype(am.dtype)
    mx, my = limited_gradient(bc, am, hm[None] * jnp.ones_like(am),
                              jnp.zeros_like(am), jnp.zeros_like(am))
    mc = am

    XXAV = 1.0 / 12.0
    minv = jnp.where(am > cst.puny, 1.0 / jnp.maximum(am, cst.puny), 0.0)
    mxav = mx * XXAV * minv          # center-of-mass offsets
    myav = my * XXAV * minv

    mm = am[1:]
    mmask_c = mmask[1:]

    # tracers reconstruct in three type-batched limited_gradient passes
    # (type 1 about the mass centroid; type 2 about its type-1 parent's
    # mass*tracer centroid; type 3 upwind) instead of one call per flat
    # tracer — the traced graph shrinks ~NT-fold, numerics identical.
    # The flat table is type-grouped (build_flat_table), so each pass is
    # a contiguous static slice and the results concat back in table
    # order with NO permutation gather (an NT-axis take lowers to slow
    # TPU gathers; measured ~4 ms of the 7 ms construct_fields at gx1).
    ttype, _par, is1, is2, is3 = _table_arrays(table)
    K1 = int(is1.sum())
    K2 = int(is2.sum())
    K3 = int(is3.sum())
    assert (ttype[:K1] == 1).all() and (ttype[K1:K1 + K2] == 2).all() \
        and (ttype[K1 + K2:] == 3).all(), "flat table must be type-grouped"

    # --- type 1 (parents: mass centroid offsets) -----------------------
    tm1 = trm[:, :K1]                                # (ncat, K1, ny, nx)
    cnx1 = mxav[1:][:, None]
    cny1 = myav[1:][:, None]
    gx1, gy1 = limited_gradient(bc, tm1, mmask_c[:, None], cnx1, cny1)
    tc1 = tm1 - gx1 * cnx1 - gy1 * cny1
    # center of (mass*tracer) (reference construct_fields w2/w3/w7),
    # used by type-2 children
    w2 = mm[:, None] * gx1 + mx[1:][:, None] * tc1
    w3 = mm[:, None] * gy1 + my[1:][:, None] * tc1
    denom = mm[:, None] * tm1
    dinv = jnp.where(jnp.abs(denom) > cst.puny,
                     1.0 / jnp.where(denom != 0.0, denom, 1.0), 0.0)
    ctx1 = w2 * XXAV * dinv
    cty1 = w3 * XXAV * dinv

    pieces_tc, pieces_tx, pieces_ty = [tc1], [gx1], [gy1]

    # --- type 2 (children of type-1 tracers) ---------------------------
    if K2:
        parf2 = _np.array([table[k].parent for k in range(K1, K1 + K2)])
        # parent-plane selection via a static one-hot MXU matmul (take
        # would lower to a TPU gather)
        P2 = jnp.asarray(_np.eye(K1)[parf2], trm.dtype)
        sel2 = lambda a: jnp.einsum("np,cpyx->cnyx", P2, a)
        tm2 = trm[:, K1:K1 + K2]
        cnx2 = sel2(ctx1)
        cny2 = sel2(cty1)
        pmask2 = mmask_c[:, None] * \
            (jnp.abs(sel2(tm1)) > cst.puny).astype(trm.dtype)
        gx2, gy2 = limited_gradient(bc, tm2, pmask2, cnx2, cny2)
        tc2 = tm2 - gx2 * cnx2 - gy2 * cny2
        pieces_tc.append(tc2)
        pieces_tx.append(gx2)
        pieces_ty.append(gy2)

    # --- type 3: upwind (reference) ------------------------------------
    if K3:
        tm3 = trm[:, K1 + K2:]
        pieces_tc.append(tm3)
        pieces_tx.append(jnp.zeros_like(tm3))
        pieces_ty.append(jnp.zeros_like(tm3))

    # one packed [tc|tx|ty] stack: the fused Pallas flux kernel consumes
    # it directly (one pad instead of a 0.2 GB re-concat); tc/tx/ty are
    # zero-copy slices of it for the XLA path and the tests
    NT = len(table)
    tstack = jnp.concatenate(pieces_tc + pieces_tx + pieces_ty, axis=1)
    tc = tstack[:, :NT]
    tx = tstack[:, NT:2 * NT]
    ty = tstack[:, 2 * NT:]
    return mc, mx, my, tc, tx, ty, tstack


# ---------------------------------------------------------------------------
# departure points (reference departure_points:1449)
# ---------------------------------------------------------------------------

def departure_points_scaled(grid: Grid, uvel, vvel, dt, l_dp_midpt=False):
    """Scaled departure displacements at U corners + out-of-bounds flag.

    Returns (dxs, dys, oob): dxs = -u*dt/dxU etc.; oob mirrors the
    reference abort when a departure point leaves the neighbor cell."""
    dpx = -dt * uvel * grid.uvm
    dpy = -dt * vvel * grid.uvm
    shn = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                  ftype=FIELD_TYPE_SCALAR)
    oob = ((dpx < -grid.HTN) | (dpx > shn(grid.HTN, 0, 1)) |
           (dpy < -grid.HTE) | (dpy > shn(grid.HTE, 1, 0)))
    oob = jnp.any(oob & (grid.uvm > 0.5))

    if l_dp_midpt:
        # midpoint-corrected trajectories (reference :1544-1617): evaluate
        # the bilinear corner-velocity interpolant at the trajectory
        # midpoint. Dense form: the 4-way cell selection collapses into
        # one bilinear formula in the signed midpoint offsets.
        shv = partial(shift, bc=grid.bc, loc=FIELD_LOC_NECORNER,
                      ftype=FIELD_TYPE_VECTOR)
        mpx = 0.5 * dpx / grid.dxU
        mpy = 0.5 * dpy / grid.dyU
        ix = jnp.where(mpx >= 0.0, 1, 0)
        jy = jnp.where(mpy >= 0.0, 1, 0)
        # fractional position within the chosen cell, in [-1/2, 1/2]
        mpxt = mpx - (jnp.asarray(ix, dpx.dtype) - 0.5)
        mpyt = mpy - (jnp.asarray(jy, dpy.dtype) - 0.5)

        def bilin(f):
            vals = {}
            for ddi in (-1, 0, 1):
                for ddj in (-1, 0, 1):
                    vals[(ddj, ddi)] = shv(f, ddj, ddi)
            # corners of cell (ix, jy): U(ix-1+{0,1}, jy-1+{0,1}) offsets
            def at(dj, di):
                out = jnp.zeros_like(f)
                for (oj, oi), v in vals.items():
                    m = (jnp.asarray(jy + dj - 1 == oj)) & \
                        (jnp.asarray(ix + di - 1 == oi))
                    out = jnp.where(m, v, out)
                return out
            f_sw = at(0, 0)
            f_se = at(0, 1)
            f_nw = at(1, 0)
            f_ne = at(1, 1)
            return (f_sw * (mpxt - 0.5) * (mpyt - 0.5)
                    - f_se * (mpxt + 0.5) * (mpyt - 0.5)
                    + f_ne * (mpxt + 0.5) * (mpyt + 0.5)
                    - f_nw * (mpxt - 0.5) * (mpyt + 0.5))

        ump = bilin(uvel)
        vmp = bilin(vvel)
        keep = (uvel != 0.0) | (vvel != 0.0)
        dpx = jnp.where(keep, -dt * ump * grid.uvm, dpx)
        dpy = jnp.where(keep, -dt * vmp * grid.uvm, dpy)

    return dpx / grid.dxU, dpy / grid.dyU, oob


# ---------------------------------------------------------------------------
# Green's-theorem region moments
# ---------------------------------------------------------------------------

def _clamp_interval(lo, hi, g0, g1):
    """Clamp parametric interval [lo, hi] to the halfspace where the
    linear function g(t) = g0 + (g1-g0) t is >= 0 (elementwise, any
    broadcastable shapes)."""
    dg = g1 - g0
    ts = -g0 / jnp.where(dg == 0, 1.0, dg)
    lo2 = jnp.where(dg > 0, jnp.maximum(lo, ts), lo)
    hi2 = jnp.where(dg < 0, jnp.minimum(hi, ts), hi)
    empty = (dg == 0) & (g0 < 0)
    lo2 = jnp.where(empty, 1.0, lo2)
    hi2 = jnp.where(empty, 0.0, hi2)
    return lo2, hi2


def pentagon_cell_moments(verts, edgearea=None):
    """Per-candidate-cell moments of the signed pentagon region.

    verts: list of 5 (x, y) tuples of (ny, nx) arrays in edge-local scaled
    coordinates, ordered CL, CR, DR, DM, DL. If `edgearea` (scaled signed
    area, positive = toward y<0 departure i.e. positive transport) is
    given, DM is shifted normal to the edge so the pentagon's signed area
    matches (Bentsen edge-flux adjustment, reference locate_triangles).

    Returns a (6, 10, ny, nx) array of moments in candidate-local
    coordinates, candidate axis ordered as `CANDS`.

    Vectorized over (region, monomial): the 5 pentagon segments loop in
    Python (accumulation), everything else is stacked array math — this
    keeps the traced graph ~100x smaller than the naive per-region,
    per-monomial, per-Gauss-point unrolling (XLA CPU compile time on the
    full model step is the binding constraint, VERDICT r2 Weak #3)."""
    (xcl, ycl), (xcr, ycr), (xdr, ydr), (xdm, ydm), (xdl, ydl) = verts

    if edgearea is not None:
        # signed area of pentagon CL,CR,DR,DM,DL (shoelace)
        def shoelace(pts):
            A = 0.0
            n = len(pts)
            for i in range(n):
                x0, y0 = pts[i]
                x1, y1 = pts[(i + 1) % n]
                A = A + 0.5 * (x0 * y1 - x1 * y0)
            return A
        A0 = shoelace([(xcl, ycl), (xcr, ycr), (xdr, ydr), (xdm, ydm),
                       (xdl, ydl)])
        # flux convention: positive transport = region below the edge for
        # the CL->CR->DR->DM->DL loop = negative shoelace area
        target = -edgearea
        dAdy = 0.5 * (xdr - xdl)     # d(shoelace)/d(ydm)
        delta = jnp.where(jnp.abs(dAdy) > cst.puny,
                          (target - A0) / jnp.where(dAdy != 0.0, dAdy, 1.0),
                          0.0)
        ydm = ydm + delta

    dtype = xcl.dtype
    # region constraint constants, broadcast shape (R=6, 1, 1)
    sy = jnp.asarray([r[0] for r in _REGIONS], dtype)[:, None, None]
    col_a = {"inf": -_LARGE, "m": -0.5, "p": 0.5}
    av = jnp.asarray([col_a[r[1]] for r in _REGIONS], dtype)[:, None, None]

    # the CL->CR segment lies on the edge line y=0, where the 1-form's
    # G = x^p y^(q+1)/(q+1) vanishes identically — skip it (20% of the
    # Gauss work)
    segs = [((xcr, ycr), (xdr, ydr)),
            ((xdr, ydr), (xdm, ydm)), ((xdm, ydm), (xdl, ydl)),
            ((xdl, ydl), (xcl, ycl))]

    acc = [0.0] * len(MONO)                       # per-monomial (R, ny, nx)
    for (x0, y0), (x1, y1) in segs:
        dx = x1 - x0
        dy = y1 - y0
        # clamp to the y-halfplane then the x column, regions stacked
        lo, hi = _clamp_interval(jnp.zeros_like(sy * y0), 1.0,
                                 sy * y0, sy * y1)
        lo, hi = _clamp_interval(lo, hi, x0 - av, x1 - av)
        hi = jnp.maximum(hi, lo)                  # (R, ny, nx)
        half = 0.5 * (hi - lo)
        mid = 0.5 * (hi + lo)
        for gx, gw in zip(_GL_X, _GL_W):
            t = mid + half * gx                   # (R, ny, nx)
            x = x0 + dx * t
            y = y0 + dy * t
            w = -(gw * half) * dx                 # -dx weight of the 1-form
            xp = [jnp.ones_like(x), x, x * x, x * x * x]
            yq = [y, y * y, y * y * y, y * y * y * y]
            # moment k: w * x^p(k) * y^(q(k)+1) / (q(k)+1) — explicit
            # per-monomial products into 10 independent accumulation
            # chains; a jnp.stack per Gauss point materializes a
            # (10, R, ny, nx) temporary 15 times (~0.9 GB of HBM churn)
            for k, (p, q) in enumerate(MONO):
                acc[k] = acc[k] + w * xp[p] * yq[q] * (1.0 / (q + 1.0))
    tot = jnp.stack(acc)                          # (10, R, ny, nx)

    # per-candidate column differences then static translation matrices:
    # col -1: J_inf - J_m; col 0: J_m - J_p; col +1: J_p  (T rows use
    # regions 0..2, B rows 3..5)
    D = jnp.stack([tot[:, 0] - tot[:, 1], tot[:, 1] - tot[:, 2], tot[:, 2],
                   tot[:, 3] - tot[:, 4], tot[:, 4] - tot[:, 5], tot[:, 5]])
    return jnp.einsum("cab,cb...->ca...", jnp.asarray(_T_CAND, dtype), D)


# ---------------------------------------------------------------------------
# flux assembly (reference transport_integrals:3188)
# ---------------------------------------------------------------------------

class _TableArrays:
    """Static per-tracer index/type vectors for the vectorized chain math
    (the reference's recursive tracer dependency walks become fixed-depth
    gathers along the flat-tracer axis; depth <= 3). The table is
    type-grouped (build_flat_table), recorded as block sizes K1/K2/K3."""

    def __init__(self, table):
        self.ttype = _np.array([ft.ttype for ft in table])
        praw = _np.array([ft.parent for ft in table])
        self.has_p = praw >= 0
        self.par = _np.maximum(praw, 0)
        graw = _np.array([table[p].parent if p >= 0 else -1 for p in praw])
        self.has_g = graw >= 0
        self.gpar = _np.maximum(graw, 0)
        self.is1 = self.ttype == 1
        self.is2 = self.ttype == 2
        self.is3 = self.ttype == 3
        self.has_dep = _np.array([ft.has_dependents for ft in table])
        self.K1 = int(self.is1.sum())
        self.K2 = int(self.is2.sum())
        self.K3 = int(self.is3.sum())
        assert (_np.diff(self.ttype) >= 0).all(), \
            "flat tracer table must be type-grouped (build_flat_table)"
        # physical value rails in TRANSPORT space (qsno rows ride with the
        # +rhos*Lfresh positivity offset, state_to_tracers) — applied after
        # the chain solve; see FlatTracer.lo docstring
        off = _np.array([cst.rhos * cst.Lfresh if ft.name == "qsno" else 0.0
                         for ft in table])
        self.lo = _np.array([getattr(ft, "lo", 0.0) for ft in table]) + off
        self.hi = _np.array([getattr(ft, "hi", _np.inf) for ft in table]) + off


def _table_arrays(table):
    ta = _TableArrays(table)
    return (ta.ttype, ta.par, ta.is1, ta.is2, ta.is3)


def _onehot(idx, dtype):
    """Static one-hot (NT, NT) selection matrix: row n picks plane idx[n].
    Used as an einsum so NT-axis 'gathers' ride the MXU instead of
    lowering to slow TPU gather ops."""
    NT = len(idx)
    M = _np.zeros((NT, NT), _np.float64)
    M[_np.arange(NT), idx] = 1.0
    return jnp.asarray(M, dtype)


def _sel(M, a):
    """a[:, idx] with idx baked into the one-hot matrix M."""
    return jnp.einsum("np,cpyx->cnyx", M, a)


def _block_onehots(ta: _TableArrays, dtype):
    """Static one-hot selectors for the type-grouped blocks: P2 (K2, K1)
    parents of type-2 tracers; P3p (K3, K2) type-2 parents of type-3
    tracers (block-local); P3g (K3, K1) their type-1 grandparents."""
    K1, K2, K3 = ta.K1, ta.K2, ta.K3
    P2 = jnp.asarray(_np.eye(K1)[ta.par[K1:K1 + K2]], dtype) if K2 else None
    P3p = jnp.asarray(_np.eye(K2)[ta.par[K1 + K2:] - K1], dtype) \
        if K3 else None
    P3g = jnp.asarray(_np.eye(K1)[ta.gpar[K1 + K2:]], dtype) if K3 else None
    return P2, P3p, P3g


def _chain_product(trm, base, ta: _TableArrays):
    """Old-state chain products: base * trcr * trcr[parent] * trcr[gparent]
    per flat tracer (reference state_to_work weight chains). Uses the
    type-grouped layout: chains build block-wise with small static
    one-hot matmuls instead of two (NT, NT) gathers."""
    K1, K2, K3 = ta.K1, ta.K2, ta.K3
    P2, P3p, P3g = _block_onehots(ta, trm.dtype)
    c1 = trm[:, :K1]
    parts = [c1]
    if K2:
        c2 = trm[:, K1:K1 + K2] * _sel(P2, c1)
        parts.append(c2)
    if K3:
        # chain3 = trcr * trcr[par] * trcr[gpar] = trcr * chain2[par]
        parts.append(trm[:, K1 + K2:] * _sel(P3p, c2))
    return base[:, None] * jnp.concatenate(parts, axis=1)


def _family_fluxes(grid: Grid, moments, offsets, mc, mx, my, tc, tx, ty,
                   table, areafac, sign):
    """Sum mass and mass*tracer transports over the candidate cells.

    moments: (6, 10, ny, nx) stacked per-candidate moments (CANDS order).
    offsets: dict cand -> (dj, di) shift taking edge (j, i) to the donor.
    sign: +1/-1 mapping the signed pentagon integrals to "positive flux
    = +x/+y transport". Returns (mflx (ncat+1,...), mtflx (ncat,NT,...))
    in physical units (scaled by areafac).

    The per-tracer dependency-chain recursion of the reference
    (transport_integrals:3188) is evaluated with PRE-GATHERED parent and
    grandparent reconstructions (the moment sums commute with the NT-axis
    parent gather, so stage 2/3 become pure fused elementwise math —
    no per-candidate gathers, no second-moment temporaries: the runtime
    stays within ~1.3x of the fully unrolled per-tracer form while the
    traced graph is ~25x smaller)."""
    sh_s = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                   ftype=FIELD_TYPE_SCALAR)
    sh_v = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                   ftype=FIELD_TYPE_VECTOR)
    ta = _TableArrays(table)
    t1 = jnp.asarray(ta.is1, mc.dtype)[:, None, None]
    t2 = jnp.asarray(ta.is2, mc.dtype)[:, None, None]
    t3 = jnp.asarray(ta.is3, mc.dtype)[:, None, None]

    if tc is not None:
        # parent/grandparent reconstructions, gathered ONCE via one-hot
        # MXU matmuls (a take would lower to a slow TPU gather)
        Pp = _onehot(ta.par, mc.dtype)
        Pg = _onehot(ta.gpar, mc.dtype)
        tcp, txp, typ = _sel(Pp, tc), _sel(Pp, tx), _sel(Pp, ty)
        tcg, txg, tyg = _sel(Pg, tc), _sel(Pg, tx), _sel(Pg, ty)

    # Shift-inversion (HBM-traffic optimization): every contribution is
    # LINEAR in the donor fields, and non-tripole ghost fills are zeros
    # (f(0, M) = 0), so instead of shifting nine (ncat, NT) donor stacks
    # per candidate we back-shift the ten moment planes and forward-shift
    # the single result — ~2.5x less memory traffic. Tripole folds mix
    # mirrored donors with unmirrored moments, so they keep direct shifts.
    direct = grid.bc.tripole

    mflx = 0.0
    mtflx = 0.0
    for c, cand in enumerate(CANDS):
        dj, di = offsets[cand]
        if direct:
            M = moments[c]
            S_s = lambda a: sh_s(a, dj, di)
            S_v = lambda a: sh_v(a, dj, di)
            post = lambda u: u
        else:
            M = sh_s(moments[c], -dj, -di)
            S_s = S_v = lambda a: a
            post = lambda u: sh_s(u, dj, di)
        mc_c = S_s(mc)
        mx_c = S_v(mx)
        my_c = S_v(my)

        def mom(p, q):
            return M[MIDX[(p, q)]]

        msum = mc_c * mom(0, 0) + mx_c * mom(1, 0) + my_c * mom(0, 1)
        mflx = mflx + post(msum)

        if tc is not None:
            tc_c = S_s(tc)                              # (ncat, NT, ny, nx)
            tx_c = S_v(tx)
            ty_c = S_v(ty)
            tcp_c, txp_c, typ_c = S_s(tcp), S_v(txp), S_v(typ)
            tcg_c, txg_c, tyg_c = S_s(tcg), S_v(txg), S_v(tyg)
            mi = mc_c[1:][:, None]                      # (ncat, 1, ny, nx)
            mxi = mx_c[1:][:, None]
            myi = my_c[1:][:, None]
            mxsum = mi * mom(1, 0) + mxi * mom(2, 0) + myi * mom(1, 1)
            mysum = mi * mom(0, 1) + mxi * mom(1, 1) + myi * mom(0, 2)
            mxxsum = mi * mom(2, 0) + mxi * mom(3, 0) + myi * mom(2, 1)
            mxysum = mi * mom(1, 1) + mxi * mom(2, 1) + myi * mom(1, 2)
            myysum = mi * mom(0, 2) + mxi * mom(1, 2) + myi * mom(0, 3)
            msum_i = msum[1:][:, None]
            # materialize the 6 (ncat, 1) coefficient planes: without this
            # barrier XLA's kLoop fusion re-evaluates the whole
            # moment x mass-reconstruction chain once per NT element of
            # the broadcast product below (~127 ops/element measured on
            # v5e); the planes are ~2.5 MB each, the recompute is 25x
            (msum_i, mxsum, mysum, mxxsum, mxysum, myysum) = \
                jax.lax.optimization_barrier(
                    (msum_i, mxsum, mysum, mxxsum, mxysum, myysum))

            def m1(a, b, c_):
                """type-1 first-moment sum of a reconstruction (a,b,c)."""
                return msum_i * a + mxsum * b + mysum * c_

            # stage 1: every tracer as if type 1
            mts1 = m1(tc_c, tx_c, ty_c)
            # stage 2: parent's (type-1) moment sums contracted with this
            # tracer's reconstruction — the parent's first/second moments
            # evaluated via the pre-gathered parent reconstruction
            mts1_p = m1(tcp_c, txp_c, typ_c)
            mtx1_p = mxsum * tcp_c + mxxsum * txp_c + mxysum * typ_c
            mty1_p = mysum * tcp_c + mxysum * txp_c + myysum * typ_c
            mts2 = mts1_p * tc_c + mtx1_p * tx_c + mty1_p * ty_c
            # stage 3: type-3 upwind from the (type-2) parent, whose own
            # parent is the grandparent (reference uses only the first
            # moment sum here)
            mts1_g = m1(tcg_c, txg_c, tyg_c)
            mtx1_g = mxsum * tcg_c + mxxsum * txg_c + mxysum * tyg_c
            mty1_g = mysum * tcg_c + mxysum * txg_c + myysum * tyg_c
            mts2_p = mts1_g * tcp_c + mtx1_g * txp_c + mty1_g * typ_c
            mts3 = mts2_p * tc_c
            mts = t1 * mts1 + t2 * mts2 + t3 * mts3
            mtflx = mtflx + post(mts)

    mflx = sign * mflx * areafac[None]
    if tc is not None:
        mtflx = sign * mtflx * areafac[None, None]
    return mflx, (mtflx if tc is not None else None)


def edge_moments(grid: Grid, dxs, dys, edgearea_e=None, edgearea_n=None):
    """(mom_n, mom_e): per-candidate translated pentagon moments for the
    N and E edge families (the geometry stage shared by every flux
    engine). dxs/dys: scaled departure displacements at U points;
    edgearea_*: prescribed physical edge areas (C/CD Bentsen
    adjustment)."""
    shu = partial(shift, bc=grid.bc, loc=FIELD_LOC_NECORNER,
                  ftype=FIELD_TYPE_VECTOR)

    # ---- N edges: frame x = east, y = north; CL = U(i-1,j), CR = U(i,j)
    zeros = jnp.zeros_like(dxs)
    dxl = shu(dxs, 0, -1)
    dyl = shu(dys, 0, -1)
    v_cl = (zeros - 0.5, zeros)
    v_cr = (zeros + 0.5, zeros)
    v_dr = (0.5 + dxs, dys)
    v_dl = (-0.5 + dxl, dyl)
    v_dm = (0.5 * (v_dr[0] + v_dl[0]), 0.5 * (v_dr[1] + v_dl[1]))
    ea_n = None if edgearea_n is None else edgearea_n / grid.narea
    mom_n = pentagon_cell_moments([v_cl, v_cr, v_dr, v_dm, v_dl],
                                  edgearea=ea_n)

    # ---- E edges: frame x = north (xi), y = east (eta);
    # CL = U(i,j-1) (south end), CR = U(i,j). The sign convention is
    # frame-internal (departure on the eta<0 side => positive +eta flux),
    # so the same sign as the N family applies.
    dxb = shu(dxs, -1, 0)
    dyb = shu(dys, -1, 0)
    v_cl = (zeros - 0.5, zeros)
    v_cr = (zeros + 0.5, zeros)
    v_dr = (0.5 + dys, dxs)          # U(i,j): xi = north disp, eta = east
    v_dl = (-0.5 + dyb, dxb)
    v_dm = (0.5 * (v_dr[0] + v_dl[0]), 0.5 * (v_dr[1] + v_dl[1]))
    ea_e = None if edgearea_e is None else edgearea_e / grid.earea
    mom_e = pentagon_cell_moments([v_cl, v_cr, v_dr, v_dm, v_dl],
                                  edgearea=ea_e)
    return mom_n, mom_e


def remap_fluxes(grid: Grid, dxs, dys, mc, mx, my, tc, tx, ty, table,
                 edgearea_e=None, edgearea_n=None, flux_kernel: str = "xla",
                 tstack=None):
    """Mass/tracer transports across N and E edges (positive = north/east).

    dxs/dys: scaled departure displacements at U points. edgearea_*:
    physical prescribed edge areas (C/CD grids; Bentsen adjustment).
    flux_kernel: 'xla' (dense masked XLA path) or 'fused_pallas' (the
    one-pass TPU kernel for the tracer transports, kernels/remap_pallas)."""
    mom_n, mom_e = edge_moments(grid, dxs, dys, edgearea_e, edgearea_n)
    use_fused = flux_kernel == "fused_pallas" and tc is not None
    if not use_fused:
        # donor offsets: T row = cell (i, j+1) side (north), B row = (i, j)
        offs_n = {("T", -1): (1, -1), ("T", 0): (1, 0), ("T", 1): (1, 1),
                  ("B", -1): (0, -1), ("B", 0): (0, 0), ("B", 1): (0, 1)}
        mflxn, mtflxn = _family_fluxes(grid, mom_n, offs_n, mc, mx, my,
                                       tc, tx, ty, table,
                                       grid.narea * grid.npm, sign=-1.0)
    if use_fused:
        # the kernel produces BOTH the tracer and the mass (area)
        # transports in one pass (the open-water row rides the moment
        # buffer), so the XLA families are skipped entirely
        from ..kernels.remap_pallas import tracer_fluxes_fused
        mflxe, mflxn, mtflxe, mtflxn = tracer_fluxes_fused(
            grid, mom_n, mom_e, mc, mx, my, tc, tx, ty, table,
            tstack=tstack, interpret=flux_kernel_interpret())
    else:
        offs_e = {("T", -1): (-1, 1), ("T", 0): (0, 1), ("T", 1): (1, 1),
                  ("B", -1): (-1, 0), ("B", 0): (0, 0), ("B", 1): (1, 0)}
        mflxe, mtflxe = _family_fluxes(grid, mom_e, offs_e, mc, mx, my,
                                       tc, tx, ty, table,
                                       grid.earea * grid.epm, sign=-1.0)
    return mflxe, mflxn, mtflxe, mtflxn


def flux_kernel_interpret() -> bool:
    """Pallas interpret mode: required off-TPU (tests on the CPU
    backend exercise the kernel logic through the interpreter; the
    test conftest opts in via CICE_TPU_PALLAS_INTERPRET=1).

    An explicit 'fused_pallas' request without the opt-in never gets
    here — horizontal_remap_exact falls back to the XLA path with a
    warning instead of silently running orders-of-magnitude slower."""
    import os

    import jax
    return (jax.default_backend() != "tpu"
            and os.environ.get("CICE_TPU_PALLAS_INTERPRET") == "1")


#: VMEM budget for the fused kernel's scratch + output block (bytes).
#: v5e cores have ~16 MB VMEM; leave headroom for Mosaic's own buffers.
FUSED_VMEM_BUDGET = 12 * 1024 * 1024


def fused_kernel_eligible(grid: Grid, NT: int, dtype, *,
                          tile_y: int = 16) -> tuple:
    """(ok, reason) for the fused Pallas tracer-flux kernel.

    Checks the boundary topology (tripole/y-cyclic unsupported), dtype
    (f32 only — anything else would silently lose precision in the
    kernel's internal f32 cast), and the VMEM scratch footprint, which
    scales as O(NT*nx): with many tracers on a wide grid the three
    scratch stacks + output block exceed the ~16 MB/core VMEM and the
    Mosaic compile fails. Mirrors kernels/remap_pallas geometry."""
    import numpy as _np
    if grid.bc.tripole or grid.bc.y_cyclic:
        return False, "tripole/y-cyclic boundary"
    if _np.dtype(dtype) != _np.float32:
        return False, f"dtype {_np.dtype(dtype).name} (kernel is f32-only)"
    ny, nx = grid.shape
    TY = max(8, (tile_y // 8) * 8)
    TYW = TY + 8
    nxg = -(-(nx + 2) // 128) * 128
    scratch_planes = 3 * NT + 3 + (2 * 6 * 10 + 5)
    vmem = 4 * (scratch_planes * TYW + (2 * NT + 4) * TY) * nxg
    if vmem > FUSED_VMEM_BUDGET:
        return False, (f"VMEM footprint {vmem / 2**20:.1f} MiB "
                       f"(NT={NT}, nx={nx}) exceeds "
                       f"{FUSED_VMEM_BUDGET / 2**20:.0f} MiB budget")
    return True, ""


def fused_full_eligible(grid: Grid, NT: int, dtype, *,
                        tile_y: int = 8) -> tuple:
    """(ok, reason) for the full fused transport kernel
    (kernels/remap_pallas.transport_fused). Same topology/dtype rules as
    the flux kernel; the VMEM model is empirical — the Mosaic stack
    holds the per-window reconstruction planes and limiter temporaries,
    measured at ~(11*NT + 270) f32 plane-equivalents of (W, L) (19.97 MB
    at NT=25, W=24, L=384; fits at W=16)."""
    import numpy as _np
    if grid.bc.tripole or grid.bc.y_cyclic:
        return False, "tripole/y-cyclic boundary"
    if _np.dtype(dtype) != _np.float32:
        return False, f"dtype {_np.dtype(dtype).name} (kernel is f32-only)"
    ny, nx = grid.shape
    TY = max(8, (tile_y // 8) * 8)
    W = TY + 8
    L = -(-(nx + 6) // 128) * 128
    vmem = 4 * (11 * NT + 270) * W * L
    budget = 15 * 1024 * 1024
    if vmem > budget:
        return False, (f"VMEM estimate {vmem / 2**20:.1f} MiB "
                       f"(NT={NT}, nx={nx}) exceeds "
                       f"{budget / 2**20:.0f} MiB")
    return True, ""


# ---------------------------------------------------------------------------
# update (reference update_fields:3480)
# ---------------------------------------------------------------------------

def update_fields(grid: Grid, am, trm, mflxe, mflxn, mtflxe, mtflxn, table):
    """Flux-form update of mass and tracers; returns (am, trm, neg_flag).

    The per-tracer dependency recursion is evaluated as 3 staged
    NT-vectorized expressions (type 1, then 2, then 3) with static
    parent-index gathers, matching the reference's new-value chain
    denominators (update_fields:3480)."""
    she = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                  ftype=FIELD_TYPE_SCALAR)
    div = lambda fe, fn: (fe - she(fe, 0, -1) + fn - she(fn, -1, 0))
    ta = _TableArrays(table)
    K1, K2, K3 = ta.K1, ta.K2, ta.K3
    P2, P3p, P3g = _block_onehots(ta, trm.dtype)

    # old mass*tracer chain products
    prods = _chain_product(trm, am[1:], ta)

    am_new = am - div(mflxe, mflxn) * grid.tarear[None]
    tmask = grid.tmask
    neg = jnp.any((am_new < -cst.puny) & tmask[None])
    am_new = jnp.where(tmask[None], jnp.maximum(am_new, 0.0), 0.0)

    mm = am_new[1:][:, None]
    # weight-chain floors at puny (reference work_to_state ->
    # icepack_compute_tracers: tracer defined only where its full weight
    # chain exceeds puny, else zero) — `denom != 0` alone lets an f32
    # chain of 1e-20 through, and the signed-fragment ratio at such a
    # denominator amplifies without bound (round-5 annual-run collapse)
    mm_pos = mm > cst.puny
    num = prods - div(mtflxe, mtflxn) * grid.tarear[None, None]

    def solve(numb, denom, ok):
        return jnp.where(ok, numb /
                         jnp.where(denom != 0.0, denom, 1.0), 0.0)

    # new-value chains solve block-wise on the type-grouped layout
    # (each stage's parents live in an earlier block — contiguous
    # slices + small static one-hot matmuls, no (NT, NT) gathers)
    # stage 1: no parent
    val1 = solve(num[:, :K1], mm, mm_pos)
    parts = [val1]
    # stage 2: one (type-1) parent
    if K2:
        tp = _sel(P2, val1)
        val2 = solve(num[:, K1:K1 + K2], mm * tp,
                     mm_pos & (jnp.abs(tp) > cst.puny))
        parts.append(val2)
    # stage 3: type-2 parent + type-1 grandparent
    if K3:
        tp2 = _sel(P3p, val2)
        gp = _sel(P3g, val1)
        val3 = solve(num[:, K1 + K2:], mm * tp2 * gp,
                     mm_pos & (jnp.abs(tp2) > cst.puny) &
                     (jnp.abs(gp) > cst.puny))
        parts.append(val3)
    trm_new = jnp.concatenate(parts, axis=1)
    # physical range rail (registry TracerSpec.lo/hi, transport space)
    trm_new = jnp.clip(trm_new,
                       jnp.asarray(ta.lo, trm.dtype)[None, :, None, None],
                       jnp.asarray(ta.hi, trm.dtype)[None, :, None, None])
    return am_new, trm_new, neg


# ---------------------------------------------------------------------------
# checks (reference ice_transport_driver: global_conservation:1124,
# local_max_min / quasilocal_max_min / check_monotonicity:1360-1493)
# ---------------------------------------------------------------------------

def global_sums(grid: Grid, am, trm, table):
    """Σ area and Σ area*tracer-chain-product over the domain per category."""
    w = grid.tarea * grid.hm
    asum = jnp.sum(am * w[None], axis=(-2, -1))
    pr = _chain_product(trm, am[1:], _TableArrays(table))
    prods = jnp.sum(pr * w[None, None], axis=(-2, -1))
    return asum, prods                          # (ncat+1,), (ncat, NT)


def monotonicity_bounds(grid: Grid, am, trm, table):
    """Local min/max of each tracer over the 3x3 neighborhood (masked),
    then widened by one more ring (reference quasilocal_max_min)."""
    bc = grid.bc
    sh = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)
    aim = (am[1:] > cst.puny).astype(trm.dtype)
    # tracer "present" where the full weight chain is nonzero
    ta = _TableArrays(table)
    p1 = jnp.take(trm, jnp.asarray(ta.par), axis=1)
    p2 = jnp.take(trm, jnp.asarray(ta.gpar), axis=1)
    m1 = jnp.asarray(ta.has_p, trm.dtype)[:, None, None]
    m2 = jnp.asarray(ta.has_g, trm.dtype)[:, None, None]
    ok1 = m1 * (jnp.abs(p1) > cst.puny).astype(trm.dtype) + (1.0 - m1)
    ok2 = m2 * (jnp.abs(p2) > cst.puny).astype(trm.dtype) + (1.0 - m2)
    tmask_t = aim[:, None] * ok1 * ok2

    big = jnp.asarray(1e30, trm.dtype)
    tmn = jnp.where(tmask_t > 0.5, trm, big)
    tmx = jnp.where(tmask_t > 0.5, trm, -big)
    for _ in range(2):   # 3x3 then one more ring (quasilocal)
        mn, mx = tmn, tmx
        for (dj, di) in ((0, 1), (0, -1), (1, 0), (-1, 0),
                         (1, 1), (1, -1), (-1, 1), (-1, -1)):
            mn = jnp.minimum(mn, sh(tmn, dj, di,))
            mx = jnp.maximum(mx, sh(tmx, dj, di,))
        tmn, tmx = mn, mx
    tmn = jnp.where(tmn > 0.5 * big, 0.0, tmn)
    tmx = jnp.where(tmx < -0.5 * big, 0.0, tmx)
    return tmn, tmx


def check_monotonicity(tmin, tmax, am_new, trm_new, table, tol=None):
    """True if any updated tracer escapes its local bounds (masked).

    Tolerance is relative like the reference (w*puny with w = max(1,
    |bound|), ice_transport_driver.F90:1463-1475) but wider: the signed
    departure-region decomposition shared with the reference does not
    guarantee exact bounds when swept quads cross (the reference hardcodes
    l_monotonicity_check = .false.; we expose it as an optional rail)."""
    if tol is None:
        tol = 1e4 * cst.puny
    # mass floor: tracer ratios in cells with vanishing area amplify the
    # signed-fragment roundoff of the division (prod/weight); below ~1e-5
    # area fraction the ratio check is pure noise
    alive = am_new[1:] > 1e6 * cst.puny
    w_lo = jnp.maximum(1.0, jnp.abs(tmin)) * tol
    w_hi = jnp.maximum(1.0, jnp.abs(tmax)) * tol
    viol = ((trm_new < tmin - w_lo) | (trm_new > tmax + w_hi)) & \
        alive[:, None]
    return jnp.any(viol)


# ---------------------------------------------------------------------------
# top-level driver (reference horizontal_remap:3077 + transport_remap:252)
# ---------------------------------------------------------------------------

def horizontal_remap_exact(grid: Grid, state: State, registry, Tf, dt,
                           grid_ice: str = "B", l_dp_midpt: bool = False,
                           conserv_check: bool = False,
                           monotonicity_check: bool = False,
                           flux_kernel: str = "xla", tile_y: int = 8):
    """Exact incremental remapping of the full ice state.

    Returns (new_state, diag) where diag carries jnp scalars:
    'oob' departure out of bounds, 'neg_mass', 'mono_violation',
    'cons_err_area', 'cons_err_tracer' (relative errors; 0 when checks
    off). Host-side code (model driver watchdog) raises on flags."""
    table = build_flat_table(registry)
    am, trm = state_to_tracers(state, registry, table)

    if grid_ice in ("C", "CD") and state.uvelE is not None:
        # corner velocities for trajectories; Bentsen edge areas from the
        # prognostic face velocities (reference horizontal_remap:629-668)
        shE = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                      ftype=FIELD_TYPE_VECTOR)
        ucorn = 0.5 * (state.uvelE + shE(state.uvelE, 1, 0))
        vcorn = 0.5 * (state.vvelN + shE(state.vvelN, 0, 1))
        edgearea_e = state.uvelE * grid.HTE * dt
        edgearea_n = state.vvelN * grid.HTN * dt
    else:
        ucorn, vcorn = state.uvel, state.vvel
        edgearea_e = edgearea_n = None

    dxs, dys, oob = departure_points_scaled(grid, ucorn, vcorn, dt,
                                            l_dp_midpt)

    if conserv_check:
        asum0, atsum0 = global_sums(grid, am, trm, table)
    if monotonicity_check:
        tmn, tmx = monotonicity_bounds(grid, am, trm, table)

    if flux_kernel not in ("xla", "fused_pallas", "fused_full"):
        raise ValueError(f"flux_kernel={flux_kernel!r}: expected 'xla', "
                         "'fused_pallas' or 'fused_full' ('auto' resolves "
                         "in model/step)")
    if flux_kernel in ("fused_pallas", "fused_full"):
        import warnings

        import jax as _jax
        elig = (fused_full_eligible if flux_kernel == "fused_full"
                else fused_kernel_eligible)
        ok, why = elig(grid, len(table), trm.dtype)
        if not ok:
            warnings.warn(f"remap {flux_kernel} kernel unavailable ({why});"
                          " falling back to the XLA tracer-flux path")
            flux_kernel = "xla"
        elif (_jax.default_backend() != "tpu"
              and not flux_kernel_interpret()):
            warnings.warn(
                f"remap_kernel={flux_kernel!r} on a non-TPU backend would "
                "run through the Pallas interpreter (orders of magnitude "
                "slower); falling back to the XLA path. Set "
                "CICE_TPU_PALLAS_INTERPRET=1 to force interpret mode.")
            flux_kernel = "xla"

    if flux_kernel == "fused_full":
        # one-pass kernel: reconstruction + fluxes + update fused; only
        # the geometry (edge moments) stays in XLA
        from ..kernels.remap_pallas import transport_fused
        mom_n, mom_e = edge_moments(grid, dxs, dys, edgearea_e,
                                    edgearea_n)
        am_pre, trm_new = transport_fused(
            grid, mom_n, mom_e, am, trm, table, tile_y=tile_y,
            interpret=flux_kernel_interpret())
        tmask = grid.tmask
        neg = jnp.any((am_pre < -cst.puny) & tmask[None])
        am_new = jnp.where(tmask[None], jnp.maximum(am_pre, 0.0), 0.0)
    else:
        mc, mx, my, tc, tx, ty, tstack = construct_fields(grid, am, trm,
                                                          table, grid.hm)
        mflxe, mflxn, mtflxe, mtflxn = remap_fluxes(
            grid, dxs, dys, mc, mx, my, tc, tx, ty, table,
            edgearea_e=edgearea_e, edgearea_n=edgearea_n,
            flux_kernel=flux_kernel, tstack=tstack)

        am_new, trm_new, neg = update_fields(grid, am, trm, mflxe, mflxn,
                                             mtflxe, mtflxn, table)

    diag = {"oob": oob, "neg_mass": neg}
    if conserv_check:
        asum1, atsum1 = global_sums(grid, am_new, trm_new, table)
        scale_a = jnp.maximum(jnp.abs(asum0), 1.0)
        scale_t = jnp.maximum(jnp.abs(atsum0), 1e-6 * jnp.max(
            jnp.abs(atsum0), initial=1.0))
        diag["cons_err_area"] = jnp.max(jnp.abs(asum1 - asum0) / scale_a)
        diag["cons_err_tracer"] = jnp.max(jnp.abs(atsum1 - atsum0) / scale_t)
    else:
        diag["cons_err_area"] = jnp.zeros((), am.dtype)
        diag["cons_err_tracer"] = jnp.zeros((), am.dtype)
    if monotonicity_check:
        diag["mono_violation"] = check_monotonicity(tmn, tmx, am_new,
                                                    trm_new, table)
    else:
        diag["mono_violation"] = jnp.zeros((), bool)

    new_state = tracers_to_state(am_new, trm_new, state, registry,
                                 grid.tmask, Tf, table)
    return new_state, diag
