"""Incremental remapping transport — dense TPU reformulation.

Re-implementation of the reference's high-order advection
(cicecore/cicedyn/dynamics/ice_transport_remap.F90: `construct_fields`:1009,
`limited_gradient`:1295, `departure_points`:1449, `locate_triangles`:1633,
`transport_integrals`:3188, `update_fields`:3480 — Dukowicz & Baumgardner
2000; Lipscomb & Hunke 2004). The reference enumerates departure-region
triangles into per-cell groups with ~1400 lines of branchy geometry; that
scalar control flow is hostile to XLA. The TPU-native reformulation keeps
the *same mathematical construction* but evaluates it densely:

 1. van-Leer-limited linear reconstruction of every transported density in
    every cell (one stencil op over the packed (narr, ny, nx) array);
 2. backward trajectories of the B-grid cell corners (departure points);
 3. per edge (E and N), the swept region is the quadrilateral bounded by
    the edge and the two corner trajectories. Because adjacent edges share
    corner trajectories, these quads exactly tile each cell's departure
    region — the same decomposition as the reference;
 4. each quad splits into 2 *signed* triangles; a 3-point edge-midpoint
    quadrature rule (exact for quadratics) integrates the reconstruction.
    Each quadrature point selects its donor cell densely (6 candidate
    cells per edge — u-side x two, v-side x three) via `jnp.where` masks
    instead of triangle-group branching. Sub-cell triangle clipping is
    thereby replaced by quadrature-point cell assignment (error O(h^3) at
    CFL<1, same order as the scheme).
 5. flux-form update: exactly conservative by construction; the van Leer
    limiter keeps the reconstruction bounded (monotone up to the corner
    quadrature approximation).

Geometry is evaluated in edge-local metric coordinates with the local cell
spacings (dxT/dyT); metric variation across one cell is neglected in the
quadrature (consistent with the reference's use of a locally-flat
T-cell frame, ice_transport_remap.F90 triangle_coordinates).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_EFACE, FIELD_LOC_NFACE,
                         FIELD_LOC_NECORNER, FIELD_TYPE_SCALAR,
                         FIELD_TYPE_VECTOR)
from ..core.grid import Grid
from ..core.halo import shift


def limited_gradient(grid: Grid, m):
    """Van-Leer limited gradient of a packed (narr, ny, nx) density field
    (reference limited_gradient:1295): per direction, the harmonic mean of
    one-sided differences, zero at extrema."""
    shc = partial(shift, bc=grid.bc, loc=FIELD_LOC_CENTER,
                  ftype=FIELD_TYPE_SCALAR)
    m_e = shc(m, 0, 1)
    m_w = shc(m, 0, -1)
    m_n = shc(m, 1, 0)
    m_s = shc(m, -1, 0)

    def vl(dup, ddn, dl):
        prod = dup * ddn
        s = jnp.where(prod > 0.0,
                      2.0 * prod / jnp.where(prod > 0.0, dup + ddn, 1.0), 0.0)
        return s / dl

    mx = vl(m - m_w, m_e - m, grid.dxT[None])
    my = vl(m - m_s, m_n - m, grid.dyT[None])
    return mx, my


def departure_points(grid: Grid, uvel, vvel, dt):
    """Backward corner trajectories (departure_points:1449): displacement
    of each B-grid corner (U point), clipped to one cell (CFL guard)."""
    dx = -uvel * dt
    dy = -vvel * dt
    dx = jnp.clip(dx, -0.95 * grid.dxU, 0.95 * grid.dxU)
    dy = jnp.clip(dy, -0.95 * grid.dyU, 0.95 * grid.dyU)
    return dx, dy


def _eval_reconstruction(m, mx, my, shifts, xq, yq, xc, yc, sel):
    """Evaluate the donor-cell reconstruction at quadrature point (xq, yq)
    given precomputed shifted fields and the dense candidate-selection
    masks. shifts: dict offset->(m, mx, my); xc/yc: candidate cell-center
    coordinates in the edge frame; sel: offset->bool mask."""
    val = jnp.zeros_like(m)
    for off, (mo, mxo, myo) in shifts.items():
        w = sel[off]
        val = val + jnp.where(
            w[None], mo + mxo * (xq - xc[off])[None] +
            myo * (yq - yc[off])[None], 0.0)
    return val


def _edge_flux(grid: Grid, m, mx, my, p1x, p1y, p2x, p2y, d1x, d1y,
               d2x, d2y, orient: str):
    """Signed transported integral across one edge family.

    Edge frame: origin at the edge midpoint; +x toward the cell on the
    "high" side (east for E edges, north for N edges after the coordinate
    swap). p1/p2: edge endpoints; d1/d2: their departure displacements.
    Returns flux with positive sign = transport toward +x side... i.e. the
    amount of density crossing in the -x->+x direction times area.
    """
    bc = grid.bc
    shc = partial(shift, bc=bc, loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR)

    if orient == "E":
        dxl = grid.dxT
        dyl = grid.dyT
        # candidate donor cells: (io, jo), io=0 home (west of edge), 1 east
        offs = [(0, 0), (1, 0), (0, -1), (1, -1), (0, 1), (1, 1)]
        def cell_center(off):
            io, jo = off
            return ((io - 0.5) * dxl, jo * dyl)
        def do_shift(a, off):
            io, jo = off
            return shc(a, jo, io)
    else:  # N edge: swap roles, +x = north
        dxl = grid.dyT
        dyl = grid.dxT
        offs = [(0, 0), (1, 0), (0, -1), (1, -1), (0, 1), (1, 1)]
        def cell_center(off):
            io, jo = off
            return ((io - 0.5) * dxl, jo * dyl)
        def do_shift(a, off):
            io, jo = off            # io: +1 = north neighbor, jo: +1 = east
            return shc(a, io, jo)

    shifts = {}
    xc = {}
    yc = {}
    for off in offs:
        shifts[off] = (do_shift(m, off), do_shift(mx, off), do_shift(my, off))
        cx, cy = cell_center(off)
        xc[off] = cx
        yc[off] = cy

    # triangle decomposition of the swept quad p1 -> p2 -> p2d -> p1d:
    # T1 = (p1, p2, p1d), T2 = (p2, p2d, p1d); signed areas handle
    # direction reversal and crossed quads (Dukowicz & Baumgardner).
    q1x, q1y = p1x + d1x, p1y + d1y     # departure of endpoint 1
    q2x, q2y = p2x + d2x, p2y + d2y

    def tri_signed_area(ax, ay, bx, by, cx_, cy_):
        return 0.5 * ((bx - ax) * (cy_ - ay) - (cx_ - ax) * (by - ay))

    flux = 0.0
    for (ax, ay, bx, by, cx_, cy_) in (
            (p1x, p1y, p2x, p2y, q1x, q1y),
            (p2x, p2y, q2x, q2y, q1x, q1y)):
        A = tri_signed_area(ax, ay, bx, by, cx_, cy_)
        # interior 3-point rule (barycentric (2/3,1/6,1/6) permutations),
        # weight A/3 each, exact for quadratics; points are strictly inside
        # the triangle so each lands on the correct donor side of the edge
        pts = []
        for (wa, wb, wc) in ((2/3, 1/6, 1/6), (1/6, 2/3, 1/6),
                             (1/6, 1/6, 2/3)):
            pts.append((wa * ax + wb * bx + wc * cx_,
                        wa * ay + wb * by + wc * cy_))
        for (xq, yq) in pts:
            # dense donor-cell selection: x side / y band
            sel = {}
            for off in offs:
                io, jo = off
                in_x = (xq < 0.0) if io == 0 else (xq >= 0.0)
                lo = (jo - 0.5) * dyl
                hi = (jo + 0.5) * dyl
                in_y = (yq >= lo) & (yq < hi)
                sel[off] = in_x & in_y
            val = _eval_reconstruction(m, mx, my, shifts, xq, yq, xc, yc,
                                       sel)
            flux = flux + (A / 3.0)[None] * val
    # the p1->p2->q2->q1 loop runs clockwise for transport toward +x
    # (verified for uniform u>0: signed area = -u dt dy), so negate.
    return -flux


def horizontal_remap(grid: Grid, work, uvel, vvel, dt, *, grid_ice="B",
                     uvelE=None, vvelN=None):
    """Incremental-remapping update of the packed (narr, ny, nx) densities
    (reference horizontal_remap:317)."""
    mx, my = limited_gradient(grid, work)

    shu = partial(shift, bc=grid.bc, loc=FIELD_LOC_NECORNER,
                  ftype=FIELD_TYPE_VECTOR)
    if grid_ice in ("C", "CD") and uvelE is not None:
        # C grid: corner velocities from face-velocity averages
        she = partial(shift, bc=grid.bc, loc=FIELD_LOC_EFACE,
                      ftype=FIELD_TYPE_VECTOR)
        shn = partial(shift, bc=grid.bc, loc=FIELD_LOC_NFACE,
                      ftype=FIELD_TYPE_VECTOR)
        ucorn = 0.5 * (uvelE + she(uvelE, 1, 0))
        vcorn = 0.5 * (vvelN + shn(vvelN, 0, 1))
    else:
        ucorn, vcorn = uvel, vvel
    dxp, dyp = departure_points(grid, ucorn * grid.uvm, vcorn * grid.uvm, dt)

    # --- E edges ---------------------------------------------------------
    # endpoints: north end = U(i,j) at (0, +dy/2); south end = U(i,j-1)
    dyT = grid.dyT
    dxT = grid.dxT
    d1x_E, d1y_E = dxp, dyp                               # U(i,j)
    d2x_E = shu(dxp, -1, 0)
    d2y_E = shu(dyp, -1, 0)                               # U(i,j-1)
    zeros = jnp.zeros_like(dxT)
    fe = _edge_flux(grid, work, mx, my,
                    zeros, +0.5 * dyT, zeros, -0.5 * dyT,
                    d1x_E, d1y_E, d2x_E, d2y_E, "E")
    fe = fe * grid.epm[None]

    # --- N edges ---------------------------------------------------------
    # swap frame: +x = north. endpoints: east end = U(i,j) at (0, +dx/2)
    # (its frame-y is the geographic x), west end = U(i-1,j).
    d1x_N, d1y_N = dyp, dxp                               # U(i,j) swapped
    d2x_N = shu(dyp, 0, -1)
    d2y_N = shu(dxp, 0, -1)                               # U(i-1,j)
    fn = _edge_flux(grid, work, my, mx,
                    zeros, +0.5 * dxT, zeros, -0.5 * dxT,
                    d1x_N, d1y_N, d2x_N, d2y_N, "N")
    fn = fn * grid.npm[None]

    fw = shift(fe, 0, -1, bc=grid.bc, loc=FIELD_LOC_EFACE,
               ftype=FIELD_TYPE_SCALAR)
    fs = shift(fn, -1, 0, bc=grid.bc, loc=FIELD_LOC_NFACE,
               ftype=FIELD_TYPE_SCALAR)
    return work - (fe - fw + fn - fs) * grid.tarear[None]
