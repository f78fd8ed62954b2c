"""Wide-halo shard_map EVP: k subcycles per halo exchange on a device mesh.

The reference pays one MPI halo exchange per EVP subcycle (ndte=120..240 per
dynamics step, ice_dyn_evp.F90:908 — SURVEY.md §3.3 "the scaling-critical
exchange"). Under plain GSPMD the XLA fori_loop in dynamics/evp.py inherits
the same ratio: every `shift` inside the subcycle body lowers to a
collective-permute, so a sharded step still crosses ICI ndte times. On a
multi-chip mesh the per-subcycle latency term — not bandwidth — bounds strong
scaling (SURVEY.md §7.3 item 5).

This module is the explicit-communication alternative: `shard_map` over a
("Y","X") mesh where each device keeps its tile plus an H-wide halo ring,
runs k subcycles entirely locally (the halo provides the dependency cone:
one EVP subcycle's u-update reads u through stress at a net radius of ONE
ring per side — strain rates consume the {0,-1} corner shifts, the stress
divergence the {0,+1} gathers — so H = k rings buy k exchange-free
subcycles), then refreshes the halo with ONE two-stage ppermute exchange.
ICI latency per subcycle drops by k at the cost of an
O(k·(perimeter/area)) redundant-compute halo — the wide-halo trade the
reference documents but never exercises (ug_implementation.rst:215-217).
Interior results are exactly the single-device sequence (BFB: identical ops
on identical values; tests/test_evp_wide.py asserts it).

Boundary semantics ride the exchange for free: `jax.lax.ppermute` fills
devices that receive no message with zeros, which IS the reference's
open/closed outer-halo rule (ice_boundary.F90:1179-1183 — outer halos never
filled, state halos start at zero); cyclic edges add the wrap pair to the
permutation. Tripole northern seams are served by a third ppermute between
x-mirrored devices applying the 180-degree fold rules per plane (FoldMeta:
vector sign flips, diagonal stress-corner swaps — the reference's
ice_HaloUpdate_stress _1<->_3/_2<->_4 pairing — and signed metric-partner
swaps); the final strint diagnostic is assembled globally so the seam row
matches the GSPMD path bit-for-bit per BC family
(tests/test_evp_wide.py::test_tripole_fold_matches_gspmd).

This composes with the fused Pallas kernel (single-chip HBM locality) — the
kernel can run *inside* the shard_map body — but the two optimizations are
independent; here the inner chunk is the plain XLA loop, which at per-device
tile sizes is fusion-bound anyway (see evp_pallas.py header measurements).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.grid import Grid
from ..core.halo import BC
from ..dynamics.common import DynPrep, EvpParams, stepu_dense

N_CONST = 26
N_STATE = 14


def _pack_const(grid: Grid, prep: DynPrep, strength, DminTarea, uocn, vocn,
                dtype):
    """Stack every per-point constant of the subcycle loop as one
    (N_CONST, ny, nx) array (same layout as kernels/evp_pallas.py, but in
    the caller's dtype so f64 oracle tests stay exact)."""
    f = lambda x: x.astype(dtype)
    planes = [
        f(grid.dxT), f(grid.dyT), f(grid.cxm), f(grid.cxp), f(grid.cym),
        f(grid.cyp), f(grid.dxhy), f(grid.dyhx), f(grid.uarear),
        prep.iceTmask.astype(dtype), prep.iceUmask.astype(dtype),
        f(prep.aiU), f(prep.umassdti), f(prep.fm), f(prep.waterx),
        f(prep.watery), f(prep.forcex), f(prep.forcey), f(prep.uvel_init),
        f(prep.vvel_init), f(prep.Cw), f(prep.TbU),
        f(strength), f(DminTarea), f(uocn), f(vocn),
    ]
    assert len(planes) == N_CONST
    return jnp.stack(planes)


def _unpack_const(c, bc: BC):
    g = SimpleNamespace(
        dxT=c[0], dyT=c[1], cxm=c[2], cxp=c[3], cym=c[4], cyp=c[5],
        dxhy=c[6], dyhx=c[7], uarear=c[8], bc=bc)
    prep = DynPrep(
        iceTmask=c[9] > 0.5, iceUmask=c[10] > 0.5, aiU=c[11],
        umassdti=c[12], fm=c[13], waterx=c[14], watery=c[15],
        forcex=c[16], forcey=c[17], uvel_init=c[18], vvel_init=c[19],
        uvel=c[18], vvel=c[19], Cw=c[20], TbU=c[21])
    return g, prep, c[22], c[23], c[24], c[25]


class FoldMeta:
    """Per-plane tripole fold rules for a (C, ny, nx) packed stack.

    The tripole seam glues the northern edge to itself rotated by 180
    degrees (ug_implementation.rst:279-380): vectors flip BOTH components,
    rank-2 stress components are invariant (R = -I), corner-indexed stress
    planes swap diagonal partners (NE<->SW, NW<->SE), and the one-sided
    metric combos swap with sign (cxp<->-cxm, cyp<->-cym, dxhy/dyhx
    negate). `partner[c]` is the source plane index, `sign[c]` the factor,
    `pshift[c]` = P - nx of the mirror pivot i -> (P - i) mod nx
    (ice_boundary.F90:7910-9052 index rules as encoded in
    core/halo.py:_tripole_ghost_rows), `row_corner[c]` selects the
    fold-row convention (True: ghost ny-1+k <- ny-1-k; False: <- ny-k)."""

    def __init__(self, partner, sign, pshift, row_corner):
        import numpy as np
        self.partner = np.asarray(partner)
        self.sign = np.asarray(sign, np.float64)
        self.pshift = np.asarray(pshift)
        self.row_corner = np.asarray(row_corner, bool)


def _fold_fill(z, strip, H: int, ly: int, lx: int, py: int, px: int,
               meta: FoldMeta, ax_y: str, ax_x: str):
    """Overwrite the north halo rows of top-row devices with the tripole
    fold of `strip` (the mirror device's top H+1 interior rows, full local
    width, halos already valid)."""
    C, _, W = strip.shape
    mirror = [(i, px - 1 - i) for i in range(px)]
    strip = jax.lax.ppermute(strip, ax_x, mirror)
    strip = jnp.take(strip, jnp.asarray(meta.partner), axis=0) * \
        jnp.asarray(meta.sign, strip.dtype)[:, None, None]
    # column mirror: ghost local col p <- strip col (W + pshift - p); the
    # single mod-wrapped cell per corner-pivot plane lands in a halo
    # column, which the trailing X-stage overwrites with correct data
    p = jnp.arange(W)
    cols = (W + jnp.asarray(meta.pshift)[:, None] - p[None, :]) % W  # (C,W)
    strip = jnp.take_along_axis(
        strip, jnp.broadcast_to(cols[:, None, :], strip.shape), axis=2)
    # row selection: strip row r holds global row ny-1-H+r
    ghost = []
    for k in range(1, H + 1):
        rsel = jnp.where(jnp.asarray(meta.row_corner), H - k, H + 1 - k)
        row = jnp.take_along_axis(
            strip, jnp.broadcast_to(rsel[:, None, None], (C, 1, W)), axis=1)
        ghost.append(row[:, 0])
    ghost = jnp.stack(ghost, axis=1)                     # (C, H, W)
    is_top = jax.lax.axis_index(ax_y) == py - 1
    cur = z[:, H + ly:, :]
    return z.at[:, H + ly:, :].set(jnp.where(is_top, ghost, cur))


def halo_exchange(z, H: int, py: int, px: int, *, y_cyclic: bool,
                  x_cyclic: bool, ax_y: str = "Y", ax_x: str = "X",
                  fold_meta: FoldMeta = None, ly: int = 0, lx: int = 0):
    """Refresh the H-wide halo ring of a (C, ly+2H, lx+2H) local tile from
    mesh neighbors. Two-stage (Y rows first, then X columns spanning the
    freshly filled Y halos) so corner halos carry the diagonal neighbor's
    data — the standard corner-completion trick, replacing the reference's
    20-direction neighbor messaging (ice_blocks.F90:59-88).

    Non-cyclic global edges: the edge device is absent from the permutation,
    ppermute delivers zeros ⇒ open/closed ghost semantics exactly.

    With `fold_meta`, the tripole northern seam is served by a third
    ppermute between x-mirrored devices (ice_HaloMsgCreate's fold
    messaging, ice_boundary.F90:7910-9052) followed by one more X-stage so
    the folded rows' corner halos are consistent."""

    def x_stage(z):
        east = [(i, i + 1) for i in range(px - 1)]
        west = [(i + 1, i) for i in range(px - 1)]
        if x_cyclic:
            east += [(px - 1, 0)]
            west += [(0, px - 1)]
        from_west = jax.lax.ppermute(z[:, :, -2 * H:-H], ax_x, east)
        from_east = jax.lax.ppermute(z[:, :, H:2 * H], ax_x, west)
        return z.at[:, :, :H].set(from_west).at[:, :, -H:].set(from_east)

    north = [(i, i + 1) for i in range(py - 1)]
    south = [(i + 1, i) for i in range(py - 1)]
    if y_cyclic:
        north += [(py - 1, 0)]
        south += [(0, py - 1)]
    from_south = jax.lax.ppermute(z[:, -2 * H:-H, :], ax_y, north)
    from_north = jax.lax.ppermute(z[:, H:2 * H, :], ax_y, south)
    z = z.at[:, :H, :].set(from_south).at[:, -H:, :].set(from_north)

    z = x_stage(z)
    if fold_meta is not None:
        strip = z[:, ly - 1:H + ly, :]   # global rows ny-1-H .. ny-1
        z = _fold_fill(z, strip, H, ly, lx, py, px, fold_meta, ax_y, ax_x)
        z = x_stage(z)
    return z


def _b_fold_metas(ns_kind: str):
    """FoldMeta pairs (const, state) for the B-grid packed stacks.

    Plane classes: T-centered scalars fold with the center pivot;
    U-corner quantities with the corner pivot; U vectors flip sign (180
    degree rotation flips both components); the one-sided metric combos
    swap signed partners; corner-indexed stress planes swap diagonal
    corners (NE<->SW, NW<->SE) with invariant values."""
    tfold = ns_kind == "tripoleT"
    pc = 0 if tfold else -1       # center pivot: i -> (nx+pc - i) mod nx
    pu = -1 if tfold else -2      # corner pivot
    rc = True                     # corner fold-row rule (ny-1-k)
    rt = True if tfold else False  # center fold-row rule (T-fold: ny-1-k)

    # (partner_offset_or_None, sign, corner?) per const plane
    CONST = [
        ("dxT", None, 1, 0), ("dyT", None, 1, 0),
        ("cxm", +1, -1, 0), ("cxp", -1, -1, 0),
        ("cym", +1, -1, 0), ("cyp", -1, -1, 0),
        ("dxhy", None, -1, 0), ("dyhx", None, -1, 0),
        ("uarear", None, 1, 1), ("iceTmask", None, 1, 0),
        ("iceUmask", None, 1, 1), ("aiU", None, 1, 1),
        ("umassdti", None, 1, 1), ("fm", None, 1, 1),
        ("waterx", None, -1, 1), ("watery", None, -1, 1),
        ("forcex", None, -1, 1), ("forcey", None, -1, 1),
        ("uvel_init", None, -1, 1), ("vvel_init", None, -1, 1),
        ("Cw", None, 1, 1), ("TbU", None, 1, 1),
        ("strength", None, 1, 0), ("DminTarea", None, 1, 0),
        ("uocn", None, -1, 1), ("vocn", None, -1, 1),
    ]
    partner = [i + (off or 0) for i, (_, off, _s, _c) in enumerate(CONST)]
    sign = [s for (_, _o, s, _c) in CONST]
    corner = [c for (_, _o, _s, c) in CONST]
    cmeta = FoldMeta(partner, sign,
                     [pu if c else pc for c in corner],
                     [rc if c else rt for c in corner])

    # state: u, v, sp1..4, sm1..4, s121..4 (corner order NE, NW, SW, SE)
    swap = {0: 2, 1: 3, 2: 0, 3: 1}   # NE<->SW, NW<->SE
    s_partner = [0, 1] + [2 + swap[i] for i in range(4)] + \
        [6 + swap[i] for i in range(4)] + [10 + swap[i] for i in range(4)]
    s_sign = [-1, -1] + [1] * 12
    s_corner = [1, 1] + [0] * 12
    smeta = FoldMeta(s_partner, s_sign,
                     [pu if c else pc for c in s_corner],
                     [rc if c else rt for c in s_corner])
    return cmeta, smeta


def evp_solve_wide(grid: Grid, p: EvpParams, prep: DynPrep, strength,
                   stressp, stressm, stress12, *, uocn, vocn, mesh,
                   k_fuse: int = 8):
    """Drop-in replacement for dynamics.evp.evp_solve running k_fuse
    subcycles per halo exchange on `mesh`. Tripole northern seams are
    served in-exchange by fold messaging between x-mirrored devices
    (ice_boundary.F90:7910-9052 semantics). Returns the same 9-tuple."""
    from ..dynamics.evp import evp_solve, stress_update
    from .. import constants as cst

    if mesh is None:
        return evp_solve(grid, p, prep, strength, stressp, stressm,
                         stress12, uocn=uocn, vocn=vocn)

    py, px = mesh.shape["Y"], mesh.shape["X"]
    ny, nx = grid.shape
    assert ny % py == 0 and nx % px == 0, (ny, nx, py, px)
    ly, lx = ny // py, nx // px
    # one halo ring per fused subcycle; cap below the tile size so the
    # exchanged slab never overruns the neighbor's interior
    k = max(1, min(k_fuse, p.ndte, ly - 1, lx - 1))
    H = k

    dtype = prep.uvel.dtype
    DminTarea = (p.deltaminEVP * grid.tarea).astype(dtype)
    zero3 = lambda s: jnp.where(prep.iceTmask[None], s, 0.0)
    const = _pack_const(grid, prep, strength, DminTarea, uocn, vocn, dtype)
    state = jnp.concatenate([
        prep.uvel[None].astype(dtype), prep.vvel[None].astype(dtype),
        zero3(stressp).astype(dtype), zero3(stressm).astype(dtype),
        zero3(stress12).astype(dtype)], axis=0)

    bc_loc = BC(ew="open", ns="open")  # halo ring supplies real neighbors
    if grid.bc.tripole:
        cmeta, smeta = _b_fold_metas(grid.bc.ns)
    else:
        cmeta = smeta = None
    exch_c = partial(halo_exchange, H=H, py=py, px=px,
                     y_cyclic=grid.bc.y_cyclic, x_cyclic=grid.bc.x_cyclic,
                     fold_meta=cmeta, ly=ly, lx=lx)
    exch = partial(halo_exchange, H=H, py=py, px=px,
                   y_cyclic=grid.bc.y_cyclic, x_cyclic=grid.bc.x_cyclic,
                   fold_meta=smeta, ly=ly, lx=lx)
    n_full, rem = divmod(p.ndte, k)

    def shard_body(c_loc, s_loc):
        c = jnp.pad(c_loc, ((0, 0), (H, H), (H, H)))
        c = exch_c(c)                    # constants: one exchange, ever
        g, prep_l, strength_l, Dmin_l, uocn_l, vocn_l = _unpack_const(
            c, bc_loc)

        def chunk(s, nsub):
            u, v = s[0], s[1]
            carry = (u, v, s[2:6], s[6:10], s[10:14])

            def body(_, carry):
                u, v, sp, sm, s12 = carry
                sp, sm, s12, strintx, strinty = stress_update(
                    g, p, strength_l, Dmin_l, u, v, sp, sm, s12,
                    prep_l.iceTmask)
                u, v, _, _ = stepu_dense(u, v, strintx, strinty, prep_l, p,
                                         uocn_l, vocn_l)
                return (u, v, sp, sm, s12)

            u, v, sp, sm, s12 = jax.lax.fori_loop(0, nsub, body, carry)
            return jnp.concatenate([u[None], v[None], sp, sm, s12])

        s = jnp.pad(s_loc, ((0, 0), (H, H), (H, H)))
        s = jax.lax.fori_loop(0, n_full, lambda i, s: chunk(exch(s), k), s)
        if rem:
            s = chunk(exch(s), rem)
        return s[:, H:H + ly, H:H + lx]

    spec = P(None, "Y", "X")
    out = jax.shard_map(shard_body, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec)(const, state)

    u, v = out[0], out[1]
    # final force diagnostics computed GLOBALLY, exactly as evp_solve's
    # trailing stress_update — this keeps the seam-row strint identical to
    # the GSPMD path for every BC family (incl. the tripole product fold)
    _, _, _, strintx, strinty = stress_update(
        grid, p, strength, (p.deltaminEVP * grid.tarea).astype(dtype),
        u, v, out[2:6], out[6:10], out[10:14], prep.iceTmask)
    Cb = prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
    return (u, v, out[2:6], out[6:10], out[10:14], strintx, strinty,
            -u * Cb, -v * Cb)


# ---------------------------------------------------------------------------
# C-grid variant (BASELINE.json config 5: C-grid EVP scaling across hosts).
# The reference C-grid loop exchanges FIVE halos per subcycle
# (ice_dyn_evp.F90:938-1101 — uvelE, vvelN, T-stress, U-stress and the
# interpolated velocities); the wide-halo trade is correspondingly larger.
# ---------------------------------------------------------------------------

# per-subcycle dependency radius of the C-grid update: velocity averages
# (1) -> U strain rates (1) -> T shear average (1) -> U viscosity average
# (1) -> stress divergence (1) + transverse momentum average (1) = 6 rings,
# conservatively (tests pin correctness at several k)
C_RADIUS = 6

_C_GRID_PLANES = ("dxT", "dyT", "dxU", "dyU", "dxE", "dyE", "dxN", "dyN",
                  "tarea", "uarea", "earea", "narea",
                  "hm", "uvm", "npm", "epm")


def evp_c_solve_wide(grid: Grid, p: EvpParams, prep, strength,
                     stresspT, stressmT, stress12U, *, mesh,
                     k_fuse: int = 4):
    """Drop-in replacement for dynamics.evp_c.evp_c_solve running k_fuse
    subcycles per halo exchange. Falls back to the GSPMD loop for tripole
    seams or mesh=None."""
    from ..dynamics.evp_c import (CEvpState, CPrep, c_subcycle_step,
                                  evp_c_solve)
    from ..core.grid import grid_average_X2Y

    if grid.bc.tripole or mesh is None:
        return evp_c_solve(grid, p, prep, strength, stresspT, stressmT,
                           stress12U)

    py, px = mesh.shape["Y"], mesh.shape["X"]
    ny, nx = grid.shape
    assert ny % py == 0 and nx % px == 0, (ny, nx, py, px)
    ly, lx = ny // py, nx // px
    k = max(1, min(k_fuse, p.ndte, (ly - 1) // C_RADIUS,
                   (lx - 1) // C_RADIUS))
    H = C_RADIUS * k

    dtype = prep.uvelE_init.dtype
    f = lambda x: x.astype(dtype)
    n_prep = len(prep)
    # trailing indicator plane: ones everywhere inside the global domain.
    # After pad+exchange, halo cells filled from real neighbors carry 1 and
    # beyond-global-edge cells carry ppermute's zero-fill — multiplying the
    # state by it each subcycle pins those ghost cells at 0, exactly the
    # global solver's shift() ghost semantics (the C-grid update, unlike
    # the mask-guarded B-grid one, would otherwise evolve them).
    const = jnp.stack(
        [f(getattr(grid, nm)) for nm in _C_GRID_PLANES] +
        [f(x) for x in prep] +
        [f(strength), f(p.deltaminEVP * grid.tarea),
         jnp.ones(grid.shape, dtype)])
    state = jnp.stack([f(prep.uvelE_init), f(prep.vvelN_init),
                       f(jnp.where(prep.iceTmask, stresspT, 0.0)),
                       f(jnp.where(prep.iceTmask, stressmT, 0.0)),
                       f(stress12U)])

    bc_loc = BC(ew="open", ns="open")
    exch = partial(halo_exchange, H=H, py=py, px=px,
                   y_cyclic=grid.bc.y_cyclic, x_cyclic=grid.bc.x_cyclic)
    n_full, rem = divmod(p.ndte, k)
    ng = len(_C_GRID_PLANES)

    def shard_body(c_loc, s_loc):
        c = exch(jnp.pad(c_loc, ((0, 0), (H, H), (H, H))))
        g = SimpleNamespace(bc=bc_loc,
                            **{nm: c[i] for i, nm in
                               enumerate(_C_GRID_PLANES)})
        pl_ = list(c[ng:ng + n_prep])
        for i, fld in enumerate(CPrep._fields):
            if fld.startswith("ice"):          # bool masks ride as floats
                pl_[i] = pl_[i] > 0.5
        prep_l = CPrep(*pl_)
        strength_l = c[ng + n_prep]
        Dmin_l = c[ng + n_prep + 1]
        ind = c[ng + n_prep + 2]

        def chunk(s, nsub):
            def body(_, st):
                st = c_subcycle_step(g, p, prep_l, strength_l, Dmin_l, st)
                # where, not multiply: a stray NaN minted in the dead ghost
                # ring must not survive (NaN*0 = NaN)
                return CEvpState(*(jnp.where(ind > 0, x, 0.0) for x in st))
            st = jax.lax.fori_loop(0, nsub, body,
                                   CEvpState(s[0], s[1], s[2], s[3], s[4]))
            return jnp.stack(list(st))

        s = jnp.pad(s_loc, ((0, 0), (H, H), (H, H)))
        s = jax.lax.fori_loop(0, n_full, lambda i, s: chunk(exch(s), k), s)
        if rem:
            s = chunk(exch(s), rem)
        return s[:, H:H + ly, H:H + lx]

    spec = P(None, "Y", "X")
    out = jax.shard_map(shard_body, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec)(const, state)
    final = CEvpState(out[0], out[1], out[2], out[3], out[4])
    uvelU = grid_average_X2Y("S", final.uvelE, "E", "U", grid)
    vvelU = grid_average_X2Y("S", final.vvelN, "N", "U", grid)
    return final, uvelU, vvelU
