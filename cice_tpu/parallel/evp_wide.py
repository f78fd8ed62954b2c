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
permutation. Tripole seams need fold messaging between x-mirrored devices —
those grids fall back to the GSPMD path (kernels/evp_pallas.py does the
same).

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


def halo_exchange(z, H: int, py: int, px: int, *, y_cyclic: bool,
                  x_cyclic: bool, ax_y: str = "Y", ax_x: str = "X"):
    """Refresh the H-wide halo ring of a (C, ly+2H, lx+2H) local tile from
    mesh neighbors. Two-stage (Y rows first, then X columns spanning the
    freshly filled Y halos) so corner halos carry the diagonal neighbor's
    data — the standard corner-completion trick, replacing the reference's
    20-direction neighbor messaging (ice_blocks.F90:59-88).

    Non-cyclic global edges: the edge device is absent from the permutation,
    ppermute delivers zeros ⇒ open/closed ghost semantics exactly."""
    north = [(i, i + 1) for i in range(py - 1)]
    south = [(i + 1, i) for i in range(py - 1)]
    if y_cyclic:
        north += [(py - 1, 0)]
        south += [(0, py - 1)]
    from_south = jax.lax.ppermute(z[:, -2 * H:-H, :], ax_y, north)
    from_north = jax.lax.ppermute(z[:, H:2 * H, :], ax_y, south)
    z = z.at[:, :H, :].set(from_south).at[:, -H:, :].set(from_north)

    east = [(i, i + 1) for i in range(px - 1)]
    west = [(i + 1, i) for i in range(px - 1)]
    if x_cyclic:
        east += [(px - 1, 0)]
        west += [(0, px - 1)]
    from_west = jax.lax.ppermute(z[:, :, -2 * H:-H], ax_x, east)
    from_east = jax.lax.ppermute(z[:, :, H:2 * H], ax_x, west)
    return z.at[:, :, :H].set(from_west).at[:, :, -H:].set(from_east)


def evp_solve_wide(grid: Grid, p: EvpParams, prep: DynPrep, strength,
                   stressp, stressm, stress12, *, uocn, vocn, mesh,
                   k_fuse: int = 8):
    """Drop-in replacement for dynamics.evp.evp_solve running k_fuse
    subcycles per halo exchange on `mesh`. Falls back to the GSPMD loop for
    tripole seams. Returns the same 9-tuple."""
    from ..dynamics.evp import evp_solve, stress_update
    from .. import constants as cst

    if grid.bc.tripole or mesh is None:
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
    exch = partial(halo_exchange, H=H, py=py, px=px,
                   y_cyclic=grid.bc.y_cyclic, x_cyclic=grid.bc.x_cyclic)
    n_full, rem = divmod(p.ndte, k)

    def shard_body(c_loc, s_loc):
        c = jnp.pad(c_loc, ((0, 0), (H, H), (H, H)))
        c = exch(c)                      # constants: one exchange, ever
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
        s = exch(s)                      # fresh halos for the diag stencil
        _, _, _, strintx, strinty = stress_update(
            g, p, strength_l, Dmin_l, s[0], s[1], s[2:6], s[6:10],
            s[10:14], prep_l.iceTmask)
        out = jnp.concatenate([s, strintx[None], strinty[None]])
        return out[:, H:H + ly, H:H + lx]

    spec = P(None, "Y", "X")
    out = jax.shard_map(shard_body, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec)(const, state)

    u, v = out[0], out[1]
    Cb = prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
    return (u, v, out[2:6], out[6:10], out[10:14], out[14], out[15],
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
