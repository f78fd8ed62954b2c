"""Boundary / neighbor-access engine ("halo" semantics, TPU-native form).

The reference implements halo exchange as explicit ghost-cell MPI messaging
(comm/{mpi,serial}/ice_boundary.F90, 9216 lines). On TPU the device-level
halos are XLA's job: state lives in *global* `(ny, nx)` arrays sharded over a
mesh, and any shifted access (`jnp.roll`, pad+slice) lowers to a
collective-permute of the edge slab between neighbor devices. What remains —
and what this module provides — is the *physical* boundary condition at the
global domain edge:

  - cyclic east-west wrap (gx/tx global grids)
  - closed / open edges (ghost value 0, matching ice_boundary.F90:1179-1183
    where open/closed outer halos are never filled and state halos start at 0)
  - tripole (U-fold) and tripoleT (T-fold) northern seam: the ghost row is a
    reversed, shifted copy of the top rows with location- and type-dependent
    index mapping and sign flips (reference ice_boundary.F90:7910-9052
    `ice_HaloMsgCreate`, doc ug_implementation.rst:279-380)

Arrays are indexed [j, i] = [y, x]; `shift(f, dj, di)` returns g with
g[j,i] = f[j+dj, i+di], i.e. the value of the neighbor dj cells north /
di cells east, with BCs applied.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp

from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_EFACE, FIELD_LOC_NECORNER,
                         FIELD_LOC_NFACE, FIELD_TYPE_ANGLE, FIELD_TYPE_SCALAR,
                         FIELD_TYPE_VECTOR)


@dataclass(frozen=True)
class BC:
    """Global-domain boundary conditions (grid_nml ew/ns_boundary_type)."""
    ew: str = "cyclic"    # 'cyclic' | 'closed' | 'open'
    ns: str = "open"      # 'open' | 'closed' | 'cyclic' | 'tripole' | 'tripoleT'

    @property
    def x_cyclic(self) -> bool:
        return self.ew == "cyclic"

    @property
    def y_cyclic(self) -> bool:
        return self.ns == "cyclic"

    @property
    def tripole(self) -> bool:
        return self.ns in ("tripole", "tripoleT")


def _shift_axis(f: jnp.ndarray, n: int, axis: int, cyclic: bool) -> jnp.ndarray:
    """g[k] = f[k+n] along `axis`; zero ghost unless cyclic.

    Implemented as roll + wrapped-entry masking (rather than pad+slice):
    identical semantics, and every op lowers inside Pallas kernels too
    (the fused EVP kernel traces this same code path)."""
    if n == 0:
        return f
    g = jnp.roll(f, -n, axis=axis)
    if cyclic:
        return g
    import jax
    ax = axis % f.ndim
    L = f.shape[ax]
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, ax)
    keep = (idx < L - n) if n > 0 else (idx >= -n)
    return jnp.where(keep, g, 0)


def shift(f: jnp.ndarray, dj: int = 0, di: int = 0, *, bc: BC,
          loc: int = FIELD_LOC_CENTER, ftype: int = FIELD_TYPE_SCALAR) -> jnp.ndarray:
    """g[..., j, i] = f[..., j+dj, i+di] with global BCs applied.

    The last two axes are (y, x). Tripole seam handling covers the northern
    ghost row needed by nghost=1 stencils (dj=+1 at j=ny-1).
    """
    g = _shift_axis(f, di, axis=-1, cyclic=bc.x_cyclic)
    if dj == 0:
        return g
    if not bc.tripole:
        return _shift_axis(g, dj, axis=-2, cyclic=bc.y_cyclic)

    # Tripole: south edge zero-ghost; north edge is the fold.
    out = _shift_axis(g, dj, axis=-2, cyclic=False)
    if dj > 0:
        ghost = _tripole_ghost_rows(g, dj, bc.ns, loc, ftype)
        out = out.at[..., -dj:, :].set(ghost)
    return out


def _tripole_ghost_rows(f: jnp.ndarray, n: int, kind: str, loc: int,
                        ftype: int) -> jnp.ndarray:
    """Northern ghost rows [ny..ny+n-1] for the tripole fold.

    U-fold ('tripole', fold along the U-point row j=ny-1):
      ghost(j=ny-1+k, i) maps to row ny-1-k mirrored in i, with the mirror
      pivot depending on field location:
        center:   i -> nx-1-i       (i_f = nx+1-i in 1-based)
        NEcorner: i -> nx-2-i (cyclic)
        Nface:    i -> nx-1-i
        Eface:    i -> nx-2-i (cyclic)
    T-fold ('tripoleT', fold along the T-point row j=ny-1) maps
      ghost(ny-1+k, i) to row ny-1-k (center) with pivot i -> nx-i (cyclic).
    Vector/angle fields flip sign across the seam.
    """
    ny = f.shape[-2]
    nx = f.shape[-1]
    sign = -1.0 if ftype in (FIELD_TYPE_VECTOR, FIELD_TYPE_ANGLE) else 1.0
    idx_i = jnp.arange(nx)
    if kind == "tripole":  # U-fold
        if loc in (FIELD_LOC_CENTER, FIELD_LOC_NFACE):
            src_i = (nx - 1 - idx_i) % nx
        else:  # NEcorner, Eface
            src_i = (nx - 2 - idx_i) % nx
        rows = []
        for k in range(1, n + 1):
            if loc in (FIELD_LOC_CENTER, FIELD_LOC_EFACE):
                # cell/E-face rows are offset half a cell from the U fold row:
                # ghost row ny-1+k mirrors interior row ny-k
                src_j = ny - k
            else:  # NEcorner / Nface lie on the fold line j=ny-1 itself
                src_j = ny - 1 - k
            rows.append(sign * f[..., src_j, :][..., src_i])
        return jnp.stack(rows, axis=-2)
    else:  # tripoleT (T-fold along the T row j=ny-1)
        if loc in (FIELD_LOC_CENTER, FIELD_LOC_NFACE):
            src_i = (nx - idx_i) % nx
        else:
            src_i = (nx - 1 - idx_i) % nx
        rows = []
        for k in range(1, n + 1):
            src_j = ny - 1 - k
            rows.append(sign * f[..., src_j, :][..., src_i])
        return jnp.stack(rows, axis=-2)


def neighbors4(f: jnp.ndarray, *, bc: BC, loc: int = FIELD_LOC_CENTER,
               ftype: int = FIELD_TYPE_SCALAR):
    """(north, south, east, west) neighbor values of f."""
    s = partial(shift, bc=bc, loc=loc, ftype=ftype)
    return s(f, dj=+1), s(f, dj=-1), s(f, di=+1), s(f, di=-1)


def extrapolate_edges(f: jnp.ndarray, bc: BC) -> jnp.ndarray:
    """ice_HaloExtrapolate (serial/ice_boundary.F90:9056) on dense arrays:
    overwrite the outermost row/column along each NON-cyclic axis with the
    linear extrapolation of the two interior neighbors, so grid-metric
    differences stay smooth at open/closed boundaries. Cyclic (and tripole)
    axes are untouched — their edge values are physical.

    The dense-array analogue of the reference's ghost-ring fill: here the
    global array's own edge slots play the role of the halo ring for
    time-invariant metric fields.
    """
    if not bc.x_cyclic:
        f = f.at[..., :, 0].set(2.0 * f[..., :, 1] - f[..., :, 2])
        f = f.at[..., :, -1].set(2.0 * f[..., :, -2] - f[..., :, -3])
    if not bc.y_cyclic and bc.ns not in ("tripole", "tripoleT"):
        f = f.at[..., 0, :].set(2.0 * f[..., 1, :] - f[..., 2, :])
        f = f.at[..., -1, :].set(2.0 * f[..., -2, :] - f[..., -3, :])
    return f


def apply_closed_mask(f: jnp.ndarray, bc: BC, nrows: int = 1) -> jnp.ndarray:
    """Zero out nrows at non-cyclic domain edges (used to emulate the
    reference's land ring for ew/ns_boundary_type='closed',
    ice_grid.F90 rectgrid: work_g1(1:2,:)=0 etc.)."""
    if bc.ew == "closed":
        f = f.at[..., :, :nrows].set(0).at[..., :, -nrows:].set(0)
    if bc.ns == "closed":
        f = f.at[..., :nrows, :].set(0).at[..., -nrows:, :].set(0)
    return f
