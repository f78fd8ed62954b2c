"""Tripole-seam halo semantics (halochk analogue, SURVEY §4.3).

Oracle: an independently written scalar (double-loop) implementation of the
documented fold mapping (reference doc ug_implementation.rst:279-380;
msg construction ice_boundary.F90:7910) cross-checks the vectorized
`cice_tpu.core.halo.shift` ghost rows for every field location/type.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.constants import (FIELD_LOC_CENTER, FIELD_LOC_EFACE,
                                FIELD_LOC_NECORNER, FIELD_LOC_NFACE,
                                FIELD_TYPE_SCALAR, FIELD_TYPE_VECTOR)
from cice_tpu.core.halo import BC, shift


def _oracle_ghost(f, kind, loc, ftype):
    """Scalar reference for the first northern ghost row."""
    ny, nx = f.shape
    sign = -1.0 if ftype == FIELD_TYPE_VECTOR else 1.0
    out = np.zeros(nx)
    for i in range(nx):
        if kind == "tripole":          # U-fold on the U row ny-1
            if loc in (FIELD_LOC_CENTER, FIELD_LOC_NFACE):
                i_src = (nx - 1 - i) % nx
            else:                      # NE corner / E face
                i_src = (nx - 2 - i) % nx
            if loc in (FIELD_LOC_CENTER, FIELD_LOC_EFACE):
                j_src = ny - 1         # cell row mirrored about the U fold
            else:
                j_src = ny - 2         # points on the fold line mirror inward
        else:                          # tripoleT: T-fold on T row ny-1
            if loc in (FIELD_LOC_CENTER, FIELD_LOC_NFACE):
                i_src = (nx - i) % nx
            else:
                i_src = (nx - 1 - i) % nx
            j_src = ny - 2
        out[i] = sign * f[j_src, i_src]
    return out


@pytest.mark.parametrize("kind", ["tripole", "tripoleT"])
@pytest.mark.parametrize("loc,ftype", [
    (FIELD_LOC_CENTER, FIELD_TYPE_SCALAR),
    (FIELD_LOC_CENTER, FIELD_TYPE_VECTOR),
    (FIELD_LOC_NECORNER, FIELD_TYPE_VECTOR),
    (FIELD_LOC_NFACE, FIELD_TYPE_SCALAR),
    (FIELD_LOC_EFACE, FIELD_TYPE_VECTOR),
])
def test_tripole_ghost_row(kind, loc, ftype):
    ny, nx = 8, 12
    rng = np.random.default_rng(3)
    f = rng.standard_normal((ny, nx))
    bc = BC(ew="cyclic", ns=kind)
    g = np.asarray(shift(jnp.asarray(f), dj=1, di=0, bc=bc, loc=loc,
                         ftype=ftype))
    # row ny-1 of the shifted field holds ghost row ny (first beyond the fold)
    expect = _oracle_ghost(f, kind, loc, ftype)
    np.testing.assert_allclose(g[ny - 1], expect, rtol=1e-6)


def test_tripole_center_row_consistency():
    """A field that is fold-symmetric must produce a ghost row equal to its
    own top row reversed (physical continuity across the seam)."""
    ny, nx = 6, 8
    f = np.zeros((ny, nx))
    # build a fold-symmetric top row for the U-fold center mapping:
    # ghost(i) = f[ny-1, nx-1-i]; symmetric means f[ny-1] is any row
    f[ny - 1] = np.arange(nx)
    bc = BC(ew="cyclic", ns="tripole")
    g = np.asarray(shift(jnp.asarray(f), dj=1, di=0, bc=bc,
                         loc=FIELD_LOC_CENTER, ftype=FIELD_TYPE_SCALAR))
    np.testing.assert_allclose(g[ny - 1], f[ny - 1][::-1])
