"""Device mesh & sharding for multi-chip runs.

TPU-native replacement for the reference's entire comm layer
(cicecore/cicedyn/infrastructure/comm/{mpi,serial} — ice_boundary halo
messaging, ice_distribution block→rank maps, gather/scatter): state lives in
GLOBAL (ny, nx) arrays sharded over a 2-D ("Y","X") device mesh with
`NamedSharding`; every neighbor access in the stencils (jnp.roll / pad+slice
in cice_tpu.core.halo.shift) lowers to an XLA collective-permute of the edge
slab between neighbor devices, and reductions lower to psum trees over ICI.
The reference's mpi/serial duality is a 1-device vs N-device mesh with
identical array semantics — no second code path.

Block distribution algorithms (cartesian/rake/spacecurve/…,
shared/ice_distribution.F90) are not needed for correctness: XLA tiles the
global array uniformly; land-block elimination becomes masked compute
(SURVEY.md §7.1 design stance). Their TPU uses — locality-preserving device
ordering and load-imbalance analysis — live in cice_tpu.parallel.decomp.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None,
              grid_shape: Optional[Sequence[int]] = None,
              curve_order: bool = False) -> Mesh:
    """Create a ("Y", "X") mesh. Default: all devices in a near-square grid.

    The Y axis shards rows (latitude bands), X shards columns; EVP halo
    traffic then crosses at most 4 ICI neighbors per device per subcycle.
    `grid_shape=(ny, nx)` picks the mesh shape with decomp.auto_decomp
    (lane-width-aware tiles, the cice_decomp.csh analogue); `curve_order`
    reorders devices along a generalized-Hilbert curve so neighboring tiles
    sit on neighboring ICI links (decomp.spacecurve_device_order).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        if grid_shape is not None:
            from .decomp import auto_decomp
            shape, _ = auto_decomp(grid_shape[1], grid_shape[0], n)
        else:
            py = int(np.floor(np.sqrt(n)))
            while n % py:
                py -= 1
            shape = (py, n // py)
    arr = np.asarray(devs)
    if curve_order:
        from .decomp import spacecurve_device_order
        arr = arr[spacecurve_device_order(shape[0], shape[1])]
    arr = arr.reshape(shape)
    return Mesh(arr, ("Y", "X"))


def grid_sharding(mesh: Mesh, ndim_leading: int = 0) -> NamedSharding:
    """Sharding for a (..., ny, nx) array: leading axes replicated, grid
    dims split over ("Y", "X")."""
    spec = P(*([None] * ndim_leading), "Y", "X")
    return NamedSharding(mesh, spec)


def shard_state(mesh: Mesh, tree):
    """Device-put every array leaf with its grid sharding (last two dims on
    the mesh). Scalars/1-D leaves are replicated."""
    def put(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, grid_sharding(mesh, x.ndim - 2))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
