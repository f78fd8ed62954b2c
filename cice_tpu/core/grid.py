"""Model grid: construction, metric terms, masks, inter-grid averaging.

TPU-native equivalent of cicecore/cicedyn/infrastructure/ice_grid.F90 (5807
lines). State lives on a single global (ny, nx) array per field — there are no
blocks, no ghost cells, no gather/scatter; metric arrays are plain device
arrays and the Grid is a JAX pytree so it can be donated/sharded alongside
state.

Grid staggering (Arakawa B / C / CD supported downstream):
  T(i,j) cell center; U(i,j) NE corner of T(i,j); N(i,j) north face;
  E(i,j) east face  — matching the reference convention
  (doc/source/user_guide/ug_implementation.rst grid section).

Constructors:
  - rectgrid:  uniform Cartesian box (reference ice_grid.F90:2572 `rectgrid`),
    kmt_type default/channel/wall/island variants, cm spacing inputs.
  - latlon:    regular spherical grid (reference `latlongrid`:1418).
  - from_arrays: POP-style grid from ULAT/ULON/HTN/HTE/kmt arrays (the
    gx3/gx1/tx1 path — reference popgrid:1000/popgrid_nc:1077); file readers
    live in cice_tpu.io.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from .halo import BC, shift
from ..constants import (FIELD_LOC_CENTER, FIELD_LOC_EFACE, FIELD_LOC_NECORNER,
                         FIELD_LOC_NFACE, FIELD_TYPE_SCALAR, FIELD_TYPE_VECTOR)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Grid:
    """Global grid: coordinates, metric terms, masks.

    All 2-D arrays are (ny, nx), row j = y/latitude, col i = x/longitude.
    """

    # coordinates (radians)
    ULAT: jnp.ndarray
    ULON: jnp.ndarray
    TLAT: jnp.ndarray
    TLON: jnp.ndarray
    # primary lengths (m)
    HTN: jnp.ndarray           # length of northern edge of T-cell
    HTE: jnp.ndarray           # length of eastern edge of T-cell
    # derived cell widths/heights (m) at each staggering
    dxT: jnp.ndarray
    dyT: jnp.ndarray
    dxU: jnp.ndarray
    dyU: jnp.ndarray
    dxN: jnp.ndarray
    dyN: jnp.ndarray
    dxE: jnp.ndarray
    dyE: jnp.ndarray
    # areas and reciprocals
    tarea: jnp.ndarray
    uarea: jnp.ndarray
    narea: jnp.ndarray
    earea: jnp.ndarray
    tarear: jnp.ndarray
    uarear: jnp.ndarray
    # B-grid variational-stress metric combinations (ice_dyn_shared.F90:411,433)
    dxhy: jnp.ndarray          # 0.5*(HTE - HTE(i-1))
    dyhx: jnp.ndarray          # 0.5*(HTN - HTN(j-1))
    cyp: jnp.ndarray           # 1.5*HTE - 0.5*HTE(i-1)
    cxp: jnp.ndarray           # 1.5*HTN - 0.5*HTN(j-1)
    cym: jnp.ndarray           # -(1.5*HTE(i-1) - 0.5*HTE)
    cxm: jnp.ndarray           # -(1.5*HTN(j-1) - 0.5*HTN)
    # rotation angle of grid x-axis from east (radians)
    ANGLE: jnp.ndarray         # at U points
    ANGLET: jnp.ndarray        # at T points
    # masks (float 0/1)
    hm: jnp.ndarray            # ocean mask at T points (reference `hm`)
    uvm: jnp.ndarray           # ocean mask at U points
    npm: jnp.ndarray           # N-face mask
    epm: jnp.ndarray           # E-face mask
    # bathymetry (m, positive depth) for seabed stress
    bathymetry: jnp.ndarray
    # static metadata
    bc: BC = dataclasses.field(metadata=dict(static=True), default=BC())
    nx_global: int = dataclasses.field(metadata=dict(static=True), default=0)
    ny_global: int = dataclasses.field(metadata=dict(static=True), default=0)

    # -- conveniences -------------------------------------------------------
    @property
    def tmask(self) -> jnp.ndarray:
        return self.hm > 0.5

    @property
    def umask(self) -> jnp.ndarray:
        return self.uvm > 0.5

    @property
    def shape(self):
        return (self.ny_global, self.nx_global)

    def fcor(self, where: str = "U", option: str = "latitude") -> jnp.ndarray:
        """Coriolis parameter (1/s) — reference ice_dyn_shared init `fcor_blk`."""
        lat = {"U": self.ULAT, "T": self.TLAT}[where]
        if option == "constant":
            return jnp.full_like(lat, 1.46e-4)   # reference: constant f plane
        if option == "zero":
            return jnp.zeros_like(lat)
        return 2.0 * cst.omega * jnp.sin(lat)

    @property
    def tarean(self) -> jnp.ndarray:
        """NH T-cell areas (for hemispheric diagnostics)."""
        return jnp.where(self.TLAT > 0.0, self.tarea * self.hm, 0.0)

    @property
    def tareas(self) -> jnp.ndarray:
        return jnp.where(self.TLAT < 0.0, self.tarea * self.hm, 0.0)


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------

def _np_shift(f: np.ndarray, dj: int, di: int, bc: BC, extrapolate: bool) -> np.ndarray:
    """Host-side neighbor access used during grid derivation.

    Non-cyclic edges are filled by linear extrapolation (the reference runs
    ice_HaloExtrapolate on all primary/derived grid lengths,
    serial/ice_boundary.F90:9056) so metric differences stay smooth at open
    boundaries.
    """
    ny, nx = f.shape
    g = f
    if di != 0:
        if bc.x_cyclic:
            g = np.roll(g, -di, axis=1)
        else:
            g = np.roll(g, -di, axis=1)
            if di > 0:
                for k in range(di):
                    col = nx - 1 - k
                    g[:, col] = 2.0 * g[:, col - 1] - g[:, col - 2] if extrapolate else 0.0
            else:
                for k in range(-di):
                    g[:, k] = 2.0 * g[:, k + 1] - g[:, k + 2] if extrapolate else 0.0
    if dj != 0:
        if bc.y_cyclic:
            g = np.roll(g, -dj, axis=0)
        else:
            g = np.roll(g, -dj, axis=0)
            if dj > 0:
                for k in range(dj):
                    row = ny - 1 - k
                    g[row, :] = 2.0 * g[row - 1, :] - g[row - 2, :] if extrapolate else 0.0
            else:
                for k in range(-dj):
                    g[k, :] = 2.0 * g[k + 1, :] - g[k + 2, :] if extrapolate else 0.0
    return g


def _derive(ULAT, ULON, HTN, HTE, hm, bc: BC, bathymetry=None,
            angle=None, dtype=np.float64) -> Grid:
    """Derive all metric fields from primary arrays (host-side, float64)."""
    ny, nx = HTN.shape
    s = lambda f, dj, di: _np_shift(np.asarray(f, np.float64), dj, di, bc, True)

    HTN = np.asarray(HTN, np.float64)
    HTE = np.asarray(HTE, np.float64)

    # primary_grid_lengths_HTN (ice_grid.F90:3063)
    dxU = 0.5 * (HTN + s(HTN, 0, +1))
    dxT = 0.5 * (HTN + s(HTN, -1, 0))
    dxN = HTN.copy()
    dxE = 0.25 * (HTN + s(HTN, 0, +1) + s(HTN, -1, 0) + s(HTN, -1, +1))
    # primary_grid_lengths_HTE (ice_grid.F90:3174)
    dyU = 0.5 * (HTE + s(HTE, +1, 0))
    dyT = 0.5 * (HTE + s(HTE, 0, -1))
    dyN = 0.25 * (HTE + s(HTE, 0, -1) + s(HTE, +1, 0) + s(HTE, +1, -1))
    dyE = HTE.copy()

    tarea = dxT * dyT
    uarea = dxU * dyU
    narea = dxN * dyN
    earea = dxE * dyE
    tarear = np.where(tarea > 0, 1.0 / np.where(tarea > 0, tarea, 1.0), 0.0)
    uarear = np.where(uarea > 0, 1.0 / np.where(uarea > 0, uarea, 1.0), 0.0)

    # variational metric combos (ice_dyn_shared.F90:411-440)
    HTE_w = s(HTE, 0, -1)
    HTN_s = s(HTN, -1, 0)
    dxhy = 0.5 * (HTE - HTE_w)
    dyhx = 0.5 * (HTN - HTN_s)
    cyp = 1.5 * HTE - 0.5 * HTE_w
    cxp = 1.5 * HTN - 0.5 * HTN_s
    cym = -(1.5 * HTE_w - 0.5 * HTE)
    cxm = -(1.5 * HTN_s - 0.5 * HTN)

    # T coordinates from spherical average of the 4 surrounding U points
    # (reference Tlatlon ice_grid.F90:3491)
    x = np.cos(ULAT) * np.cos(ULON)
    y = np.cos(ULAT) * np.sin(ULON)
    z = np.sin(ULAT)
    sw = lambda f: (f + s(f, 0, -1) + s(f, -1, 0) + s(f, -1, -1))
    tx, ty, tz = 0.25 * sw(x), 0.25 * sw(y), 0.25 * sw(z)
    da = np.maximum(np.sqrt(tx * tx + ty * ty + tz * tz), 1e-30)
    TLAT = np.arcsin(np.clip(tz / da, -1.0, 1.0))
    TLON = np.arctan2(ty, tx)

    hm = np.asarray(hm, np.float64)
    # makemask (ice_grid.F90:3333): U/N/E masks are mins of surrounding T masks
    uvm = np.minimum(np.minimum(hm, _bshift(hm, 0, +1, bc)),
                     np.minimum(_bshift(hm, +1, 0, bc), _bshift(hm, +1, +1, bc)))
    npm = np.minimum(hm, _bshift(hm, +1, 0, bc))
    epm = np.minimum(hm, _bshift(hm, 0, +1, bc))

    if angle is None:
        angle = np.zeros((ny, nx))
    ANGLE = np.asarray(angle, np.float64)
    # ANGLET: average of 4 surrounding ANGLEs (reference uses angle components)
    ANGLET = 0.25 * (ANGLE + s(ANGLE, 0, -1) + s(ANGLE, -1, 0) + s(ANGLE, -1, -1))

    if bathymetry is None:
        bathymetry = np.where(hm > 0.5, 4000.0, 0.0)

    arr = lambda f: jnp.asarray(np.asarray(f), dtype=dtype)
    return Grid(
        ULAT=arr(ULAT), ULON=arr(ULON), TLAT=arr(TLAT), TLON=arr(TLON),
        HTN=arr(HTN), HTE=arr(HTE),
        dxT=arr(dxT), dyT=arr(dyT), dxU=arr(dxU), dyU=arr(dyU),
        dxN=arr(dxN), dyN=arr(dyN), dxE=arr(dxE), dyE=arr(dyE),
        tarea=arr(tarea), uarea=arr(uarea), narea=arr(narea), earea=arr(earea),
        tarear=arr(tarear), uarear=arr(uarear),
        dxhy=arr(dxhy), dyhx=arr(dyhx),
        cyp=arr(cyp), cxp=arr(cxp), cym=arr(cym), cxm=arr(cxm),
        ANGLE=arr(ANGLE), ANGLET=arr(ANGLET),
        hm=arr(hm), uvm=arr(uvm), npm=arr(npm), epm=arr(epm),
        bathymetry=arr(bathymetry),
        bc=bc, nx_global=nx, ny_global=ny,
    )


def _bshift(f: np.ndarray, dj: int, di: int, bc: BC) -> np.ndarray:
    """Shift with zero fill beyond non-cyclic edges (mask-style fields)."""
    g = np.asarray(f, np.float64)
    if di != 0:
        g = np.roll(g, -di, axis=1)
        if not bc.x_cyclic:
            if di > 0:
                g[:, -di:] = 0.0
            else:
                g[:, :(-di)] = 0.0
    if dj != 0:
        g = np.roll(g, -dj, axis=0)
        if not bc.y_cyclic:
            if dj > 0:
                g[-dj:, :] = 0.0
            else:
                g[:(-dj), :] = 0.0
    return g


# ---------------------------------------------------------------------------
# rectangular grid (reference `rectgrid` ice_grid.F90:2572)
# ---------------------------------------------------------------------------

def make_kmt_rect(nx: int, ny: int, kmt_type: str, bc: BC) -> np.ndarray:
    """T-cell ocean mask for the rectangular grid variants
    (reference ice_grid.F90:2672-2762)."""
    hm = np.zeros((ny, nx))
    if kmt_type == "none":
        hm[:, :] = 1.0
    elif kmt_type == "channel":
        hm[2:ny - 2, :] = 1.0
    elif kmt_type == "channel_oneeast":
        hm[ny // 2 - 1, :] = 1.0
    elif kmt_type == "channel_onenorth":
        hm[:, nx // 2 - 1] = 1.0
    elif kmt_type == "wall":
        hm[:, 0:nx - 2] = 1.0
    elif kmt_type == "default":
        # land in upper-left and lower-right corners, otherwise open
        imid = int(nx / 2)
        jmid = int(ny / 2)
        hm[2:ny - 2, 2:nx - 2] = 1.0
        if nx > 5 and ny > 5:
            hm[0:jmid + 2, 0:imid + 2] = 1.0
            hm[max(jmid - 3, 0):ny, max(imid - 3, 0):nx] = 1.0
    elif kmt_type == "boxislands":
        # island/dock/bar obstacle course for advection & dynamics testing
        # (reference grid_boxislands_kmt, ice_grid.F90:2935-3040): all ocean
        # with a NE triangle, W docks, a tiny island, an X-shaped island
        # group, and bar islands carved out. ~5%-of-grid building block.
        nxb, nyb = nx // 20, ny // 20
        if nxb < 1 or nyb < 1:
            raise ValueError("kmt_type='boxislands' needs nx,ny >= 20")
        hm[:, :] = 1.0
        for k in range(3 * nyb + 1):                      # northeast triangle
            hm[ny - 1 - k, max(nx - 1 - 3 * nxb + k, 0):] = 0.0
        hm[ny - 1 - 3 * nyb:, 0] = 0.0                    # northwest docks
        hm[ny - 1 - 3 * nyb:ny - nyb - 2, 1:2 * nxb] = 0.0
        hm[ny - nyb - 1:ny - nyb + 1, 1:2 * nxb] = 0.0
        hm[2 * nyb - 1:3 * nyb, 0] = 0.0                  # southwest docks
        hm[:2 * nyb, 1:nxb] = 0.0
        hm[:2 * nyb, 2 * nxb - 2:2 * nxb] = 0.0
        hm[:2 * nyb, 2 * nxb + 1:4 * nxb] = 0.0
        hm[14 * nyb - 1:14 * nyb + 1,
           14 * nxb - 1:14 * nxb + 1] = 0.0               # tiny island
        for k, i in enumerate(range(2 * nxb - 1, 4 * nxb),
                              start=1):                   # X: left triangle
            hm[10 * nyb - 1 + k:14 * nyb - k, i] = 0.0
        for k, j in enumerate(range(14 * nyb - 1, 12 * nyb - 2, -1),
                              start=1):                   # X: upper triangle
            hm[j, 2 * nxb + 1 + k:6 * nxb - 2 - k] = 0.0
        for k, j in enumerate(range(10 * nyb - 1, 14 * nyb),
                              start=1):                   # X: diagonal
            hm[j, 2 * nxb + 3 + k:2 * nxb + 6 + k] = 0.0
        for k, j in enumerate(range(12 * nyb - 1, 10 * nyb - 2, -1),
                              start=1):                   # X: lower-right tri
            hm[j, 5 * nxb - 1 + k:8 * nxb] = 0.0
        hm[4 * nyb - 1:5 * nyb, 10 * nxb - 1:16 * nxb] = 0.0   # bar islands
        hm[6 * nyb + 1:8 * nyb, 10 * nxb - 1:16 * nxb] = 0.0
        hm[8 * nyb + 1:8 * nyb + 3, 10 * nxb - 1:16 * nxb] = 0.0
    else:
        raise ValueError(f"unknown kmt_type {kmt_type}")
    if bc.ew == "closed":
        hm[:, 0:2] = 0.0
        hm[:, nx - 2:nx] = 0.0
    if bc.ns == "closed":
        hm[0:2, :] = 0.0
        hm[ny - 2:ny, :] = 0.0
    return hm


def rectgrid(nx: int, ny: int, dxrect_cm: float = 30.0e5, dyrect_cm: float = 30.0e5,
             kmt_type: str = "default", bc: BC = BC(ew="cyclic", ns="open"),
             lonrefrect: float = -156.5, latrefrect: float = 71.35,
             dxscale: float = 1.0, dyscale: float = 1.0,
             dtype=jnp.float32) -> Grid:
    """Rectangular grid with analytic coordinates; uniform spacing, or
    geometrically scaled from the domain center when dx/dyscale != 1
    (reference rectgrid_scale_dxdy, ice_grid.F90:2772)."""
    dx = dxrect_cm * cst.cm_to_m
    dy = dyrect_cm * cst.cm_to_m
    if dxscale != 1.0 or dyscale != 1.0:
        # per-column/row spacing scaled by r^|i-center| (variable resolution)
        ix = np.arange(nx) - (nx - 1) / 2.0
        iy = np.arange(ny) - (ny - 1) / 2.0
        dxs = dx * dxscale ** np.abs(ix)                 # (nx,)
        dys = dy * dyscale ** np.abs(iy)                 # (ny,)
    else:
        dxs = np.full(nx, dx)
        dys = np.full(ny, dy)
    lon0 = lonrefrect * cst.deg_to_rad
    lat0 = latrefrect * cst.deg_to_rad
    xU = np.cumsum(dxs)                                  # U-point x (m)
    yU = np.cumsum(dys)
    ULON = lon0 + (xU / cst.radius)[None, :] + 0.0 * np.arange(ny)[:, None]
    ULAT = lat0 + (yU / cst.radius)[:, None] + 0.0 * np.arange(nx)[None, :]
    HTN = np.broadcast_to(dxs[None, :], (ny, nx)).copy()
    HTE = np.broadcast_to(dys[:, None], (ny, nx)).copy()
    hm = make_kmt_rect(nx, ny, kmt_type, bc)
    return _derive(ULAT, ULON, HTN, HTE, hm, bc, dtype=dtype)


def latlon_grid(nx: int, ny: int, lat_min: float = -78.0, lat_max: float = 88.0,
                kmt: Optional[np.ndarray] = None,
                bc: BC = BC(ew="cyclic", ns="open"), dtype=jnp.float32) -> Grid:
    """Regular spherical grid spanning the globe in longitude
    (reference `latlongrid` ice_grid.F90:1418, simplified: uniform spacing)."""
    dlon = 2.0 * np.pi / nx
    lat_edges = np.linspace(lat_min, lat_max, ny + 1) * cst.deg_to_rad
    ULAT = np.broadcast_to(lat_edges[1:, None], (ny, nx)).copy()
    ULON = np.broadcast_to((dlon * (np.arange(nx) + 1.0))[None, :], (ny, nx)).copy()
    # HTN: length of north edge at ULAT; HTE: meridional edge length
    HTN = cst.radius * dlon * np.cos(ULAT)
    dlat = np.diff(lat_edges)
    HTE = np.broadcast_to((cst.radius * dlat)[:, None], (ny, nx)).copy()
    if kmt is None:
        kmt = np.ones((ny, nx))
        kmt[0, :] = 0.0
        kmt[-1, :] = 0.0
    return _derive(ULAT, ULON, HTN, HTE, kmt, bc, dtype=dtype)


def from_arrays(ULAT, ULON, HTN, HTE, kmt, bc: BC, bathymetry=None, angle=None,
                dtype=jnp.float32) -> Grid:
    """Build a Grid from POP-format primary arrays (gx3/gx1/tx1 path)."""
    hm = (np.asarray(kmt) > 0.5).astype(np.float64)
    return _derive(ULAT, ULON, HTN, HTE, hm, bc, bathymetry=bathymetry,
                   angle=angle, dtype=dtype)


def make_grid(cfg) -> Grid:
    """Construct the grid described by a Config (grid_nml analogue)."""
    g = cfg.grid
    bc = BC(ew=g.ew_boundary_type, ns=g.ns_boundary_type)
    if g.grid_format == "rect":
        return rectgrid(g.nx_global, g.ny_global, g.dxrect, g.dyrect,
                        g.kmt_type, bc, g.lonrefrect, g.latrefrect,
                        dxscale=g.dxscale if g.scale_dxdy else 1.0,
                        dyscale=g.dyscale if g.scale_dxdy else 1.0,
                        dtype=cfg.np_dtype)
    if g.grid_format == "latlon":
        return latlon_grid(g.nx_global, g.ny_global, bc=bc, dtype=cfg.np_dtype)
    if g.grid_format in ("pop_bin", "pop_nc", "nc") or (
            g.grid_file and g.grid_format not in ("rect", "latlon",
                                                  "displaced_pole")):
        from ..io.grids import load_grid_files
        return load_grid_files(cfg)
    if g.grid_format == "tripole":
        # synthetic tripole: spherical metrics (mirror-symmetric across the
        # northern seam since dx depends only on j) + the U-fold halo
        # semantics. Stands in for tx1 when the POP tripole files are absent;
        # file-based tx1 loads through io.grids with ns_boundary_type set.
        from .landmask import idealized_world_kmt
        if g.nx_global % 2:
            raise ValueError("tripole grids need even nx_global (fold pairs "
                             "i <-> nx-1-i; ug_implementation.rst:279)")
        bc = BC(ew="cyclic",
                ns=g.ns_boundary_type
                if g.ns_boundary_type in ("tripole", "tripoleT")
                else "tripole")
        kmt = (None if g.kmt_type == "none"
               else idealized_world_kmt(g.nx_global, g.ny_global))
        if kmt is None:
            kmt = np.ones((g.ny_global, g.nx_global))
            kmt[0, :] = 0.0       # southern land rim; the north is the seam
        return latlon_grid(g.nx_global, g.ny_global, lat_min=-78.0,
                           lat_max=89.0, kmt=kmt, bc=bc, dtype=cfg.np_dtype)
    if g.grid_format == "displaced_pole":
        # Without the external gx grid files, approximate the gx3/gx1 domain
        # with a spherical grid of the same dimensions and an idealized
        # land mask; file-based grids load through cice_tpu.io.grids.
        from .landmask import idealized_world_kmt
        kmt = idealized_world_kmt(g.nx_global, g.ny_global)
        return latlon_grid(g.nx_global, g.ny_global, lat_min=-78.0,
                           lat_max=87.0, kmt=kmt, bc=bc, dtype=cfg.np_dtype)
    raise ValueError(f"unknown grid_format {g.grid_format}")


# ---------------------------------------------------------------------------
# inter-grid averaging (reference grid_average_X2Y, ice_grid.F90:176-186,3817)
# ---------------------------------------------------------------------------

_DIRS = {
    ("T", "U"): "NE", ("U", "T"): "SW", ("T", "E"): "E", ("T", "N"): "N",
    ("E", "T"): "W", ("N", "T"): "S", ("U", "E"): "NW2E", ("U", "N"): "NE2N",
    ("E", "U"): "E2U", ("N", "U"): "N2U", ("E", "N"): "E2N", ("N", "E"): "N2E",
}

_AREA = dict(T="tarea", U="uarea", N="narea", E="earea")
_MASK = dict(T="hm", U="uvm", N="npm", E="epm")


def _gather4(f, offs, bc, loc, ftype):
    return [shift(f, dj, di, bc=bc, loc=loc, ftype=ftype) for (dj, di) in offs]


def grid_average_X2Y(kind: str, work: jnp.ndarray, src: str, dst: str,
                     grid: Grid) -> jnp.ndarray:
    """Average a field between staggered sub-grids (jit-cached for Grid
    inputs; plane namespaces — e.g. the wide-halo local tiles — trace the
    implementation inline).

    kind: 'S' masked area-weighted state average; 'A' unmasked area-weighted;
    'F' conservative flux average (reference semantics at
    ice_grid.F90:4159 X2YS / :4388 X2YA / :4616 X2YF).
    """
    if isinstance(grid, Grid):
        return _grid_average_jit(kind, work, src, dst, grid)
    return _grid_average_impl(kind, work, src, dst, grid)


@partial(jax.jit, static_argnames=("kind", "src", "dst"))
def _grid_average_jit(kind, work, src, dst, grid):
    return _grid_average_impl(kind, work, src, dst, grid)


def _grid_average_impl(kind: str, work: jnp.ndarray, src: str, dst: str,
                       grid) -> jnp.ndarray:
    if src == dst:
        return work
    bc = grid.bc
    w1 = getattr(grid, _AREA[src])
    m1 = getattr(grid, _MASK[src])
    loc = dict(T=FIELD_LOC_CENTER, U=FIELD_LOC_NECORNER,
               N=FIELD_LOC_NFACE, E=FIELD_LOC_EFACE)[src]

    # neighbor offsets of destination point in source-field index space
    offsets = {
        ("T", "U"): [(0, 0), (0, 1), (1, 0), (1, 1)],
        ("U", "T"): [(0, 0), (0, -1), (-1, 0), (-1, -1)],
        ("T", "E"): [(0, 0), (0, 1)],
        ("E", "T"): [(0, 0), (0, -1)],
        ("T", "N"): [(0, 0), (1, 0)],
        ("N", "T"): [(0, 0), (-1, 0)],
        ("E", "U"): [(0, 0), (1, 0)],
        ("N", "U"): [(0, 0), (0, 1)],
        ("E", "N"): [(0, 0), (1, 0), (0, -1), (1, -1)],
        ("N", "E"): [(0, 0), (-1, 0), (0, 1), (-1, 1)],
        ("U", "E"): [(0, 0), (-1, 0)],
        ("U", "N"): [(0, 0), (0, -1)],
    }[(src, dst)]

    ws = _gather4(work, offsets, bc, loc, FIELD_TYPE_SCALAR)
    as_ = _gather4(w1, offsets, bc, loc, FIELD_TYPE_SCALAR)
    ms = _gather4(m1, offsets, bc, loc, FIELD_TYPE_SCALAR)

    if kind == "S":
        num = sum(w * a * m for w, a, m in zip(ws, as_, ms))
        den = sum(a * m for a, m in zip(as_, ms))
        return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)
    if kind == "A":
        num = sum(w * a for w, a in zip(ws, as_))
        den = sum(as_)
        return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)
    if kind == "F":
        w2 = getattr(grid, _AREA[dst])
        num = sum(w * a for w, a in zip(ws, as_)) / len(ws)
        return jnp.where(w2 > 0, num / jnp.where(w2 > 0, w2, 1.0), 0.0)
    raise ValueError(f"unknown average kind '{kind}'")
