"""Idealized world land mask for file-less global runs.

The reference's gx3/gx1 grids ship as external binary files (downloaded by
cice.setup; not present in the repo), so standalone global configurations here
synthesize a plausible continental mask analytically. This is only used by
`grid_format='displaced_pole'` stand-in grids; real grid files load through
cice_tpu.io.grids when available.
"""

from __future__ import annotations

import numpy as np


def idealized_world_kmt(nx: int, ny: int, lat_min: float = -78.0,
                        lat_max: float = 87.0) -> np.ndarray:
    """A crude continents mask (1=ocean, 0=land) on a regular lat-lon grid.

    Features that matter for sea-ice dynamics: a nearly land-locked Arctic
    basin with two gateways, a circumpolar Southern Ocean with an Antarctic
    continent, and meridional barriers (Americas, Afro-Eurasia) so ice drift
    sees coastlines.
    """
    lat = np.linspace(lat_min, lat_max, ny)[:, None] * np.ones((1, nx))
    lon = (np.arange(nx) + 0.5) / nx * 360.0  # degrees [0, 360)
    lon = np.ones((ny, 1)) * lon[None, :]

    ocean = np.ones((ny, nx))

    # Antarctica: land poleward of ~-72, wobbling with longitude
    ant_edge = -72.0 + 3.0 * np.sin(np.deg2rad(lon) * 2.0)
    ocean[lat < ant_edge] = 0.0

    # "Americas": meridional barrier around lon ~ 280-300, from 60S to 70N
    amer = (lon > 278.0) & (lon < 300.0) & (lat > -55.0) & (lat < 70.0)
    ocean[amer] = 0.0

    # "Afro-Eurasia": broad land mass lon ~ 0-130 between -30 and 72N
    afr = (lon < 130.0) & (lat > -30.0) & (lat < 72.0) & (lon >= 0.0)
    ocean[afr & (lon < 55.0)] = 0.0
    eur = (lon >= 55.0) & (lon < 130.0) & (lat > 5.0) & (lat < 75.0)
    ocean[eur] = 0.0

    # Greenland-ish blob
    grl = (lon > 310.0) & (lon < 335.0) & (lat > 60.0) & (lat < 82.0)
    ocean[grl] = 0.0

    # Bering-strait-like gap stays open (lon ~ 190, lat ~ 66): carve channel
    ber = (lon > 185.0) & (lon < 195.0) & (lat > 50.0)
    ocean[ber] = 1.0

    # close the top row (no tripole here) and bottom row
    ocean[0, :] = 0.0
    ocean[-1, :] = 0.0
    return ocean
