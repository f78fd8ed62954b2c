"""Snow-aging lookup table (snw_ssp_table): tabulated dry-metamorphism rates.

Equivalent of the reference's `init_snowtable` path (ice_forcing.F90
init_snowtable reads the SNICAR aging table named by `snw_filename` with
axes `snw_T, snw_Tgrd, snw_rhos` and field `drdt0`; snow_nml options
`snwgrain`, `snw_aging_table = 'file'|'snicar'|'test'`,
doc ug_case_settings snow_nml). The table gives the initial grain-growth
rate drdt0 (um/hr) as a function of snow temperature, vertical temperature
gradient, and density; evolution follows the SNICAR best-fit

    dr/dt = drdt0 * (tau / (r - r0 + tau))^(1/kappa)

(Flanner & Zender 2006). Here: the 'test' table is generated from the
published functional form on a coarse (T, Tgrd, rhos) grid; a 'file' table
loads the same three axes + drdt0/tau/kappa arrays from an .npz/.nc file.
Lookup is trilinear and fully vectorized (gather + lerp — dense on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SnowTable:
    T: tuple          # snow temperature axis (degC), ascending
    Tgrd: tuple       # |dT/dz| axis (K/m), ascending
    rhos: tuple       # density axis (kg/m^3), ascending
    drdt0: np.ndarray   # (nT, nTgrd, nrhos) um/hr
    tau: np.ndarray     # same shape (um)
    kappa: np.ndarray   # same shape

    def as_device(self):
        return (jnp.asarray(self.drdt0), jnp.asarray(self.tau),
                jnp.asarray(self.kappa))


def make_test_table() -> SnowTable:
    """The built-in 'test' table (reference snw_aging_table='test' ships an
    11x31x8-point table; we generate one of the same shape/ranges from the
    Flanner-Zender fit so no data file is required)."""
    T = np.linspace(-57.55, 1.75, 11)            # degC (test-table range)
    Tgrd = np.linspace(0.0, 300.0, 31)           # K/m
    rhos = np.linspace(50.0, 400.0, 8)           # kg/m^3
    TT, GG, RR = np.meshgrid(T, Tgrd, rhos, indexing="ij")
    TK = TT + 273.15
    # FZ06 best-fit shape: Arrhenius in T, near-linear in gradient,
    # weak density dependence
    drdt0 = (1.0e5 * np.exp(-3700.0 / TK) * (1.0 + GG / 100.0)
             * (1.0 - 0.2 * (RR - 50.0) / 350.0))
    tau = np.full_like(drdt0, 8.0)
    kappa = np.full_like(drdt0, 0.58)
    return SnowTable(tuple(T), tuple(Tgrd), tuple(rhos), drdt0, tau, kappa)


def load_table_file(path: str) -> SnowTable:
    """snw_aging_table='file': axes snw_T/snw_Tgrd/snw_rhos + drdt0[,tau,
    kappa] from .npz or netCDF (reference snw_filename/snw_*_name)."""
    if path.endswith(".nc"):
        from scipy.io import netcdf_file
        with netcdf_file(path, "r", mmap=False) as f:
            g = lambda n: np.array(f.variables[n][:], np.float64)
            T, Tgrd, rhos = g("snw_T"), g("snw_Tgrd"), g("snw_rhos")
            drdt0 = g("drdt0")
            tau = g("tau") if "tau" in f.variables else np.full_like(drdt0, 8.0)
            kappa = (g("kappa") if "kappa" in f.variables
                     else np.full_like(drdt0, 0.58))
    else:
        with np.load(path) as z:
            T, Tgrd, rhos = z["snw_T"], z["snw_Tgrd"], z["snw_rhos"]
            drdt0 = z["drdt0"]
            tau = z["tau"] if "tau" in z else np.full_like(drdt0, 8.0)
            kappa = z["kappa"] if "kappa" in z else np.full_like(drdt0, 0.58)
    return SnowTable(tuple(np.asarray(T, np.float64)),
                     tuple(np.asarray(Tgrd, np.float64)),
                     tuple(np.asarray(rhos, np.float64)),
                     np.asarray(drdt0, np.float64),
                     np.asarray(tau, np.float64),
                     np.asarray(kappa, np.float64))


def _axis_weights(x, axis: tuple):
    """Index pair + lerp weight for a (uniformly or arbitrarily spaced)
    ascending axis — branch-free searchsorted."""
    ax = jnp.asarray(axis)
    i1 = jnp.clip(jnp.searchsorted(ax, x), 1, len(axis) - 1)
    i0 = i1 - 1
    x0, x1 = ax[i0], ax[i1]
    w = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-30), 0.0, 1.0)
    return i0, i1, w


def table_aging_rate(table: SnowTable, Tsno, Tgrd, rhos, rsnw, rsnw_fall):
    """dr/dt (um/s) by trilinear table lookup + the FZ06 radius kernel.
    All args broadcastable arrays; fully dense."""
    D, TAU, KAP = table.as_device()
    i0, i1, wa = _axis_weights(Tsno, table.T)
    j0, j1, wb = _axis_weights(Tgrd, table.Tgrd)
    k0, k1, wc = _axis_weights(rhos, table.rhos)

    def tri(A):
        c00 = A[i0, j0, k0] * (1 - wc) + A[i0, j0, k1] * wc
        c01 = A[i0, j1, k0] * (1 - wc) + A[i0, j1, k1] * wc
        c10 = A[i1, j0, k0] * (1 - wc) + A[i1, j0, k1] * wc
        c11 = A[i1, j1, k0] * (1 - wc) + A[i1, j1, k1] * wc
        c0 = c00 * (1 - wb) + c01 * wb
        c1 = c10 * (1 - wb) + c11 * wb
        return c0 * (1 - wa) + c1 * wa

    drdt0 = tri(D)                       # um/hr at r = r0
    tau = jnp.maximum(tri(TAU), 1e-6)
    kappa = jnp.maximum(tri(KAP), 1e-6)
    dr = jnp.maximum(rsnw - rsnw_fall, 0.0)
    rate = drdt0 * (tau / (dr + tau)) ** (1.0 / kappa)   # um/hr
    return rate / 3600.0                                  # um/s
