"""Shortwave radiation: CCSM3 albedos and absorbed-flux partition.

Column-physics equivalent of the Icepack shortwave surface the reference
consumes (`icepack_step_radiation` with shortwave='ccsm3',
`icepack_prep_radiation`; call site ice_step_mod.F90:1292-1473). Written from
the published CCSM3 sea-ice albedo parameterization (Briegleb et al. 2004)
and the standard Beer's-law penetration treatment: visible radiation
penetrates bare ice with fraction i0vis and decays as exp(-kappav z).

Delta-Eddington ('dEdd') is the higher-fidelity scheme; it lands with the
full column-physics parity stage (SURVEY.md §7.2 step 5).

All functions are dense over (ncat, ny, nx) arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst

# CCSM3 albedo temperature-dependence coefficients (Briegleb et al. 2004)
DALB_MLT = -0.075     # bare-ice albedo decrease near melt (both bands)
DALB_MLTV = -0.100    # snow albedo decrease near melt, visible
DALB_MLTI = -0.150    # snow albedo decrease near melt, near-IR


class ShortwaveOut(NamedTuple):
    alvdr: jnp.ndarray    # visible direct albedo
    alvdf: jnp.ndarray    # visible diffuse albedo
    alidr: jnp.ndarray    # near-IR direct albedo
    alidf: jnp.ndarray    # near-IR diffuse albedo
    fswsfc: jnp.ndarray   # SW absorbed at surface (W/m^2)
    fswint: jnp.ndarray   # SW absorbed internally (W/m^2)
    fswthru: jnp.ndarray  # SW transmitted to ocean (W/m^2)
    Iswabs: jnp.ndarray   # (..., nilyr, ny, nx) per-layer internal absorption
    fswpen: jnp.ndarray   # SW penetrating below surface (W/m^2)


def albedos_ccsm3(Tsf, hi, hs, cfg_sw):
    """CCSM3 albedos for one category (dense). Returns (alvdr, alvdf, alidr,
    alidf, asnow) — direct == diffuse in this scheme."""
    # bare ice: thickness dependence
    fh = jnp.minimum(jnp.arctan(4.0 * hi) / jnp.arctan(4.0 * cfg_sw.ahmax), 1.0)
    albo = cst.albocn * (1.0 - fh)
    albiv = cfg_sw.albicev * fh + albo
    albii = cfg_sw.albicei * fh + albo
    # temperature dependence: ramp as Tsf approaches melt over dT_mlt degrees
    dTs = cst.Timelt - Tsf
    fT = jnp.minimum(dTs / cfg_sw.dT_mlt - 1.0, 0.0)    # in [-1, 0]
    albiv = jnp.clip(albiv - DALB_MLT * fT, 0.0, 1.0)
    albii = jnp.clip(albii - DALB_MLT * fT, 0.0, 1.0)
    # snow albedos
    albsv = jnp.clip(cfg_sw.albsnowv - DALB_MLTV * fT, 0.0, 1.0)
    albsi = jnp.clip(cfg_sw.albsnowi - DALB_MLTI * fT, 0.0, 1.0)
    # snow patchiness fraction
    asnow = hs / (hs + cst.snowpatch)
    alvd = albiv * (1.0 - asnow) + albsv * asnow
    alid = albii * (1.0 - asnow) + albsi * asnow
    return alvd, alvd, alid, alid, asnow


def shortwave_ccsm3(Tsf, hi, hs, swvdr, swvdf, swidr, swidf, cfg_sw,
                    nilyr: int) -> ShortwaveOut:
    """Absorbed shortwave partition for one (or a stacked category) field.

    Tsf/hi/hs: (..., ny, nx); sw* incident band fluxes (ny, nx), broadcast.
    """
    alvdr, alvdf, alidr, alidf, asnow = albedos_ccsm3(Tsf, hi, hs, cfg_sw)

    swabv = swvdr * (1.0 - alvdr) + swvdf * (1.0 - alvdf)
    swabi = swidr * (1.0 - alidr) + swidf * (1.0 - alidf)
    swabs = swabv + swabi

    # penetrating visible radiation through the bare-ice (snow-free) fraction
    fswpen = swabv * (1.0 - asnow) * cst.i0vis
    fswpen = jnp.where(hi > cst.puny, fswpen, 0.0)

    # per-layer internal absorption: Beer's law between layer interfaces.
    # exp(-kappa*z_k) is a geometric sequence in the layer index, so ONE
    # exp of the per-layer decrement replaces 2*nilyr transcendentals
    # (the ccsm3 shortwave was ~40% of the therm1 phase at gx1; exp is
    # the VPU's most expensive elementwise op)
    r = jnp.exp(-cst.kappav * jnp.maximum(hi, 0.0) / nilyr)
    e = jnp.ones_like(hi)
    layers = []
    for _ in range(nilyr):
        e_next = e * r
        layers.append(fswpen * (e - e_next))
        e = e_next
    Iswabs = jnp.stack(layers, axis=-3)
    trantop = e                          # == exp(-kappav * hi)
    fswthru = fswpen * trantop
    fswint = fswpen - fswthru
    fswsfc = swabs - fswpen

    return ShortwaveOut(alvdr=alvdr, alvdf=alvdf, alidr=alidr, alidf=alidf,
                        fswsfc=fswsfc, fswint=fswint, fswthru=fswthru,
                        Iswabs=Iswabs, fswpen=fswpen)
