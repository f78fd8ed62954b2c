"""Forcing and flux fields exchanged with atmosphere and ocean.

TPU-native analogue of cicecore/cicedyn/general/ice_flux.F90 (~250 arrays):
two frozen dataclass pytrees — `Forcing` (inputs read/derived each step) and
`FluxOut` (accumulated outputs toward the coupler/diagnostics). Everything is
(ny, nx) dense.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import constants as cst


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Forcing:
    """Per-step atmosphere & ocean forcing state (T grid unless noted)."""
    # atmosphere
    uatm: jnp.ndarray      # wind velocity (m/s)
    vatm: jnp.ndarray
    wind: jnp.ndarray      # wind speed (m/s)
    strax: jnp.ndarray     # wind stress on ice if calc_strair=False (N/m^2)
    stray: jnp.ndarray
    potT: jnp.ndarray      # air potential temperature (K)
    Tair: jnp.ndarray      # air temperature (K)
    Qa: jnp.ndarray        # specific humidity (kg/kg)
    rhoa: jnp.ndarray      # air density (kg/m^3)
    flw: jnp.ndarray       # incoming longwave (W/m^2)
    swvdr: jnp.ndarray     # incoming shortwave, visible direct (W/m^2)
    swvdf: jnp.ndarray
    swidr: jnp.ndarray
    swidf: jnp.ndarray
    frain: jnp.ndarray     # rain rate (kg/m^2/s)
    fsnow: jnp.ndarray     # snow rate (kg/m^2/s)
    zlvl: jnp.ndarray      # atm level height (m)
    coszen: jnp.ndarray    # cosine of solar zenith angle
    wave_hs: jnp.ndarray   # significant wave height (m), for FSD fracture
    wave_Tp: jnp.ndarray   # peak wave period (s)
    wave_spectrum: jnp.ndarray   # E(f) (m^2/Hz) on NFREQ bins (NFREQ,ny,nx)
    # ocean
    uocn: jnp.ndarray      # ocean current (m/s)
    vocn: jnp.ndarray
    sss: jnp.ndarray       # sea surface salinity (psu)
    sst_data: jnp.ndarray  # climatological/restoring SST (degC)
    Tf: jnp.ndarray        # freezing temperature (degC)
    qdp: jnp.ndarray       # deep ocean heat flux (W/m^2)
    hmix: jnp.ndarray      # mixed layer depth (m)
    ss_tltx: jnp.ndarray   # sea surface slope (m/m)
    ss_tlty: jnp.ndarray
    yday: jnp.ndarray      # day of year (scalar array; onset diagnostics)
    pbot: jnp.ndarray      # surface air pressure (Pa; coupler Sa_pbot)
    # per-species aerosol deposition (n_aero, ny, nx), kg/m^2/s; empty
    # (0, ny, nx) means "use the standalone faero_default constants"
    # (coupler Faxa_bcph/Faxa_dst* routing, ice_import_export.F90)
    faero_atm: jnp.ndarray
    # per-species water-isotope deposition (n_iso, ny, nx), kg/m^2/s;
    # empty means "fractionate snowfall with the ALPHA_DEP defaults"
    # (coupler Faxa_snow_wiso routing, ice_import_export.F90:757-762)
    fiso_atm: jnp.ndarray

    def replace(self, **kw) -> "Forcing":
        return dataclasses.replace(self, **kw)


def zeros_forcing(shape, dtype=jnp.float32) -> Forcing:
    z = lambda v=0.0: jnp.full(shape, v, dtype)
    return Forcing(
        uatm=z(), vatm=z(), wind=z(), strax=z(), stray=z(),
        potT=z(253.0), Tair=z(253.0), Qa=z(0.0006), rhoa=z(cst.rhoa_ref),
        flw=z(180.0), swvdr=z(), swvdf=z(), swidr=z(), swidf=z(),
        frain=z(), fsnow=z(), zlvl=z(10.0), coszen=z(0.5),
        wave_hs=z(), wave_Tp=z(8.0),
        wave_spectrum=jnp.zeros((25,) + tuple(shape), dtype),
        uocn=z(), vocn=z(), sss=z(34.0), sst_data=z(-1.8),
        Tf=z(-1.8), qdp=z(), hmix=z(20.0), ss_tltx=z(), ss_tlty=z(),
        yday=jnp.zeros((), dtype),
        pbot=z(101325.0),
        faero_atm=jnp.zeros((0,) + tuple(shape), dtype),
        fiso_atm=jnp.zeros((0,) + tuple(shape), dtype),
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FluxOut:
    """Cell-mean output fluxes & diagnostics accumulated through a step
    (subset of ice_flux.F90 coupler fields + history sources)."""
    # atm
    fsens: jnp.ndarray
    flat: jnp.ndarray
    flwout: jnp.ndarray
    evap: jnp.ndarray
    fswabs: jnp.ndarray
    strairx: jnp.ndarray   # wind stress on ice at U (N/m^2)
    strairy: jnp.ndarray
    # ocn
    fhocn: jnp.ndarray     # net heat to ocean (W/m^2)
    fresh: jnp.ndarray     # fresh water to ocean (kg/m^2/s)
    fsalt: jnp.ndarray     # salt to ocean (kg/m^2/s)
    fswthru: jnp.ndarray   # SW through ice to ocean (W/m^2)
    strocnx: jnp.ndarray   # ice-ocean stress at U (N/m^2)
    strocny: jnp.ndarray
    # mass-budget diagnostics (m/step accumulated)
    meltt: jnp.ndarray
    meltb: jnp.ndarray
    melts: jnp.ndarray
    meltl: jnp.ndarray
    congel: jnp.ndarray
    frazil: jnp.ndarray
    snoice: jnp.ndarray
    # radiation
    alvdr: jnp.ndarray
    alvdf: jnp.ndarray
    alidr: jnp.ndarray
    alidf: jnp.ndarray
    albice: jnp.ndarray
    fsurf: jnp.ndarray     # net surface flux diagnostic
    fcondtop: jnp.ndarray
    # dynamics diagnostics (history sources: f_divu/f_shear/f_sig*/f_str*)
    divu: jnp.ndarray      # velocity divergence (1/s, *dt in history)
    shear: jnp.ndarray     # shear deformation rate
    Delta: jnp.ndarray     # total deformation (Delta)
    strintx: jnp.ndarray   # internal stress divergence at U (N/m^2)
    strinty: jnp.ndarray
    taubx: jnp.ndarray     # seabed (basal) stress (N/m^2)
    tauby: jnp.ndarray
    strength: jnp.ndarray  # ice compressive strength (N/m)
    # mechanical redistribution rates (history f_dardg1dt etc.)
    dardg1dt: jnp.ndarray  # area rate ridged
    dardg2dt: jnp.ndarray  # area rate of new ridges
    dvirdgdt: jnp.ndarray  # volume rate ridged
    opening: jnp.ndarray   # lead opening rate
    # state tendencies split thermo vs dynamics (f_daidtt/f_dvidtt/...)
    daidtt: jnp.ndarray    # area tendency, thermodynamics (1/s)
    dvidtt: jnp.ndarray    # volume tendency, thermodynamics (m/s)
    daidtd: jnp.ndarray    # area tendency, dynamics (1/s)
    dvidtd: jnp.ndarray    # volume tendency, dynamics (m/s)
    # reference-height diagnostics (f_Tref/f_Qref/f_Uref)
    Tref: jnp.ndarray      # 2 m air temperature (K)
    Qref: jnp.ndarray      # 2 m specific humidity (kg/kg)
    Uref: jnp.ndarray      # 10 m wind speed (m/s)
    # extended diagnostics (history sources; reference f_fbot/f_fswint_ai/
    # f_albsno/f_albpnd/f_apeff/f_meltsliq/f_snowfrac, SIMIP siflcondbot/
    # siflsensbot/siflfwdrain/sisndmassdyn)
    fbot: jnp.ndarray      # ocean heat used at the ice bottom (W/m^2, cell)
    fcondbot: jnp.ndarray  # conductive flux at the ice bottom (W/m^2)
    fswint: jnp.ndarray    # SW absorbed in the ice interior (W/m^2)
    fpond: jnp.ndarray     # pond drainage freshwater flux (kg/m^2/s)
    apeff: jnp.ndarray     # radiatively-effective pond fraction (cell mean)
    meltsliq: jnp.ndarray  # snow liquid runoff (kg/m^2, per step)
    snowfrac: jnp.ndarray  # snow-covered fraction of the cell
    albsno: jnp.ndarray    # broadband albedo contribution, snow surface
    albpnd: jnp.ndarray    # broadband albedo contribution, ponds
    dvsdtd: jnp.ndarray    # snow volume tendency, dynamics (m/s)
    dvsdtt: jnp.ndarray    # snow volume tendency, thermo (m/s)
    dagedtt: jnp.ndarray   # mean ice-age tendency, thermo (s/s)
    dagedtd: jnp.ndarray   # mean ice-age tendency, dynamics (s/s)
    # pond water budget terms, cell mean (m of water per step; reference
    # f_dpnd_initial/f_dpnd_expon/f_dpnd_freebd/f_dpnd_dlid; flush = fpond)
    dpnd_initial: jnp.ndarray
    dpnd_expon: jnp.ndarray
    dpnd_freebd: jnp.ndarray
    dpnd_dlid: jnp.ndarray
    # per-category cell-mean flux planes (ncat, ny, nx): the reference's
    # fsurfn_ai/fcondtopn_ai/flatn_ai/fsensn_ai/fmelttn_ai 3Dc history
    # sources, stored pre-weighted by the category area at flux time
    ncat_fluxes: dict
    # transport safety-rail scalars (remap oob/neg-mass/monotonicity flags
    # + conservation errors; reference ice_transport_driver checks w/ abort)
    transport_checks: dict

    def replace(self, **kw) -> "FluxOut":
        return dataclasses.replace(self, **kw)


def zeros_fluxout(shape, dtype=jnp.float32) -> FluxOut:
    z = lambda: jnp.zeros(shape, dtype)
    names = [f.name for f in dataclasses.fields(FluxOut)
             if f.name not in ("ncat_fluxes", "transport_checks")]
    return FluxOut(ncat_fluxes={}, transport_checks={},
                   **{n: z() for n in names})
