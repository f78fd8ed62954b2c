"""Prognostic model state as a JAX pytree.

TPU-native analogue of cicecore/cicedyn/general/ice_state.F90:55-127 plus the
dynamics stress state from ice_flux.F90. One frozen dataclass holds the full
prognostic pytree; tracers are a name->array dict (registry-driven) instead of
the reference's packed `trcrn(:,:,ntrcr,:,:)` + trcr_depend tables — transport
walks the registry to apply the same dependency semantics
(ice_transport_driver.F90:47-51).

Array layout: grid dims last, (..., ny, nx); categories lead, (ncat, ny, nx);
vertical layers between, (ncat, nlyr, ny, nx) — keeping the minor axes on the
TPU lanes/sublanes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants as cst

# Tracer dependency kinds (reference trcr_depend values):
DEP_AICE = 0    # tracer carried per unit ice area fraction
DEP_VICE = 1    # per unit ice volume
DEP_VSNO = 2    # per unit snow volume
# pond tracers depend on apnd (hpnd, ipnd) -> handled via parent chain


@dataclass(frozen=True)
class TracerSpec:
    name: str
    depend: int               # DEP_AICE / DEP_VICE / DEP_VSNO
    nlayers: int = 0          # 0 => (ncat, ny, nx); >0 => (ncat, nlayers, ny, nx)
    parent: str | None = None  # e.g. hpnd/ipnd ride on apnd
    # physical value range, enforced after transport's ratio recovery
    # (reference work_to_state -> icepack_compute_tracers zeroes tracers
    # whose weight chain is below puny; the explicit range is the
    # TPU-native rail for the signed-fragment remap, whose fluxed-ratio
    # recovery is not convex at knife-edge denominators — without it a
    # sub-hs_min snow layer's qsno random-walks multiplicatively to
    # ~1e24 J/m^3 over ~100 days and its zap energy flash-freezes the
    # global ocean (round-5 annual-cycle root cause)
    lo: float = 0.0
    hi: float = float("inf")


# physical enthalpy floors (J/m^3): coldest representable snow/ice at
# T = -100 C (the Tsf clamp window) with generous margin for the mushy
# brine terms
_QICE_LO = -1.5e9
_QSNO_LO = -5.0e8


def tracer_registry(cfg) -> tuple[TracerSpec, ...]:
    """Build the active tracer table from the config
    (reference: count_tracers, shared/ice_init_column.F90)."""
    d, t = cfg.domain, cfg.tracers
    specs = [
        TracerSpec("Tsfcn", DEP_AICE, lo=-100.0, hi=0.0),  # surface temp (C)
        TracerSpec("qice", DEP_VICE, d.nilyr, lo=_QICE_LO, hi=0.0),
        TracerSpec("sice", DEP_VICE, d.nilyr, hi=200.0),   # bulk salinity
        TracerSpec("qsno", DEP_VSNO, d.nslyr, lo=_QSNO_LO, hi=0.0),
    ]
    if t.tr_iage:
        specs.append(TracerSpec("iage", DEP_VICE))     # volume-weighted age (s)
    if t.tr_FY:
        specs.append(TracerSpec("FY", DEP_AICE, hi=1.0))   # first-year area frac
    if t.tr_lvl:
        specs.append(TracerSpec("alvl", DEP_AICE, hi=1.0))  # level-ice area frac
        specs.append(TracerSpec("vlvl", DEP_VICE, hi=1.0))  # level-ice volume frac
    if t.tr_pond_lvl or t.tr_pond_topo or t.tr_pond_sealvl:
        # lvl ponds live on the level-ice fraction: transport weight is
        # aicen*alvl (reference trcr_depend(nt_apnd) = 2+nt_alvl for
        # tr_pond_lvl; plain area weight for topo/sealvl ponds)
        apnd_parent = "alvl" if (t.tr_pond_lvl and t.tr_lvl) else None
        specs.append(TracerSpec("apnd", DEP_AICE, parent=apnd_parent, hi=1.0))
        specs.append(TracerSpec("hpnd", DEP_AICE, parent="apnd"))
        specs.append(TracerSpec("ipnd", DEP_AICE, parent="apnd"))  # lid depth
    if t.tr_snow:
        for nm in ("smice", "smliq", "rhos_cmp", "rsnw"):
            specs.append(TracerSpec(nm, DEP_VSNO, d.nslyr))
    if t.tr_fsd:
        specs.append(TracerSpec("fsd", DEP_AICE, d.nfsd, hi=1.0))
    if t.tr_iso and d.n_iso:
        # per-CATEGORY-AREA burdens (the column code deposits/releases
        # amounts directly, aero_iso.py) — area-weighted through
        # transport/ITD so cell content aicen*burden is conserved
        specs.append(TracerSpec("isosno", DEP_AICE, d.n_iso))
        specs.append(TracerSpec("isoice", DEP_AICE, d.n_iso))
    if t.tr_aero and d.n_aero:
        specs.append(TracerSpec("aerosno", DEP_AICE, 2 * d.n_aero))
        specs.append(TracerSpec("aeroice", DEP_AICE, 2 * d.n_aero))
    if t.tr_brine:
        specs.append(TracerSpec("fbri", DEP_VICE))     # brine height fraction
    if getattr(cfg, "zbgc", None) is not None and cfg.zbgc.skl_bgc:
        z = cfg.zbgc
        if z.tr_bgc_N:
            specs.append(TracerSpec("bgc_N", DEP_AICE))    # mmol N/m^2
            if z.n_algae >= 2:
                specs.append(TracerSpec("bgc_N2", DEP_AICE))
            if z.n_algae >= 3:
                specs.append(TracerSpec("bgc_N3", DEP_AICE))
        if z.tr_bgc_Nit:
            specs.append(TracerSpec("bgc_Nit", DEP_AICE))  # mmol N/m^3
        if z.tr_bgc_Am:
            specs.append(TracerSpec("bgc_Am", DEP_AICE))
        if z.tr_bgc_Sil:
            specs.append(TracerSpec("bgc_Sil", DEP_AICE))
        if z.tr_bgc_DMS:
            specs.append(TracerSpec("bgc_DMSPp", DEP_AICE))
            specs.append(TracerSpec("bgc_DMSPd", DEP_AICE))
            specs.append(TracerSpec("bgc_DMS", DEP_AICE))
        if z.tr_bgc_PON:
            specs.append(TracerSpec("bgc_PON", DEP_AICE))
        if z.tr_bgc_DON:
            specs.append(TracerSpec("bgc_DON", DEP_AICE))
        if z.tr_bgc_C:
            for i in range(z.n_doc):
                specs.append(TracerSpec(f"bgc_DOC{i+1}", DEP_AICE))
            for i in range(z.n_dic):
                specs.append(TracerSpec(f"bgc_DIC{i+1}", DEP_AICE))
        if z.tr_bgc_Fe:
            specs.append(TracerSpec("bgc_Fed", DEP_AICE))
            specs.append(TracerSpec("bgc_Fep", DEP_AICE))
            # second iron classes (reference icepack_max_fe = 2)
            if getattr(z, "n_fed", 1) >= 2:
                specs.append(TracerSpec("bgc_Fed2", DEP_AICE))
            if getattr(z, "n_fep", 1) >= 2:
                specs.append(TracerSpec("bgc_Fep2", DEP_AICE))
        if z.tr_bgc_hum:
            specs.append(TracerSpec("bgc_hum", DEP_AICE))  # mmol C/m^3
    if getattr(cfg, "zbgc", None) is not None and cfg.zbgc.z_tracers:
        # vertically-resolved z tracers (zbgc_nml z_tracers): bulk
        # concentrations on the nblyr bio grid, conserved per unit brine
        # volume vice*fbri (reference trcr_depend = 2 + nt_fbri), each with
        # a mobile-fraction companion (reference zbgc_frac tracer,
        # sg_tracers.rst:114 nt_zbgc_frac)
        from ..columns.zbgc_vertical import z_tracer_names
        nb = max(cfg.domain.nblyr, 1)
        for nm in z_tracer_names(cfg.zbgc):
            specs.append(TracerSpec(nm, DEP_VICE, nb, parent="fbri"))
            specs.append(TracerSpec(nm + "_mf", DEP_VICE, nb, parent="fbri",
                                    hi=1.0))
            # snow reservoir (per-category-area content; the reference
            # bio grid's snow levels — round 5)
            specs.append(TracerSpec(nm + "_sn", DEP_AICE))
    return tuple(specs)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class State:
    """Full prognostic state."""

    # ITD state (ncat, ny, nx)
    aicen: jnp.ndarray         # fractional area of ice per category
    vicen: jnp.ndarray         # ice volume per unit area (m)
    vsnon: jnp.ndarray         # snow volume per unit area (m)
    # tracers: name -> (ncat[, nl], ny, nx)
    trcrn: Dict[str, jnp.ndarray]
    # dynamics (ny, nx)
    uvel: jnp.ndarray          # B-grid ice velocity, x (m/s)
    vvel: jnp.ndarray
    uvelE: jnp.ndarray         # C-grid east-face u
    vvelE: jnp.ndarray
    uvelN: jnp.ndarray         # C-grid north-face v
    vvelN: jnp.ndarray
    # internal stress tensor state at 4 corners (B-grid; 4, ny, nx)
    stressp: jnp.ndarray       # sigma11+sigma22 at NE,NW,SW,SE
    stressm: jnp.ndarray       # sigma11-sigma22
    stress12: jnp.ndarray      # sigma12
    # EAP structure tensor at 4 corners (prognostic when kdyn=2; restart
    # parity with reference write/read_restart_eap, ice_dyn_eap.F90:2059)
    a11: jnp.ndarray           # (4, ny, nx), isotropic = 0.5
    a12: jnp.ndarray           # (4, ny, nx), isotropic = 0
    # ocean-coupling scalar state carried between steps
    sst: jnp.ndarray           # sea surface temperature (C)
    frzmlt: jnp.ndarray        # freezing/melting potential (W/m^2)
    # dynamics mask memory (iceUmask persistence, ice_dyn_shared dyn_prep1)
    iceUmask: jnp.ndarray
    # melt/freeze onset day-of-year (0 = not yet this year; f_mlt_onset /
    # f_frz_onset history, reset at new year by the driver)
    mlt_onset: jnp.ndarray
    frz_onset: jnp.ndarray

    # -- aggregates ----------------------------------------------------------
    @property
    def aice(self) -> jnp.ndarray:
        return jnp.sum(self.aicen, axis=0)

    @property
    def vice(self) -> jnp.ndarray:
        return jnp.sum(self.vicen, axis=0)

    @property
    def vsno(self) -> jnp.ndarray:
        return jnp.sum(self.vsnon, axis=0)

    @property
    def aice0(self) -> jnp.ndarray:
        return jnp.clip(1.0 - self.aice, 0.0, 1.0)

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


def zeros_state(cfg, grid) -> State:
    ny, nx = grid.ny_global, grid.nx_global
    ncat = cfg.domain.ncat
    dt = cfg.np_dtype
    z2 = lambda: jnp.zeros((ny, nx), dt)
    zc = lambda: jnp.zeros((ncat, ny, nx), dt)
    trcrn = {}
    for spec in tracer_registry(cfg):
        if spec.nlayers:
            trcrn[spec.name] = jnp.zeros((ncat, spec.nlayers, ny, nx), dt)
        else:
            trcrn[spec.name] = jnp.zeros((ncat, ny, nx), dt)
    return State(
        aicen=zc(), vicen=zc(), vsnon=zc(), trcrn=trcrn,
        uvel=z2(), vvel=z2(), uvelE=z2(), vvelE=z2(), uvelN=z2(), vvelN=z2(),
        stressp=jnp.zeros((4, ny, nx), dt), stressm=jnp.zeros((4, ny, nx), dt),
        stress12=jnp.zeros((4, ny, nx), dt),
        a11=jnp.full((4, ny, nx), 0.5, dt), a12=jnp.zeros((4, ny, nx), dt),
        sst=z2(), frzmlt=z2(), iceUmask=jnp.zeros((ny, nx), jnp.bool_),
        mlt_onset=z2(), frz_onset=z2(),
    )
