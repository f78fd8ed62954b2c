"""Advanced snow physics (tr_snow): grain metamorphism, liquid water,
wind compaction/redistribution.

Equivalent of the Icepack snow pack the reference consumes
(`icepack_step_snow`, `icepack_init_snow`; tracer_nml `tr_snow`, snow_nml
in configuration/scripts/ice_in; call site ice_step_mod.F90:1184-1282 —
SURVEY.md §2.9). Icepack source not vendored; written from the published
science: Lecomte et al. (2013) wind compaction, Brun (1989) /
Flanner & Zender (2006) dry & wet grain metamorphism, and the
level/ridged-ice snow redistribution described in the CICE docs
(snwredist='ITDrdg'/'bulk', snwlvlfac).

Snow tracers per category and snow layer (ncat, nslyr, ny, nx):
  smice — ice mass content of snow (kg/m^2 per layer)
  smliq — liquid water content of snow (kg/m^2 per layer)
  rhos_cmp — compaction-driven density contribution (kg/m^3)
  rsnw — grain radius (10^-6 m)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as cst

# dry metamorphism e-folding time toward the temperature-dependent
# equilibrium radius (s); wet metamorphism rate (Brun 1989)
TAU_DRY = 5.0 * cst.secday
C_WET = 4.22e-5        # wet growth: dr^3/dt = C * (liq frac)^3 (um^3/s scale)


class SnowOut(NamedTuple):
    smice: jnp.ndarray
    smliq: jnp.ndarray
    rhos_cmp: jnp.ndarray
    rsnw: jnp.ndarray
    vsnon: jnp.ndarray
    meltsliq: jnp.ndarray   # liquid runoff reaching the ice surface (kg/m^2)


def snow_effective_density(cfg_snow, smice, smliq, rhos_cmp):
    """Bulk snow density from mass contents + compaction (kg/m^3)."""
    rhos = cst.rhos + rhos_cmp
    return jnp.clip(rhos, cfg_snow.rhosmin, cfg_snow.rhosmax)


def update_rhos_wind(cfg_snow, dt, rhos_cmp, wind):
    """Wind compaction (Lecomte et al. 2013): drho/dt above windmin."""
    drho = cfg_snow.drhosdwind * jnp.maximum(wind - cfg_snow.windmin, 0.0) \
        * dt / cst.secday
    return jnp.clip(rhos_cmp + drho,
                    0.0, cfg_snow.rhosmax - cfg_snow.rhosmin)


def grain_metamorphism(cfg_snow, dt, rsnw, Tsno, smice, smliq, Tgrd=None,
                       rhos_eff=None):
    """Grain radius evolution: dry growth toward a warm-limit radius with
    temperature-gradient acceleration (or SNICAR-table rates when
    snw_aging_table != 'exponential'); wet growth from liquid content."""
    liq_frac = smliq / jnp.maximum(smice + smliq, cst.puny)
    table_kind = getattr(cfg_snow, "snw_aging_table", "exponential")
    if table_kind in ("test", "snicar", "file") and Tgrd is not None:
        # tabulated dry aging (init_snowtable path, snow_nml snw_aging_table)
        from .snowtable import (load_table_file, make_test_table,
                                table_aging_rate)
        table = (load_table_file(cfg_snow.snw_filename)
                 if table_kind == "file" and cfg_snow.snw_filename
                 else make_test_table())
        rhos_l = rhos_eff if rhos_eff is not None else \
            jnp.full_like(rsnw, cst.rhos)
        rate = table_aging_rate(table, Tsno * jnp.ones_like(rsnw), Tgrd,
                                rhos_l, rsnw, cfg_snow.rsnw_fall)
        rs_dry = rsnw + rate * dt
    else:
        # dry: equilibrium radius grows as snow warms toward 0C
        warm = jnp.clip(1.0 + Tsno / 20.0, 0.0, 1.0)    # 0 at -20C, 1 at 0C
        r_eq = cfg_snow.rsnw_fall + \
            (cfg_snow.rsnw_tmax - cfg_snow.rsnw_fall) * warm
        rs_dry = rsnw + (r_eq - rsnw) * (1.0 - jnp.exp(-dt / TAU_DRY))
    # wet: r^3 growth with liquid fraction cubed (Brun 1989)
    r3 = rs_dry ** 3 + C_WET * 1.0e9 * liq_frac ** 3 * dt
    rs = jnp.where(liq_frac > 1e-4, r3 ** (1.0 / 3.0), rs_dry)
    return jnp.clip(rs, cfg_snow.rsnw_fall, cfg_snow.rsnw_tmax)


def snow_liquid_budget(dt, *, smice, smliq, Tsno, melts_lyr, frain, fsnow,
                       aicen):
    """Update per-layer ice/liquid snow mass: melt converts ice->liquid,
    cold refreezes liquid->ice, rain adds liquid, liquid above the
    irreducible holding capacity (~3% of pore mass) drains downward."""
    mask = aicen > cst.puny
    # melt of snow (m of snow this step) removes from smice, adds to smliq
    dm_melt = jnp.minimum(melts_lyr * cst.rhos, smice)
    smice1 = smice - dm_melt
    smliq1 = smliq + dm_melt + jnp.where(mask, frain * dt, 0.0)
    # refreeze when cold: all liquid refreezes with timescale ~1h below -1C
    cold = Tsno < -0.1
    refrz = jnp.where(cold, smliq1 * jnp.minimum(dt / 3600.0, 1.0), 0.0)
    smice2 = smice1 + refrz
    smliq2 = smliq1 - refrz
    # drainage beyond holding capacity
    cap = 0.033 * smice2
    drain = jnp.maximum(smliq2 - cap, 0.0)
    smliq3 = smliq2 - drain
    return (jnp.where(mask, smice2, smice),
            jnp.where(mask, smliq3, smliq),
            jnp.where(mask, drain, 0.0))


def snow_redistribution(cfg_snow, dt, *, vsnon, aicen, alvl, wind):
    """snwredist: blowing-snow transfer from level to deformed ice
    (bulk parameterization: a fraction ~snwlvlfac of level-ice snow moves
    to ridges per day of strong wind)."""
    if cfg_snow.snwredist == "none":
        return vsnon, jnp.zeros_like(vsnon)
    blow = jnp.clip((wind - cfg_snow.windmin) / 10.0, 0.0, 1.0) * \
        dt / cst.secday
    frac_move = cfg_snow.snwlvlfac * blow
    lvl = jnp.clip(alvl, 0.0, 1.0)
    # snow leaves the level fraction; deposits uniformly on the deformed part
    dv = vsnon * frac_move * lvl
    # blown fraction lvl*dv is lost to leads/ocean — the reference's fsloss
    # / sisndmasswind mass-loss diagnostic (ice_history_snow.F90:217-229)
    lost = dv * lvl
    return vsnon - dv + dv * (1.0 - lvl), lost


def step_snow(cfg, dt, *, vsnon, aicen, trcrn, Tsno, melts, frain, fsnow,
              wind):
    """Full snow-physics step updating the 4 snow tracers + vsnon.

    Tsno: top snow layer temperature (ncat, ny, nx); melts: snow melt this
    step (m, per category). Returns (trcrn, meltsliq, vsnon) with
    dict-copied tracers (reference step_snow ice_step_mod.F90:1184)."""
    t = cfg.tracers
    if not t.tr_snow:
        return trcrn, jnp.zeros_like(aicen), vsnon, jnp.zeros_like(aicen)
    trcrn = dict(trcrn)
    nslyr = cfg.domain.nslyr
    smice, smliq = trcrn["smice"], trcrn["smliq"]
    rhos_cmp, rsnw = trcrn["rhos_cmp"], trcrn["rsnw"]

    mask3 = (aicen > cst.puny)[:, None]
    hs = jnp.where(aicen > cst.puny,
                   vsnon / jnp.maximum(aicen, cst.puny), 0.0)
    hslyr = hs / nslyr
    # default ice content when tracers are uninitialized (fresh snowfall)
    smice = jnp.where(smice > cst.puny, smice,
                      jnp.where(mask3, cst.rhos * hslyr[:, None], 0.0))

    melts_lyr = melts[:, None] / nslyr
    meltsliq = jnp.zeros_like(aicen)
    smice_n, smliq_n, drain = snow_liquid_budget(
        dt, smice=smice, smliq=smliq, Tsno=Tsno[:, None],
        melts_lyr=melts_lyr, frain=frain[None] / nslyr,
        fsnow=fsnow[None], aicen=aicen[:, None])
    meltsliq = jnp.sum(drain, axis=1)

    # snowpack temperature gradient proxy: surface at Tsno, base near 0C
    Tgrd = jnp.abs(Tsno[:, None]) / jnp.maximum(hslyr[:, None] * nslyr, 0.05)
    rsnw_n = grain_metamorphism(cfg.snow, dt, rsnw, Tsno[:, None],
                                smice_n, smliq_n, Tgrd=Tgrd,
                                rhos_eff=snow_effective_density(
                                    cfg.snow, smice_n, smliq_n, rhos_cmp))
    # fresh snowfall resets the top layer radius toward rsnw_fall
    new_frac = jnp.clip(fsnow[None] * dt /
                        jnp.maximum(cst.rhos * hslyr[:, None], cst.puny),
                        0.0, 1.0)
    rsnw_top = rsnw_n.at[:, 0].set(
        rsnw_n[:, 0] * (1.0 - new_frac[:, 0]) +
        cfg.snow.rsnw_fall * new_frac[:, 0])

    rhos_n = update_rhos_wind(cfg.snow, dt, rhos_cmp, wind[None])

    vsnon_n = vsnon
    vsn_lost = jnp.zeros_like(aicen)
    if cfg.snow.snwredist != "none" and "alvl" in trcrn:
        vsnon_n, vsn_lost = snow_redistribution(
            cfg.snow, dt, vsnon=vsnon, aicen=aicen, alvl=trcrn["alvl"],
            wind=wind[None][0])

    trcrn["smice"] = smice_n
    trcrn["smliq"] = smliq_n
    trcrn["rhos_cmp"] = jnp.where(mask3, rhos_n, rhos_cmp)
    trcrn["rsnw"] = jnp.where(mask3, rsnw_top, rsnw)
    # fsloss (kg/m^2/s, per category plane): wind-blown snow mass to ocean
    fsloss = cst.rhos * vsn_lost / dt
    return trcrn, meltsliq, vsnon_n, fsloss
