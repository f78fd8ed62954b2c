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
    del T0n   # secant pairing unused: dq/dT of the exact branch suffices
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

# Convective-flux efficiency of mushy-layer chimney convection: the
# dimensionless brine flux above onset grows linearly in the supercriticality,
# F ~ alpha*(Ra - Rac), with alpha = O(0.03) from steady-chimney solutions
# (Rees Jones & Worster 2014, JFM 742; same law underlies the Griewank &
# Notz 2013 1-D convection parameterization). The marginal-stability
# consequence — growing ice self-regulates its bulk salinity so that the
# local Ra hovers at Rac — is the observed behavior (Notz & Worster 2009)
# and is asserted by tests/test_mushy.py.
ALPHA_CONV = 0.03
A_CHANNEL_REF = 0.5e-3      # reference brine-channel diameter (m) — the
                            # Icepack default a_rapid_mode; Poiseuille
                            # throughput scales as (a/a_ref)^2 per channel
                            # at fixed channel density


def drain_salinity(cfg_th, dt, *, S_layers, T_layers, hilyr, sss, nilyr):
    """Two-mode convective gravity drainage — prognostic bulk-salinity
    evolution of the mushy layer (reference icepack_therm_mushy.F90 gravity
    drainage; Turner, Hunke & Elliott 2013 two-mode parameterization).

    Rapid mode (brine-channel convection). For each layer k the local mush
    Rayleigh number is measured over the column from the layer midpoint to
    the ice base (Notz & Worster 2009):

        Ra_k = g beta (S_br,k - S_sw) Pi_min,k L_k / (kappa nu)

    with Pi(phi) the Freitag (1999) cubic percolation permeability and
    Pi_min,k its minimum over the layers below k (the flow bottleneck).
    Where Ra_k exceeds Rac (`Rac_rapid_mode`), chimney convection flushes
    the pore space: ocean water (S_sw) enters through the mush while layer
    brine (S_br,k) leaves down the channels. The Darcy flushing velocity
    follows the linear supercriticality flux law of steady-chimney theory,

        w_k = ALPHA_CONV (a/a_ref)^2 / lambda^2 * kappa (Ra_k - Rac) / L_k

    (a = `a_rapid_mode` channel diameter: per-channel Poiseuille throughput
    ~ a^2 at fixed density; lambda = `aspect_rapid_mode` channel-spacing
    aspect ratio: channel density ~ 1/lambda^2). Pore-brine replacement at
    Darcy flux w changes bulk salinity (S = phi S_br) at

        dS_k/dt = (w_k / dz) (phi_k S_sw - S_k)

    which is exactly conservative against the ocean reservoir and
    self-limiting: as S drops, Ra_k falls back to Rac and convection shuts
    off (marginal stability).

    Slow mode. Below the convective threshold, residual drainage continues
    wherever the mush stays permeable (phi > `phi_c_slow_mode`) at the
    constant Darcy velocity |`dSdt_slow_mode`| (m/s) — the reference's
    long-term background desalination of maturing ice.

    Enthalpy advection by the drained brine is neglected (phase equilibrium
    is re-established by the implicit solve each step; the associated heat
    flux is O(w rho c dT) ~ 0.1 W/m^2 at peak drainage).

    Returns (new S layers list, fsalt_drain [kg/m^2/s to ocean]).
    """
    # permeability bottleneck: running minimum from the base upward
    phi_l = [liquid_fraction(T_layers[k], S_layers[k]) for k in range(nilyr)]
    perm = [PERM_A * (jnp.maximum(phi_l[k] - PHI_PERC, 0.0) /
                      (1.0 - PHI_PERC)) ** 3 for k in range(nilyr)]
    perm_min = [None] * nilyr
    running = perm[nilyr - 1]
    for k in range(nilyr - 1, -1, -1):
        running = jnp.minimum(running, perm[k])
        perm_min[k] = running

    geom = (cfg_th.a_rapid_mode / A_CHANNEL_REF) ** 2 / \
        max(cfg_th.aspect_rapid_mode, 1e-8) ** 2
    w_slow0 = jnp.abs(jnp.asarray(cfg_th.dSdt_slow_mode))

    fsalt = jnp.zeros_like(S_layers[0])
    S_out = []
    for k in range(nilyr):
        S = S_layers[k]
        T = T_layers[k]
        phi = phi_l[k]
        Sbr = liquidus_brine_salinity(T)
        L = jnp.maximum(hilyr * (nilyr - k - 0.5), 1e-6)   # midpoint->base
        Ra = (GRAV * BETA_S * jnp.maximum(Sbr - sss, 0.0) * perm_min[k] * L /
              (KAPPA_T * NU_BRINE))
        super_c = jnp.maximum(Ra - cfg_th.Rac_rapid_mode, 0.0)
        w_rapid = ALPHA_CONV * geom * KAPPA_T * super_c / L
        slow_on = ((phi > cfg_th.phi_c_slow_mode) &
                   (Sbr > sss)).astype(S.dtype)
        w = w_rapid + w_slow0 * slow_on
        # pore flushing toward the ocean-equilibrated bulk salinity
        # phi*S_sw; exponential-form update keeps the step monotone and
        # unconditionally stable for any w*dt/dz
        dz = jnp.maximum(hilyr, 1e-6)
        f_flush = 1.0 - jnp.exp(-w * dt / dz)
        dS = f_flush * jnp.maximum(S - phi * sss, 0.0)
        S_out.append(S - dS)
        fsalt = fsalt + dS * 1e-3 * cst.rhoi * hilyr / dt
    return S_out, fsalt
