"""Model driver: initialization, run loop, finalize.

TPU-native analogue of cicecore/drivers/standalone/cice/ (CICE.F90:30-57
Initialize/Run/Finalize; CICE_InitMod.F90:62 `cice_init`; CICE_RunMod.F90:46
`CICE_Run`). One `Model` object owns config, grid, static tables, and the
prognostic state; `Model.step()` advances one coupled timestep through the
jitted `model_step`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..calendar import Calendar
from ..columns import itd as itd_mod
from ..columns.ocean import freezing_temperature
from ..columns.thermo_vertical import (bl99_salinity, enthalpy_ice,
                                       enthalpy_snow, melting_temps)
from ..core.grid import Grid, make_grid
from .flux import Forcing, zeros_forcing
from .forcing import get_forcing
from .state import State, tracer_registry, zeros_state
from .step import ModelStatic, model_step

# shared across Model instances: ModelStatic is hashable (static arg), Grid
# is an array pytree, so two Models with equal config + grid shapes hit the
# same compiled executable instead of retracing
_model_step_jit = jax.jit(model_step, static_argnums=(0,),
                          static_argnames=("dt",))


def set_state_var(cfg, grid: Grid, state: State, Tf) -> State:
    """Initial ice distribution (reference set_state_var ice_init.F90:3266,
    ice_ic='default'): ice where the surface would freeze, parabolic ITD."""
    ncat = cfg.domain.ncat
    nilyr, nslyr = cfg.domain.nilyr, cfg.domain.nslyr
    dtp = state.aicen.dtype
    hin_max = itd_mod.category_bounds(ncat, cfg.grid.kcatbound, nilyr,
                                      cfg.thermo.kitd)
    ainit, hinit = itd_mod.initial_itd_profile(ncat, hin_max)

    # ice where latitude is poleward of ~60deg (edge_init defaults) over ocean
    lat = np.asarray(grid.TLAT) * cst.rad_to_deg
    tmask = np.asarray(grid.tmask)
    icemask = tmask & ((lat > 60.0) | (lat < -60.0))
    icemask_j = jnp.asarray(icemask)

    salin = bl99_salinity(nilyr)
    Tmlt = melting_temps(salin)

    aicen = []
    vicen = []
    vsnon = []
    Tsfc0 = jnp.where(icemask_j, -5.0, 0.0).astype(dtp)
    trcrn = dict(state.trcrn)
    for n in range(ncat):
        a = jnp.where(icemask_j, float(ainit[n]), 0.0).astype(dtp)
        aicen.append(a)
        vicen.append(a * float(hinit[n]))
        vsnon.append(a * float(min(0.2, 0.2 * hinit[n])))  # initial snow depth
    aicen = jnp.stack(aicen)
    vicen = jnp.stack(vicen)
    vsnon = jnp.stack(vsnon)

    # linear initial temperature profile between Tsfc and Tf -> enthalpies
    qice = []
    for k in range(nilyr):
        zf = (k + 0.5) / nilyr
        Tlay = Tsfc0 * (1.0 - zf) + Tf * zf
        Tlay = jnp.minimum(Tlay, float(Tmlt[k]) - 0.1)
        if cfg.thermo.ktherm == 2:
            from ..columns.mushy import enthalpy_mush
            qice.append(enthalpy_mush(Tlay, jnp.full_like(Tlay,
                                                          float(salin[k]))))
        else:
            qice.append(enthalpy_ice(Tlay, float(Tmlt[k])))
    qice = jnp.stack(qice)                       # (nilyr, ny, nx)
    qsno = enthalpy_snow(jnp.minimum(Tsfc0, -1.0))

    trcrn["Tsfcn"] = jnp.broadcast_to(Tsfc0, (ncat,) + grid.shape).astype(dtp)
    trcrn["qice"] = jnp.broadcast_to(qice[None], (ncat, nilyr) + grid.shape).astype(dtp)
    trcrn["qsno"] = jnp.broadcast_to(qsno[None, None],
                                     (ncat, nslyr) + grid.shape).astype(dtp)
    trcrn["sice"] = jnp.broadcast_to(
        jnp.asarray(salin, dtp)[None, :, None, None],
        (ncat, nilyr) + grid.shape)
    if "alvl" in trcrn:
        trcrn["alvl"] = jnp.where(aicen > 0, 1.0, 0.0).astype(dtp)
        trcrn["vlvl"] = jnp.where(vicen > 0, 1.0, 0.0).astype(dtp)
    if "FY" in trcrn:
        trcrn["FY"] = jnp.where(aicen > 0, 1.0, 0.0).astype(dtp)
    if "fsd" in trcrn:
        # start with all area in the smallest floe-size bin
        trcrn["fsd"] = jnp.zeros_like(trcrn["fsd"]).at[:, 0].set(1.0)
    def _init_bgc(nm, v0):
        # skl tracers are (ncat, ny, nx); z tracers are (ncat, nb, ny, nx).
        # Fill against zeros_like so 4-D tracers keep their layer dim —
        # where(mask[:, None], scalar, scalar) would collapse (ncat, nb,
        # ny, nx) to (ncat, 1, ny, nx) (round-2 latent bug exposed by the
        # packed ITD machinery's shape checks)
        if nm not in trcrn:
            return
        m = aicen > 0
        if trcrn[nm].ndim == 4:
            m = m[:, None]
        trcrn[nm] = jnp.where(m, jnp.asarray(v0, dtp),
                              jnp.zeros_like(trcrn[nm])).astype(dtp)

    if "bgc_Nit" in trcrn:
        _init_bgc("bgc_Nit", cfg.zbgc.nit_data)
        _init_bgc("bgc_N", 0.5)
    for nm, v0 in (("bgc_N2", 0.3), ("bgc_N3", 0.2),
                   ("bgc_Am", cfg.zbgc.amm_data),
                   ("bgc_Sil", cfg.zbgc.sil_data),
                   ("bgc_DMSPp", 0.1), ("bgc_DMSPd", cfg.zbgc.dms_data),
                   ("bgc_DMS", cfg.zbgc.dms_data), ("bgc_PON", 0.1),
                   ("bgc_DON", 1.0), ("bgc_Fed", cfg.zbgc.fed_data),
                   ("bgc_Fep", 0.1), ("bgc_hum", cfg.zbgc.hum_data),
                   ("bgc_DOC1", cfg.zbgc.doc_data),
                   ("bgc_DOC2", cfg.zbgc.doc_data),
                   ("bgc_DOC3", cfg.zbgc.doc_data),
                   ("bgc_DIC1", cfg.zbgc.dic_data)):
        _init_bgc(nm, v0)
    # z-tracer companions: mobile fraction starts fully mobile; aerosols
    # start clean
    for nm in list(trcrn):
        if nm.endswith("_mf"):
            _init_bgc(nm, 1.0)
        elif nm.startswith("zaero"):
            _init_bgc(nm, 0.0)
    if "fbri" in trcrn:
        trcrn["fbri"] = jnp.where(aicen > 0, 1.0, 0.0).astype(dtp)
    if "rsnw" in trcrn:
        trcrn["rsnw"] = jnp.full_like(trcrn["rsnw"], cfg.snow.rsnw_fall)
        trcrn["smice"] = jnp.where(
            vsnon[:, None] > 0,
            cst.rhos * vsnon[:, None] / jnp.maximum(aicen[:, None], 1e-6) /
            cfg.domain.nslyr, 0.0).astype(dtp)

    sst = jnp.where(icemask_j, Tf, jnp.maximum(Tf, -1.0)).astype(dtp)
    return state.replace(aicen=aicen, vicen=vicen, vsnon=vsnon, trcrn=trcrn,
                         sst=sst)


class Model:
    """Standalone model instance (cice_init + CICE_Run equivalents)."""

    def __init__(self, cfg, grid: Optional[Grid] = None,
                 enable_history: bool = False, mesh=None):
        if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
            # without this, jnp silently truncates every array to f32 and
            # the run is NOT the f64 run the user asked for
            jax.config.update("jax_enable_x64", True)
        self.cfg = cfg
        self.grid = grid if grid is not None else make_grid(cfg)
        self.static = ModelStatic.build(cfg, mesh=mesh)
        # use_leap_years / days_per_year resolve to the calendar type
        # (reference ice_calendar init_calendar consistency checks)
        cal_type = cfg.setup.calendar_type
        if cfg.setup.use_leap_years and cal_type == "noleap":
            cal_type = "gregorian"
        expected = {"noleap": 365, "gregorian": 365, "360day": 360}[cal_type]
        if cfg.setup.days_per_year != expected:
            raise ValueError(
                f"days_per_year={cfg.setup.days_per_year} inconsistent with "
                f"calendar_type='{cal_type}' (expected {expected})")
        self.calendar = Calendar(
            calendar_type=cal_type, year=cfg.setup.year_init,
            month=cfg.setup.month_init, day=cfg.setup.day_init,
            sec=cfg.setup.sec_init, year_init=cfg.setup.year_init)
        self.forcing = zeros_forcing(self.grid.shape, cfg.np_dtype)
        if cfg.forcing.default_season == "summer":
            # pre-first-read air state (forcing_nml default_season)
            warm = jnp.full(self.grid.shape, 273.15 + 2.0, cfg.np_dtype)
            self.forcing = self.forcing.replace(Tair=warm, potT=warm)
        from .forcing import default_ocn
        self.forcing = default_ocn(self.grid, cfg, self.forcing)
        self.state = zeros_state(cfg, self.grid)
        if cfg.setup.runtype == "continue":
            if cfg.setup.restart_format == "pio":
                from ..io.pio import read_restart_sharded
                self.state, self.calendar = read_restart_sharded(
                    cfg.setup.pointer_file, self.state)
            else:
                from ..io.restart import read_restart
                self.state, self.calendar = read_restart(
                    cfg.setup.pointer_file, self.state)
        elif cfg.setup.ice_ic == "default":
            self.state = set_state_var(cfg, self.grid, self.state,
                                       self.forcing.Tf)
        # one process-wide jit of model_step shared by every Model instance
        # (a per-instance partial would defeat jax's trace cache: each suite
        # row / restart re-init would retrace+recompile the whole step)
        self._step_jit = partial(_model_step_jit, self.static, self.grid)
        from ..utils.timers import Timers
        self.timers = Timers().init_standard()
        # boundary-restore target = the run's INITIAL state (reference
        # ice_HaloRestore_init captures it at initialization, not lazily)
        self._restore_target = None
        self._restore_zone = None
        if cfg.forcing.restore_ice:
            from .restoring import make_restore_target
            self._restore_target = make_restore_target(cfg, self.state)
        self.flux = None
        self.io_writer = None
        if cfg.setup.io_async:
            from ..io.async_writer import AsyncWriter
            self.io_writer = AsyncWriter(cfg.setup.io_nthreads)
        self.history = None
        if enable_history:
            from ..io.history import History
            self.history = History(cfg, self.grid, writer=self.io_writer)
        self.diag_log: list = []

    def step(self):
        self.timers.start("Total")
        state_pre = self.state      # for budget closure (no copy: functional)
        with self.timers("Forcing"):
            fc = get_forcing(self.cfg, self.grid,
                             float(self.calendar.elapsed_seconds),
                             self.calendar.fyday, self.state.aice,
                             self.forcing, year=self.calendar.year,
                             sec_of_year=(self.calendar.fyday - 1.0) *
                             cst.secday)
            self.forcing = fc
        if self.cfg.setup.prescribed_ice:
            # AMIP-style prescribed concentration (ice_prescribed_mod):
            # reset the ITD to the data before the (thermo-only) step
            from .prescribed import prescribe_ice_state
            aice_dat = self._prescribed_aice(fc)
            self.state = prescribe_ice_state(self.cfg, self.grid, self.state,
                                             aice_dat, self.static.hin_max)
        with self.timers("TimeLoop"):
            self.state, self.flux = self._step_jit(self.state, fc,
                                                   dt=self.cfg.setup.dt)
            if self.cfg.forcing.restore_ice or self.cfg.forcing.restore_ocn:
                from .restoring import restore_ice, restore_sst
                if self.cfg.forcing.restore_ice:
                    if self._restore_target is None:
                        from .restoring import make_restore_target
                        self._restore_target = make_restore_target(
                            self.cfg, self.state)
                        self._restore_zone = None
                    from .restoring import boundary_zone_weight
                    if self._restore_zone is None:
                        self._restore_zone = boundary_zone_weight(self.grid)
                    self.state = restore_ice(self.cfg, self.grid, self.state,
                                             self._restore_target,
                                             self.cfg.setup.dt,
                                             zone=self._restore_zone)
                if self.cfg.forcing.restore_ocn:
                    self.state = restore_sst(self.cfg, self.state,
                                             fc.sst_data, self.cfg.setup.dt)
            jax.block_until_ready(self.state.aicen)
        prev_year = self.calendar.year
        self.calendar = self.calendar.advance(self.cfg.setup.dt)
        if self.calendar.year != prev_year:
            # yearly reset of melt/freeze onset diagnostics (reference
            # resets mlt_onset/frz_onset with the annual history cycle)
            z = jnp.zeros_like(self.state.mlt_onset)
            self.state = self.state.replace(mlt_onset=z, frz_onset=z)

        # analysis / IO phases (reference ice_step tail, CICE_RunMod:375-420)
        self.timers.start("History")
        if self.history is not None:
            self.history.accum(self.state, self.flux, self.forcing)
            self.history.maybe_write(self.calendar,
                                     fmt=self.cfg.setup.history_format)
        if self.cfg.setup.diagfreq and \
                self.calendar.istep % self.cfg.setup.diagfreq == 0:
            from .diagnostics import (check_state, print_points_state,
                                      runtime_diags, total_energy,
                                      total_water_mass)
            d = runtime_diags(self.grid, self.state)
            rec = {k: float(v) for k, v in d.items()}
            if self.cfg.setup.conserv_check:
                # conservation series + NaN/instability watchdog
                # (reference conserv_check + check_umax/diagnostic_abort)
                rec["total_energy"] = float(total_energy(self.grid,
                                                         self.state))
                rec["total_water"] = float(total_water_mass(self.grid,
                                                            self.state))
                # heat/freshwater budget closure over this step (reference
                # ice_diagnostics.F90:243-530); water must close to
                # roundoff — abort otherwise
                from .diagnostics import hemispheric_budgets
                bud = hemispheric_budgets(
                    self.grid, state_pre, self.state, self.flux,
                    self.forcing, self.cfg.setup.dt,
                    frazil_in_fresh=self.cfg.forcing.update_ocn_f,
                    pond_lvl=self.cfg.tracers.tr_pond_lvl)
                rec.update({f"bud_{k}": float(v) for k, v in bud.items()})
                wscale = max(abs(rec["bud_dM"]), abs(rec["bud_water_in"]),
                             1.0)
                # observed closure is ~5e-4 relative (a small snow-ice /
                # brine-volume bookkeeping term, VALIDATION.md); 1% catches
                # any genuinely lost budget term. Prescribed-ice resets and
                # boundary/SST restoring change mass with no flux term, so
                # the residual is meaningless there and the abort is
                # disabled (the reference likewise skips conservation
                # aborts for prescribed runs)
                wtol = 1e-2
                nudged = (self.cfg.setup.prescribed_ice or
                          self.cfg.forcing.restore_ice or
                          self.cfg.forcing.restore_ocn)
                if not nudged and \
                        abs(rec["bud_water_residual"]) > wtol * wscale:
                    self.write_restart()
                    self.flush_io()
                    raise RuntimeError(
                        "freshwater budget closure violated at step "
                        f"{self.calendar.istep}: residual "
                        f"{rec['bud_water_residual']:.3e} kg vs budget "
                        f"{wscale:.3e} kg (early checkpoint written)")
                w = check_state(self.state)
                if bool(w["nonfinite"]):
                    self.write_restart()
                    self.flush_io()
                    raise FloatingPointError(
                        f"non-finite state at step {self.calendar.istep} "
                        f"(early checkpoint written)")
                # transport safety rails (reference transport_remap
                # conservation/monotonicity aborts,
                # ice_transport_driver.F90:594-697; checked at diagfreq
                # cadence to avoid a per-step host sync)
                tc = getattr(self.flux, "transport_checks", None) or {}
                if tc:
                    import numpy as _np
                    tol = 1e-9 if self.state.aice.dtype == jnp.float64 \
                        else 1e-4
                    cons = max(float(tc.get("cons_err_area", 0.0)),
                               float(tc.get("cons_err_tracer", 0.0)))
                    rec["transport_cons_err"] = cons
                    bad = []
                    if bool(tc.get("oob", False)):
                        bad.append("departure points out of bounds")
                    if bool(tc.get("neg_mass", False)):
                        bad.append("negative mass after remap")
                    if bool(tc.get("mono_violation", False)):
                        bad.append("tracer monotonicity violation")
                    if cons > tol:
                        bad.append(f"global conservation error {cons:.3e}")
                    if bad:
                        self.write_restart()
                        self.flush_io()
                        raise RuntimeError(
                            "transport check failed at step "
                            f"{self.calendar.istep}: {'; '.join(bad)} "
                            "(early checkpoint written)")
            if self.cfg.setup.print_points:
                rec["points"] = print_points_state(
                    self.grid, self.state, self.cfg.setup.latpnt,
                    self.cfg.setup.lonpnt)
            self.diag_log.append(rec)
        if self.cfg.setup.debug_model and \
                self.calendar.istep >= self.cfg.setup.debug_model_step:
            from .diagnostics import debug_ice, print_points_state
            i, j = self.cfg.setup.debug_model_i, self.cfg.setup.debug_model_j
            if i < 0 or j < 0:
                p = print_points_state(self.grid, self.state,
                                       self.cfg.setup.latpnt,
                                       self.cfg.setup.lonpnt)[0]
                i, j = p["i"], p["j"]
            print(f"debug_model step {self.calendar.istep}:",
                  debug_ice(self.grid, self.state, j, i, stage="post_step"))
        if self.calendar.is_boundary(self.cfg.setup.dumpfreq,
                                     self.cfg.setup.dumpfreq_n,
                                     self.cfg.setup.dt):
            self.write_restart()
        self.timers.stop("History")
        self.timers.stop("Total")

    def _prescribed_aice(self, fc):
        """Ice-coverage data for prescribed mode: an `ice_cov` stream file
        when configured, else a seasonal analytic cover (high-lat cap)."""
        import numpy as np
        f = self.cfg.forcing
        if f.atm_data_dir:
            path = f"{f.atm_data_dir}/ice_cov.npz"
            try:
                with np.load(path) as z:
                    cov = z["ice_cov"]
                month = self.calendar.month - 1
                return cov[month % cov.shape[0]]
            except FileNotFoundError:
                pass
        lat = self.grid.TLAT
        phase = np.cos(2.0 * np.pi * (self.calendar.fyday - 80.0) / 365.0)
        edge_nh = (68.0 - 8.0 * phase) * np.pi / 180.0
        edge_sh = -(62.0 + 6.0 * phase) * np.pi / 180.0
        return jnp.where((lat > edge_nh) | (lat < edge_sh), 0.95, 0.0)

    def write_restart(self):
        if self.cfg.setup.restart_format == "pio":
            from ..io.pio import write_restart_sharded
            return write_restart_sharded(self.cfg.setup.restart_dir,
                                         self.state, self.calendar,
                                         self.cfg.setup.pointer_file,
                                         writer=self.io_writer)
        from ..io.restart import write_restart
        return write_restart(self.cfg.setup.restart_dir, self.state,
                             self.calendar, self.cfg.setup.pointer_file,
                             prefix=self.cfg.setup.restart_file,
                             fmt=self.cfg.setup.restart_format,
                             writer=self.io_writer)

    def flush_io(self) -> int:
        """Durability barrier for async IO (no-op when io_async is off)."""
        if self.io_writer is None:
            return 0
        errs = self.io_writer.flush()
        if errs:
            raise IOError(f"{errs} async history/restart writes failed")
        return errs

    def run(self, nsteps: Optional[int] = None):
        from ..calendar import npt_to_steps
        n = nsteps if nsteps is not None else npt_to_steps(
            self.cfg.setup.npt, self.cfg.setup.npt_unit, self.cfg.setup.dt,
            self.calendar)
        for _ in range(n):
            self.step()
        if self.cfg.setup.dump_last:
            self.write_restart()
        self.flush_io()
        return self.state
