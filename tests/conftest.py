"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the TPU tunnel env (axon) is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# compile-time knobs: the full model step is a ~25k-instruction module and
# XLA:CPU's LLVM tail is superlinear in it; these cut whole-suite compile
# wall ~2x at identical numerics (scheduling/codegen only). CPU tests only —
# bench.py and the TPU path never see these flags.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend and sets
# jax_platforms="axon,cpu" — override AFTER import so unit tests run on the
# local CPU backend (fast, deterministic), not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # f64 available for oracle tests

# NO persistent compilation cache under pytest: re-validated on jax 0.9
# (round 3) — a full-suite run still ABORTS in cache deserialization
# (get_executable_and_time SIGABRT, reproduced at
# test_io_hdf5::test_driver_continue_from_hdf5 after ~50 green tests).
# ROOT CAUSE identified round 4 (tools/jit_cache_repro.py): XLA:CPU AOT
# cache entries record compile-time tuning flags (+prefer-no-scatter,
# +prefer-no-gather) as target MACHINE FEATURES; on reload
# cpu_aot_loader's host-feature check rejects them as unsupported and
# its own error text warns of "execution errors such as SIGILL" — i.e.
# deserialized CPU executables are not feature-safe on this jaxlib.
# The whole suite runs in one process, so the in-process jit cache
# (driver._model_step_jit) already dedupes recompiles; the on-disk cache
# only ever helped across processes and is kept for TPU CLI/bench
# entries (the TPU backend does not take this AOT loader path).
os.environ["CICE_TPU_NO_JIT_CACHE"] = "1"

# Tests exercise the fused Pallas remap kernel through the interpreter on
# the CPU backend; production code falls back to the XLA path instead.
os.environ.setdefault("CICE_TPU_PALLAS_INTERPRET", "1")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Tiered suite (reference quick_suite vs base_suite split,
# configuration/scripts/tests/quick_suite.ts): tests measured > 25 s on the
# 2-CPU reference runner are marked `slow` centrally here (compile-dominated
# end-to-end runs). The default gate (`pytest tests -q`, see pytest.ini
# addopts) runs everything else in < 10 min; `pytest tests -m slow` is the
# nightly/second-CI-job tier. Durations source: full-suite runs recorded in
# round 3 (PROGRESS notes).
# ---------------------------------------------------------------------------
_SLOW = {
    "test_io_hdf5.py::test_driver_continue_from_hdf5",
    "test_sharding.py::test_full_step_sharded",
    "test_io_hdf5.py::test_history_hdf5_chunks_deflate",
    "test_hbrine_bgc_net.py::test_model_with_brine_and_full_bgc",
    "test_formdrag.py::test_model_runs_with_formdrag",
    "test_evp_c.py::test_cdgrid_end_to_end_step",
    "test_io_hdf5.py::test_restart_hdf5_bfb",
    "test_fixtures.py::test_ncar_file_forcing_step",
    "test_async_io.py::test_driver_io_async_run_bfb",
    "test_salt_pond_options.py::test_model_smoke_sealvl_saltflux",
    "test_restart.py::test_restart_bfb",
    "test_restart.py::test_pointer_file",
    "test_vp.py::test_precond_variants_agree",
    "test_fixtures.py::test_jra55_file_forcing_step",
    "test_evp_wide.py::test_model_step_wide_halo",
    "test_evp_c.py::test_c_grid_coupler_exports_nonzero",
    "test_budgets.py::test_water_budget_summer_melt_ponds",
    "test_budgets.py::test_driver_abort_on_violation",
    "test_vp.py::test_anderson_accelerates_picard",
    "test_model_smoke.py::test_model_winter_grows_ice",
    "test_budgets.py::test_water_budget_cold_growth",
    "test_budgets.py::test_water_budget_update_ocn_f",
    "test_coupling.py::test_import_export_round",
    "test_model_smoke.py::test_model_runs_and_stays_physical",
    "test_vp.py::test_vp_matches_converged_evp",
    "test_snow_fsd.py::test_snow_fsd_end_to_end",
    "test_vp.py::test_vp_residual_decreases",
    "test_async_io.py::test_restart_cdf1_bfb",
    "test_tripole_model.py::test_tripole_smoke",
    "test_async_io.py::test_restart_async_bfb",
    "test_new_components.py::test_prescribed_ice_mode",
    "test_mushy.py::test_ktherm2_end_to_end",
    "test_forcing_files.py::test_model_runs_from_forcing_files",
    "test_aero_iso_bgc.py::test_tracers_end_to_end",
    "test_evp_wide.py::test_mesh_shape_invariance",
    "test_model_smoke.py::test_model_no_dynamics_mode",
    "test_evp_pallas.py::test_pallas_k_fuse_invariance",
    "test_remap_exact.py::test_translation_accuracy",
    "test_transport.py::test_remap_less_diffusive_than_upwind",
    "test_budgets.py::test_heat_budget_residual_bounded",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = "::".join([os.path.basename(str(item.fspath)), item.name])
        base = key.split("[")[0]
        if key in _SLOW or base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def devices8():
    return jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_accumulation():
    """Drop jit caches at module boundaries: XLA:CPU aborts (SIGABRT in
    backend_compile_and_load) after ~140 accumulated whole-model
    compilations in one process (reproduced twice at the same suite
    position; the same test passes alone and in short prefixes). Bounding
    live executables keeps a full-suite run inside one process viable;
    within-module jit sharing (the expensive model_step reuse) is
    preserved."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
