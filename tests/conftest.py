"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

This mirrors the driver's multi-chip dry-run environment
(``xla_force_host_platform_device_count``) so sharding tests exercise real
SPMD partitioning without TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The surrounding environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize imports jax before conftest runs, so env vars are too late —
# force the platform through the live config instead.
jax.config.update("jax_platforms", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

# Parity tests compare against fp32 torch references; JAX's CPU backend
# (oneDNN) and TPU both default to reduced-precision matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

# ---------------------------------------------------------------------------
# Smoke profile: `-m "not slow"` (~12 min solo on the 1-core host) vs the
# full suite (~45 min solo; CLAUDE.md has the batching guidance when other
# jobs share the core).  One central list, measured from the full-suite
# `--durations` report (anything ≥ ~30 s solo): these train real (250+
# step) models, run multi-process drivers, or render at full shapes.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_pose.py::test_pose_registration_recovers_injected_jitter",
    "test_pose.py::test_pose_cli_and_resume",
    "test_eval_quality.py",                      # module: trained fixture
    "test_eval_split.py::test_pose_refiner_recovers_jitter_against_frozen_model",
    "test_eval_split.py::test_pose_refiner_recovers_harder_jitter",
    "test_eval_split.py::test_eval_cli_matches_training_validation",
    "test_dynamic.py::test_dynamic_beats_static_on_moving_scene",
    "test_dynamic.py::test_dynamic_eval_renders_differ_across_time",
    "test_dynamic.py::test_kp_time_res_without_times_warns",
    "test_dynamic.py::test_dynamic_cli_end_to_end",
    "test_async_val.py::test_async_val_matches_sync",
    "test_async_val.py::test_async_val_drains_before_exports",
    "test_kplanes.py::test_cli_train_smoke",
    "test_kplanes.py::test_eval_kp_pool_cli",
    "test_kplanes.py::test_kp_tv_weight_train_step_smooths_tables",
    "test_e2e_cli.py::test_train_validate_checkpoint_resume",
    "test_e2e_cli.py::test_vanilla_with_auto_kind_resolves_dataset_branch",
    "test_e2e_cli.py::test_unbounded_360_stack_cli",
    "test_e2e_cli.py::test_render_only",
    "test_e2e_cli.py::test_llff_ndc_smoke",
    "test_sampling.py::test_distortion_weight_changes_total_not_metric",
    "test_appearance.py::test_trainer_cli_end_to_end",
    "test_appearance.py::test_codes_absorb_exposure_jitter",
    "test_multiprocess.py",                      # module: 2-proc drivers
    "test_proposal.py::test_cli_proposal_e2e",
    "test_proposal.py::test_distortion_anneal_ramp",
    "test_occupancy.py::test_occupancy_resume_equivalence",
    "test_occupancy.py::test_gridless_checkpoint_falls_back_to_rebuild",
    "test_occupancy.py::test_cli_occupancy_smoke",
    "test_occupancy.py::test_occ_explore_anneal_train_step",
    "test_scan_steps.py::test_cli_scan_steps_hits_boundaries",
    "test_scan_steps.py::test_scan_chunk_skipped_count",
    "test_scan_steps.py::test_scan_chunk_equals_singles",
    "test_sharding.py::test_driver_dryrun",
    "test_sharding.py::test_sharded_fused_eval_matches_xla_and_single_device",
    "test_sharding.py::test_trainer_mesh_slices_cli",
    "test_checkpoints.py::test_orbax_cli_resume",
    "test_checkpoints.py::test_orbax_resume_prefers_newer_tagged_npz",
    "test_hashgrid.py::test_cli_hashgrid_smoke",
    "test_sh.py::test_sh_trainer_cli",
}


def pytest_collection_modifyitems(items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        key = f"{fname}::{item.name.split('[')[0]}"
        if key in _SLOW_TESTS or fname in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def golden():
    """Load golden fixtures generated from the PyTorch reference.

    Regenerate with ``python tests/golden/gen_golden.py`` (requires the
    read-only reference checkout at /root/reference).
    """
    path = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixtures not generated")
    return dict(np.load(path, allow_pickle=True))
