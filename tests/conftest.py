"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's axon TPU plugin force-prepends itself to jax_platforms at
# plugin registration, overriding the env var — override it back after import
# so tests run on the virtual CPU mesh (and not through the TPU tunnel).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA-compile cache for the suite: one full run performs ~200
# distinct CPU compiles, and the XLA:CPU compiler has crashed (SIGSEGV/abort)
# deep into a single long-lived process near the end of the suite (twice at
# ~95%, in a compile that passes in isolation). Caching makes re-runs skip
# almost every compile, which both speeds the suite and shrinks the crash
# exposure window; if a full single-process run does die there, re-running
# the remaining files completes green (the r4-review chunked-run practice).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# slow/fast test tiers (VERDICT r3 #8): the full suite outgrew a single
# serial run (~18 min on the CI CPU). The inner loop is
#     python -m pytest tests/ -q -m "not slow"
# (a few minutes); CI / the review runs the full tier (no -m filter, default).
# Slow = Pallas-interpreter parity rollouts, multi-process spawns, and
# dataset-slice e2e runs; membership is centralized here (measured off a
# --durations=40 run) instead of scattering marks through 20 files.

import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_iteration_stats.py::test_frame_kernel_iter_row_matches_truncated_runs",
    "test_iteration_stats.py::test_banded_iter_stats_match_truncated_runs",
    "test_iteration_stats.py::test_dense_iter_stats_match_truncated_runs",
    "test_stream_batch.py::test_stream_batch_matches_single",
    "test_stream_batch.py::test_stream_step_matches_grid",
    "test_stream_batch.py::test_materialized_scenes_match",
    "test_fast_tracker.py::test_canvas_layout_and_window_match_default_path",
    "test_fast_tracker.py::test_fast_tracker_matches_lean_path",
    "test_fast_tracker.py::test_bulk_sequence_matches_stepwise",
    "test_fast_tracker.py::test_shift_zbuffer_matches_projector",
    "test_multicue_fused.py::test_fused_multicue_matches_xla_path",
    "test_fast_slam.py::test_fast_slam_topology_straight_line",
    "test_fast_slam.py::test_fast_slam_loop_closure_and_relocalization",
    "test_slam.py::test_loop_closure_with_alternative_global_solvers",
    "test_multiprocess.py::test_multiprocess_pgo_matches_single_process",
    "test_finders.py::test_nearest_field_matches_bruteforce",
    "test_finders.py::test_nearest_field_exactness",
    "test_finder_plugins.py::test_finder_plugins_align_to_gt",
    "test_banded_align.py::test_banded_matches_dense_fused",
    "test_banded_align.py::test_banded_tracking_trajectory_equivalent",
    "test_visual_apps.py::test_track_sequence_reuse_matches_plain",
    "test_status.py::test_scene_auto_grows_at_host_boundary",
    "test_status.py::test_graph_capacity_regrows_instead_of_asserting",
    "test_parallel.py::test_sharded_batch_align_matches_vmap",
    "test_multicue.py::test_multicue_tracking_matches_gt",
    "test_multicue.py::test_multicue_beats_blindspot",
    "test_pgo.py::test_lm_never_increases_chi",
    "test_longrun.py::test_two_loop_drive_with_validator_and_checkpoint",
    "test_schur.py::test_schur_sharded_matches_vmapped",
    "test_closure_merge.py::test_slam_closure_merges_scenes",
    "test_apps.py::test_slam_app_end_to_end",
    "test_multicue_slam.py::test_multicue_graph_slam",
    "test_multicue_slam.py::test_dual_cue_runner_with_tf_extrinsics_beats_occluded_single",
    "test_cg.py::test_cg_scales_to_grid_graph",
    "test_icp.py::test_keep_only_inlier_correspondences_final_pass",
    "test_icp.py::test_inlier_only_runs_refine_under_outliers",
    "test_aux.py::test_checkpoint_roundtrip",
    "test_carmen_e2e.py",
    "test_chunked_slam.py",
    "test_corridor_bench.py",
    "test_pallas_icp.py",
    "test_pallas_projective.py",
    "test_pallas_scene.py",
    "test_longrun.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpreter-parity rollouts / e2e runs; "
        "inner loop skips via -m 'not slow'"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        file_part = item.nodeid.split("/")[-1]
        base = file_part.split("[")[0]
        fname = base.split("::")[0]
        if base in _SLOW_TESTS or fname in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
