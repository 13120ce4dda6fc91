"""Component registration + shipped pipeline presets.

Re-creates the reference's two complete pipeline assemblies as config presets
(configurations/stage_segway_double_config_LASER_0.json — 1 laser + odometry —
and ..._MULTI.json — 2 lasers + odometry; the MULTI variant differs only in
config, SURVEY.md §5), plus the default-config generator (slam_app.cpp -j,
:87-167).
"""

from __future__ import annotations

import math

from ..models import loop_closure as lc
from ..models import slam as slam_mod
from ..models import tracker as tracker_mod
from ..models.preprocessor import PreprocessorConfig
from ..ops import icp
from ..ops.projector import PolarProjection
from ..solver import pgo
from . import config as config_mod

# ---- registration with parameter docs (the PARAM docstring surface) --------

config_mod.register(
    PreprocessorConfig,
    {
        "range_min": "range_min [meters]",
        "range_max": "range_max [meters]",
        "voxelize_resolution": "unproject voxelization resolution [meters]",
        "normal_point_distance": "range of points considered while computing normal",
        "normal_min_points": "min number of points to compute a normal",
        "normal_window": "static one-sided stencil width of the normal window",
        "scan_topic": "topic of the scan",
    },
)
config_mod.register(
    icp.AlignerConfig,
    {
        "max_iterations": "maximum number of iterations of the outer ICP loop",
        "min_num_inliers": "minimum number of inliers",
        "enable_inlier_only_runs": "additional inlier-only runs if sufficient inliers are available",
        "keep_only_inlier_correspondences": "final pass drops correspondences whose factors are not inliers",
        "epsilon": "chi2-decay termination ratio (None = run all iterations)",
        "damping": "GN damping factor, the higher the closer to gradient descent",
        "point_distance": "max beam-depth distance between corresponding points",
        "normal_cos": "min cosine between normals",
        "chi_threshold": "Cauchy robustifier chi threshold (<=0 disables)",
        "min_num_correspondences": "minimum number of correspondences in this slice",
        "odom_weight": "information weight of the odometry prior slice (0 disables)",
        "finder": "correspondence finder: projective | nn_grid | bruteforce",
        "finder_max_distance": "max distance for NN correspondences [meters]",
        "finder_resolution": "resolution of the nn_grid distance map [m/pixel]",
        "finder_grid_size": "static side of the nn_grid distance map [pixels]",
    },
)
config_mod.register(
    tracker_mod.TrackerConfig,
    {
        "scene_capacity": "static local-map scene capacity [points]",
        "merge_threshold": "max depth distance for merging measurement into scene",
        "clip_voxelize_resolution": "clipper decimation grid [meters], 0 = off",
        "projection": "polar canvas used for matching/merging/clipping",
        "aligner": "scan-to-scene aligner assembly",
        "use_fused_aligner": "run the whole alignment as one Pallas kernel",
        "banded_aligner": "block-windowed beam matching in the fused aligner (beam-indexed moving cloud required)",
        "use_fused_scene_ops": "Pallas clip/merge kernels instead of XLA scatters",
        "clipper": "scene clipper: projective | ball",
        "ball_max_range": "SceneClipperBall2D max range [meters]",
        "reuse_clip_canvas": "reuse the merger's canvas as the next clip (fast path)",
        "lean_scene_ops": "beam-window merge via the cached canvas (zero full-scene projections)",
        "auto_grow_scene": "regrow the scene 2x at a watermark between steps (reference dynamic-resize role)",
        "grow_watermark": "occupancy fraction that triggers scene regrowth",
    },
)
config_mod.register(
    lc.LoopDetectorConfig,
    {
        "relocalize_min_inliers": "minimum number of inliers for success [int]",
        "relocalize_min_inliers_ratio": "minimum fraction of inliers over total correspondences",
        "relocalize_max_chi_inliers": "maximum chi per inlier for success [chi]",
        "max_local_map_distance": "max distance in meters for closure candidates",
        "relocalize_range_scale": "distance scale of candidate closures",
        "aggressive_relocalize_graph_distance": "min graph distance to start aggressive widening",
        "aggressive_relocalize_graph_max_range": "max graph distance for aggressive widening",
        "aggressive_relocalize_range_increase_per_edge": "chi2 range increase per graph edge",
        "max_candidates": "static batch size of the parallel candidate alignment",
        "aligner": "aligner used to register loop closures",
        "backend": "candidate-alignment backend: projective (XLA parity "
                   "path) or fused_nn (one-kernel bounded-NN ICP, TPU "
                   "serving path of the chunked loop)",
        "detection_capacity": "chunked-loop alignment point capacity "
                              "(0 = live-count bucket); align cost is "
                              "O(capacity)",
    },
)
config_mod.register(
    lc.ValidatorConfig,
    {
        "inlier_accept_ratio": "ratio to accept a closure after min checks",
        "inlier_reject_ratio": "ratio to reject a closure after min checks",
        "inlier_chi": "chi2 of an inlier",
        "min_times_checked": "minimum number a closure is checked",
        "partition_expansion_range": "region around a closure endpoint to compute partitions",
        "enabled": "toggle vote-based validation (off = accept gated closures immediately)",
    },
)
config_mod.register(
    lc.RelocalizerConfig,
    {
        "max_translation": "max translation to attempt a jump",
        "relocalize_max_chi_inliers": "maximum chi per inlier for successful relocalization",
        "relocalize_min_inliers": "minimum number of inliers for successful relocalization",
        "relocalize_min_inliers_ratio": "minimum fraction of inliers out of total correspondences",
    },
)
config_mod.register(
    pgo.PGOConfig,
    {
        "max_iterations": "maximum global GN iterations",
        "epsilon": "ratio of decay of chi2 between iterations",
        "chi_threshold": "Cauchy robustifier threshold on PGO edges (<=0 disables)",
        "damping": "diagonal damping of the dense solve",
        "anchor_weight": "gauge prior weight on fixed variables",
        "algorithm": "iteration algorithm: gn | lm (the reference's GN/LM slot)",
        "lm_lambda_init": "initial LM damping lambda",
        "lm_lambda_factor": "LM lambda multiplier on reject (divider on accept)",
    },
)
config_mod.register(
    slam_mod.GraphSLAMConfig,
    {
        "local_map_distance": "distance between the centers of local maps [meters]",
        "var_capacity": "static pose-graph variable capacity",
        "edge_capacity": "static pose-graph edge capacity",
        "odom_edge_info": "diagonal information of odometry edges (tx, ty, theta)",
        "closure_edge_info": "diagonal information of closure edges",
        "tracker": "incremental tracker assembly",
        "detector": "loop detector assembly",
        "validator": "closure validator",
        "relocalizer": "relocalizer",
        "global_solver": "global pose-graph solver",
        "global_solver_kind": "global linear solver: dense | cg | schur",
        "schur_partitions": "partition count of the Schur solver",
        "enable_loop_closure": "toggle loop closing",
        "enable_relocalizer": "toggle relocalization",
        "enable_closure_merger": "fuse the query map into the candidate map on accepted closures",
        "closure_merge_max_distance2": "closure merger max squared point distance [m^2]",
        "closure_merge_target": "closure merger target number of merges",
        "closure_merge_binning": "closure merger point binning (distribution homogenization)",
        "cue_extrinsics": "per-cue sensor-in-robot poses; enables multi-cue tracking",
        "use_fast_tracker": "track through the fused frame kernel (lazy scene materialization)",
        "fast_canvas_meas": "fast-tracker measurement layout: pre-z-buffered canvases (fast) vs raw rows (bit-exact parity oracle)",
    },
)
config_mod.register(PolarProjection)


# ---- presets ----------------------------------------------------------------


def reference_projection(num_beams: int = 721) -> PolarProjection:
    """The matching/merging/clipping canvas of the shipped configs
    (PointNormal2fProjectorPolar: 721 beams over ±π, range [0.3, 20])."""
    return PolarProjection.make(
        cols=num_beams,
        angle_min=-math.pi,
        angle_max=math.pi,
        range_min=0.3,
        range_max=20.0,
    )


def laser0_tracking_aligner() -> icp.AlignerConfig:
    """Tracking aligner of LASER_0 (MultiAligner2D #29: 10 iterations; finder
    #17: point_distance 0.5, normal_cos 0.9; robustifier #10: chi 0.01)."""
    return icp.AlignerConfig(
        max_iterations=10,
        min_num_inliers=10,
        point_distance=0.5,
        normal_cos=0.9,
        chi_threshold=0.01,
        odom_weight=1.0,
    )


def laser0_preprocessor() -> PreprocessorConfig:
    """RawDataPreprocessorProjective2D #6 + NormalComputator #45 + unprojector #38."""
    return PreprocessorConfig(
        range_min=0.0,
        range_max=1000.0,
        voxelize_resolution=0.02,
        normal_point_distance=0.3,
        normal_min_points=5,
    )


def laser0_slam(num_beams: int = 721, scene_capacity: int = 8192,
                use_fast_tracker: bool | None = None) -> slam_mod.GraphSLAMConfig:
    """Full LASER_0 SLAM assembly (single laser + wheel odometry).

    ``use_fast_tracker`` defaults to ON when a TPU backend is present: the
    production tracking path IS the fused frame kernel (parity with the XLA
    path proven in tests/test_fast_slam.py — same topology, closures, ATE).
    On CPU the kernel only runs under the slow Pallas interpreter, so the
    default there is the XLA tracker (the parity oracle)."""
    if use_fast_tracker is None:
        import jax

        use_fast_tracker = jax.default_backend() != "cpu"
    proj = reference_projection(num_beams)
    return slam_mod.GraphSLAMConfig(
        use_fast_tracker=use_fast_tracker,
        local_map_distance=1.0,
        tracker=tracker_mod.TrackerConfig(
            scene_capacity=scene_capacity,
            merge_threshold=0.2,
            clip_voxelize_resolution=0.0,
            projection=proj,
            aligner=laser0_tracking_aligner(),
        ),
        detector=lc.LoopDetectorConfig(
            relocalize_min_inliers=300,
            relocalize_min_inliers_ratio=0.8,
            relocalize_max_chi_inliers=0.1,
            aligner=icp.AlignerConfig(
                max_iterations=30,
                point_distance=1.414,
                normal_cos=0.8,
                chi_threshold=0.05,
                odom_weight=0.0,
            ),
        ),
        validator=lc.ValidatorConfig(),
        relocalizer=lc.RelocalizerConfig(),
        # the reference Cauchy-robustifies SE2PosePoseGeodesicErrorFactor in
        # the global solve (slam_app.cpp:147-153; RobustifierCauchy default
        # kernel 1.0) — a surviving wrong closure gets down-weighted instead
        # of bending the whole graph
        global_solver=pgo.PGOConfig(
            max_iterations=20, epsilon=1e-5, chi_threshold=1.0
        ),
    )


def multi_slam(num_beams: int = 721, scene_capacity: int = 8192,
               cue_extrinsics=((0.0, 0.0, 0.0), (0.0, 0.0, math.pi)),
               use_fused_aligner: bool | None = None) -> slam_mod.GraphSLAMConfig:
    """MULTI assembly: dual rangefinders + wheel odometry
    (configurations/stage_segway_double_config_MULTI.json — identical to
    LASER_0 except for the second laser slice, which in this framework means
    running the tracker through models.tracker.MultiCueTracker with two
    extrinsics; the SLAM-level parameters are unchanged).

    ``cue_extrinsics`` are the sensor-in-robot poses of the two rangefinders
    (the reference pulls them from the TF tree via each slice's ``frame_id``,
    aligner_slice_processor_laser_2d.h:22-45; the default here is the
    stage_segway arrangement — front laser at the base frame, rear laser
    rotated π). Callers with a TF tree override them per run.

    ``use_fused_aligner`` defaults ON when a TPU backend is present: dual-cue
    alignment then runs as ONE Pallas program (ops/pallas_multicue_align.py,
    parity proven in tests/test_multicue_fused.py). On CPU the kernel would
    run under the slow interpreter, so the default there is the XLA
    ``icp.align_multi`` path."""
    if use_fused_aligner is None:
        import jax

        # TPU only: the fused multi-cue kernel is a Pallas TPU program; a GPU
        # backend must take the XLA path too (ADVICE r4)
        use_fused_aligner = jax.default_backend() == "tpu"
    import dataclasses

    cfg = laser0_slam(num_beams, scene_capacity)
    return dataclasses.replace(
        cfg,
        cue_extrinsics=tuple(tuple(float(v) for v in e) for e in cue_extrinsics),
        tracker=dataclasses.replace(cfg.tracker,
                                    use_fused_aligner=use_fused_aligner),
    )


def default_config_manager() -> config_mod.ConfigManager:
    """The slam_app -j equivalent: a complete named default assembly."""
    mgr = config_mod.ConfigManager()
    slam_cfg = laser0_slam()
    mgr.add(slam_cfg, "slam")
    mgr.add(slam_cfg.tracker, "tracker")
    mgr.add(slam_cfg.tracker.aligner, "aligner")
    mgr.add(slam_cfg.detector, "loop_detector")
    mgr.add(slam_cfg.validator, "closure_validator")
    mgr.add(slam_cfg.relocalizer, "relocalizer")
    mgr.add(slam_cfg.global_solver, "global_solver")
    mgr.add(laser0_preprocessor(), "preprocessor")
    return mgr
