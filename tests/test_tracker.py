"""Tracker integration tests on the synthetic dataset: scan-to-map tracking
must recover the ground-truth trajectory (the TPU analog of the reference's
step-through visual_test_tracker_2d validation and the LASER_0 odometry-only
milestone of SURVEY.md §7.4)."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import (
    LaserModel,
    PreprocessorConfig,
    ScanPreprocessor,
)
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection

_CACHE = {}


def dataset():
    if "d" not in _CACHE:
        _CACHE["d"] = synthetic.simulate(
            synthetic.SyntheticConfig(steps=10, num_beams=512)
        )
    return _CACHE["d"]


def make_tracker(ds):
    cfg = ds.config
    proj = PolarProjection.make(
        cols=512, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=30.0
    )
    tcfg = tracker_mod.TrackerConfig(
        scene_capacity=4096,
        projection=proj,
        aligner=icp.AlignerConfig(max_iterations=10, point_distance=0.5, normal_cos=0.8),
    )
    return tracker_mod.LaserTracker(tcfg, sensor_in_robot=np.array(cfg.sensor_in_robot))


def preprocessor(ds):
    cfg = ds.config
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
    pre.set_model(
        LaserModel(
            num_beams=cfg.num_beams,
            angle_min=cfg.angle_min,
            angle_max=cfg.angle_max,
            range_min=cfg.range_min,
            range_max=cfg.range_max,
        )
    )
    return pre


def run_tracking(use_odom: bool):
    ds = dataset()
    pre = preprocessor(ds)
    trk = make_tracker(ds)
    errs = []
    for k in range(len(ds.ranges)):
        meas = pre.compute(ds.ranges[k])
        odom = ds.robot_poses[k] if use_odom else None
        trk.compute(meas, odom)
        est = np.asarray(trk.robot_in_local_map)
        gt = ds.robot_poses[k]  # local map frame == world (robot starts at origin)
        errs.append(np.abs(est - gt))
    return np.stack(errs)


def test_tracking_scan_match_only():
    errs = run_tracking(use_odom=False)
    assert errs[:, :2].max() < 0.05, errs  # translation drift < 5 cm over 10 frames
    assert errs[:, 2].max() < 0.03, errs


def test_tracking_with_odometry_prior():
    errs = run_tracking(use_odom=True)
    assert errs[:, :2].max() < 0.05, errs
    assert errs[:, 2].max() < 0.03, errs


def test_scene_grows_reasonably():
    ds = dataset()
    pre = preprocessor(ds)
    trk = make_tracker(ds)
    first_count = None
    for k in range(4):
        meas = pre.compute(ds.ranges[k])
        trk.compute(meas, None)
        if first_count is None:
            first_count = int(trk.state.scene.count())
    final = int(trk.state.scene.count())
    assert first_count > 100
    # merging keeps growth bounded: far less than 4 full scans appended
    assert final < first_count * 3, (first_count, final)
