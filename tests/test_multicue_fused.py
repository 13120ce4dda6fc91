"""Fused multi-cue aligner (ops/pallas_multicue_align.py) parity with the
XLA ``icp.align_multi`` path — the MULTI config's fast path (round-3
directive: dual-laser users previously always took the slowest route)."""

import numpy as np
import jax
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

FRONT = (0.2, 0.0, 0.0)
REAR = (-0.2, 0.0, np.pi)
STEPS = 5


def _run(use_fused: bool):
    cfg_f = synthetic.SyntheticConfig(steps=STEPS, num_beams=512,
                                      sensor_in_robot=FRONT)
    cfg_r = synthetic.SyntheticConfig(steps=STEPS, num_beams=512,
                                      sensor_in_robot=REAR)
    ds_f, ds_r = synthetic.simulate(cfg_f), synthetic.simulate(cfg_r)
    pre = ScanPreprocessor(
        PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    )
    pre.set_model(
        LaserModel(num_beams=512, angle_min=ds_f.config.angle_min,
                   angle_max=ds_f.config.angle_max,
                   range_min=ds_f.config.range_min,
                   range_max=ds_f.config.range_max)
    )
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    tcfg = tracker_mod.TrackerConfig(
        scene_capacity=4096, projection=proj,
        aligner=icp.AlignerConfig(max_iterations=8, point_distance=0.5,
                                  normal_cos=0.8),
        use_fused_aligner=use_fused,
    )
    trk = tracker_mod.MultiCueTracker(
        tcfg, np.stack([FRONT, REAR]).astype(np.float32)
    )
    poses, stats = [], None
    for k in range(len(ds_f.ranges)):
        meas = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            pre.compute(ds_f.ranges[k]), pre.compute(ds_r.ranges[k]),
        )
        stats = trk.compute(meas, ds_f.robot_poses[k])
        poses.append(np.asarray(trk.robot_in_local_map))
    return np.stack(poses), stats, ds_f.robot_poses


def test_fused_multicue_matches_xla_path():
    p_fused, s_fused, gt = _run(True)
    p_xla, s_xla, _ = _run(False)
    # same trajectory as the XLA align_multi route (semantic differences:
    # no moving-side z-buffer, fixed iteration count — see module header)
    np.testing.assert_allclose(p_fused[:, :2], p_xla[:, :2], atol=2e-3)
    np.testing.assert_allclose(p_fused[:, 2], p_xla[:, 2], atol=2e-3)
    # and still tracks ground truth
    err = np.abs(p_fused - gt[: len(p_fused)])
    assert err[:, :2].max() < 0.05, err
    assert err[:, 2].max() < 0.03, err


def test_fused_multicue_iteration_stats():
    _, stats, _ = _run(True)
    it = np.asarray(stats.iter_stats)
    assert it.shape[0] == 8
    # record populated every iteration: correspondences found, finite chi,
    # and the converged mean inlier chi is small (total chi is NOT monotone —
    # a converging pose gains correspondences, growing the sum)
    assert np.isfinite(it).all()
    assert (it[:, 2] > 50).all(), it[:, 2]
    assert float(it[-1, 3]) < 0.01, it[-1]
