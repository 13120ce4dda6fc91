"""Multi-cue (dual rangefinder + odometry) tracking — the MULTI config
capability (configurations/stage_segway_double_config_MULTI.json adds a
second laser slice; SURVEY.md §5 'config-only pipeline reshaping')."""

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


def dual_dataset():
    # same seed => identical robot trajectory; two sensors at different mounts
    cfg_front = synthetic.SyntheticConfig(steps=8, num_beams=512, sensor_in_robot=FRONT)
    cfg_rear = synthetic.SyntheticConfig(steps=8, num_beams=512, sensor_in_robot=REAR)
    return synthetic.simulate(cfg_front), synthetic.simulate(cfg_rear)


def test_multicue_tracking_matches_gt():
    ds_f, ds_r = dual_dataset()
    np.testing.assert_allclose(ds_f.robot_poses, ds_r.robot_poses)  # same trajectory

    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
    pre.set_model(
        LaserModel(num_beams=512, angle_min=ds_f.config.angle_min,
                   angle_max=ds_f.config.angle_max,
                   range_min=ds_f.config.range_min, range_max=ds_f.config.range_max)
    )
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    tcfg = tracker_mod.TrackerConfig(
        scene_capacity=4096,
        projection=proj,
        aligner=icp.AlignerConfig(max_iterations=10, point_distance=0.5, normal_cos=0.8),
    )
    trk = tracker_mod.MultiCueTracker(tcfg, np.stack([FRONT, REAR]).astype(np.float32))

    errs = []
    for k in range(len(ds_f.ranges)):
        c_f = pre.compute(ds_f.ranges[k])
        c_r = pre.compute(ds_r.ranges[k])
        meas = jax.tree.map(lambda a, b: jnp.stack([a, b]), c_f, c_r)
        trk.compute(meas, ds_f.robot_poses[k])
        errs.append(np.abs(np.asarray(trk.robot_in_local_map) - ds_f.robot_poses[k]))
    errs = np.stack(errs)
    assert errs[:, :2].max() < 0.05, errs
    assert errs[:, 2].max() < 0.03, errs


def test_multicue_beats_blindspot():
    # rear-only coverage: a single front laser has a blind spot behind; the
    # dual rig constrains rotation better. Just verify both cues contribute
    # correspondences.
    ds_f, ds_r = dual_dataset()
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
    pre.set_model(
        LaserModel(num_beams=512, angle_min=ds_f.config.angle_min,
                   angle_max=ds_f.config.angle_max,
                   range_min=ds_f.config.range_min, range_max=ds_f.config.range_max)
    )
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    tcfg = tracker_mod.TrackerConfig(
        scene_capacity=4096, projection=proj,
        aligner=icp.AlignerConfig(max_iterations=6),
    )
    trk = tracker_mod.MultiCueTracker(tcfg, np.stack([FRONT, REAR]).astype(np.float32))
    c0 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                      pre.compute(ds_f.ranges[0]), pre.compute(ds_r.ranges[0]))
    c1 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                      pre.compute(ds_f.ranges[1]), pre.compute(ds_r.ranges[1]))
    trk.compute(c0, None)
    stats = trk.compute(c1, None)
    # both cues matched: a single 0.8π-FOV cue can occupy at most
    # 0.4 * 512 ≈ 205 beams of the ±π matching canvas, so >250 correspondences
    # prove the second cue contributes
    assert int(stats.num_correspondences) > 250, int(stats.num_correspondences)
