"""Aligner finder plugin slots: all three finders must register scans, and
the ball clipper must keep the tracker working (plugin parity with the
reference's param_finder/param_clipper slots)."""

import numpy as np
import jax.numpy as jnp
import pytest

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import (
    LaserModel,
    PreprocessorConfig,
    ScanPreprocessor,
)
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.utils import geometry as g

_C = {}


def setup_scans():
    if not _C:
        ds = synthetic.simulate(synthetic.SyntheticConfig(steps=4, num_beams=512))
        pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
        pre.set_model(
            LaserModel(num_beams=512, angle_min=ds.config.angle_min,
                       angle_max=ds.config.angle_max, range_min=ds.config.range_min,
                       range_max=ds.config.range_max)
        )
        _C["ds"] = ds
        _C["clouds"] = [pre.compute(r) for r in ds.ranges]
    return _C["ds"], _C["clouds"]


PROJ = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                            range_min=0.1, range_max=30.0)


@pytest.mark.parametrize("finder", ["projective", "nn_grid", "bruteforce"])
def test_finder_plugins_align_to_gt(finder):
    ds, clouds = setup_scans()
    fixed, moving = clouds[0], clouds[1]
    t_gt = np.asarray(
        g.relative(jnp.asarray(ds.sensor_poses[0]), jnp.asarray(ds.sensor_poses[1]))
    )
    cfg = icp.AlignerConfig(
        max_iterations=10, finder=finder, finder_max_distance=0.5,
        finder_resolution=0.05, finder_grid_size=512,
    )
    res = icp.align(cfg, PROJ, fixed, moving, jnp.zeros(3))
    est = np.asarray(res.estimate)
    assert np.abs(est - t_gt).max() < 0.03, (finder, est, t_gt)
    assert int(res.num_correspondences) > 50


def test_ball_clipper_tracking():
    ds, clouds = setup_scans()
    tcfg = tracker_mod.TrackerConfig(
        scene_capacity=2048, projection=PROJ,
        aligner=icp.AlignerConfig(max_iterations=8),
        clipper="ball", ball_max_range=20.0,
    )
    trk = tracker_mod.LaserTracker(tcfg, sensor_in_robot=np.array(ds.config.sensor_in_robot))
    for k in range(len(clouds)):
        trk.compute(clouds[k], None)
    err = np.abs(np.asarray(trk.robot_in_local_map) - ds.robot_poses[len(clouds) - 1])
    assert err[:2].max() < 0.06, err
