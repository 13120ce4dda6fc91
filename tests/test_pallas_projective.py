"""Fused projective-align Pallas kernel vs the XLA while_loop path."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models.preprocessor import (
    LaserModel,
    PreprocessorConfig,
    ScanPreprocessor,
)
from srrg2_laser_slam_2d_tpu.ops import icp, pallas_projective_align as ppa
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.utils import geometry as g

_C = {}


def scans():
    if not _C:
        ds = synthetic.simulate(synthetic.SyntheticConfig(steps=3, num_beams=512))
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


def test_fused_projective_matches_gt():
    ds, clouds = scans()
    fixed, moving = clouds[0], clouds[1]
    t_gt = np.asarray(
        g.relative(jnp.asarray(ds.sensor_poses[0]), jnp.asarray(ds.sensor_poses[1]))
    )
    res = ppa.fused_projective_align(
        PROJ, fixed.xy, fixed.normal, fixed.valid,
        moving.xy, moving.normal, moving.valid,
        jnp.zeros(3), iterations=10, interpret=True,
    )
    est = np.asarray(res.estimate)
    assert np.abs(est[:2] - t_gt[:2]).max() < 0.02, (est, t_gt)
    assert abs(est[2] - t_gt[2]) < 0.01
    assert float(res.num_corr) > 50


def test_fused_projective_close_to_xla_path():
    ds, clouds = scans()
    fixed, moving = clouds[0], clouds[1]
    acfg = icp.AlignerConfig(max_iterations=10, point_distance=0.5, normal_cos=0.8,
                             chi_threshold=0.05, odom_weight=0.0)
    ref = icp.align(acfg, PROJ, fixed, moving, jnp.zeros(3))
    res = ppa.fused_projective_align(
        PROJ, fixed.xy, fixed.normal, fixed.valid,
        moving.xy, moving.normal, moving.valid,
        jnp.zeros(3), iterations=10, point_distance=0.5, normal_cos=0.8,
        chi_threshold=0.05, interpret=True,
    )
    # same model, tiny numeric differences (polynomial atan2 at bin edges)
    np.testing.assert_allclose(
        np.asarray(res.estimate), np.asarray(ref.estimate), atol=2e-3
    )
    assert abs(float(res.num_corr) - float(ref.num_correspondences)) <= 8


def test_fused_projective_with_odom_prior():
    ds, clouds = scans()
    fixed = clouds[0]
    # no overlap: moving pushed far away -> the odom prior dominates
    moving = fixed._replace(xy=fixed.xy + 100.0)
    prior = jnp.array([0.2, -0.1, 0.15])
    res = ppa.fused_projective_align(
        PROJ, fixed.xy, fixed.normal, fixed.valid,
        moving.xy, moving.normal, moving.valid,
        prior, odom_prior=prior, iterations=5, odom_weight=1.0,
        min_inliers=0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.estimate), np.asarray(prior), atol=1e-4)
