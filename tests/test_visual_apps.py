"""Smoke tests: visual-test apps render PNG artifacts; streamed pipeline with
canvas reuse matches the plain path."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.apps import visual_tests
from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection


def test_visual_stages_render(tmp_path):
    out = str(tmp_path)
    setup = visual_tests._setup()
    for stage in ("adaptor", "correspondences", "aligner"):
        path = visual_tests.STAGES[stage](out, *setup)
        assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_track_sequence_reuse_matches_plain():
    ds = synthetic.simulate(synthetic.SyntheticConfig(steps=7, num_beams=512))
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    meas = pipeline.preprocess_batch(ds.projection, pcfg, jnp.asarray(ds.ranges))
    odoms = jnp.asarray(ds.robot_poses)
    ov = jnp.ones(len(ds.ranges), bool)
    results = {}
    for reuse in (False, True):
        tcfg = tracker_mod.TrackerConfig(
            scene_capacity=2048, projection=proj,
            aligner=icp.AlignerConfig(max_iterations=8),
            reuse_clip_canvas=reuse,
        )
        s0 = tracker_mod.init_state(
            tcfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
        )
        s0 = tracker_mod.populate(tcfg, s0, jax.tree.map(lambda x: x[0], meas))
        fin, traces = pipeline.track_sequence(tcfg, s0, meas, odoms, ov)
        results[reuse] = np.asarray(traces[0])  # per-frame poses
    # trajectories agree to sub-centimeter (reuse is an approximation only at
    # sub-beam resolution)
    np.testing.assert_allclose(results[True], results[False], atol=0.01)
