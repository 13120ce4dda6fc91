"""MULTI-config SLAM end-to-end: dual rangefinders through the full graph
pipeline (splits + trajectory) — the config-only reshaping capability."""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models import loop_closure as lc
from srrg2_laser_slam_2d_tpu.models import slam as slam_mod
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


def test_multicue_graph_slam():
    cfg_f = synthetic.SyntheticConfig(
        steps=14, num_beams=512, max_variance=0.0, drift=(0.11, 0.0, 0.0),
        sensor_in_robot=FRONT,
    )
    cfg_r = synthetic.SyntheticConfig(
        steps=14, num_beams=512, max_variance=0.0, drift=(0.11, 0.0, 0.0),
        sensor_in_robot=REAR,
    )
    ds_f, ds_r = synthetic.simulate(cfg_f), synthetic.simulate(cfg_r)

    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
    pre.set_model(
        LaserModel(num_beams=512, angle_min=cfg_f.angle_min, angle_max=cfg_f.angle_max,
                   range_min=cfg_f.range_min, range_max=cfg_f.range_max)
    )
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    scfg = slam_mod.GraphSLAMConfig(
        local_map_distance=0.5,
        var_capacity=32,
        edge_capacity=64,
        tracker=tracker_mod.TrackerConfig(
            scene_capacity=2048, projection=proj,
            aligner=icp.AlignerConfig(max_iterations=8),
        ),
        validator=lc.ValidatorConfig(enabled=False),
        enable_loop_closure=False,
        enable_relocalizer=False,
        cue_extrinsics=(FRONT, REAR),
    )
    slam = slam_mod.GraphSLAM2D(scfg)
    for k in range(len(ds_f.ranges)):
        meas = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            pre.compute(ds_f.ranges[k]),
            pre.compute(ds_r.ranges[k]),
        )
        slam.process(meas, ds_f.robot_poses[k])
    # 14 steps x 0.11 m = 1.54 m of travel -> splits at 0.55 and 1.05 (+origin)
    assert slam.num_variables() == 3, slam.num_variables()
    assert slam.num_factors() == 2
    err = np.abs(slam.robot_in_world() - ds_f.robot_poses[-1])
    assert err[:2].max() < 0.06, err
