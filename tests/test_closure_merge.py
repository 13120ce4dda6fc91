"""Closure-time map fusion — MergerCorrespondencePointNormal2f wired into the
loop-closing path (reference config :55-58 wiring, :656-670 params).

Two overlapping local maps fuse on an accepted closure, and the fused map
still tracks correctly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.models import loop_closure as lc
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op
from srrg2_laser_slam_2d_tpu.utils import geometry

CAP = 1024
PROJ = PolarProjection.make(
    cols=256, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=30.0
)


def _world(n=720, radius=5.0):
    a = np.linspace(-np.pi, np.pi, n, endpoint=False)
    xy = np.stack([radius * np.cos(a), radius * np.sin(a)], 1).astype(np.float32)
    normal = (-xy / radius).astype(np.float32)
    return xy, normal


def _local_scene(pose, sector, xy, normal):
    """Points of the world visible in an angular sector around ``pose``,
    expressed in the pose's frame."""
    inv = np.asarray(geometry.inverse(jnp.asarray(pose, jnp.float32)))
    loc = np.asarray(
        geometry.transform_points(jnp.asarray(inv), jnp.asarray(xy))
    )
    nrm = np.asarray(geometry.rotate_vectors(jnp.asarray(inv), jnp.asarray(normal)))
    ang = np.arctan2(loc[:, 1], loc[:, 0])
    keep = np.abs(ang) <= sector
    return cloud_op.from_numpy(loc[keep], nrm[keep], capacity=CAP)


def test_two_overlapping_maps_fuse_and_track():
    xy, normal = _world()
    pose_a = np.array([1.0, 0.0, 0.0], np.float32)
    pose_b = np.array([0.2, 0.9, 0.4], np.float32)
    scene_a = _local_scene(pose_a, 2.2, xy, normal)
    scene_b = _local_scene(pose_b, 2.2, xy, normal)
    n_a = int(scene_a.count())
    n_b = int(scene_b.count())

    b_in_a = np.asarray(
        geometry.relative(jnp.asarray(pose_a), jnp.asarray(pose_b))
    )
    fused = lc.merge_closure_scenes(
        PROJ, scene_a, scene_b, jnp.asarray(b_in_a),
        target_merges=400, binning=False,
    )
    n_f = int(fused.count())
    # fusion happened: more points than A alone, fewer than a blind union
    assert n_f > n_a
    assert n_f < n_a + n_b
    # every fused point still lies on the world circle (seen from A's frame)
    pts_w = np.asarray(
        geometry.transform_points(jnp.asarray(pose_a), fused.xy)
    )
    r = np.linalg.norm(pts_w[np.asarray(fused.valid)], axis=1)
    np.testing.assert_allclose(r, 5.0, atol=0.05)

    # the fused map tracks: a measurement taken from a pose in B's exclusive
    # region aligns correctly against the fused A-frame scene
    pose_c = np.array([-0.2, 1.2, 0.9], np.float32)
    meas = _local_scene(pose_c, 1.8, xy, normal)
    c_in_a = np.asarray(geometry.relative(jnp.asarray(pose_a), jnp.asarray(pose_c)))
    init = c_in_a + np.array([0.15, -0.1, 0.08], np.float32)
    res = icp.align(
        icp.AlignerConfig(max_iterations=20, odom_weight=0.0),
        PROJ, fused, meas, jnp.asarray(init),
    )
    np.testing.assert_allclose(np.asarray(res.estimate), c_in_a, atol=0.07)


def test_merge_respects_budget_and_binning():
    xy, normal = _world()
    pose_a = np.array([1.0, 0.0, 0.0], np.float32)
    pose_b = np.array([-1.0, 0.5, 2.0], np.float32)
    scene_a = _local_scene(pose_a, 1.5, xy, normal)
    scene_b = _local_scene(pose_b, 1.5, xy, normal)
    n_a = int(scene_a.count())
    b_in_a = np.asarray(geometry.relative(jnp.asarray(pose_a), jnp.asarray(pose_b)))
    fused = lc.merge_closure_scenes(
        PROJ, scene_a, scene_b, jnp.asarray(b_in_a),
        target_merges=50, binning=True,
    )
    # append budget: at most target_number_of_merges new points
    assert int(fused.count()) <= n_a + 50


def test_slam_closure_merges_scenes():
    """Drive the full SLAM loop around a revisit and check that accepted
    closures fused the candidate map (its point count grows)."""
    from srrg2_laser_slam_2d_tpu.bench import synthetic
    from tests.test_slam import make_pipeline

    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=40, num_beams=512, max_variance=0.02,
            drift=(0.15, 0.0, 2 * np.pi / 40), seed=5,
        )
    )
    slam, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=True)
    merges = []
    orig = slam._merge_closure_scenes

    def spy(c):
        before = int(slam.scene_of(c.candidate_map).count())
        orig(c)
        after = int(slam.scene_of(c.candidate_map).count())
        merges.append((before, after))

    slam._merge_closure_scenes = spy
    for k in range(len(ds.ranges)):
        slam.process(pre.compute(ds.ranges[k]), ds.robot_poses[k])
    assert slam.num_closures >= 1, "drive must close at least one loop"
    assert merges, "accepted closures must trigger the closure merger"
    assert all(after >= before for before, after in merges)
    assert any(after > before for before, after in merges), (
        "no candidate map gained points from closure fusion"
    )
