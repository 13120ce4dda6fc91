"""Fused Pallas clip kernel vs the XLA clipper."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.ops import clip as clip_op
from srrg2_laser_slam_2d_tpu.ops import pallas_scene
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op


def test_pallas_clip_matches_xla():
    rng = np.random.default_rng(0)
    n = 3000
    xy = rng.uniform(-6, 6, size=(n, 2)).astype(np.float32)
    nrm = rng.normal(size=(n, 2)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    scene = cloud_op.from_numpy(xy, nrm, capacity=4096)
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.3, range_max=20.0)
    robot = jnp.array([0.5, -0.3, 0.4])
    sensor = jnp.array([0.2, 0.1, 0.05])

    ref = clip_op.clip_projective(proj, scene, robot, sensor)
    got = pallas_scene.clip_projective_pallas(proj, scene, robot, sensor, interpret=True)

    rv = np.asarray(ref.valid)          # [512] beam-indexed
    gv = np.asarray(got.valid)[:512]
    np.testing.assert_array_equal(gv, rv)
    np.testing.assert_allclose(
        np.asarray(got.xy)[:512][gv], np.asarray(ref.xy)[rv], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.normal)[:512][gv], np.asarray(ref.normal)[rv], atol=2e-4
    )
    # padded beams invalid
    assert not np.asarray(got.valid)[512:].any()


def test_pallas_merge_matches_xla():
    from srrg2_laser_slam_2d_tpu.ops import merge as merge_op

    rng = np.random.default_rng(0)
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.3, range_max=20.0)
    a = rng.uniform(-np.pi, np.pi, 1500)
    r = rng.uniform(2, 8, 1500)
    sxy = np.stack([r * np.cos(a), r * np.sin(a)], 1).astype(np.float32)
    snrm = rng.normal(size=(1500, 2)).astype(np.float32)
    snrm /= np.linalg.norm(snrm, axis=1, keepdims=True)
    scene = cloud_op.from_numpy(sxy, snrm, capacity=2048)
    a2 = rng.uniform(-np.pi, np.pi, 400)
    r2 = rng.uniform(2, 8, 400)
    mxy = np.stack([r2 * np.cos(a2), r2 * np.sin(a2)], 1).astype(np.float32)
    mnrm = rng.normal(size=(400, 2)).astype(np.float32)
    mnrm /= np.linalg.norm(mnrm, axis=1, keepdims=True)
    meas = cloud_op.from_numpy(mxy, mnrm, capacity=512)
    cam = jnp.array([0.3, -0.2, 0.15])

    ref = merge_op.merge_projective(proj, scene, meas, cam, merge_threshold=0.2)
    got = pallas_scene.merge_projective_pallas(
        proj, scene, meas, cam, merge_threshold=0.2, interpret=True
    )
    rv, gv = np.asarray(ref.valid), np.asarray(got.valid)
    np.testing.assert_array_equal(rv, gv)
    np.testing.assert_allclose(np.asarray(got.xy)[gv], np.asarray(ref.xy)[rv], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got.normal)[gv], np.asarray(ref.normal)[rv], atol=1e-5
    )
