"""Tests for the masked fixed-capacity cloud data model."""

import jax.numpy as jnp
import numpy as np

from srrg2_laser_slam_2d_tpu.utils import cloud as cl


def make_cloud():
    xy = np.array([[0, 0], [1, 0], [2, 0], [3, 0]], np.float32)
    nm = np.tile(np.array([[0, 1]], np.float32), (4, 1))
    valid = np.array([True, False, True, True])
    return cl.from_numpy(xy, nm, valid, capacity=8)


def test_count():
    c = make_cloud()
    assert int(c.count()) == 3


def test_compact_preserves_order():
    c = cl.compact(make_cloud())
    assert int(c.count()) == 3
    np.testing.assert_allclose(
        np.asarray(c.xy[:3]), [[0, 0], [2, 0], [3, 0]], atol=1e-6
    )
    assert bool(c.valid[2]) and not bool(c.valid[3])


def test_transform_roundtrip():
    c = make_cloud()
    pose = jnp.array([1.0, -1.0, 0.5])
    back = cl.transform(cl.transform(c, pose), jnp.array(
        np.asarray(__import__("srrg2_laser_slam_2d_tpu.utils.geometry",
                              fromlist=["inverse"]).inverse(pose))))
    np.testing.assert_allclose(np.asarray(back.xy), np.asarray(c.xy), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.normal), np.asarray(c.normal), atol=1e-5)


def test_concat():
    a = make_cloud()
    b = make_cloud()
    c = cl.concat(a, b, capacity=16)
    assert int(c.count()) == 6
    np.testing.assert_allclose(np.asarray(c.xy[3:6]), [[0, 0], [2, 0], [3, 0]], atol=1e-6)


def test_clip_ball():
    c = make_cloud()
    clipped = cl.clip_ball(c, jnp.zeros(2), 2.5)
    # points at distance 0 and 2 survive; invalid point at 1 stays invalid; 3 dropped
    assert int(clipped.count()) == 2


def test_voxelize_merges_close_points():
    xy = np.array([[0.001, 0.001], [0.002, 0.003], [1.0, 1.0]], np.float32)
    nm = np.tile(np.array([[0.0, 1.0]], np.float32), (3, 1))
    c = cl.from_numpy(xy, nm, capacity=8)
    v = cl.voxelize(c, 0.05)
    assert int(v.count()) == 2
    got = np.sort(np.asarray(v.xy)[np.asarray(v.valid)], axis=0)
    np.testing.assert_allclose(got[0], [0.0015, 0.002], atol=1e-5)
    np.testing.assert_allclose(got[1], [1.0, 1.0], atol=1e-5)


def test_voxelize_no_merge_when_fine():
    xy = np.stack([np.arange(5, dtype=np.float32) * 0.02, np.zeros(5, np.float32)], 1)
    c = cl.from_numpy(xy, capacity=8)
    v = cl.voxelize(c, 0.01)
    assert int(v.count()) == 5


def test_voxelize_separates_opposite_normals():
    # same xy voxel, opposite normals with res_normal=1 -> bins floor(-1)= -1 vs floor(1)=1
    xy = np.zeros((2, 2), np.float32)
    nm = np.array([[0.0, 1.0], [0.0, -1.0]], np.float32)
    c = cl.from_numpy(xy, nm, capacity=4)
    v = cl.voxelize(c, 0.05, res_normal=1.0)
    assert int(v.count()) == 2
