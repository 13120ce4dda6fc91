"""Tests for the grid distance-map and brute-force NN correspondence finders."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.ops import correspond, distance_map
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op


def make_fixed():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-2, 2, size=(64, 2)).astype(np.float32)
    nrm = rng.normal(size=(64, 2)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return cloud_op.from_numpy(xy, nrm, capacity=128), xy, nrm


def test_nearest_field_exactness():
    fixed, xy, _ = make_fixed()
    field = distance_map.build(fixed, rows=128, cols=128, resolution=0.05)
    # query at every fixed point: nearest must be itself (or an equidistant twin)
    idx, _ = distance_map.lookup(field, jnp.asarray(xy))
    got = np.asarray(idx)
    d_self = np.linalg.norm(xy[got] - xy, axis=1)
    assert np.all(got >= 0)
    assert d_self.max() < 0.08  # within a cell of the true nearest


def test_nearest_field_matches_bruteforce():
    fixed, xy, _ = make_fixed()
    field = distance_map.build(fixed, rows=256, cols=256, resolution=0.02)
    rng = np.random.default_rng(1)
    q = rng.uniform(-1.8, 1.8, size=(200, 2)).astype(np.float32)
    idx, _ = distance_map.lookup(field, jnp.asarray(q))
    got = np.asarray(idx)
    # brute force reference
    d = np.linalg.norm(q[:, None, :] - xy[None, :, :], axis=-1)
    want = d.argmin(axis=1)
    d_got = d[np.arange(len(q)), got]
    d_want = d[np.arange(len(q)), want]
    # grid quantization may pick a neighbor at most a cell worse
    assert np.all(d_got <= d_want + 0.03), (d_got - d_want).max()


def test_grid_finder_gates():
    fixed, xy, nrm = make_fixed()
    field = distance_map.build(fixed, rows=256, cols=256, resolution=0.02)
    # moving = fixed exactly: every valid point matches itself
    corr = correspond.find_nn_grid(field, fixed, fixed, jnp.zeros(3),
                                   max_distance_m=0.5, normal_cos=0.8)
    v = np.asarray(corr.valid)
    assert v[:64].all() and not v[64:].any()
    np.testing.assert_array_equal(np.asarray(corr.fixed_idx)[:64], np.arange(64))


def test_bruteforce_finder_exact():
    fixed, xy, nrm = make_fixed()
    # moving: fixed points shifted by 5 mm (within the 1 cm bound)
    moved = cloud_op.from_numpy(xy + np.array([0.005, 0.0], np.float32), nrm, capacity=128)
    corr = correspond.find_bruteforce_nn(fixed, moved, jnp.zeros(3),
                                         max_distance_m=0.01, normal_cos=0.8)
    v = np.asarray(corr.valid)
    assert v[:64].all()
    np.testing.assert_array_equal(np.asarray(corr.fixed_idx)[:64], np.arange(64))
    # shift beyond the bound: no matches
    moved_far = cloud_op.from_numpy(xy + np.array([0.05, 0.0], np.float32), nrm, capacity=128)
    corr2 = correspond.find_bruteforce_nn(fixed, moved_far, jnp.zeros(3),
                                          max_distance_m=0.01, normal_cos=0.8)
    assert not np.asarray(corr2.valid).any()


def test_finders_respect_estimate_transform():
    fixed, xy, nrm = make_fixed()
    t = jnp.array([0.3, -0.2, 0.25])
    from srrg2_laser_slam_2d_tpu.utils import geometry as g
    inv = g.inverse(t)
    moved_back = cloud_op.Cloud(
        xy=g.transform_points(inv, fixed.xy),
        normal=g.rotate_vectors(inv, fixed.normal),
        valid=fixed.valid,
    )
    corr = correspond.find_bruteforce_nn(fixed, moved_back, t,
                                         max_distance_m=0.01, normal_cos=0.9)
    assert np.asarray(corr.valid)[:64].all()
