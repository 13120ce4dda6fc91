"""Pallas z-buffer projector must agree exactly with the scatter-min path."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.ops import pallas_projector, projector
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op


def random_cloud(n=500, seed=0, cap=512):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-8, 8, size=(n, 2)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    return cloud_op.from_numpy(xy, valid=valid, capacity=cap)


def test_pallas_matches_scatter_zbuffer():
    proj = projector.PolarProjection.make(
        cols=721, angle_min=-np.pi, angle_max=np.pi, range_min=0.3, range_max=20.0
    )
    cloud = random_cloud()
    ref = projector.project_local_xla(proj, cloud)
    got = pallas_projector.project_local_pallas(
        proj, cloud.xy, cloud.valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.depth)[v], np.asarray(ref.depth)[v], rtol=1e-6
    )


def test_pallas_tie_break_lowest_index():
    proj = projector.PolarProjection.make(cols=128, angle_min=-np.pi, angle_max=np.pi,
                                          range_min=0.01, range_max=100.0)
    xy = np.array([[1.0, 0.0]] * 5, np.float32)  # identical points, same beam
    cloud = cloud_op.from_numpy(xy, capacity=8)
    got = pallas_projector.project_local_pallas(proj, cloud.xy, cloud.valid, interpret=True)
    col = int(np.floor(proj.c))
    assert int(got.idx[col]) == 0


def test_pallas_handles_multi_chunk():
    proj = projector.PolarProjection.make(cols=256, angle_min=-np.pi, angle_max=np.pi,
                                          range_min=0.1, range_max=50.0)
    cloud = random_cloud(n=4000, seed=3, cap=4096)
    ref = projector.project_local_xla(proj, cloud)
    got = pallas_projector.project_local_pallas(
        proj, cloud.xy, cloud.valid, chunk=1024, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))


def test_sort_zbuffer_matches_scatter():
    proj = projector.PolarProjection.make(
        cols=721, angle_min=-np.pi, angle_max=np.pi, range_min=0.3, range_max=20.0
    )
    cloud = random_cloud(n=3000, seed=5, cap=4096)
    ref = projector.project_local_xla(proj, cloud)
    got = projector.project_local_sort(proj, cloud)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    # winner indices agree except where depth quantization (<10um) tied
    same = np.asarray(got.idx)[v] == np.asarray(ref.idx)[v]
    assert same.mean() > 0.999, same.mean()
    np.testing.assert_allclose(
        np.asarray(got.depth)[v], np.asarray(ref.depth)[v], atol=1e-4
    )
