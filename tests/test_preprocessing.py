"""Preprocessing-stage tests, mirroring the reference's synthetic fixture
(tests/fixtures.hpp:8-53) and exact-count assertions
(tests/test_measurement_adaptor.cpp:36: 100 points from a 100-beam unit circle).
"""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.models.preprocessor import (
    LaserModel,
    PreprocessorConfig,
    ScanPreprocessor,
)
from srrg2_laser_slam_2d_tpu.ops import normals as normals_op
from srrg2_laser_slam_2d_tpu.ops import projector as projector_op
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op


def synthetic_circle_model():
    # fixtures.hpp: angle [-1, 1], increment 0.02 -> 100 beams, ranges all 1 m
    return LaserModel(
        num_beams=100, angle_min=-1.0, angle_max=1.0, range_min=0.0, range_max=1000.0
    )


def test_synthetic_circle_exact_count():
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.01))
    pre.set_model(synthetic_circle_model())
    cloud = pre.compute(np.ones(100, np.float32))
    assert int(cloud.count()) == 100  # reference: ASSERT_EQ(points.size(), 100)


def test_synthetic_circle_points_on_unit_circle():
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.0))
    pre.set_model(synthetic_circle_model())
    cloud = pre.compute(np.ones(100, np.float32))
    xy = np.asarray(cloud.xy)[np.asarray(cloud.valid)]
    np.testing.assert_allclose(np.linalg.norm(xy, axis=1), 1.0, atol=1e-5)


def test_normals_point_inward_on_circle():
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.0))
    pre.set_model(synthetic_circle_model())
    cloud = pre.compute(np.ones(100, np.float32))
    v = np.asarray(cloud.valid)
    xy = np.asarray(cloud.xy)[v]
    nm = np.asarray(cloud.normal)[v]
    # sensor inside the circle: normals face the origin, i.e. n = -p/|p|.
    # scan-edge points have one-sided windows (same bias as the reference's
    # truncated sliding window), so assert tightly only on the interior.
    want = -xy / np.linalg.norm(xy, axis=1, keepdims=True)
    np.testing.assert_allclose(nm[16:-16], want[16:-16], atol=2e-2)
    dots = np.sum(nm * want, axis=1)
    assert np.all(dots > 0.95)  # edges: still within ~18 degrees
    np.testing.assert_allclose(np.linalg.norm(nm, axis=1), 1.0, atol=1e-5)


def test_invalid_ranges_dropped():
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.0))
    pre.set_model(
        LaserModel(num_beams=100, angle_min=-1.0, angle_max=1.0, range_min=0.1, range_max=5.0)
    )
    ranges = np.ones(100, np.float32)
    ranges[10:20] = 0.0   # below range_min
    ranges[30:40] = 99.0  # above range_max
    cloud = pre.compute(ranges)
    # exactly the 20 gated beams are dropped; remaining segments all have
    # enough window support for normals
    assert int(cloud.count()) == 80


def test_normal_discontinuity_cuts_window():
    # two separated straight segments: normals must not blend across the gap
    n = 64
    xs = np.linspace(0.0, 0.63, n, dtype=np.float32)
    ys = np.where(np.arange(n) < n // 2, 1.0, 3.0).astype(np.float32)  # wall jump
    cloud = cloud_op.from_numpy(np.stack([xs, ys], 1))
    out = normals_op.compute_normals(cloud, normal_point_distance=0.3, normal_min_points=3)
    nm = np.asarray(out.normal)
    v = np.asarray(out.valid)
    # interior points of each wall: normal ±(0, 1); walls are horizontal lines
    for i in list(range(5, 27)) + list(range(37, 59)):
        assert v[i]
        assert abs(abs(nm[i, 1]) - 1.0) < 1e-3, (i, nm[i])


def test_projector_zbuffer_keeps_closest():
    proj = projector_op.PolarProjection.make(
        cols=8, angle_min=-1.0, angle_max=1.0, range_min=0.01, range_max=100.0
    )
    # two points on the same beam (straight ahead): near one must win
    xy = np.array([[2.0, 0.0], [1.0, 0.0], [3.0, 0.0]], np.float32)
    cloud = cloud_op.from_numpy(xy)
    canvas = projector_op.project_local(proj, cloud)
    col = int(np.floor(0.0 * proj.f + proj.c))
    assert bool(canvas.valid[col])
    assert int(canvas.idx[col]) == 1
    np.testing.assert_allclose(float(canvas.depth[col]), 1.0, atol=1e-6)


def test_projector_tie_breaks_to_first_index():
    proj = projector_op.PolarProjection.make(cols=8, angle_min=-1.0, angle_max=1.0)
    xy = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
    canvas = projector_op.project_local(proj, cloud_op.from_numpy(xy))
    col = int(np.floor(proj.c))
    assert int(canvas.idx[col]) == 0


def test_project_unproject_roundtrip():
    proj = projector_op.PolarProjection.make(
        cols=256, angle_min=-2.0, angle_max=2.0, range_min=0.01, range_max=100.0
    )
    rng = np.random.default_rng(1)
    angles = rng.uniform(-1.9, 1.9, 128)
    radii = rng.uniform(0.5, 9.0, 128)
    xy = np.stack([radii * np.cos(angles), radii * np.sin(angles)], 1).astype(np.float32)
    cloud = cloud_op.from_numpy(xy)
    canvas = projector_op.project_local(proj, cloud)
    ranges = projector_op.ranges_from_canvas(canvas)
    back = projector_op.unproject(proj, ranges)
    v = np.asarray(back.valid)
    got = np.asarray(back.xy)[v]
    # every unprojected point must lie within a beam-quantization step of an input
    d = np.linalg.norm(got[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
    beam_step = (proj.angle_max - proj.angle_min) / proj.cols
    assert np.all(d <= 9.0 * beam_step + 1e-3), d.max()


def test_sequential_voxelize_matches_grid_on_scan():
    """voxelize_sequential (the scatter-free TPU fast path) vs the exact
    grid voxelize on a scan-ordered cloud: near-identical point counts
    (runs == cells except non-adjacent revisits) and identical geometry for
    cells formed from one run."""
    import numpy as np

    import jax.numpy as jnp

    from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op
    from srrg2_laser_slam_2d_tpu.utils.cloud import Cloud

    rng = np.random.default_rng(3)
    # synthetic scan: smooth range profile -> angularly ordered points
    a = np.linspace(-np.pi / 2, np.pi / 2, 721).astype(np.float32)
    r = (4.0 + 0.5 * np.sin(3 * a) + rng.normal(scale=0.002, size=a.shape)
         ).astype(np.float32)
    xy = np.stack([r * np.cos(a), r * np.sin(a)], 1)
    nm = np.stack([-np.cos(a), -np.sin(a)], 1).astype(np.float32)
    valid = np.ones(721, bool)
    valid[100:110] = False  # a dropout gap
    c = Cloud(jnp.asarray(xy), jnp.asarray(nm), jnp.asarray(valid))

    g = cloud_op.voxelize(c, 0.05, res_normal=1.0)
    s = cloud_op.voxelize_sequential(c, 0.05, res_normal=1.0)
    ng = int(np.asarray(g.count()))
    ns = int(np.asarray(s.count()))
    assert ng <= ns <= ng * 1.05, (ng, ns)  # runs >= cells, within 5%
    # every sequential output point must match a grid output point exactly
    gxy = np.asarray(g.xy)[np.asarray(g.valid)]
    sxy = np.asarray(s.xy)[np.asarray(s.valid)]
    d = np.abs(sxy[:, None, :] - gxy[None, :, :]).sum(-1).min(1)
    # prefix-sum accumulation differs from direct summation at f32 roundoff
    # (~1e-5 on metre-scale coords — far under the 0.02 m voxel); run-split
    # revisited cells differ by construction, hence the median
    assert np.median(d) < 1e-4, np.median(d)
