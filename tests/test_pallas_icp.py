"""Fused Pallas NN-ICP kernel tests (interpret mode on CPU; the same kernel
compiles for TPU). Golden-checked against the XLA brute-force NN finder +
linearize path."""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.ops import correspond, icp, pallas_icp
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op
from srrg2_laser_slam_2d_tpu.utils import geometry as g


def spiral_cloud(n=512, cap=512):
    angles = (np.arange(n) + 0.27) * (2 * np.pi / n) - np.pi
    radii = 2.0 + 0.25 * angles
    xy = np.stack([radii * np.cos(angles), radii * np.sin(angles)], 1).astype(np.float32)
    nrm = (-xy / np.linalg.norm(xy, axis=1, keepdims=True)).astype(np.float32)
    return cloud_op.from_numpy(xy, nrm, capacity=cap)


def square_cloud(n_side=128):
    # axis-aligned square walls, normals inward: rotation-observable geometry
    # (a circle/spiral is degenerate for point-to-plane NN-ICP: rotation only
    # slides points tangentially)
    t = (np.arange(n_side) + 0.5) / n_side * 4.0 - 2.0
    pts, nrm = [], []
    for wall, normal in [
        (np.stack([t, np.full_like(t, 2.0)], 1), (0.0, -1.0)),
        (np.stack([t, np.full_like(t, -2.0)], 1), (0.0, 1.0)),
        (np.stack([np.full_like(t, 2.0), t], 1), (-1.0, 0.0)),
        (np.stack([np.full_like(t, -2.0), t], 1), (1.0, 0.0)),
    ]:
        pts.append(wall)
        nrm.append(np.tile(normal, (n_side, 1)))
    xy = np.concatenate(pts).astype(np.float32)
    nm = np.concatenate(nrm).astype(np.float32)
    return cloud_op.from_numpy(xy, nm)


def test_fused_align_recovers_offset():
    fixed = square_cloud()
    true_t = jnp.array([0.05, -0.04, 0.03])
    inv = g.inverse(true_t)
    moving = cloud_op.Cloud(
        xy=g.transform_points(inv, fixed.xy),
        normal=g.rotate_vectors(inv, fixed.normal),
        valid=fixed.valid,
    )
    res = pallas_icp.fused_align_cloud(
        fixed, moving, jnp.zeros(3),
        iterations=10, max_distance=0.5, normal_cos=0.8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.estimate), np.asarray(true_t), atol=2e-3)
    assert float(res.num_inliers) > 450


def test_fused_align_single_step_matches_xla_path():
    fixed = spiral_cloud()
    rng = np.random.default_rng(0)
    moving = cloud_op.Cloud(
        xy=fixed.xy + jnp.asarray(rng.normal(scale=0.01, size=(512, 2)).astype(np.float32)),
        normal=fixed.normal,
        valid=fixed.valid,
    )
    t0 = jnp.zeros(3)
    # XLA path: brute-force NN correspondences + one GN step
    corr = correspond.find_bruteforce_nn(fixed, moving, t0, max_distance_m=0.5, normal_cos=0.8)
    H, b, chi, n_inl, _ = icp.p2p_linearize(t0, fixed, moving, corr, 0.05)
    dx = jnp.linalg.solve(H, -b)
    t_xla = g.compose(dx, t0)
    # Pallas path: one iteration
    res = pallas_icp.fused_align_cloud(
        fixed, moving, t0, iterations=1, max_distance=0.5, normal_cos=0.8,
        chi_threshold=0.05, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.estimate), np.asarray(t_xla), atol=1e-4)


def test_fused_align_respects_validity():
    fixed = spiral_cloud(n=512, cap=512)
    # invalidate half the moving points: alignment still works on the rest
    valid = np.ones(512, bool)
    valid[::2] = False
    moving = cloud_op.Cloud(fixed.xy, fixed.normal, jnp.asarray(valid))
    res = pallas_icp.fused_align_cloud(
        fixed, moving, jnp.array([0.02, 0.0, 0.0]),
        iterations=8, max_distance=0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(res.estimate), np.zeros(3), atol=1e-3)
    assert abs(float(res.num_inliers) - 256) < 5


def test_fused_align_min_inlier_guard():
    fixed = spiral_cloud()
    moving = cloud_op.Cloud(
        fixed.xy + 100.0, fixed.normal, fixed.valid  # hopelessly far
    )
    t0 = jnp.array([0.1, 0.2, 0.3])
    res = pallas_icp.fused_align_cloud(
        fixed, moving, t0, iterations=5, max_distance=0.5, interpret=True
    )
    # no inliers -> estimate unchanged
    np.testing.assert_allclose(np.asarray(res.estimate), np.asarray(t0), atol=1e-6)
    assert float(res.num_inliers) == 0
