"""Multi-device tests on the 8-way virtual CPU mesh: distributed PGO must
match the single-device solver; sharded batch alignment must match vmap."""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.parallel import batch_align, dist_pgo
from srrg2_laser_slam_2d_tpu.parallel.mesh import make_mesh
from srrg2_laser_slam_2d_tpu.solver import pgo
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op
from srrg2_laser_slam_2d_tpu.utils import geometry as g

from test_pgo import build_circle_graph


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_pgo_matches_single_device():
    graph, gt, est, n = build_circle_graph()
    cfg = pgo.PGOConfig(max_iterations=10)
    ref, chi_ref, _ = pgo.optimize(cfg, graph)

    mesh = make_mesh(8)
    sharded = dist_pgo.shard_edges(graph, mesh)
    out, chi, it = dist_pgo.optimize_sharded(cfg, sharded, mesh)
    np.testing.assert_allclose(
        np.asarray(out.poses[:n]), np.asarray(ref.poses[:n]), atol=1e-4
    )
    np.testing.assert_allclose(float(chi), float(chi_ref), rtol=1e-3, atol=1e-5)


def test_sharded_batch_align_matches_vmap():
    rng = np.random.default_rng(2)
    n_pts = 128
    # spiral (not a circle): rotational symmetry would create multiple exact
    # optima and let numerically-different compilations pick different basins.
    # +0.27 beam offset keeps points off the matching-canvas bin boundaries
    # (points exactly on bin edges flip beams under epsilon perturbations).
    angles = (np.arange(n_pts) + 0.27) * (2 * np.pi / n_pts) - np.pi
    radii = 2.0 + 0.25 * angles
    xy = np.stack([radii * np.cos(angles), radii * np.sin(angles)], 1).astype(np.float32)
    nrm = (-xy / np.linalg.norm(xy, axis=1, keepdims=True)).astype(np.float32)
    base = cloud_op.from_numpy(xy, nrm)
    K = 8
    fixed_batch = jax.tree.map(lambda x: jnp.stack([x] * K), base)
    # offsets below half a beam width keep every candidate in the identity
    # basin of the (near-self-similar) spiral
    initials = jnp.asarray(rng.normal(scale=0.008, size=(K, 3)).astype(np.float32))
    proj = PolarProjection.make(cols=128, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=10.0)
    acfg = icp.AlignerConfig(max_iterations=8)

    mesh = make_mesh(8)
    res_sh = batch_align.batch_align_sharded(
        acfg, proj, mesh, fixed_batch, fixed_batch, initials
    )
    res_vm = jax.vmap(lambda f, m, i: icp.align(acfg, proj, f, m, i))(
        fixed_batch, fixed_batch, initials
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.estimate), np.asarray(res_vm.estimate), atol=1e-5
    )
    # self-alignment converges to identity (a near-self-similar spiral can
    # trap a worst-case candidate one beam over; the median must be exact)
    errs = np.max(np.abs(np.asarray(res_sh.estimate)), axis=1)
    assert np.median(errs) < 1e-4, errs
    assert np.sort(errs)[-2] < 5e-3, errs
