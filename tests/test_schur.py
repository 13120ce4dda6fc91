"""Schur-complement partitioned solver must match the dense GN solver."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.solver import pgo, schur

from test_cg import grid_graph
from test_pgo import build_circle_graph


def test_schur_matches_dense_on_circle():
    graph, gt, est, n = build_circle_graph()
    cfg = pgo.PGOConfig(max_iterations=10)
    dense, chi_d, _ = pgo.optimize(cfg, graph)
    part = schur.partition_graph(graph, n_parts=4, n_vars=n)
    out, chi_s, _ = schur.optimize_schur(cfg, graph, part)
    np.testing.assert_allclose(
        np.asarray(out.poses[:n]), np.asarray(dense.poses[:n]), atol=5e-3
    )
    assert abs(float(chi_s) - float(chi_d)) < 1e-2 * max(float(chi_d), 1.0)


def test_schur_matches_dense_on_grid():
    graph, gt, v = grid_graph(side=12)
    cfg = pgo.PGOConfig(max_iterations=6)
    dense, chi_d, _ = pgo.optimize(cfg, graph)
    part = schur.partition_graph(graph, n_parts=4, n_vars=v)
    out, chi_s, _ = schur.optimize_schur(cfg, graph, part)
    np.testing.assert_allclose(
        np.asarray(out.poses[:v]), np.asarray(dense.poses[:v]), atol=2e-2
    )


def test_partitioning_structure():
    graph, gt, v = grid_graph(side=16)
    part = schur.partition_graph(graph, n_parts=4, n_vars=v)
    interior = np.asarray(part.interior_idx)
    sep = np.asarray(part.separator_idx)
    v_cap = graph.var_capacity
    # every valid variable appears exactly once (interior xor separator)
    seen = list(interior[interior < v_cap]) + list(sep[sep < v_cap])
    assert len(seen) == len(set(seen))
    assert set(seen) == set(range(v))
    # separator is a small fraction of the grid
    assert (sep < v_cap).sum() < v * 0.6


def test_schur_sharded_matches_vmapped():
    from srrg2_laser_slam_2d_tpu.parallel.mesh import make_mesh

    graph, gt, v = grid_graph(side=12)
    cfg = pgo.PGOConfig(max_iterations=5)
    part = schur.partition_graph(graph, n_parts=8, n_vars=v)
    ref, chi_ref, _ = schur.optimize_schur(cfg, graph, part)
    mesh = make_mesh(8)
    out, chi, _ = schur.optimize_schur_sharded(cfg, graph, part, mesh)
    np.testing.assert_allclose(
        np.asarray(out.poses[:v]), np.asarray(ref.poses[:v]), atol=1e-3
    )
    assert abs(float(chi) - float(chi_ref)) < 1e-2 * max(float(chi_ref), 1.0)
