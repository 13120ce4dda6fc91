"""CG solver tests: must match the dense solver on small graphs and scale to
large synthetic pose graphs (the city-scale config path)."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.solver import cg, pgo
from srrg2_laser_slam_2d_tpu.utils import geometry as g

from test_pgo import build_circle_graph


def test_cg_matches_dense_on_circle():
    graph, gt, est, n = build_circle_graph()
    dense, chi_d, _ = pgo.optimize(pgo.PGOConfig(max_iterations=10), graph)
    out, chi_c, _ = cg.optimize_cg(
        cg.CGConfig(gn_iterations=10, cg_iterations=100, cg_tolerance=1e-9), graph
    )
    np.testing.assert_allclose(
        np.asarray(out.poses[:n]), np.asarray(dense.poses[:n]), atol=5e-3
    )
    assert abs(float(chi_c) - float(chi_d)) < 1e-2 * max(float(chi_d), 1.0)


def grid_graph(side: int, noise: float = 0.02, seed: int = 0):
    """Manhattan-world grid pose graph: side x side nodes, chain + row/col ties."""
    rng = np.random.default_rng(seed)
    v = side * side
    # GT poses on a lattice
    gt = np.zeros((v, 3), np.float32)
    for r in range(side):
        for c in range(side):
            gt[r * side + c] = (c * 1.0, r * 1.0, 0.0)
    edges = []
    for r in range(side):
        for c in range(side):
            k = r * side + c
            if c + 1 < side:
                edges.append((k, k + 1))
            if r + 1 < side:
                edges.append((k, k + side))
    e = len(edges)
    ei = np.array([a for a, _ in edges], np.int32)
    ej = np.array([b for _, b in edges], np.int32)
    meas = []
    for a, b in edges:
        z = np.asarray(g.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
        meas.append(z + rng.normal(scale=noise, size=3).astype(np.float32))
    meas = np.stack(meas)
    # noisy initialization: spanning-tree integration
    init = gt + rng.normal(scale=0.1, size=(v, 3)).astype(np.float32)
    init[0] = gt[0]

    vc = 1
    while vc < v:
        vc *= 2
    ec = 1
    while ec < e:
        ec *= 2
    graph = pgo.empty_graph(vc, ec)
    graph = graph._replace(
        poses=graph.poses.at[:v].set(jnp.asarray(init)),
        var_valid=graph.var_valid.at[:v].set(True),
        var_fixed=graph.var_fixed.at[0].set(True),
        edge_i=graph.edge_i.at[:e].set(jnp.asarray(ei)),
        edge_j=graph.edge_j.at[:e].set(jnp.asarray(ej)),
        edge_meas=graph.edge_meas.at[:e].set(jnp.asarray(meas)),
        edge_valid=graph.edge_valid.at[:e].set(True),
    )
    return graph, gt, v


def test_cg_scales_to_grid_graph():
    graph, gt, v = grid_graph(side=16)  # 256 nodes, ~480 edges
    chi0 = float(pgo.graph_chi(graph))
    out, chi, it = cg.optimize_cg(
        cg.CGConfig(gn_iterations=8, cg_iterations=100), graph
    )
    chi1 = float(pgo.graph_chi(out))
    # the normal-equation residual collapses to the edge-noise floor
    # (single-anchor gauge means ATE-vs-GT has an O(noise * diameter) floor,
    # so chi — what the solver actually minimizes — is the right check)
    assert chi1 < 0.05 * chi0, (chi0, chi1)
    # and the solution agrees with the dense solver
    dense, _, _ = pgo.optimize(pgo.PGOConfig(max_iterations=8), graph)
    np.testing.assert_allclose(
        np.asarray(out.poses[:v]), np.asarray(dense.poses[:v]), atol=2e-2
    )


def test_sorted_order_and_chunked_jacfwd_match_baseline():
    # the million-node controls (EdgeOrder sorted segment sums + jac_chunk)
    # must be numerically identical to the plain path
    from srrg2_laser_slam_2d_tpu.bench import pgo_bench

    graph = pgo_bench.make_grid_graph(8)  # 64 nodes, edge capacity 128
    cfg0 = cg.CGConfig(gn_iterations=4, cg_iterations=30)
    ref, chi_ref, _ = cg.optimize_cg(cfg0, graph)
    order = cg.prepare_edge_order(graph)
    cfg1 = cg.CGConfig(gn_iterations=4, cg_iterations=30, jac_chunk=32)
    out, chi, _ = cg.optimize_cg(cfg1, graph, order)
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(ref.poses), atol=1e-5
    )
    np.testing.assert_allclose(float(chi), float(chi_ref), rtol=1e-5)
