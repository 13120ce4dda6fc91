"""Pose-graph optimizer tests: odometry chain + loop closure on a noisy
circle must recover ground truth up to the anchored gauge."""

import numpy as np
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.solver import pgo
from srrg2_laser_slam_2d_tpu.utils import geometry as g


def build_circle_graph(n=20, noise=0.03, seed=0, close_loop=True):
    rng = np.random.default_rng(seed)
    # GT: robot drives a circle of n segments
    step = np.array([2 * np.pi * 5.0 / n, 0.0, 2 * np.pi / n], np.float32)
    gt = [np.zeros(3, np.float32)]
    for _ in range(n - 1):
        gt.append(np.asarray(g.compose(jnp.asarray(gt[-1]), jnp.asarray(step))))
    gt = np.stack(gt)

    graph = pgo.empty_graph(var_capacity=32, edge_capacity=64)
    poses = graph.poses
    # initialize variables by noisy odometry integration
    est = [gt[0]]
    meas = []
    for k in range(1, n):
        z = np.asarray(g.relative(jnp.asarray(gt[k - 1]), jnp.asarray(gt[k])))
        z_noisy = z + rng.normal(scale=noise, size=3).astype(np.float32)
        meas.append(z_noisy)
        est.append(np.asarray(g.compose(jnp.asarray(est[-1]), jnp.asarray(z_noisy))))
    est = np.stack(est)

    poses = poses.at[:n].set(jnp.asarray(est))
    var_valid = graph.var_valid.at[:n].set(True)
    var_fixed = graph.var_fixed.at[0].set(True)

    ei = list(range(n - 1))
    ej = list(range(1, n))
    ems = list(meas)
    if close_loop:
        # exact loop closure from last back to first
        z = np.asarray(g.relative(jnp.asarray(gt[n - 1]), jnp.asarray(gt[0])))
        ei.append(n - 1)
        ej.append(0)
        ems.append(z)
    ne = len(ei)
    graph = graph._replace(
        poses=poses,
        var_valid=var_valid,
        var_fixed=var_fixed,
        edge_i=graph.edge_i.at[:ne].set(jnp.asarray(ei, jnp.int32)),
        edge_j=graph.edge_j.at[:ne].set(jnp.asarray(ej, jnp.int32)),
        edge_meas=graph.edge_meas.at[:ne].set(jnp.asarray(np.stack(ems))),
        edge_valid=graph.edge_valid.at[:ne].set(True),
    )
    return graph, gt, est, n


def test_chain_only_consistency():
    # without closure the optimum reproduces the integrated odometry exactly
    graph, gt, est, n = build_circle_graph(close_loop=False)
    out, chi, it = pgo.optimize(pgo.PGOConfig(max_iterations=10), graph)
    np.testing.assert_allclose(np.asarray(out.poses[:n]), est, atol=1e-3)
    assert float(chi) < 1e-6


def test_loop_closure_reduces_error():
    graph, gt, est, n = build_circle_graph()
    out, chi, it = pgo.optimize(pgo.PGOConfig(max_iterations=20), graph)
    opt = np.asarray(out.poses[:n])
    err_before = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1).mean()
    err_after = np.linalg.norm(opt[:, :2] - gt[:, :2], axis=1).mean()
    assert err_after < 0.6 * err_before, (err_before, err_after)
    # anchored first pose never moves
    np.testing.assert_allclose(opt[0], gt[0], atol=1e-6)


def test_fixed_variable_stays_put():
    graph, gt, est, n = build_circle_graph()
    graph = graph._replace(var_fixed=graph.var_fixed.at[5].set(True))
    before = np.asarray(graph.poses[5])
    out, _, _ = pgo.optimize(pgo.PGOConfig(max_iterations=5), graph)
    np.testing.assert_allclose(np.asarray(out.poses[5]), before, atol=1e-5)


def test_edge_residual_zero_at_truth():
    a = jnp.array([1.0, 2.0, 0.5])
    b = jnp.array([2.0, 2.5, 0.9])
    z = g.relative(a, b)
    e = pgo.edge_residual(a, b, z)
    np.testing.assert_allclose(np.asarray(e), np.zeros(3), atol=1e-6)


def test_lm_matches_gn_solution():
    # IterationAlgorithmLM option ("GN/LM or others", config :92): on a
    # well-conditioned graph LM converges to the same optimum as GN
    graph, gt, est, n = build_circle_graph()
    out_gn, chi_gn, _ = pgo.optimize(pgo.PGOConfig(max_iterations=20), graph)
    out_lm, chi_lm, _ = pgo.optimize(
        pgo.PGOConfig(max_iterations=40, algorithm="lm"), graph
    )
    np.testing.assert_allclose(
        np.asarray(out_lm.poses[:n]), np.asarray(out_gn.poses[:n]), atol=5e-3
    )
    assert float(chi_lm) <= float(chi_gn) * 1.1 + 1e-6


def test_lm_never_increases_chi():
    # LM accept/reject: chi after optimization never exceeds the initial chi,
    # even from a poor initialization where a raw GN step could overshoot
    graph, gt, est, n = build_circle_graph(noise=0.15, seed=3)
    chi0 = float(pgo.graph_chi(graph))
    out, chi, _ = pgo.optimize(pgo.PGOConfig(max_iterations=30, algorithm="lm"), graph)
    assert float(chi) <= chi0 + 1e-5


def test_chain_graphs_never_nan():
    """f32-conditioning regression (r4 schur_r04 'chi: NaN' root cause):
    long anchored chains exceed the f32 dense solve — the scaled solve +
    divergence guard must keep poses finite at every size, and the LM / CG
    paths must actually converge on the shape (pgo.solve_spd_scaled)."""
    import jax.numpy as jnp

    from srrg2_laser_slam_2d_tpu.bench.pgo_bench import edge_chi, make_chain_graph
    from srrg2_laser_slam_2d_tpu.solver import cg as cg_mod

    for n in (64, 256):
        g = make_chain_graph(n)
        out, chi, _ = pgo.optimize(pgo.PGOConfig(max_iterations=10), g)
        assert bool(jnp.isfinite(out.poses).all()), n
        lm, _, _ = pgo.optimize(
            pgo.PGOConfig(max_iterations=20, algorithm="lm"), g
        )
        assert bool(jnp.isfinite(lm.poses).all()), n
        assert edge_chi(lm) < edge_chi(g), n
        sc, _, _ = cg_mod.optimize_cg(
            cg_mod.CGConfig(gn_iterations=10, cg_iterations=100), g
        )
        assert edge_chi(sc) < 0.05 * edge_chi(g), (n, edge_chi(sc))
