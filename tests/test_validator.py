"""FactorGraphClosureValidator parity tests — partition-based voting
(reference config configurations/stage_segway_double_config_LASER_0.json:684-701).

The negative test is the one the reference leaves untested: a geometrically
wrong closure must be REJECTED within min_times_checked rounds.
"""

import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.models import loop_closure as lc
from srrg2_laser_slam_2d_tpu.utils import geometry

import jax.numpy as jnp


def _ring_graph(n=16, radius=4.0, drift=0.01, seed=0):
    """Odometry ring: GT poses on a circle, edges = noisy GT relatives, graph
    poses = integration of the noisy edges (accumulated drift). Returns
    (poses [n,3], adjacency, edges [(i, j, meas, info)], gt [n,3])."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        a = 2 * np.pi * k / n
        gt.append([radius * np.cos(a), radius * np.sin(a), a + np.pi / 2])
    gt = np.asarray(gt, np.float32)
    info = np.asarray([100.0, 100.0, 1000.0], np.float32)
    edges = []
    poses = [gt[0]]
    for k in range(n - 1):
        meas = np.asarray(
            geometry.relative(jnp.asarray(gt[k]), jnp.asarray(gt[k + 1]))
        )
        meas = meas + rng.normal(scale=drift, size=3).astype(np.float32)
        edges.append((k, k + 1, meas, info))
        poses.append(
            np.asarray(geometry.compose(jnp.asarray(poses[-1]), jnp.asarray(meas)))
        )
    poses = np.stack(poses)
    adjacency = [set() for _ in range(n)]
    for i, j, _, _ in edges:
        adjacency[i].add(j)
        adjacency[j].add(i)
    return poses, adjacency, edges, gt


def _closure(i, j, gt, offset=None):
    meas = np.asarray(geometry.relative(jnp.asarray(gt[i]), jnp.asarray(gt[j])))
    if offset is not None:
        meas = meas + np.asarray(offset, np.float32)
    return lc.ClosureCandidate(
        query_map=j,
        candidate_map=i,
        estimate=meas,
        num_inliers=500,
        num_correspondences=600,
        chi_inliers=0.01,
    )


def _run_rounds(validator, poses, adjacency, edges, rounds):
    accepted = []
    for _ in range(rounds):
        accepted += validator.vote(poses, adjacency, edges)
    return accepted


def test_good_closure_accepted():
    poses, adjacency, edges, gt = _ring_graph()
    cfg = lc.ValidatorConfig()
    v = lc.ClosureValidator(cfg)
    v.add(_closure(0, 15, gt))
    accepted = _run_rounds(v, poses, adjacency, edges, cfg.min_times_checked)
    assert len(accepted) == 1
    assert not v.pending


def test_wrong_closure_rejected():
    poses, adjacency, edges, gt = _ring_graph()
    cfg = lc.ValidatorConfig()
    v = lc.ClosureValidator(cfg)
    # closure wrong by 2 m / 0.5 rad — must be rejected, not accepted
    v.add(_closure(0, 15, gt, offset=(2.0, 1.0, 0.5)))
    accepted = _run_rounds(v, poses, adjacency, edges, cfg.min_times_checked)
    assert accepted == []
    assert not v.pending  # rejected (dropped), not left pending forever


def test_mixed_closures_judged_in_one_partition():
    poses, adjacency, edges, gt = _ring_graph()
    cfg = lc.ValidatorConfig()
    v = lc.ClosureValidator(cfg)
    v.add(_closure(0, 15, gt))
    v.add(_closure(1, 14, gt))
    v.add(_closure(2, 13, gt, offset=(1.5, -1.0, 0.3)))  # the liar
    accepted = _run_rounds(v, poses, adjacency, edges, cfg.min_times_checked)
    pairs = {(c.candidate_map, c.query_map) for c in accepted}
    assert (0, 15) in pairs and (1, 14) in pairs
    assert (2, 13) not in pairs
    assert not v.pending


def test_partition_respects_expansion_range():
    poses, adjacency, edges, gt = _ring_graph(n=16)
    cfg = lc.ValidatorConfig(partition_expansion_range=2)
    v = lc.ClosureValidator(cfg)
    v.add(_closure(0, 15, gt))
    parts = v._partitions(adjacency)
    assert len(parts) == 1
    vars_, entries = parts[0]
    # 2 hops around each endpoint of the 0—15 closure on a 16-chain
    assert vars_ == {0, 1, 2, 13, 14, 15}


def test_disabled_validator_passes_through():
    poses, adjacency, edges, gt = _ring_graph()
    v = lc.ClosureValidator(lc.ValidatorConfig(enabled=False))
    v.add(_closure(0, 15, gt, offset=(5.0, 5.0, 1.0)))
    accepted = v.vote(poses)
    assert len(accepted) == 1
