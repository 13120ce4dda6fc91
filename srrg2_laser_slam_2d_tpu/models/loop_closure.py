"""Loop-closing stack — TPU equivalents of ``MultiLoopDetectorBruteForce2D``,
``LocalMapSelectorBreadthFirst2D``, ``FactorGraphClosureValidator`` and
``MultiRelocalizer2D`` (all external in the reference; behavior reconstructed
from configurations/stage_segway_double_config_LASER_0.json:613-635 (detector),
:145-162 (selector), :684-701 (validator), :577-596 (relocalizer) and
SURVEY.md §2.2).

The headline TPU win: candidate local maps are aligned against the query map
IN PARALLEL — a single vmapped instance of the fused ICP kernel (ops/icp.py)
over a static candidate batch, something the sequential C++ loop cannot do
(SURVEY.md §7.6).
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import icp
from ..ops.projector import PolarProjection
from ..utils import geometry
from ..utils.cloud import Cloud

Array = jax.Array


def default_ld_aligner() -> icp.AlignerConfig:
    """Loop-detection aligner assembly (config: MultiAligner2D #2 max_it 30,
    finder #42 point_distance 1.414 / normal_cos 0.8, robustifier #24 chi 0.05)."""
    return icp.AlignerConfig(
        max_iterations=30,
        min_num_inliers=10,
        point_distance=1.414,
        normal_cos=0.8,
        chi_threshold=0.05,
        odom_weight=0.0,
    )


@dataclass(frozen=True)
class LoopDetectorConfig:
    """MultiLoopDetectorBruteForce2D + LocalMapSelectorBreadthFirst2D params."""

    # detector gates (config :621-634)
    relocalize_min_inliers: int = 300
    relocalize_min_inliers_ratio: float = 0.8
    relocalize_max_chi_inliers: float = 0.1
    # selector (config :145-162)
    max_local_map_distance: float = 1.0
    relocalize_range_scale: float = 2.0
    aggressive_relocalize_graph_distance: int = 10
    aggressive_relocalize_graph_max_range: int = 20
    aggressive_relocalize_range_increase_per_edge: float = 0.05
    # static candidate batch size for the vmapped alignment
    max_candidates: int = 8
    aligner: icp.AlignerConfig = field(default_factory=default_ld_aligner)


@dataclass(frozen=True)
class ValidatorConfig:
    """FactorGraphClosureValidator params (config :684-701)."""

    inlier_accept_ratio: float = 0.5
    inlier_reject_ratio: float = 0.3
    inlier_chi: float = 0.05
    min_times_checked: int = 3
    partition_expansion_range: int = 8
    enabled: bool = True


@dataclass(frozen=True)
class RelocalizerConfig:
    """MultiRelocalizer2D params (config :577-596)."""

    max_translation: float = 3.0
    relocalize_max_chi_inliers: float = 0.005
    relocalize_min_inliers: int = 500
    relocalize_min_inliers_ratio: float = 0.7


@dataclass
class ClosureCandidate:
    query_map: int
    candidate_map: int
    estimate: np.ndarray       # pose of query map in candidate map frame
    num_inliers: int
    num_correspondences: int
    chi_inliers: float


@functools.partial(jax.jit, static_argnames=("acfg", "proj"))
def _batch_align(
    acfg: icp.AlignerConfig,
    proj: PolarProjection,
    fixed_batch: Cloud,        # [K, N, ...] candidate scenes (their map frames)
    moving: Cloud,             # [N, ...] query scene
    initials: Array,           # [K, 3]
) -> icp.AlignResult:
    """Align the query scene against K candidate scenes in parallel."""

    def one(fixed, init):
        return icp.align(acfg, proj, fixed, moving, init)

    return jax.vmap(one)(fixed_batch, initials)


def graph_distances(adjacency: list[set[int]], start: int) -> dict[int, int]:
    """Host-side BFS over the local-map graph (LocalMapSelectorBreadthFirst2D)."""
    dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in adjacency[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


class BreadthFirstSelector:
    """Pick candidate local maps for closure checks: graph-BFS distances plus
    a Euclidean gate that widens aggressively when the graph detour is long
    (the reference's aggressive relocalization heuristics, config :145-162)."""

    def __init__(self, cfg: LoopDetectorConfig):
        self.cfg = cfg

    def select(
        self,
        query: int,
        poses: np.ndarray,          # [V, 3] current variable estimates
        n_maps: int,
        adjacency: list[set[int]],
    ) -> list[int]:
        cfg = self.cfg
        dist = graph_distances(adjacency, query)
        q_xy = poses[query, :2]
        out = []
        for m in range(n_maps):
            if m == query:
                continue
            gd = dist.get(m, 10**9)
            if gd <= 1:
                continue  # direct neighbors are not closures
            rng = cfg.max_local_map_distance * cfg.relocalize_range_scale
            if gd >= cfg.aggressive_relocalize_graph_distance:
                widen = min(gd, cfg.aggressive_relocalize_graph_max_range)
                rng += widen * cfg.aggressive_relocalize_range_increase_per_edge
            d = float(np.linalg.norm(poses[m, :2] - q_xy))
            if d <= rng:
                out.append((d, m))
        out.sort()
        return [m for _, m in out[: cfg.max_candidates]]


class BruteForceLoopDetector:
    """Align the query map scene against all selected candidates in one
    batched kernel, then gate (MultiLoopDetectorBruteForce2D)."""

    def __init__(self, cfg: LoopDetectorConfig, proj: PolarProjection):
        self.cfg = cfg
        self.proj = proj
        self.selector = BreadthFirstSelector(cfg)

    def detect(
        self,
        query: int,
        scenes: list[Cloud],
        poses: np.ndarray,
        n_maps: int,
        adjacency: list[set[int]],
    ) -> list[ClosureCandidate]:
        cfg = self.cfg
        cands = self.selector.select(query, poses, n_maps, adjacency)
        if not cands:
            return []
        K = cfg.max_candidates
        # static batch: pad by repeating the first candidate (masked later)
        padded = cands + [cands[0]] * (K - len(cands))
        fixed_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[scenes[m] for m in padded])
        # initial guess: query map pose seen from each candidate map
        initials = np.stack(
            [
                np.asarray(
                    geometry.relative(
                        jnp.asarray(poses[m]), jnp.asarray(poses[query])
                    )
                )
                for m in padded
            ]
        )
        res = _batch_align(
            cfg.aligner, self.proj, fixed_batch, scenes[query], jnp.asarray(initials)
        )
        closures = []
        n_inl = np.asarray(res.num_inliers)
        n_cor = np.asarray(res.num_correspondences)
        chi_in = np.asarray(res.chi_inliers)
        est = np.asarray(res.estimate)
        for k, m in enumerate(cands):
            if n_inl[k] < cfg.relocalize_min_inliers:
                continue
            if n_cor[k] == 0 or n_inl[k] / max(int(n_cor[k]), 1) < cfg.relocalize_min_inliers_ratio:
                continue
            if chi_in[k] > cfg.relocalize_max_chi_inliers:
                continue
            closures.append(
                ClosureCandidate(
                    query_map=query,
                    candidate_map=m,
                    estimate=est[k],
                    num_inliers=int(n_inl[k]),
                    num_correspondences=int(n_cor[k]),
                    chi_inliers=float(chi_in[k]),
                )
            )
        return closures


class ClosureValidator:
    """Vote-based closure acceptance (FactorGraphClosureValidator).

    Each pending closure is re-scored on subsequent rounds by measuring the
    graph-vs-alignment consistency of its endpoints; after
    ``min_times_checked`` rounds the accumulated inlier ratio accepts
    (>= inlier_accept_ratio) or rejects (< inlier_reject_ratio) it.
    A round happens every time the SLAM loop calls ``vote`` (once per new
    local map, matching the reference's per-epoch re-checks).
    """

    def __init__(self, cfg: ValidatorConfig):
        self.cfg = cfg
        self.pending: list[dict] = []

    def add(self, closure: ClosureCandidate) -> None:
        self.pending.append({"closure": closure, "checks": 0, "votes": 0})

    def vote(self, poses: np.ndarray) -> list[ClosureCandidate]:
        """Run one voting round against the current pose estimates; returns
        newly accepted closures (removed from pending)."""
        if not self.cfg.enabled:
            out = [p["closure"] for p in self.pending]
            self.pending.clear()
            return out
        accepted = []
        still = []
        for p in self.pending:
            c: ClosureCandidate = p["closure"]
            # consistency: closure-predicted relative pose vs graph-estimated
            rel_graph = np.asarray(
                geometry.relative(
                    jnp.asarray(poses[c.candidate_map]), jnp.asarray(poses[c.query_map])
                )
            )
            diff = rel_graph - c.estimate
            diff[2] = np.arctan2(np.sin(diff[2]), np.cos(diff[2]))
            chi = float(diff[:2] @ diff[:2] + diff[2] * diff[2])
            p["checks"] += 1
            if chi < self.cfg.inlier_chi * max(c.num_inliers, 1) / 100.0 + 0.25:
                p["votes"] += 1
            if p["checks"] >= self.cfg.min_times_checked:
                ratio = p["votes"] / p["checks"]
                if ratio >= self.cfg.inlier_accept_ratio:
                    accepted.append(c)
                elif ratio < self.cfg.inlier_reject_ratio:
                    pass  # rejected, drop
                else:
                    still.append(p)  # undecided: keep checking
            else:
                still.append(p)
        self.pending = still
        return accepted
