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


def relative_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-side SE(2) relative pose a^-1 ∘ b (no device round-trip — the
    per-candidate initial guesses are host bookkeeping, and a device sync
    through the axon tunnel costs ~24 ms each, BENCH_NOTES.md r4)."""
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array(
        [c * dx + s * dy, -s * dx + c * dy, b[2] - a[2]], np.float32
    )


def compose_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-side SE(2) composition a ∘ b."""
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array(
        [a[0] + c * b[0] - s * b[1], a[1] + s * b[0] + c * b[1], a[2] + b[2]],
        np.float32,
    )


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
    # candidate-alignment backend: "projective" = XLA beam-projective finder
    # (icp.align; the parity path), "fused_nn" = one-kernel bounded-NN ICP
    # (ops/pallas_icp.fused_align_pairs; the CorrespondenceFinderKDTree2D
    # correspondence model, TPU serving path — used by the chunked loop)
    backend: str = "projective"
    # chunked-loop detection point capacity: candidate/query scenes align at
    # min(this, live-count bucket). Alignment cost is O(capacity); 1024
    # covers typical 1 m local maps (corridor median ~700 points) — scenes
    # beyond it align on their first `detection_capacity` points.
    # 0 = ledger bucket only (no cap)
    detection_capacity: int = 0
    # fused_nn backend: NN-correspondence refresh period (the NN pass is the
    # whole kernel cost; >1 reuses frozen matches between GN updates —
    # classic fixed-correspondence ICP, quality-gated by the corridor ATE)
    fused_corr_refresh: int = 1


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


@functools.partial(jax.jit, static_argnames=("acfg", "proj"))
def _batch_align_pairs(
    acfg: icp.AlignerConfig,
    proj: PolarProjection,
    fixed_batch: Cloud,        # [J, N, ...] candidate scenes (their map frames)
    moving_batch: Cloud,       # [J, N, ...] per-job query scenes
    initials: Array,           # [J, 3]
) -> icp.AlignResult:
    """Align J independent (query, candidate) scene pairs in parallel — the
    multi-query variant of ``_batch_align`` used by the chunked SLAM loop,
    where one harvest runs the closure detection of EVERY local map born in
    the chunk as a single batched program (models/chunked_slam.py)."""

    def one(fixed, moving, init):
        return icp.align(acfg, proj, fixed, moving, init)

    return jax.vmap(one)(fixed_batch, moving_batch, initials)


@functools.partial(
    jax.jit,
    static_argnames=("proj", "point_distance", "normal_cos", "max_distance2",
                     "target_merges", "binning"),
)
def merge_closure_scenes(
    proj: PolarProjection,
    fixed: Cloud,            # candidate map scene (its frame)
    moving: Cloud,           # query map scene (its frame)
    query_in_candidate: Array,  # [3] accepted closure estimate
    point_distance: float = 0.5,
    normal_cos: float = 0.8,
    max_distance2: float = 0.25,
    target_merges: int = 200,
    binning: bool = True,
) -> Cloud:
    """Closure-time map fusion — the tracker slice's ``closure_merger``
    (``MergerCorrespondencePointNormal2f``, config :55-58 wiring and
    :656-670 params): corresponding points from the relocalize aligner's
    projective finder are averaged; unclaimed query points append (binned,
    budgeted). Returns the fused candidate-map scene."""
    from ..ops import merge as merge_op
    from ..ops import projector as projector_op

    canvas = projector_op.project_local(proj, fixed)
    corr = icp.find_projective(
        proj, canvas, fixed, moving, query_in_candidate, point_distance, normal_cos
    )
    return merge_op.merge_correspondence(
        fixed,
        moving,
        corr.fixed_idx,
        corr.moving_idx,
        corr.valid,
        query_in_candidate,
        maximum_distance_geometry_squared=max_distance2,
        target_number_of_merges=target_merges,
        enable_binning=binning,
    )


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

    def select_many(
        self,
        queries: list[int],
        poses: np.ndarray,
        n_maps: int,
        adjacency: list[set[int]],
    ) -> list[tuple[int, int]]:
        """Vectorized multi-query selection (same semantics as ``select``
        per query): one level-synchronous BFS over a [Q, M] frontier matrix
        instead of Q python BFS walks — the chunked loop selects for every
        map born in a chunk at once, and the per-query python walk was ~1 s
        per corridor run (r5 profile). Returns (query, candidate) jobs in
        per-query nearest-first order."""
        cfg = self.cfg
        Q = len(queries)
        if Q == 0 or n_maps == 0:
            return []
        M = n_maps
        adj = np.zeros((M, M), bool)
        for i, nbrs in enumerate(adjacency[:M]):
            for j in nbrs:
                if j < M:
                    adj[i, j] = True
        # level-synchronous BFS, all queries at once; distances needed only
        # up to the aggressive-widening cap
        max_d = max(cfg.aggressive_relocalize_graph_max_range, 2) + 1
        dist = np.full((Q, M), 1 << 30, np.int64)
        frontier = np.zeros((Q, M), bool)
        frontier[np.arange(Q), queries] = True
        dist[np.arange(Q), queries] = 0
        for level in range(1, max_d + 1):
            nxt = (frontier @ adj) & (dist > level)
            if not nxt.any():
                break
            dist[nxt] = level
            frontier = nxt
        gd = np.minimum(dist, 10**9)
        rng = np.full((Q, M), cfg.max_local_map_distance * cfg.relocalize_range_scale)
        widen = gd >= cfg.aggressive_relocalize_graph_distance
        rng = rng + np.where(
            widen,
            np.minimum(gd, cfg.aggressive_relocalize_graph_max_range)
            * cfg.aggressive_relocalize_range_increase_per_edge,
            0.0,
        )
        q_xy = poses[queries, :2]                       # [Q, 2]
        d = np.linalg.norm(poses[None, :M, :2] - q_xy[:, None, :], axis=2)
        ok = (gd > 1) & (d <= rng)
        ok[np.arange(Q), queries] = False
        jobs: list[tuple[int, int]] = []
        for qi, q in enumerate(queries):
            cand = np.where(ok[qi])[0]
            if len(cand) == 0:
                continue
            order = cand[np.argsort(d[qi, cand], kind="stable")]
            for m in order[: cfg.max_candidates]:
                jobs.append((q, int(m)))
        return jobs


def gate_candidates(
    cfg: LoopDetectorConfig,
    jobs: list[tuple[int, int]],
    n_inl: np.ndarray,
    n_cor: np.ndarray,
    chi_in: np.ndarray,
    est: np.ndarray,
) -> list[ClosureCandidate]:
    """Detector acceptance gates (MultiLoopDetectorBruteForce2D, config
    :621-634) applied to batched alignment results for (query, candidate)
    job pairs."""
    out = []
    for k, (q, m) in enumerate(jobs):
        if n_inl[k] < cfg.relocalize_min_inliers:
            continue
        if n_cor[k] == 0 or n_inl[k] / max(int(n_cor[k]), 1) < cfg.relocalize_min_inliers_ratio:
            continue
        if chi_in[k] > cfg.relocalize_max_chi_inliers:
            continue
        out.append(
            ClosureCandidate(
                query_map=q,
                candidate_map=m,
                estimate=est[k],
                num_inliers=int(n_inl[k]),
                num_correspondences=int(n_cor[k]),
                chi_inliers=float(chi_in[k]),
            )
        )
    return out


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
        # static batch: pad by repeating the first candidate (masked later).
        # Scenes can differ in capacity after host-boundary regrowth
        # (TrackerConfig.auto_grow_scene) — repad to the largest before stacking
        padded = cands + [cands[0]] * (K - len(cands))
        from ..utils import cloud as cloud_lib

        maxcap = max(scenes[m].capacity for m in padded)
        batch_scenes = [
            scenes[m] if scenes[m].capacity == maxcap
            else cloud_lib.repad(scenes[m], maxcap)
            for m in padded
        ]
        fixed_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *batch_scenes)
        # initial guess: query map pose seen from each candidate map
        initials = np.stack([relative_np(poses[m], poses[query]) for m in padded])
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


    def detect_many(
        self,
        queries: list[int],
        scenes: list[Cloud],
        poses: np.ndarray,
        n_maps: int,
        adjacency: list[set[int]],
        pad_to: int = 8,
        capacity: int | None = None,
    ) -> list[ClosureCandidate]:
        """Closure detection for SEVERAL query maps as ONE batched alignment
        program + ONE host sync (the chunked SLAM harvest path). Semantics per
        query match ``detect``; job count is padded to a power-of-two bucket
        (>= ``pad_to``) so chunk-to-chunk job-count jitter does not recompile.

        ``capacity``: align at this point capacity instead of the scenes' full
        storage capacity. The chunked loop passes a bucket sized from its
        host-side count ledger — local-map scenes hold ~600-1100 live points
        in 8192-slot arrays (corridor measurement), and the alignment cost is
        O(capacity), so aligning at storage capacity wastes ~8x. Scenes are
        sliced WITHOUT compaction (chunked materialize emits prefix-packed
        scenes; the ledger bucket over-provisions merged scenes)."""
        cfg = self.cfg
        jobs: list[tuple[int, int]] = []
        for q in queries:
            for m in self.selector.select(q, poses, n_maps, adjacency):
                jobs.append((q, m))
        if not jobs:
            return []
        from ..utils import cloud as cloud_lib

        J = pad_to
        while J < len(jobs):
            J *= 2
        padded = jobs + [jobs[0]] * (J - len(jobs))
        maxcap = capacity or max(
            max(scenes[m].capacity for _, m in padded),
            max(scenes[q].capacity for q, _ in padded),
        )

        def at_cap(c: Cloud) -> Cloud:
            if c.capacity == maxcap:
                return c
            if c.capacity > maxcap:  # prefix slice (see docstring)
                return Cloud(
                    xy=c.xy[:maxcap], normal=c.normal[:maxcap],
                    valid=c.valid[:maxcap],
                )
            return cloud_lib.repad(c, maxcap)

        fixed_batch = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[at_cap(scenes[m]) for _, m in padded]
        )
        moving_batch = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[at_cap(scenes[q]) for q, _ in padded]
        )
        initials = np.stack([relative_np(poses[m], poses[q]) for q, m in padded])
        res = _batch_align_pairs(
            cfg.aligner, self.proj, fixed_batch, moving_batch,
            jnp.asarray(initials),
        )
        closures = []
        n_inl = np.asarray(res.num_inliers)
        n_cor = np.asarray(res.num_correspondences)
        chi_in = np.asarray(res.chi_inliers)
        est = np.asarray(res.estimate)
        for k, (q, m) in enumerate(jobs):
            if n_inl[k] < cfg.relocalize_min_inliers:
                continue
            if n_cor[k] == 0 or n_inl[k] / max(int(n_cor[k]), 1) < cfg.relocalize_min_inliers_ratio:
                continue
            if chi_in[k] > cfg.relocalize_max_chi_inliers:
                continue
            closures.append(
                ClosureCandidate(
                    query_map=q,
                    candidate_map=m,
                    estimate=est[k],
                    num_inliers=int(n_inl[k]),
                    num_correspondences=int(n_cor[k]),
                    chi_inliers=float(chi_in[k]),
                )
            )
        return closures


class ClosureValidator:
    """Vote-based closure acceptance (FactorGraphClosureValidator,
    srrg2_solver utils; parameter surface at config :684-701).

    Reference semantics reproduced here: each voting round, a *partition* is
    grown around every pending closure — all variables within
    ``partition_expansion_range`` BFS hops of either endpoint — and
    overlapping partitions are merged, so closures that touch the same region
    are judged together. Each partition subgraph (its existing graph edges
    plus ALL pending closure edges inside it) is re-optimized with the gauge
    fixed at one variable; a closure whose post-optimization residual chi
    stays below ``inlier_chi`` scores an inlier round (good closures agree
    with the graph and each other; a geometrically wrong closure fights the
    odometry backbone and keeps a large residual). After
    ``min_times_checked`` rounds the inlier-round fraction accepts
    (>= inlier_accept_ratio) or rejects (< inlier_reject_ratio) the closure.

    A round happens every time the SLAM loop calls ``vote`` (once per new
    local map, matching the reference's per-epoch re-checks). Trial closure
    edges enter the partition solve with the closure-edge information
    (``closure_info``) and the vote chi is the factor's own
    information-weighted residual, matching the reference's factor-chi gate:
    a closure across an N-edge backbone retains ~N/(N+1) of its disagreement
    as residual after the partition solve, so a wrong closure keeps a large
    chi while a drift-consistent one relaxes below ``inlier_chi``.
    """

    def __init__(self, cfg: ValidatorConfig, closure_info=(100.0, 100.0, 1000.0)):
        self.cfg = cfg
        self.closure_info = np.asarray(closure_info, np.float32)
        self.pending: list[dict] = []

    def add(self, closure: ClosureCandidate) -> None:
        self.pending.append({"closure": closure, "checks": 0, "votes": 0})

    # ---- partition machinery ------------------------------------------------
    def _expand(self, adjacency: list[set[int]], seeds: list[int]) -> set[int]:
        """BFS region of partition_expansion_range hops around the seeds."""
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        rng = self.cfg.partition_expansion_range
        while q:
            u = q.popleft()
            if dist[u] >= rng:
                continue
            for v in adjacency[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return set(dist)

    def _partitions(self, adjacency: list[set[int]]) -> list[tuple[set[int], list[dict]]]:
        """(variable set, pending entries) per merged partition."""
        regions = []
        for p in self.pending:
            c: ClosureCandidate = p["closure"]
            regions.append((self._expand(adjacency, [c.query_map, c.candidate_map]), [p]))
        merged: list[tuple[set[int], list[dict]]] = []
        for vars_, ps in regions:
            hit = None
            for m in merged:
                if m[0] & vars_:
                    hit = m
                    break
            if hit is None:
                merged.append((set(vars_), list(ps)))
            else:
                hit[0].update(vars_)
                hit[1].extend(ps)
        return merged

    def _check_partition(
        self,
        vars_: set[int],
        entries: list[dict],
        poses: np.ndarray,
        graph_edges: list[tuple[int, int, np.ndarray, np.ndarray]],
    ) -> None:
        """Optimize one partition with its trial closures; score each."""
        from ..solver import pgo

        order = sorted(vars_)
        local = {g: l for l, g in enumerate(order)}
        sub_edges = [
            (local[i], local[j], m, w)
            for (i, j, m, w) in graph_edges
            if i in vars_ and j in vars_
        ]
        closure_rows = []
        for p in entries:
            c: ClosureCandidate = p["closure"]
            closure_rows.append((local[c.candidate_map], local[c.query_map], c.estimate))
        nv = len(order)
        ne = len(sub_edges) + len(closure_rows)
        g = pgo.empty_graph(
            pgo._round_capacity(nv), pgo._round_capacity(max(ne, 1))
        )
        sub_poses = np.zeros((g.var_capacity, 3), np.float32)
        sub_poses[:nv] = poses[order]
        ei = np.zeros(g.edge_capacity, np.int32)
        ej = np.zeros(g.edge_capacity, np.int32)
        meas = np.zeros((g.edge_capacity, 3), np.float32)
        info = np.ones((g.edge_capacity, 3), np.float32)
        valid = np.zeros(g.edge_capacity, bool)
        for k, (i, j, m, w) in enumerate(sub_edges):
            ei[k], ej[k], meas[k], info[k], valid[k] = i, j, m, w, True
        for k, (i, j, m) in enumerate(closure_rows, start=len(sub_edges)):
            ei[k], ej[k], meas[k], valid[k] = i, j, m, True
            info[k] = self.closure_info
        var_valid = np.zeros(g.var_capacity, bool)
        var_valid[:nv] = True
        var_fixed = np.zeros(g.var_capacity, bool)
        var_fixed[0] = True
        g = g._replace(
            poses=jnp.asarray(sub_poses),
            var_valid=jnp.asarray(var_valid),
            var_fixed=jnp.asarray(var_fixed),
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            edge_meas=jnp.asarray(meas),
            edge_info=jnp.asarray(info),
            edge_valid=jnp.asarray(valid),
        )
        # Cauchy at inlier_chi (the reference global solver's robustifier
        # policy, config :76-81): an outlier closure is down-weighted during
        # the partition solve and cannot bend the backbone into agreeing
        # with it, so good and bad closures separate cleanly in chi.
        solved, _, _ = pgo.optimize(
            pgo.PGOConfig(max_iterations=10, chi_threshold=self.cfg.inlier_chi), g
        )
        opt = np.asarray(solved.poses)
        for p, (i, j, m) in zip(entries, closure_rows):
            # host-side residual (e = t2v(Z^-1 ∘ (Xi^-1 ∘ Xj)), the
            # SE2PosePoseGeodesic error of pgo.edge_residual) — a device
            # round-trip PER closure here cost ~24 ms each through the
            # serving tunnel and dominated the chunked vote phase
            e = compose_np(
                np.array([-np.cos(m[2]) * m[0] - np.sin(m[2]) * m[1],
                          np.sin(m[2]) * m[0] - np.cos(m[2]) * m[1],
                          -m[2]], np.float32),
                relative_np(opt[i], opt[j]),
            )
            e[2] = (e[2] + np.pi) % (2 * np.pi) - np.pi  # wrap like geometry.compose
            chi = float(np.sum(e * e * self.closure_info))
            p["checks"] += 1
            if chi < self.cfg.inlier_chi:
                p["votes"] += 1

    def vote(
        self,
        poses: np.ndarray,
        adjacency: list[set[int]] | None = None,
        graph_edges: list[tuple[int, int, np.ndarray]] | None = None,
    ) -> list[ClosureCandidate]:
        """Run one voting round against the current pose estimates; returns
        newly accepted closures (removed from pending). ``graph_edges`` is the
        list of existing (i, j, measurement) graph edges; the partitions are
        grown over ``adjacency``."""
        if not self.cfg.enabled:
            out = [p["closure"] for p in self.pending]
            self.pending.clear()
            return out
        if not self.pending:
            return []
        assert adjacency is not None and graph_edges is not None, (
            "partition-based validation needs the graph adjacency and edges"
        )
        for vars_, entries in self._partitions(adjacency):
            self._check_partition(vars_, entries, poses, graph_edges)
        accepted = []
        still = []
        for p in self.pending:
            c: ClosureCandidate = p["closure"]
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
