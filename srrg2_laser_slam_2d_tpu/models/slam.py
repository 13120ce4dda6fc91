"""Top-level graph SLAM — TPU equivalent of ``MultiGraphSLAM2D``
(srrg2_slam_interfaces; behavior per apps/slam_app.cpp:89-154, config
configurations/stage_segway_double_config_LASER_0.json:340-381 and
SURVEY.md §2.2/§3.1).

Per-message flow (reference compute()):
  track -> split local maps on the distance criterion
        -> detect loop closures (batched candidate alignment)
        -> validate closures (vote) -> add edges -> global pose-graph solve
        -> relocalize onto existing maps
``robotInWorld = local_map_pose ∘ robotInLocalMap``.

Host/device split (SURVEY.md §7 'hard parts'): data-dependent control flow
(splits, closure triggering, relocalization jumps) stays in Python; every
numeric inner loop (tracking step, batched closure alignment, PGO) is a
single jitted device program.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops import icp
from ..solver import pgo
from ..utils import geometry
from ..utils.cloud import Cloud
from . import loop_closure as lc
from . import tracker as tracker_mod

Array = jnp.ndarray


@dataclass(frozen=True)
class GraphSLAMConfig:
    # LocalMapSplittingCriterionDistance2D (config :1-7)
    local_map_distance: float = 1.0
    var_capacity: int = 1024
    edge_capacity: int = 4096
    odom_edge_info: tuple = (100.0, 100.0, 1000.0)
    closure_edge_info: tuple = (100.0, 100.0, 1000.0)
    tracker: tracker_mod.TrackerConfig = field(default_factory=tracker_mod.TrackerConfig)
    detector: lc.LoopDetectorConfig = field(default_factory=lc.LoopDetectorConfig)
    validator: lc.ValidatorConfig = field(default_factory=lc.ValidatorConfig)
    relocalizer: lc.RelocalizerConfig = field(default_factory=lc.RelocalizerConfig)
    global_solver: pgo.PGOConfig = field(default_factory=pgo.PGOConfig)
    # linear-solver strategy for the global solve: "dense" (small graphs,
    # CHOLMOD-role), "cg" (matrix-free PCG, large graphs / CSparse-role),
    # "schur" (partitioned elimination, the distributed design)
    global_solver_kind: str = "dense"
    schur_partitions: int = 8
    enable_loop_closure: bool = True
    enable_relocalizer: bool = True
    # closure-time map fusion — the tracker slice's closure_merger
    # (MergerCorrespondencePointNormal2f, config :55-58, params :656-670)
    enable_closure_merger: bool = True
    closure_merge_max_distance2: float = 0.25
    closure_merge_target: int = 200
    closure_merge_binning: bool = True
    # MULTI config: per-cue sensor extrinsics ((x, y, theta), ...). When set,
    # the tracker runs as MultiCueTracker and ``process`` expects cue-stacked
    # measurements [C, N, ...] (configurations/..._MULTI.json adds the second
    # laser slice; here it is this one field)
    cue_extrinsics: tuple | None = None
    # run tracking through the fused frame kernel (models/fast_tracker.py:
    # one Pallas program per frame, lazy scene materialization at SLAM
    # events). Single-cue only; trajectory-equivalent to the lean path.
    use_fast_tracker: bool = False
    # fast-tracker measurement layout: True = pre-z-buffered [8, B] canvases
    # (one batched XLA projection outside the kernel — the fast mode; scene
    # trajectory-equivalent), False = raw [F, 8] rows z-buffered in-kernel
    # (bit-identical to the lean XLA path — the parity-oracle mode)
    fast_canvas_meas: bool = True


class GraphSLAM2D:
    """Stateful SLAM orchestrator with the reference's setRawData/compute-style
    API surface (here: ``process(measurement, odom)``)."""

    def __init__(self, cfg: GraphSLAMConfig = GraphSLAMConfig(), sensor_in_robot=None):
        self.cfg = cfg
        if cfg.cue_extrinsics is not None:
            self.tracker = tracker_mod.MultiCueTracker(
                cfg.tracker, np.asarray(cfg.cue_extrinsics, np.float32)
            )
        elif cfg.use_fast_tracker:
            from ..ops.pallas_frame import FrameSpec
            from . import fast_tracker as fast_mod

            t = cfg.tracker
            self.tracker = fast_mod.FastTracker(
                FrameSpec(
                    projection=t.projection,
                    scene_capacity=t.scene_capacity,
                    iterations=t.aligner.max_iterations,
                    point_distance=t.aligner.point_distance,
                    normal_cos=t.aligner.normal_cos,
                    chi_threshold=t.aligner.chi_threshold,
                    min_inliers=t.aligner.min_num_inliers,
                    odom_weight=t.aligner.odom_weight,
                    merge_threshold=t.merge_threshold,
                    # pre-z-buffered measurement canvases: one batched XLA
                    # projection outside the kernel instead of the dense
                    # [F, B] in-kernel compare (trajectory-equivalent,
                    # tests/test_fast_tracker.py canvas-layout test)
                    meas_as_canvas=cfg.fast_canvas_meas,
                ),
                sensor_in_robot,
            )
        else:
            self.tracker = tracker_mod.LaserTracker(cfg.tracker, sensor_in_robot)
        self.graph = pgo.empty_graph(cfg.var_capacity, cfg.edge_capacity)
        self.scenes: list[Cloud] = []     # one scene per local map (its frame)
        self.adjacency: list[set[int]] = []
        self.n_maps = 0
        self.n_edges = 0
        self.current_map = -1
        self.detector = lc.BruteForceLoopDetector(cfg.detector, cfg.tracker.projection)
        self.validator = lc.ClosureValidator(cfg.validator, cfg.closure_edge_info)
        self.num_closures = 0
        self.relocalizations = 0

    # ---- graph bookkeeping -------------------------------------------------
    def _grow_graph(self, var_capacity=None, edge_capacity=None) -> None:
        """Host-boundary capacity regrowth of the pose graph (the reference
        resizes dynamically; the static-shape equivalent doubles the arrays
        between steps — pgo.trim keeps compiled solver shapes bounded)."""
        g = self.graph
        vc = var_capacity or g.var_capacity
        ec = edge_capacity or g.edge_capacity

        def pad(x, cap):
            extra = cap - x.shape[0]
            if extra <= 0:
                return x
            widths = ((0, extra),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, widths)

        self.graph = pgo.PoseGraph(
            poses=pad(g.poses, vc),
            var_valid=pad(g.var_valid, vc),
            var_fixed=pad(g.var_fixed, vc),
            edge_i=pad(g.edge_i, ec),
            edge_j=pad(g.edge_j, ec),
            edge_meas=pad(g.edge_meas, ec),
            edge_info=pad(g.edge_info, ec),
            edge_valid=pad(g.edge_valid, ec),
        )

    def _add_variable(self, pose: np.ndarray, fixed: bool = False) -> int:
        idx = self.n_maps
        if idx >= self.graph.var_capacity:
            self._grow_graph(var_capacity=2 * self.graph.var_capacity)
        g = self.graph
        self.graph = g._replace(
            poses=g.poses.at[idx].set(jnp.asarray(pose, jnp.float32)),
            var_valid=g.var_valid.at[idx].set(True),
            var_fixed=g.var_fixed.at[idx].set(bool(fixed)),
        )
        self.adjacency.append(set())
        self.n_maps += 1
        return idx

    def _add_edge(self, i: int, j: int, meas: np.ndarray, info: tuple) -> None:
        e = self.n_edges
        if e >= self.graph.edge_capacity:
            self._grow_graph(edge_capacity=2 * self.graph.edge_capacity)
        g = self.graph
        self.graph = g._replace(
            edge_i=g.edge_i.at[e].set(i),
            edge_j=g.edge_j.at[e].set(j),
            edge_meas=g.edge_meas.at[e].set(jnp.asarray(meas, jnp.float32)),
            edge_info=g.edge_info.at[e].set(jnp.asarray(info, jnp.float32)),
            edge_valid=g.edge_valid.at[e].set(True),
        )
        self.adjacency[i].add(j)
        self.adjacency[j].add(i)
        self.n_edges += 1

    # ---- accessors ---------------------------------------------------------
    @property
    def poses_np(self) -> np.ndarray:
        return np.asarray(self.graph.poses)

    def _edge_list(self) -> list[tuple[int, int, np.ndarray, np.ndarray]]:
        """Live (i, j, measurement, info) edges, for the closure validator's
        partition subgraphs."""
        ei = np.asarray(self.graph.edge_i[: self.n_edges])
        ej = np.asarray(self.graph.edge_j[: self.n_edges])
        meas = np.asarray(self.graph.edge_meas[: self.n_edges])
        info = np.asarray(self.graph.edge_info[: self.n_edges])
        return [
            (int(ei[k]), int(ej[k]), meas[k], info[k]) for k in range(self.n_edges)
        ]

    def robot_in_world(self) -> np.ndarray:
        if self.current_map < 0:
            return np.zeros(3, np.float32)
        lm = self.graph.poses[self.current_map]
        return np.asarray(
            geometry.compose(lm, self.tracker.robot_in_local_map)
        )

    def num_variables(self) -> int:
        return self.n_maps

    def num_factors(self) -> int:
        return self.n_edges

    def scene_of(self, m: int) -> Cloud | None:
        """Scene of local map ``m`` — the live tracker scene for the current
        map (scenes of non-current maps are captured at the event that made
        them non-current)."""
        if m == self.current_map:
            return self.tracker.capture_scene()
        return self.scenes[m]

    # ---- main entry --------------------------------------------------------
    def process(self, measurement: Cloud, odom=None) -> None:
        """One message pack: laser measurement (sensor frame) + optional odometry."""
        if self.current_map < 0:
            self.current_map = self._add_variable(np.zeros(3, np.float32), fixed=True)
            self.scenes.append(None)  # captured lazily (current map = tracker)
            self.tracker.compute(measurement, odom)
            return

        self.tracker.compute(measurement, odom)

        # splitting criterion: new local map after local_map_distance meters
        ril = np.asarray(self.tracker.robot_in_local_map)
        if float(np.linalg.norm(ril[:2])) >= self.cfg.local_map_distance:
            self._split(measurement, odom)

    def _split(self, measurement: Cloud, odom) -> None:
        cfg = self.cfg
        # MultiRelocalizer2D's role is to AVOID creating new nodes
        # (config :340-381 'relocalizer to avoid creation of new nodes'):
        # before splitting, try to re-attach to an existing nearby local map
        if cfg.enable_relocalizer and self._relocalize_at_split():
            return
        prev = self.current_map
        ril = np.asarray(self.tracker.robot_in_local_map)
        new_pose_w = np.asarray(
            geometry.compose(self.graph.poses[prev], jnp.asarray(ril))
        )
        new = self._add_variable(new_pose_w)
        self._add_edge(prev, new, ril, cfg.odom_edge_info)
        self.scenes.append(None)

        # the previous map stops being current: capture its final scene, then
        # re-seed the tracker on the new local map with the current measurement
        self.scenes[prev] = self.tracker.capture_scene()
        self.tracker.reseed(measurement, odom)
        self.scenes[new] = self.tracker.capture_scene()
        self.current_map = new

        if cfg.enable_loop_closure:
            self._loop_closure_round(new)

    def _loop_closure_round(self, query: int) -> None:
        cfg = self.cfg
        closures = self.detector.detect(
            query, self.scenes, self.poses_np, self.n_maps, self.adjacency
        )
        for c in closures:
            self.validator.add(c)
        accepted = self.validator.vote(
            self.poses_np, self.adjacency, self._edge_list()
        )
        if not accepted:
            return
        added = 0
        for c in accepted:
            # one closure edge per map pair: repeated passes over the same
            # area re-detect the same closure every split — don't duplicate
            if c.candidate_map in self.adjacency[c.query_map]:
                continue
            # closure edge: query map pose expressed in candidate map frame
            self._add_edge(
                c.candidate_map, c.query_map, c.estimate, cfg.closure_edge_info
            )
            self.num_closures += 1
            added += 1
            if cfg.enable_closure_merger:
                self._merge_closure_scenes(c)
        if not added:
            return
        self._global_solve()
        if cfg.enable_relocalizer:
            self._try_relocalize()

    def _merge_closure_scenes(self, c: lc.ClosureCandidate) -> None:
        """Fuse the query map's scene into the candidate map's on an accepted
        closure, so re-traversals track against the joint map (the reference's
        closure_merger wiring, config :55-58)."""
        cfg = self.cfg
        fixed = self.scene_of(c.candidate_map)
        moving = self.scene_of(c.query_map)
        if fixed is None or moving is None:
            return
        fused = lc.merge_closure_scenes(
            self.cfg.tracker.projection,
            fixed,
            moving,
            jnp.asarray(c.estimate, jnp.float32),
            point_distance=cfg.detector.aligner.point_distance,
            normal_cos=cfg.detector.aligner.normal_cos,
            max_distance2=cfg.closure_merge_max_distance2,
            target_merges=cfg.closure_merge_target,
            binning=cfg.closure_merge_binning,
        )
        if c.candidate_map == self.current_map:
            self.tracker.set_scene(
                fused, robot_in_local_map=self.tracker.robot_in_local_map
            )
        else:
            self.scenes[c.candidate_map] = fused

    def _global_solve(self) -> None:
        trimmed, _, _ = pgo.trim(self.graph, self.n_maps, self.n_edges)
        kind = self.cfg.global_solver_kind
        if kind == "cg":
            from ..solver import cg as cg_mod

            solved, chi, iters = cg_mod.optimize_cg(
                cg_mod.CGConfig(
                    gn_iterations=self.cfg.global_solver.max_iterations,
                    epsilon=self.cfg.global_solver.epsilon,
                    chi_threshold=self.cfg.global_solver.chi_threshold,
                ),
                trimmed,
            )
        elif kind == "schur":
            from ..solver import schur as schur_mod

            n_parts = min(self.cfg.schur_partitions, max(self.n_maps // 2, 1))
            part = schur_mod.partition_graph(
                trimmed, n_parts, n_vars=self.n_maps, n_edges=self.n_edges
            )
            solved, chi, iters = schur_mod.optimize_schur(
                self.cfg.global_solver, trimmed, part
            )
        else:
            solved, chi, iters = pgo.optimize(self.cfg.global_solver, trimmed)
        self.graph = pgo.untrim_poses(self.graph, solved)

    def _relocalize_at_split(self) -> bool:
        """Try to continue tracking on an existing map instead of splitting:
        nearest old map within the jump radius, verified by an alignment that
        must pass the relocalizer gates (config :577-596)."""
        import jax

        rcfg = self.cfg.relocalizer
        poses = self.poses_np
        cur_w = self.robot_in_world()
        # candidate search radius is the reference's max_translation
        # (config :577-596: 3 m); jumps that would immediately re-split are
        # rejected AFTER the verified alignment (below), so a stale graph
        # pose does not hide a legitimate nearby map
        radius = rcfg.max_translation
        cands = []
        for m in range(self.n_maps):
            if m == self.current_map or self.scenes[m] is None:
                continue
            d = float(np.linalg.norm(poses[m, :2] - cur_w[:2]))
            if d <= radius:
                cands.append((d, m))
        if not cands:
            return False
        cands.sort()
        best = cands[0][1]
        # verify: align the current tracker scene against the candidate map.
        # pose of the CURRENT LOCAL MAP frame in the candidate frame: the
        # tracker scene lives in the current map frame
        lm_in_best = np.asarray(
            geometry.relative(
                jnp.asarray(poses[best]), jnp.asarray(poses[self.current_map])
            )
        )
        fixed_batch = jax.tree.map(
            lambda x: x[None], self.scenes[best]
        )
        cur_scene = self.tracker.capture_scene()
        res = lc._batch_align(
            self.detector.cfg.aligner,
            self.detector.proj,
            fixed_batch,
            cur_scene,
            jnp.asarray(lm_in_best[None]),
        )
        n_inl = int(res.num_inliers[0])
        n_cor = max(int(res.num_correspondences[0]), 1)
        chi_inl = float(res.chi_inliers[0])
        if (
            n_inl < rcfg.relocalize_min_inliers
            or n_inl / n_cor < rcfg.relocalize_min_inliers_ratio
            or chi_inl > rcfg.relocalize_max_chi_inliers
        ):
            return False
        # jump: express the robot in the candidate map via the verified
        # alignment (current-map frame -> candidate frame)
        lm_in_best_ref = np.asarray(res.estimate[0])
        ril = np.asarray(
            geometry.compose(
                jnp.asarray(lm_in_best_ref), self.tracker.robot_in_local_map
            )
        )
        if float(np.linalg.norm(ril[:2])) >= self.cfg.local_map_distance:
            return False  # would re-split immediately; not a useful jump
        self.scenes[self.current_map] = cur_scene
        self.tracker.set_scene(self.scenes[best], robot_in_local_map=ril)
        self.current_map = best
        self.relocalizations += 1
        return True

    def _try_relocalize(self) -> None:
        """MultiRelocalizer2D: if an accepted closure landed the current map
        next to an older map, continue tracking on the older map instead of
        growing the graph (config :577-596)."""
        rcfg = self.cfg.relocalizer
        poses = self.poses_np
        cur_w = self.robot_in_world()
        best, best_d = -1, rcfg.max_translation
        for m in range(self.n_maps):
            if m == self.current_map:
                continue
            d = float(np.linalg.norm(poses[m, :2] - cur_w[:2]))
            if d < best_d and m in self.adjacency[self.current_map]:
                best, best_d = m, d
        if best < 0:
            return
        # jump: express the robot in the chosen map and continue there
        ril = np.asarray(
            geometry.relative(jnp.asarray(poses[best]), jnp.asarray(cur_w))
        )
        self.scenes[self.current_map] = self.tracker.capture_scene()
        self.tracker.set_scene(self.scenes[best], robot_in_local_map=ril)
        self.current_map = best
        self.relocalizations += 1
