"""Chunk-batched SLAM — the round-5 device-speed product loop.

The round-4 finding (BENCH_NOTES.md): through the axon tunnel every
device->host sync costs ~24 ms, so the per-message loop of
``GraphSLAM2D.process`` (one `np.asarray(robot_in_local_map)` per frame,
models/slam.py:232) capped the END-TO-END pipeline at ~2.2 Hz while the
tracking kernel itself does >100k scans/s. This module restructures the
product loop the way the benchmarks already consume the kernel: frames are
dispatched in CHUNKS through the grid-iterated fused frame kernel
(ops/pallas_frame.track_frames_grid) with the local-map splitting criterion
evaluated IN-KERNEL (FrameSpec.split_distance — the kernel reseeds itself at
a split and flags it in the stats row), and the host syncs ONCE per chunk to
harvest the per-frame pose trace + split flags, from which it reconstructs
the pose graph, materializes per-local-map scenes in one batched pass, runs
loop-closure detection for every map born in the chunk as one batched
alignment, votes, solves, and relocalizes — all at the chunk boundary.

Reference contract covered (same surface as models/slam.py, per
apps/slam_app.cpp:89-154 and SURVEY.md §2.2/§3.1):
  track -> split (LocalMapSplittingCriterionDistance2D; in-kernel here)
        -> detect (MultiLoopDetectorBruteForce2D; batched multi-query here)
        -> validate (FactorGraphClosureValidator; one voting round per chunk)
        -> merge accepted closures -> global solve -> relocalize.

Semantic deltas vs the per-frame loop (both flag-gated, verified by the
corridor acceptance gate):
  * split-time relocalization (models/slam.py:241) is deferred to the chunk
    boundary — revisits inside one chunk create local maps that the
    post-closure relocalizer and closure merger then reconcile;
  * the validator runs one voting round per chunk instead of one per split —
    configs tuned for chunked mode should scale ``min_times_checked``
    accordingly (one round still re-checks against evolving poses).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_frame import FrameSpec, track_frames_grid
from ..utils.cloud import Cloud
from . import fast_tracker as fast_mod
from .loop_closure import compose_np, relative_np
from .slam import GraphSLAM2D, GraphSLAMConfig

Array = jax.Array


def _bucket(n: int, lo: int = 8) -> int:
    """Smallest power-of-two >= n (>= lo) — shape buckets keep the number of
    distinct compiled programs bounded as chunk contents vary."""
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("spec",))
def _materialize_prefix(spec: FrameSpec, scene: Cloud, payloads: Array,
                        n_valid: Array, final_count: Array) -> Cloud:
    """Materialize the first ``n_valid`` (dynamic) frames of a bucket-padded
    payload slice onto ``scene`` (frames >= n_valid are neutralized)."""
    T = payloads.shape[0]
    t = jnp.arange(T)[:, None, None]
    payloads = jnp.where(t < n_valid, payloads, 0.0)
    return fast_mod.materialize(spec, scene, payloads, final_count)


@functools.partial(
    jax.jit,
    static_argnames=("proj", "point_distance", "normal_cos", "max_distance2",
                     "target_merges", "binning"),
)
def _merge_closure_batch(proj, fixed: Cloud, moving: Cloud, estimates: Array,
                         point_distance: float, normal_cos: float,
                         max_distance2: float, target_merges: int,
                         binning: bool) -> Cloud:
    """Vmapped closure-time map fusion: J (candidate, query) scene pairs
    fused in ONE program (the chunked loop merges every accepted closure of
    a chunk at once — sequentially dispatched per-closure merges dominated
    the chunk wall clock at ~10 ms x hundreds of closures)."""
    from .loop_closure import merge_closure_scenes

    def one(f, m, e):
        return merge_closure_scenes(
            proj, f, m, e,
            point_distance=point_distance, normal_cos=normal_cos,
            max_distance2=max_distance2, target_merges=target_merges,
            binning=binning,
        )

    return jax.vmap(one)(fixed, moving, estimates)


@functools.partial(jax.jit, static_argnames=("spec",))
def _materialize_gathered(spec: FrameSpec, payloads: Array, idx: Array,
                          mask: Array, counts: Array) -> Cloud:
    """Batched fresh-scene materialization. ``idx`` [S, L] indexes payload
    frames per segment, ``mask`` [S, L] marks real frames (False rows are
    neutralized), ``counts`` [S] are the per-segment final scene counts."""
    seg = payloads[idx]                                  # [S, L, 8, B]
    seg = jnp.where(mask[:, :, None, None], seg, 0.0)
    cap = spec.scene_capacity
    empty = Cloud(
        xy=jnp.zeros((cap, 2), jnp.float32),
        normal=jnp.zeros((cap, 2), jnp.float32),
        valid=jnp.zeros((cap,), bool),
    )
    return jax.vmap(
        lambda p, c: fast_mod.materialize(spec, empty, p, c)
    )(seg, counts)


class ChunkedGraphSLAM2D(GraphSLAM2D):
    """GraphSLAM2D with the chunk-batched processing loop. Construct with a
    single-cue config; ``use_fast_tracker`` is forced on and the kernel runs
    with in-kernel splitting at ``cfg.local_map_distance``."""

    def __init__(self, cfg: GraphSLAMConfig = GraphSLAMConfig(),
                 sensor_in_robot=None, chunk: int = 256):
        if cfg.cue_extrinsics is not None:
            raise ValueError("chunked loop is single-cue; use GraphSLAM2D")
        cfg = dataclasses.replace(cfg, use_fast_tracker=True,
                                  fast_canvas_meas=True)
        super().__init__(cfg, sensor_in_robot)
        self.chunk = chunk
        # in-kernel splitting (ops/pallas_frame.py FrameSpec.split_distance)
        self.tracker.spec = dataclasses.replace(
            self.tracker.spec, split_distance=cfg.local_map_distance
        )
        # the pose graph lives ON THE HOST in chunked mode: variables and
        # edges are numpy bookkeeping (hundreds of tiny per-edge device
        # updates per chunk would each pay dispatch overhead through the
        # tunnel); a device graph is built only at solve time, in one shot
        self._poses_host = np.zeros((0, 3), np.float32)
        self._fixed_host: list[bool] = []
        self._edges_host: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self._X_host = np.zeros(3, np.float32)
        self.world_trajectory: list[np.ndarray] = []
        # per-map live-point-count ledger (host): sizes the detection
        # alignment capacity (detect_many capacity bucket) without syncing
        self._scene_counts: dict[int, int] = {}
        # device-side scene POOL: every local map's scene as rows of ONE
        # stacked [M, cap, ...] array. Per-scene python Clouds cost O(maps)
        # tiny device ops per chunk to slice/stack for detection (measured:
        # the dominant chunk cost through the tunnel); the pool instead takes
        # one batched write per harvest and one gather per detection batch
        self._pool: Cloud | None = None
        # fixed detection batch width: alignment runs in ceil(jobs/J)
        # batches of exactly J pairs -> one compiled program per scene
        # capacity bucket instead of one per job-count bucket
        self.detect_batch = 128
        # per-phase wall seconds (tracing surface, utils/profiling.py role).
        # Phases end at natural host syncs; with SRRG2_PHASE_SYNC=1 every
        # phase blocks on its dispatches so the attribution is exact
        # (profiling mode — adds one ~24 ms tunnel sync per phase per chunk)
        import os

        self.phase_times: dict[str, float] = {}
        self._phase_sync = os.environ.get("SRRG2_PHASE_SYNC", "") not in ("", "0")

    # ---- scene pool ---------------------------------------------------------
    def _pool_ensure(self, n: int) -> None:
        cap = self.tracker.spec.scene_capacity
        if self._pool is None:
            m = max(64, _bucket(n))
            self._pool = Cloud(
                xy=jnp.zeros((m, cap, 2), jnp.float32),
                normal=jnp.zeros((m, cap, 2), jnp.float32),
                valid=jnp.zeros((m, cap), bool),
            )
        elif self._pool.xy.shape[0] < n:
            m = _bucket(n)
            grow = m - self._pool.xy.shape[0]
            self._pool = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((grow,) + x.shape[1:], x.dtype)]
                ),
                self._pool,
            )

    def _pool_write_many(self, ids: list[int], scenes_k: Cloud) -> None:
        """One batched write: scenes_k [S, cap, ...] rows -> pool[ids]."""
        self._pool_ensure(self.n_maps)
        idx = jnp.asarray(np.asarray(ids, np.int32))
        self._pool = Cloud(
            xy=self._pool.xy.at[idx].set(scenes_k.xy),
            normal=self._pool.normal.at[idx].set(scenes_k.normal),
            valid=self._pool.valid.at[idx].set(scenes_k.valid),
        )

    def _pool_write_one(self, m: int, scene: Cloud) -> None:
        self._pool_ensure(self.n_maps)
        self._pool = Cloud(
            xy=self._pool.xy.at[m].set(scene.xy),
            normal=self._pool.normal.at[m].set(scene.normal),
            valid=self._pool.valid.at[m].set(scene.valid),
        )

    def _pool_view(self, m: int) -> Cloud:
        return jax.tree.map(lambda x: x[m], self._pool)

    def scene_of(self, m: int):
        if m == self.current_map:
            return self.tracker.capture_scene()
        if self._pool is None or m >= self.n_maps:
            return None
        return self._pool_view(m)

    def _phase(self, name: str, t0: float, block=None) -> float:
        import time as _t

        if self._phase_sync and block is not None:
            jax.block_until_ready(block)
        t1 = _t.perf_counter()
        self.phase_times[name] = self.phase_times.get(name, 0.0) + (t1 - t0)
        return t1

    # ---- host-side graph bookkeeping ---------------------------------------
    def _add_variable(self, pose: np.ndarray, fixed: bool = False) -> int:
        idx = self.n_maps
        self._poses_host = np.concatenate(
            [self._poses_host, np.asarray(pose, np.float32)[None]]
        )
        self._fixed_host.append(bool(fixed))
        self.adjacency.append(set())
        self.n_maps += 1
        return idx

    def _add_edge(self, i: int, j: int, meas, info) -> None:
        self._edges_host.append(
            (i, j, np.asarray(meas, np.float32), np.asarray(info, np.float32))
        )
        self.adjacency[i].add(j)
        self.adjacency[j].add(i)
        self.n_edges += 1

    def _edge_list(self):
        return list(self._edges_host)

    @property
    def poses_np(self) -> np.ndarray:
        if getattr(self, "_pending_poses", None) is not None:
            dev_poses, nm = self._pending_poses
            self._pending_poses = None
            self._poses_host = np.asarray(dev_poses)[:nm]
        return self._poses_host

    def robot_in_world(self) -> np.ndarray:
        if self.current_map < 0:
            return np.zeros(3, np.float32)
        return compose_np(self._poses_host[self.current_map], self._X_host)

    def _device_graph(self):
        """Build the solve-time device graph from the host bookkeeping
        (power-of-two capacity buckets keep compiled solver shapes bounded,
        the pgo.trim convention)."""
        from ..solver import pgo

        nv, ne = self.n_maps, self.n_edges
        vc, ec = pgo._round_capacity(nv), pgo._round_capacity(max(ne, 1))
        poses = np.zeros((vc, 3), np.float32)
        poses[:nv] = self._poses_host
        var_valid = np.zeros(vc, bool)
        var_valid[:nv] = True
        var_fixed = np.zeros(vc, bool)
        var_fixed[:nv] = self._fixed_host
        ei = np.zeros(ec, np.int32)
        ej = np.zeros(ec, np.int32)
        meas = np.zeros((ec, 3), np.float32)
        info = np.ones((ec, 3), np.float32)
        evalid = np.zeros(ec, bool)
        for k, (i, j, m, w) in enumerate(self._edges_host):
            ei[k], ej[k], meas[k], info[k], evalid[k] = i, j, m, w, True
        return pgo.PoseGraph(
            poses=jnp.asarray(poses),
            var_valid=jnp.asarray(var_valid),
            var_fixed=jnp.asarray(var_fixed),
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            edge_meas=jnp.asarray(meas),
            edge_info=jnp.asarray(info),
            edge_valid=jnp.asarray(evalid),
        )

    def _global_solve(self) -> None:
        """Global pose-graph solve on the host-built device graph; solved
        poses land back in the host mirror (models/slam.py:321-347 solver
        routing)."""
        from ..solver import pgo

        g = self._device_graph()
        kind = self.cfg.global_solver_kind
        if kind == "cg":
            from ..solver import cg as cg_mod

            solved, chi, iters = cg_mod.optimize_cg(
                cg_mod.CGConfig(
                    gn_iterations=self.cfg.global_solver.max_iterations,
                    epsilon=self.cfg.global_solver.epsilon,
                    chi_threshold=self.cfg.global_solver.chi_threshold,
                ),
                g,
            )
        elif kind == "schur":
            from ..solver import schur as schur_mod

            n_parts = min(self.cfg.schur_partitions, max(self.n_maps // 2, 1))
            part = schur_mod.partition_graph(
                g, n_parts, n_vars=self.n_maps, n_edges=self.n_edges
            )
            solved, chi, iters = schur_mod.optimize_schur(
                self.cfg.global_solver, g, part
            )
        else:
            solved, chi, iters = pgo.optimize(self.cfg.global_solver, g)
        if self.cfg.enable_relocalizer:
            # relocalization reads poses right after the solve
            self._poses_host = np.asarray(solved.poses)[: self.n_maps]
        else:
            # defer the device->host pose fetch to the NEXT chunk's harvest
            # sync (saves the ~24 ms completion poll per solve and lets the
            # solve overlap the next chunk's dispatches)
            self._pending_poses = (solved.poses, self.n_maps)

    # ---- main entry ---------------------------------------------------------
    def process(self, measurement, odom=None) -> None:  # pragma: no cover
        raise NotImplementedError(
            "ChunkedGraphSLAM2D consumes whole chunks; use process_chunk"
        )

    def process_chunk(self, clouds: Cloud, odoms: np.ndarray | None = None,
                      n_frames: int | None = None) -> np.ndarray:
        """Process a [T, ...] Cloud stack (+ [T, 3] odometry). ``n_frames``
        <= T marks trailing frames as padding (final partial chunk). Returns
        the [n_frames, 3] world-frame trajectory of this chunk."""
        import time as _t

        t0 = _t.perf_counter()
        spec = self.tracker.spec
        T = clouds.xy.shape[0]
        n = T if n_frames is None else n_frames
        odom_valid = None
        if odoms is not None:
            odoms = np.asarray(odoms, np.float32)
            odom_valid = (np.arange(T) < n).astype(np.float32)

        first = self.current_map < 0
        if first:
            # frame 0 seeds local map 0 (models/slam.py process():222-227)
            self.current_map = self._add_variable(
                np.zeros(3, np.float32), fixed=True
            )
            self.scenes.append(None)
            self.tracker.state = fast_mod.seed(
                spec, jax.tree.map(lambda x: x[0], clouds),
                jnp.asarray(self.tracker.sensor_in_robot),
                odom=None if odoms is None else odoms[0],
            )
            self.world_trajectory.append(np.zeros(3, np.float32))

        # canvas pack: one batched XLA projection for the whole chunk. The
        # first chunk drops frame 0 (it seeded) and pads the tail by one dead
        # frame so the grid program keeps a single static T.
        if first:
            clouds_g = jax.tree.map(
                lambda x: jnp.concatenate([x[1:], jnp.zeros_like(x[:1])]), clouds
            )
            odoms_g = None if odoms is None else np.concatenate(
                [odoms[1:], odoms[-1:]]
            )
            ov_g = None if odoms is None else np.concatenate(
                [odom_valid[1:], np.zeros(1, np.float32)]
            )
            n_g = n - 1
        else:
            clouds_g, odoms_g, ov_g, n_g = clouds, odoms, odom_valid, n
        measC = fast_mod.pack_measurement_canvas_batch(
            spec, clouds_g,
            None if odoms_g is None else jnp.asarray(odoms_g),
            None if ov_g is None else jnp.asarray(ov_g),
        )
        st = self.tracker.state
        cacheT, pose, payloads = track_frames_grid(
            spec, st.cacheT, st.pose, measC,
            interpret=self.tracker._interpret,
        )
        self.tracker.state = st._replace(cacheT=cacheT, pose=pose)

        # ---- THE chunk sync: [T, 12] stats (poses, split flags, counts) ----
        stats = np.asarray(payloads[:, 6, :12])
        if getattr(self, "_pending_poses", None) is not None:
            dev_poses, nm = self._pending_poses
            self._pending_poses = None
            self._poses_host = np.asarray(dev_poses)[:nm]  # complete by now
        t0 = self._phase("track", t0)
        if n_g <= 0:
            return np.zeros((0, 3), np.float32)
        stats = stats[:n_g]
        split_f = stats[:, 7] > 0.5
        X = stats[:, 8:11]
        counts = stats[:, 11]
        split_idx = np.where(split_f)[0]

        # ---- graph reconstruction + trajectory (host math only) ------------
        cfg = self.cfg
        entry_map = self.current_map
        traj_map = np.empty(n_g, np.int64)
        seg_bounds: list[tuple[int, int, int]] = []  # (map, start, end) payloads
        cur = entry_map
        start = 0   # payload-segment start (split frame seeds the NEW map)
        tstart = 0  # trajectory start (split frame's X is in the OLD map)
        new_maps: list[int] = []
        for s in split_idx:
            traj_map[tstart: s + 1] = cur
            ril = X[s]
            new_pose_w = compose_np(self._poses_host[cur], ril)
            seg_bounds.append((cur, start, int(s)))
            new = self._add_variable(new_pose_w)
            self._add_edge(cur, new, ril, cfg.odom_edge_info)
            self.scenes.append(None)
            new_maps.append(new)
            cur = new
            start = int(s)
            tstart = int(s) + 1
        traj_map[tstart:] = cur
        seg_bounds.append((cur, start, n_g))  # the open segment
        self.current_map = cur
        self._X_host = X[-1].copy() if not split_f[-1] else np.zeros(3, np.float32)

        P = self._poses_host[traj_map]
        c_, s_ = np.cos(P[:, 2]), np.sin(P[:, 2])
        world = np.stack(
            [
                P[:, 0] + c_ * X[:, 0] - s_ * X[:, 1],
                P[:, 1] + s_ * X[:, 0] + c_ * X[:, 1],
                P[:, 2] + X[:, 2],
            ],
            axis=1,
        ).astype(np.float32)
        self.world_trajectory.extend(world)

        # ---- scene materialization (batched) -------------------------------
        # first segment continues the entering map's scene
        m0, a0, b0 = seg_bounds[0]
        base_scene = self.tracker.state.scene
        if b0 > a0:
            Lp = min(_bucket(b0), int(payloads.shape[0]))
            scene0 = _materialize_prefix(
                spec, base_scene, payloads[:Lp], jnp.int32(b0),
                jnp.float32(counts[b0 - 1]),
            )
        else:
            scene0 = base_scene
        if b0 > a0:
            self._scene_counts[m0] = int(counts[b0 - 1])
        fresh = seg_bounds[1:]
        for m, _, e in fresh:
            self._scene_counts[m] = int(counts[e - 1])
        self._pool_write_one(m0, scene0)
        if fresh:
            # segment-count padding at 64-granularity above 64: pow2 buckets
            # waste up to 2x of the sort-bound materialize (146 segments
            # would pad to 256); multiples of 64 bound the compile variants
            # at chunk/64 while keeping padding <= 30%
            S_pad = (
                _bucket(len(fresh)) if len(fresh) <= 64
                else -(-len(fresh) // 64) * 64
            )
            L_pad = _bucket(max(e - s for _, s, e in fresh))
            idx = np.zeros((S_pad, L_pad), np.int32)
            mask = np.zeros((S_pad, L_pad), bool)
            cnts = np.zeros(S_pad, np.float32)
            pool_ids = np.full(S_pad, np.iinfo(np.int32).max, np.int64)
            for k, (m, s, e) in enumerate(fresh):
                ln = e - s
                idx[k, :ln] = np.arange(s, e)
                mask[k, :ln] = True
                cnts[k] = counts[e - 1]
                pool_ids[k] = m
            scenes_k = _materialize_gathered(
                spec, payloads, jnp.asarray(idx), jnp.asarray(mask),
                jnp.asarray(cnts),
            )
            # one batched pool write (padding rows drop as out-of-bounds)
            self._pool_ensure(self.n_maps)
            pid = jnp.asarray(pool_ids)
            self._pool = Cloud(
                xy=self._pool.xy.at[pid].set(scenes_k.xy, mode="drop"),
                normal=self._pool.normal.at[pid].set(scenes_k.normal, mode="drop"),
                valid=self._pool.valid.at[pid].set(scenes_k.valid, mode="drop"),
            )
            last_scene = jax.tree.map(lambda x: x[len(fresh) - 1], scenes_k)
            self.tracker.state = self.tracker.state._replace(scene=last_scene)
        else:
            # no splits: the open segment IS the first segment
            self.tracker.state = self.tracker.state._replace(scene=scene0)
        t0 = self._phase("materialize", t0, self.tracker.state.scene.xy)

        # ---- loop closures / solve / relocalize at the chunk boundary ------
        if cfg.enable_loop_closure and new_maps:
            self._chunk_closure_round(new_maps)
        return world

    def _detect_pool(self, queries: list[int]) -> list:
        """Loop-closure detection over the scene pool: candidate selection on
        host mirrors, then alignment in fixed-width batches of
        ``detect_batch`` gathered straight from the pool (one gather + one
        program per batch; ONE host sync for all batches)."""
        from . import loop_closure as lc

        dcfg = self.detector.cfg
        poses = self._poses_host
        jobs = self.detector.selector.select_many(
            queries, poses, self.n_maps, self.adjacency
        )
        if not jobs:
            return []
        cap = self.tracker.spec.scene_capacity
        det_cap = min(
            _bucket(
                max(self._scene_counts.get(m, cap) for m in range(self.n_maps)),
                lo=1024,
            ),
            cap,
        )
        if dcfg.detection_capacity:
            det_cap = min(det_cap, dcfg.detection_capacity)
        JB = self.detect_batch
        results = []
        acfg = dcfg.aligner
        for i in range(0, len(jobs), JB):
            batch = jobs[i: i + JB]
            batch = batch + [batch[0]] * (JB - len(batch))
            fi = jnp.asarray(np.array([m for _, m in batch], np.int32))
            qi = jnp.asarray(np.array([q for q, _ in batch], np.int32))
            fixed = Cloud(
                xy=self._pool.xy[fi, :det_cap],
                normal=self._pool.normal[fi, :det_cap],
                valid=self._pool.valid[fi, :det_cap],
            )
            moving = Cloud(
                xy=self._pool.xy[qi, :det_cap],
                normal=self._pool.normal[qi, :det_cap],
                valid=self._pool.valid[qi, :det_cap],
            )
            initials = np.stack(
                [lc.relative_np(poses[m], poses[q]) for q, m in batch]
            )
            if dcfg.backend == "fused_nn":
                from ..ops import pallas_icp

                results.append(
                    pallas_icp.fused_align_pairs(
                        fixed, moving, jnp.asarray(initials),
                        iterations=acfg.max_iterations,
                        max_distance=acfg.point_distance,
                        normal_cos=acfg.normal_cos,
                        chi_threshold=acfg.chi_threshold,
                        min_inliers=acfg.min_num_inliers,
                        interpret=self.tracker._interpret,
                        corr_refresh=dcfg.fused_corr_refresh,
                    )
                )
            else:
                results.append(
                    lc._batch_align_pairs(
                        acfg, self.detector.proj, fixed, moving,
                        jnp.asarray(initials),
                    )
                )
        # ONE packed device->host fetch for all batches (each separate
        # np.asarray pays the ~24 ms tunnel completion poll)
        packed = np.asarray(jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        r.num_inliers[:, None].astype(jnp.float32),
                        r.num_correspondences[:, None].astype(jnp.float32),
                        r.chi_inliers[:, None].astype(jnp.float32),
                        r.estimate,
                    ],
                    axis=1,
                )
                for r in results
            ]
        ))
        return lc.gate_candidates(
            dcfg, jobs, packed[:, 0], packed[:, 1], packed[:, 2], packed[:, 3:6]
        )

    def _chunk_closure_round(self, new_maps: list[int]) -> None:
        import time as _t

        t0 = _t.perf_counter()
        cfg = self.cfg
        closures = self._detect_pool(new_maps)
        for c in closures:
            self.validator.add(c)
        t0 = self._phase("detect", t0)
        accepted = self.validator.vote(
            self._poses_host, self.adjacency, self._edge_list()
        )
        t0 = self._phase("vote", t0)
        added = 0
        to_merge = []
        for c in accepted:
            if c.candidate_map in self.adjacency[c.query_map]:
                continue
            self._add_edge(
                c.candidate_map, c.query_map, c.estimate, cfg.closure_edge_info
            )
            self.num_closures += 1
            added += 1
            to_merge.append(c)
        if cfg.enable_closure_merger and to_merge:
            self._merge_closures_batched(to_merge)
        t0 = self._phase("merge", t0,
                         self._pool.xy if added else None)
        if not added:
            return
        self._global_solve()
        t0 = self._phase("solve", t0)
        if cfg.enable_relocalizer:
            self._try_relocalize_host()
            self._phase("relocalize", t0)

    def _merge_closures_batched(self, closures: list) -> None:
        """Closure-time map fusion (models/slam.py:294-319) against the scene
        pool, batched: all accepted closures of a chunk fuse in one program
        per round (rounds separate closures sharing a candidate map, so
        sequential-merge semantics hold). Fused scenes write back to the
        pool in one batched write."""
        cfg = self.cfg
        cap = self.tracker.spec.scene_capacity
        remaining = list(closures)
        while remaining:
            seen: set[int] = set()
            group, later = [], []
            for c in remaining:
                if c.candidate_map in seen:
                    later.append(c)
                else:
                    seen.add(c.candidate_map)
                    group.append(c)
            remaining = later
            J = _bucket(len(group))
            padded = group + [group[0]] * (J - len(group))
            ci = jnp.asarray(
                np.array([c.candidate_map for c in padded], np.int32))
            qi = jnp.asarray(
                np.array([c.query_map for c in padded], np.int32))
            est = jnp.asarray(
                np.stack([c.estimate for c in padded]).astype(np.float32))
            fused = _merge_closure_batch(
                cfg.tracker.projection,
                jax.tree.map(lambda x: x[ci], self._pool),
                jax.tree.map(lambda x: x[qi], self._pool),
                est,
                point_distance=cfg.detector.aligner.point_distance,
                normal_cos=cfg.detector.aligner.normal_cos,
                max_distance2=cfg.closure_merge_max_distance2,
                target_merges=cfg.closure_merge_target,
                binning=cfg.closure_merge_binning,
            )
            # batched write-back (pad rows collapse onto group[0]'s id, whose
            # row 0 carries the real fusion — identical values, safe)
            ids = np.full(J, np.iinfo(np.int32).max, np.int64)
            ids[: len(group)] = [c.candidate_map for c in group]
            pid = jnp.asarray(ids)
            self._pool = Cloud(
                xy=self._pool.xy.at[pid].set(fused.xy, mode="drop"),
                normal=self._pool.normal.at[pid].set(fused.normal, mode="drop"),
                valid=self._pool.valid.at[pid].set(fused.valid, mode="drop"),
            )
            for c in group:
                if c.candidate_map == self.current_map:
                    self.tracker.set_scene(
                        self._pool_view(c.candidate_map),
                        robot_in_local_map=self.tracker.robot_in_local_map,
                    )
                # ledger upper bound: a merge appends at most
                # closure_merge_target unclaimed query points
                fx = self._scene_counts.get(c.candidate_map, cap)
                self._scene_counts[c.candidate_map] = min(
                    cap, fx + cfg.closure_merge_target
                )

    def _try_relocalize_host(self) -> None:
        """Post-closure relocalization at the chunk boundary (the
        MultiRelocalizer2D role, models/slam.py:418-441) on host mirrors."""
        rcfg = self.cfg.relocalizer
        cur_w = self.robot_in_world()
        best, best_d = -1, rcfg.max_translation
        for m in range(self.n_maps):
            if m == self.current_map:
                continue
            d = float(np.linalg.norm(self._poses_host[m, :2] - cur_w[:2]))
            if d < best_d and m in self.adjacency[self.current_map]:
                best, best_d = m, d
        if best < 0:
            return
        ril = relative_np(self._poses_host[best], cur_w)
        self._pool_write_one(self.current_map, self.tracker.capture_scene())
        self.tracker.set_scene(self._pool_view(best), robot_in_local_map=ril)
        self.current_map = best
        self._X_host = ril
        self.relocalizations += 1


class ChunkedSlamRunner:
    """Message-driven wrapper with the SlamRunner surface (put_message / run /
    trajectory / timing_summary / draw) over the chunk-batched loop. Laser
    frames buffer on the host; every ``chunk`` frames one batched dispatch
    processes them (models/runner.py is the per-message reference loop)."""

    def __init__(self, slam_config: GraphSLAMConfig | None = None,
                 preprocessor_config=None, chunk: int = 256,
                 scan_topic: str | None = None, odom_topic: str = "/odom",
                 sensor_in_robot=None):
        from .preprocessor import PreprocessorConfig, ScanPreprocessor

        self.slam_config = slam_config or GraphSLAMConfig()
        self.preprocessor = ScanPreprocessor(
            preprocessor_config or PreprocessorConfig()
        )
        self.chunk = chunk
        self.scan_topic = scan_topic
        self.odom_topic = odom_topic
        self.sensor_in_robot = sensor_in_robot
        self.slam: ChunkedGraphSLAM2D | None = None
        self.trajectory: list = []        # (timestamp, pose, duration)
        self._ranges: list[np.ndarray] = []
        self._stamps: list[float] = []
        self._odoms: list[np.ndarray | None] = []
        self._last_odom: np.ndarray | None = None
        self._chunk_times: list[tuple[int, float]] = []

    def _ensure_slam(self) -> ChunkedGraphSLAM2D:
        if self.slam is None:
            self.slam = ChunkedGraphSLAM2D(
                self.slam_config, sensor_in_robot=self.sensor_in_robot,
                chunk=self.chunk,
            )
        return self.slam

    def put_message(self, msg) -> bool:
        """Feed one message. Returns True if a laser frame was BUFFERED
        (processing happens on chunk boundaries / finish())."""
        from ..io.messages import LaserMessage, OdometryMessage, extract_message
        from .preprocessor import LaserModel

        odom = extract_message(msg, OdometryMessage, self.odom_topic)
        if odom is not None:
            self._last_odom = np.asarray(odom.pose, np.float32)
        laser = extract_message(msg, LaserMessage, self.scan_topic)
        if laser is None:
            return False
        self.preprocessor.set_model(
            LaserModel(
                num_beams=len(laser.ranges),
                angle_min=laser.angle_min,
                angle_max=laser.angle_max,
                range_min=laser.range_min,
                range_max=laser.range_max,
            )
        )
        self._ranges.append(np.asarray(laser.ranges, np.float32))
        self._stamps.append(float(laser.timestamp))
        self._odoms.append(self._last_odom)
        if len(self._ranges) >= self.chunk:
            self._flush(self.chunk)
        return True

    def _flush(self, n_pad: int) -> None:
        """Process the buffered frames as one chunk (padded to ``n_pad``)."""
        import time as _time

        from ..bench import pipeline

        n = len(self._ranges)
        if n == 0:
            return
        t0 = _time.perf_counter()
        slam = self._ensure_slam()
        ranges = np.stack(self._ranges)
        if n < n_pad:
            ranges = np.pad(ranges, ((0, n_pad - n), (0, 0)))
        clouds = pipeline.preprocess_batch(
            self.preprocessor.projection, self.preprocessor.cfg,
            jnp.asarray(ranges),
        )
        odoms = None
        if any(o is not None for o in self._odoms):
            filled = []
            prev = next(o for o in self._odoms if o is not None)
            for o in self._odoms:
                prev = o if o is not None else prev
                filled.append(prev)
            odoms = np.stack(filled)
            if n < n_pad:
                odoms = np.concatenate(
                    [odoms, np.repeat(odoms[-1:], n_pad - n, axis=0)]
                )
        world = slam.process_chunk(clouds, odoms, n_frames=n)
        dt = _time.perf_counter() - t0
        per = dt / max(n, 1)
        # the chunk's world poses: the first chunk consumed frame 0 at seed
        offset = len(self.trajectory)
        poses = slam.world_trajectory[offset:]
        for ts, p in zip(self._stamps, poses):
            self.trajectory.append((ts, np.asarray(p), per))
        self._chunk_times.append((n, dt))
        self._ranges, self._stamps, self._odoms = [], [], []

    def finish(self) -> None:
        """Process any buffered partial chunk (padded with dead frames so the
        grid program keeps its single compiled shape)."""
        self._flush(self.chunk)

    def run(self, source, max_frames: int | None = None) -> int:
        n = 0
        for msg in source:
            if self.put_message(msg):
                n += 1
                if max_frames is not None and n >= max_frames:
                    break
        self.finish()
        return n

    # -- observability -------------------------------------------------------
    def timing_summary(self) -> dict:
        frames = sum(n for n, _ in self._chunk_times)
        total = sum(t for _, t in self._chunk_times)
        if frames == 0:
            return {"frames": 0}
        out = {
            "frames": frames,
            "total_compute_time": total,
            "mean_frame_time": total / frames,
            "mean_frame_hz": frames / total,
            "chunks": len(self._chunk_times),
            "chunk_size": self.chunk,
        }
        if self.slam is not None and self.slam.phase_times:
            out["phases"] = {
                k: round(v, 3) for k, v in self.slam.phase_times.items()
            }
        return out

    def draw(self, canvas) -> None:
        """MultiGraphSLAM2D::draw equivalent over the host-side graph."""
        slam = self.slam
        if slam is None:
            return
        poses = slam.poses_np
        colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b"]
        for m in range(slam.n_maps):
            canvas.push_matrix()
            canvas.mult_matrix(poses[m])
            canvas.put_reference_system(0.3)
            scene = slam.scene_of(m)
            if scene is not None:
                canvas.put_cloud(scene, color=colors[m % len(colors)])
            canvas.pop_matrix()
        if self.trajectory:
            canvas.put_trajectory(np.stack([p for _, p, _ in self.trajectory]))
        if slam.n_edges:
            ei = np.array([e[0] for e in slam._edges_host])
            ej = np.array([e[1] for e in slam._edges_host])
            canvas.put_segments(poses[ei, :2], poses[ej, :2], color="gray")
