"""Scan-to-local-map tracker — TPU equivalent of ``MultiTracker2D`` +
``TrackerSliceProcessorLaser2D`` + ``TrackerSliceProcessorPriorOdom2D``
(tracking/tracker_slice_processor_laser_2d.h:5-21; behavior per
apps/visual_test_tracker_2d.cpp:136-180 and SURVEY.md §2.2).

Per frame (reference flow setRawData -> preprocessRawData -> align -> merge):
  1. clip the local-map scene to the sensor's view (SceneClipperProjective2D)
  2. align the new measurement against the clipped scene with the odometry
     prior as initial guess and prior factor (MultiAligner2D)
  3. update robot_in_local_map from the estimate
  4. merge the measurement into the scene (MergerProjective2D)

Frame conventions (see ops/icp.py header for the with-sensor equivalence):
  - measurement cloud: sensor frame (raw preprocessor output)
  - scene: local-map frame; clipped scene: robot frame at the previous pose
  - aligner estimate T': clipped(prev-robot) frame -> current-sensor frame
  - robot update: X_new = X_old ∘ (S ∘ T')^-1  with S = sensor_in_robot

The whole step is ONE jitted device program; the only host decision is
first-frame populate (data-independent: the caller knows).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import clip as clip_op
from ..ops import icp
from ..ops import merge as merge_op
from ..ops.projector import PolarProjection
from ..utils import cloud as cloud_op
from ..utils import geometry
from ..utils.cloud import Cloud

Array = jax.Array


def default_projection() -> PolarProjection:
    """The shipped configs' matching/merging/clipping canvas: 721 beams over
    ±π, range [0.3, 20] (configurations/...LASER_0.json:328-338 etc.)."""
    import math

    return PolarProjection.make(
        cols=721, angle_min=-math.pi, angle_max=math.pi, range_min=0.3, range_max=20.0
    )


@dataclass(frozen=True)
class TrackerConfig:
    scene_capacity: int = 8192
    merge_threshold: float = 0.2          # MergerProjective2D (config :656)
    clip_voxelize_resolution: float = 0.0  # SceneClipperProjective2D (config :734)
    projection: PolarProjection = field(default_factory=default_projection)
    aligner: icp.AlignerConfig = field(default_factory=icp.AlignerConfig)
    # run the whole alignment as ONE Pallas kernel
    # (ops/pallas_projective_align.py) instead of the XLA while_loop — same
    # correspondence/residual model, ~3x lower per-frame latency on TPU
    use_fused_aligner: bool = False
    # banded variant (ops/pallas_banded_align.py): exploits the beam-indexed
    # clipped cloud to replace the per-iteration dense [M, B] compare with
    # block-local windows. Requires the projective clipper without clip
    # voxelization (those keep the moving cloud beam-indexed).
    banded_aligner: bool = False
    # Pallas clip/merge kernels (ops/pallas_scene.py): chunked VMEM z-buffers
    # with matmul write-back instead of XLA scatters
    use_fused_scene_ops: bool = False
    # scene clipper plugin slot (TrackerSliceProcessor param_clipper):
    # "projective" (SceneClipperProjective2D) or "ball" (SceneClipperBall2D)
    clipper: str = "projective"
    ball_max_range: float = 10.0  # SceneClipperBall2D max_range
    # fast path: the merger's scene projection at X_new∘S is exactly the next
    # frame's clip camera, so its post-merge canvas (ops/merge.py
    # return_canvas) replaces the clipper's full scene projection. Saves one
    # scene-sized z-buffer per frame; sub-beam-resolution deviations only
    # (see merge_projective docstring).
    reuse_clip_canvas: bool = False
    # lean mode (implies reuse_clip_canvas, XLA merge path): the merge's scene
    # side ALSO comes from the cached canvas (ops/merge.merge_projective_lean)
    # — zero full-scene projections per frame, every op beam-sized
    lean_scene_ops: bool = False
    # host-boundary capacity regrowth: when the scene fills past
    # grow_watermark, the host wrapper re-pads it to 2x capacity before the
    # next step (one re-jit per growth) — the static-shape answer to the
    # reference's dynamic resize (merger_projective_2d.cpp:31-33). Appends
    # that would not fit are counted in TrackStats.dropped_appends either way.
    auto_grow_scene: bool = True
    grow_watermark: float = 0.9


class TrackerState(NamedTuple):
    """Device-resident tracker state (a pytree)."""

    scene: Cloud               # local-map frame
    robot_in_local_map: Array  # [3]
    last_odom: Array           # [3] last odometry pose fed in
    has_odom: Array            # [] bool
    sensor_in_robot: Array     # [3] laser extrinsic (from the TF tree)
    clip_cache: Cloud          # [cols] post-merge beam canvas (sensor frame)
    clip_cache_rows: Array     # [cols] scene row behind each canvas cell


class TrackStats(NamedTuple):
    estimate: Array            # [3] aligner estimate (moving->sensor frame)
    chi: Array
    num_correspondences: Array
    num_inliers: Array
    chi_inliers: Array         # [] mean chi over inliers (final pass)
    iterations: Array
    # the reference aligner's iterationStats(): per-GN-iteration
    # [chi, n_corr, n_inliers, chi_inl_mean] at each linearization point
    iter_stats: Array          # [max_iterations, 4]
    # status surface (utils/status.py; the reference's per-stage _status):
    # aligner SUCCESS iff it reached min_num_inliers actual inliers
    status: Array              # [] int32 Status code
    scene_count: Array         # [] int32 post-merge scene occupancy
    scene_full: Array          # [] bool  scene at capacity (appends may drop)
    dropped_appends: Array     # [] int32 appends that did not fit (-1 unknown)


def init_state(cfg: TrackerConfig, sensor_in_robot=None) -> TrackerState:
    if sensor_in_robot is None:
        sensor_in_robot = jnp.zeros(3, jnp.float32)
    return TrackerState(
        scene=cloud_op.empty(cfg.scene_capacity),
        robot_in_local_map=jnp.zeros(3, jnp.float32),
        last_odom=jnp.zeros(3, jnp.float32),
        has_odom=jnp.asarray(False),
        sensor_in_robot=jnp.asarray(sensor_in_robot, jnp.float32),
        clip_cache=cloud_op.empty(cfg.projection.cols),
        clip_cache_rows=jnp.full((cfg.projection.cols,), -1, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def populate(cfg: TrackerConfig, state: TrackerState, measurement: Cloud) -> TrackerState:
    """First-frame scene population (TrackerSliceProcessor::populateScene):
    the measurement, moved into the local-map frame, seeds the scene."""
    sensor_in_lm = geometry.compose(state.robot_in_local_map, state.sensor_in_robot)
    meas_lm = cloud_op.transform(measurement, sensor_in_lm)
    scene = cloud_op.repad(meas_lm, cfg.scene_capacity)
    return state._replace(scene=scene)


def track_step_impl(
    cfg: TrackerConfig,
    state: TrackerState,
    measurement: Cloud,
    odom: Array,
    odom_valid: Array,
    use_clip_cache: bool = False,
) -> tuple[TrackerState, TrackStats]:
    """One tracking step. ``odom`` is the current odometry pose (any fixed
    odom frame); ``odom_valid`` gates the prior."""
    S = state.sensor_in_robot
    # odometry-predicted robot motion D (prev-robot -> curr-robot), if available
    use_prior = state.has_odom & odom_valid
    D = jnp.where(use_prior, geometry.relative(state.last_odom, odom), jnp.zeros(3))
    # initial guess / prior for the aligner estimate: T'0 = (D ∘ S)^-1 ∘ ... wait
    # T' maps prev-robot frame -> current-sensor frame: T'0 = S^-1 ∘ D^-1 = (D∘S)^-1
    T0 = geometry.inverse(geometry.compose(D, S))

    if use_clip_cache and cfg.reuse_clip_canvas:
        # the cache holds last merge's post-merge beam canvas in the sensor
        # frame at exactly this frame's clip camera — just re-frame it
        clipped = cloud_op.transform(state.clip_cache, S)
    elif cfg.clipper == "ball":
        clipped = clip_op.clip_ball(
            state.scene, state.robot_in_local_map, S, cfg.ball_max_range
        )
    elif cfg.use_fused_scene_ops:
        from ..ops import pallas_scene

        clipped = pallas_scene.clip_projective_pallas(
            cfg.projection,
            state.scene,
            state.robot_in_local_map,
            S,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        clipped = clip_op.clip_projective(
            cfg.projection,
            state.scene,
            state.robot_in_local_map,
            S,
            cfg.clip_voxelize_resolution,
        )

    if cfg.use_fused_aligner:
        if cfg.banded_aligner:
            if cfg.clipper != "projective" or cfg.clip_voxelize_resolution > 0:
                raise ValueError(
                    "banded_aligner needs a beam-indexed moving cloud "
                    "(projective clipper, no clip voxelization)"
                )
            from ..ops.pallas_banded_align import (
                fused_projective_align_banded as align_fn,
            )
        else:
            from ..ops.pallas_projective_align import (
                fused_projective_align as align_fn,
            )

        a = cfg.aligner
        fres = align_fn(
            cfg.projection,
            measurement.xy, measurement.normal, measurement.valid,
            clipped.xy, clipped.normal, clipped.valid,
            T0,
            odom_prior=T0,
            iterations=a.max_iterations,
            point_distance=a.point_distance,
            normal_cos=a.normal_cos,
            chi_threshold=a.chi_threshold,
            min_inliers=a.min_num_inliers,
            odom_weight=a.odom_weight,
            interpret=jax.default_backend() == "cpu",
        )
        # per-iteration stats come straight out of the kernel (spare output
        # lanes) — same [chi, n_corr, n_inliers, chi_inl_mean] rows as
        # icp.align's stats (the reference's iterationStats() surface)
        it_stats = fres.iter_stats.at[:, 3].set(
            fres.iter_stats[:, 3] / jnp.maximum(fres.iter_stats[:, 2], 1.0)
        )
        res = icp.AlignResult(
            estimate=fres.estimate,
            chi=fres.chi,
            num_correspondences=fres.num_corr.astype(jnp.int32),
            num_inliers=fres.num_inliers.astype(jnp.int32),
            chi_inliers=fres.chi_inl_sum / jnp.maximum(fres.num_inliers, 1.0),
            iterations=jnp.int32(a.max_iterations),
            stats=it_stats,
        )
    else:
        res = icp.align(
            cfg.aligner,
            cfg.projection,
            fixed=measurement,
            moving=clipped,
            initial=T0,
            odom_prior=T0,
        )

    # X_new = X_old ∘ (S ∘ T')^-1
    X_new = geometry.compose(
        state.robot_in_local_map, geometry.inverse(geometry.compose(S, res.estimate))
    )

    clip_cache = state.clip_cache
    clip_cache_rows = state.clip_cache_rows
    dropped = jnp.int32(-1)  # unknown unless the merge path reports it
    if cfg.lean_scene_ops and use_clip_cache:
        scene, clip_cache, clip_cache_rows = merge_op.merge_projective_lean(
            cfg.projection,
            state.scene,
            state.clip_cache,
            state.clip_cache_rows,
            measurement,
            old_sensor_in_new=geometry.compose(res.estimate, S),
            measurement_in_scene=geometry.compose(X_new, S),
            merge_threshold=cfg.merge_threshold,
        )
    elif cfg.use_fused_scene_ops:
        from ..ops import pallas_scene

        out = pallas_scene.merge_projective_pallas(
            cfg.projection,
            state.scene,
            measurement,
            measurement_in_scene=geometry.compose(X_new, S),
            merge_threshold=cfg.merge_threshold,
            interpret=jax.default_backend() == "cpu",
            return_canvas=cfg.reuse_clip_canvas,
        )
        if cfg.reuse_clip_canvas:
            scene, cache_padded = out
            # pallas canvases are padded to a lane multiple; trim to cols
            clip_cache = Cloud(
                xy=cache_padded.xy[: cfg.projection.cols],
                normal=cache_padded.normal[: cfg.projection.cols],
                valid=cache_padded.valid[: cfg.projection.cols],
            )
        else:
            scene = out
    elif cfg.reuse_clip_canvas:
        scene, clip_cache, clip_cache_rows, dropped = merge_op.merge_projective(
            cfg.projection,
            state.scene,
            measurement,
            measurement_in_scene=geometry.compose(X_new, S),
            merge_threshold=cfg.merge_threshold,
            return_canvas=True,
            return_dropped=True,
        )
    else:
        scene, dropped = merge_op.merge_projective(
            cfg.projection,
            state.scene,
            measurement,
            measurement_in_scene=geometry.compose(X_new, S),
            merge_threshold=cfg.merge_threshold,
            return_dropped=True,
        )

    new_state = state._replace(
        scene=scene,
        robot_in_local_map=X_new,
        last_odom=jnp.where(odom_valid, odom, state.last_odom),
        has_odom=state.has_odom | odom_valid,
        clip_cache=clip_cache,
        clip_cache_rows=clip_cache_rows,
    )
    scene_count = jnp.sum(scene.valid.astype(jnp.int32))
    stats = TrackStats(
        estimate=res.estimate,
        chi=res.chi,
        num_correspondences=res.num_correspondences,
        num_inliers=res.num_inliers,
        chi_inliers=res.chi_inliers,
        iterations=res.iterations,
        iter_stats=res.stats,
        status=jnp.where(
            res.num_inliers >= cfg.aligner.min_num_inliers, jnp.int32(2), jnp.int32(0)
        ),
        scene_count=scene_count,
        scene_full=scene_count >= scene.capacity,
        dropped_appends=dropped,
    )
    return new_state, stats


track_step = jax.jit(track_step_impl, static_argnames=("cfg", "use_clip_cache"))


def track_step_multi_impl(
    cfg: TrackerConfig,
    state: TrackerState,
    measurements: Cloud,   # [C, N, ...] per-cue clouds in their sensor frames
    extrinsics: Array,     # [C, 3] sensor-in-robot poses
    odom: Array,
    odom_valid: Array,
) -> tuple[TrackerState, TrackStats]:
    """Multi-cue tracking step (the MULTI config: one tracker slice per
    rangefinder + the odometry prior slice; each cue clips its own view of the
    scene and merges back through its own extrinsic). The aligner estimate T
    here maps prev-robot -> curr-robot directly."""
    n_cues = extrinsics.shape[0]
    use_prior = state.has_odom & odom_valid
    D = jnp.where(use_prior, geometry.relative(state.last_odom, odom), jnp.zeros(3))
    T0 = geometry.inverse(D)  # prev-robot -> curr-robot initial guess

    # per-cue clipped views, concatenated in the robot frame
    clips = [
        clip_op.clip_projective(
            cfg.projection, state.scene, state.robot_in_local_map,
            extrinsics[c], cfg.clip_voxelize_resolution,
        )
        for c in range(n_cues)
    ]
    moving = clips[0]
    for c in range(1, n_cues):
        moving = cloud_op.concat(moving, clips[c])

    if cfg.use_fused_aligner:
        # fused multi-cue kernel: all cue canvases matched + reduced into one
        # 3x3 solve per GN iteration inside ONE Pallas program
        from ..ops.pallas_multicue_align import fused_projective_align_multi

        a = cfg.aligner
        fres = fused_projective_align_multi(
            cfg.projection,
            measurements.xy, measurements.normal, measurements.valid,
            extrinsics,
            moving.xy, moving.normal, moving.valid,
            T0,
            odom_prior=T0,
            iterations=a.max_iterations,
            point_distance=a.point_distance,
            normal_cos=a.normal_cos,
            chi_threshold=a.chi_threshold,
            min_inliers=a.min_num_inliers,
            min_corr=a.min_num_correspondences,
            odom_weight=a.odom_weight,
            damping=a.damping,
            interpret=jax.default_backend() == "cpu",
        )
        it_stats = fres.iter_stats.at[:, 3].set(
            fres.iter_stats[:, 3] / jnp.maximum(fres.iter_stats[:, 2], 1.0)
        )
        res = icp.AlignResult(
            estimate=fres.estimate,
            chi=fres.chi,
            num_correspondences=fres.num_corr.astype(jnp.int32),
            num_inliers=fres.num_inliers.astype(jnp.int32),
            chi_inliers=fres.chi_inl_sum / jnp.maximum(fres.num_inliers, 1.0),
            iterations=jnp.int32(a.max_iterations),
            stats=it_stats,
        )
    else:
        res = icp.align_multi(
            cfg.aligner, cfg.projection, measurements, extrinsics, moving, T0,
            odom_prior=T0,
        )

    X_new = geometry.compose(state.robot_in_local_map, geometry.inverse(res.estimate))

    scene = state.scene
    for c in range(n_cues):
        scene = merge_op.merge_projective(
            cfg.projection,
            scene,
            jax.tree.map(lambda x: x[c], measurements),
            measurement_in_scene=geometry.compose(X_new, extrinsics[c]),
            merge_threshold=cfg.merge_threshold,
        )

    new_state = state._replace(
        scene=scene,
        robot_in_local_map=X_new,
        last_odom=jnp.where(odom_valid, odom, state.last_odom),
        has_odom=state.has_odom | odom_valid,
    )
    scene_count = jnp.sum(scene.valid.astype(jnp.int32))
    stats = TrackStats(
        estimate=res.estimate,
        chi=res.chi,
        num_correspondences=res.num_correspondences,
        num_inliers=res.num_inliers,
        chi_inliers=res.chi_inliers,
        iterations=res.iterations,
        iter_stats=res.stats,
        status=jnp.where(
            res.num_inliers >= cfg.aligner.min_num_inliers, jnp.int32(2), jnp.int32(0)
        ),
        scene_count=scene_count,
        scene_full=scene_count >= scene.capacity,
        dropped_appends=jnp.int32(-1),
    )
    return new_state, stats


track_step_multi = jax.jit(track_step_multi_impl, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("cfg",))
def populate_multi(
    cfg: TrackerConfig, state: TrackerState, measurements: Cloud, extrinsics: Array
) -> TrackerState:
    """Seed the scene from all cues at once."""
    n_cues = extrinsics.shape[0]
    scene = None
    for c in range(n_cues):
        meas_lm = cloud_op.transform(
            jax.tree.map(lambda x: x[c], measurements),
            geometry.compose(state.robot_in_local_map, extrinsics[c]),
        )
        scene = meas_lm if scene is None else cloud_op.concat(scene, meas_lm)
    return state._replace(scene=cloud_op.repad(scene, cfg.scene_capacity))


class MultiCueTracker:
    """Host wrapper for dual-rangefinder (+odom) tracking."""

    def __init__(self, cfg: TrackerConfig, extrinsics):
        self.cfg = cfg
        self.extrinsics = jnp.asarray(extrinsics, jnp.float32)
        self.state = init_state(cfg)
        self._seeded = False

    @property
    def robot_in_local_map(self) -> Array:
        return self.state.robot_in_local_map

    def set_scene(self, scene: Cloud, robot_in_local_map=None) -> None:
        self.state = self.state._replace(scene=scene)
        if robot_in_local_map is not None:
            self.state = self.state._replace(
                robot_in_local_map=jnp.asarray(robot_in_local_map, jnp.float32)
            )
        self._seeded = True

    def capture_scene(self) -> Cloud:
        return self.state.scene

    def reseed(self, measurements: Cloud, odom=None) -> None:
        self.state = self.state._replace(
            robot_in_local_map=jnp.zeros(3, jnp.float32)
        )
        self._seeded = False
        self.compute(measurements, odom)

    def compute(self, measurements: Cloud, odom=None) -> TrackStats | None:
        if not self._seeded:
            self.state = populate_multi(self.cfg, self.state, measurements, self.extrinsics)
            self._seeded = True
            if odom is not None:
                self.state = self.state._replace(
                    last_odom=jnp.asarray(odom, jnp.float32), has_odom=jnp.asarray(True)
                )
            return None
        odom_arr = jnp.asarray(odom, jnp.float32) if odom is not None else jnp.zeros(3)
        self.state, stats = track_step_multi(
            self.cfg, self.state, measurements, self.extrinsics,
            odom_arr, jnp.asarray(odom is not None),
        )
        return stats


class LaserTracker:
    """Host-side convenience wrapper with the reference's stateful API."""

    def __init__(self, cfg: TrackerConfig = TrackerConfig(), sensor_in_robot=None):
        self.cfg = cfg
        self.state = init_state(cfg, sensor_in_robot)
        self._seeded = False
        self._has_clip_cache = False

    @property
    def robot_in_local_map(self) -> Array:
        return self.state.robot_in_local_map

    def set_scene(self, scene: Cloud, robot_in_local_map=None) -> None:
        if scene.capacity != self.cfg.scene_capacity:
            # scenes may have been grown (auto_grow_scene): keep the config's
            # capacity in sync with the actual array shape
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, scene_capacity=scene.capacity)
        self.state = self.state._replace(scene=scene)
        if robot_in_local_map is not None:
            self.state = self.state._replace(
                robot_in_local_map=jnp.asarray(robot_in_local_map, jnp.float32)
            )
        self._seeded = True
        self._has_clip_cache = False

    def capture_scene(self) -> Cloud:
        """Current local-map scene (the tracker-agnostic accessor the SLAM
        layer uses when a map stops being current)."""
        return self.state.scene

    def reseed(self, measurement: Cloud, odom=None) -> None:
        """Start a new local map at the current measurement (the SLAM split
        path: reset robot-in-local-map, re-populate the scene)."""
        self.state = self.state._replace(
            robot_in_local_map=jnp.zeros(3, jnp.float32)
        )
        self._seeded = False
        self.compute(measurement, odom)

    def compute(self, measurement: Cloud, odom=None) -> TrackStats | None:
        if not self._seeded:
            self.state = populate(self.cfg, self.state, measurement)
            self._seeded = True
            self._has_clip_cache = False
            if odom is not None:
                self.state = self.state._replace(
                    last_odom=jnp.asarray(odom, jnp.float32), has_odom=jnp.asarray(True)
                )
            return None
        odom_arr = (
            jnp.asarray(odom, jnp.float32) if odom is not None else jnp.zeros(3)
        )
        odom_valid = jnp.asarray(odom is not None)
        self.state, stats = track_step(
            self.cfg, self.state, measurement, odom_arr, odom_valid,
            use_clip_cache=self._has_clip_cache and self.cfg.reuse_clip_canvas,
        )
        self._has_clip_cache = bool(self.cfg.reuse_clip_canvas)
        self._maybe_grow_scene(stats)
        return stats

    def _maybe_grow_scene(self, stats: TrackStats) -> None:
        """Capacity regrowth at a safe host boundary (between jitted steps)."""
        cfg = self.cfg
        if not cfg.auto_grow_scene:
            return
        if int(stats.scene_count) < cfg.grow_watermark * cfg.scene_capacity:
            return
        import dataclasses

        new_cap = cfg.scene_capacity * 2
        self.cfg = dataclasses.replace(cfg, scene_capacity=new_cap)
        self.state = self.state._replace(
            scene=cloud_op.repad(self.state.scene, new_cap)
        )
