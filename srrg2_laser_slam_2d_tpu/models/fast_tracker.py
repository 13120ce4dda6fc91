"""Fast tracking path — host orchestration of the fused frame kernel
(ops/pallas_frame.py): beam-sized carried state, one kernel per frame,
deferred scene materialization.

Equivalent tracker behavior to models/tracker.py with
``use_fused_aligner + banded + reuse_clip_canvas + lean_scene_ops`` (the
lean beam-window semantics; validated against it in
tests/test_fast_tracker.py), at a fraction of the per-frame op count.

The scene array is NOT updated per frame. Each frame emits a [8, B] payload
(merge/replace/append decisions with final scene rows — slots are assigned
in-kernel from the carried count, so payloads from any number of frames can
be applied in one batched pass). ``materialize`` folds any pending payloads
into the scene with last-write-wins ordering; the SLAM layer calls it only
at events that actually read the scene (local-map split, loop closure,
relocalization, drawing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import projector as projector_op
from ..ops.pallas_frame import FrameSpec, frame_step, track_frames_grid
from ..utils import cloud as cloud_op
from ..utils import geometry
from ..utils.cloud import Cloud

Array = jax.Array


class FastState(NamedTuple):
    """Carried device state of the fast tracker (a pytree)."""

    cacheT: Array   # [8, B] canvas cells, current sensor frame
    pose: Array     # [2, 8] X / last_odom / has_odom / count / S
    scene: Cloud    # materialized up to `applied` payloads only


def pack_measurement(cloud: Cloud, odom=None, odom_valid=False,
                     capacity: int | None = None) -> Array:
    """Cloud (+ odometry) -> [F, 8] kernel rows (x, y, nx, ny, valid, aux).

    Column 5 rows 0-3 carry [odom x, y, theta, odom_valid] (the kernel's
    single per-frame input)."""
    n = cloud.capacity if capacity is None else capacity
    geo = jnp.concatenate(
        [
            cloud.xy, cloud.normal,
            cloud.valid.astype(jnp.float32)[:, None],
            jnp.zeros((cloud.capacity, 3), jnp.float32),
        ],
        axis=1,
    )
    if n != cloud.capacity:
        geo = jnp.pad(geo, ((0, n - cloud.capacity), (0, 0)))
    if odom is not None:
        geo = geo.at[0:3, 5].set(jnp.asarray(odom, jnp.float32))
        geo = geo.at[3, 5].set(jnp.asarray(odom_valid, jnp.float32))
    return geo


@functools.partial(jax.jit, static_argnames=("capacity",))
def pack_measurement_batch(clouds: Cloud, odoms: Array | None = None,
                           odom_valid: Array | None = None,
                           capacity: int | None = None) -> Array:
    """[T, ...] Cloud stack (+ [T, 3] odometry) -> [T, F, 8] kernel rows
    (one program, outside the frame loop)."""
    if odoms is None:
        return jax.vmap(lambda c: pack_measurement(c, capacity=capacity))(clouds)
    if odom_valid is None:
        odom_valid = jnp.ones(odoms.shape[0], jnp.float32)
    return jax.vmap(
        lambda c, o, v: pack_measurement(c, o, v, capacity=capacity)
    )(clouds, odoms, odom_valid)


def pack_measurement_canvas(spec: FrameSpec, cloud: Cloud, odom=None,
                            odom_valid=False) -> Array:
    """Cloud -> [8, B] PRE-z-buffered canvas rows (spec.meas_as_canvas
    layout): rows 0 depth, 1 x, 2 y, 3 nx, 4 ny, 5 has, 6 lanes 0-3 =
    [odom x, y, theta, odom_valid], 7 zero. One batched XLA projection
    OUTSIDE the frame loop replaces the kernel's dense [F, B] z-buffer."""
    proj = spec.projection
    canvas = projector_op.project_local(proj, cloud)
    idx = jnp.maximum(canvas.idx, 0)
    B = spec.cols_padded
    rows = jnp.stack(
        [
            jnp.where(canvas.valid, canvas.depth, 0.0),
            cloud.xy[idx, 0], cloud.xy[idx, 1],
            cloud.normal[idx, 0], cloud.normal[idx, 1],
            canvas.valid.astype(jnp.float32),
        ]
    )
    rows = jnp.concatenate(
        [rows, jnp.zeros((2, proj.cols), jnp.float32)], axis=0
    )
    pad = B - proj.cols
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    if odom is not None:
        rows = rows.at[6, 0:3].set(jnp.asarray(odom, jnp.float32))
        rows = rows.at[6, 3].set(jnp.asarray(odom_valid, jnp.float32))
    return rows


@functools.partial(jax.jit, static_argnames=("spec",))
def pack_measurement_canvas_batch(spec: FrameSpec, clouds: Cloud,
                                  odoms: Array | None = None,
                                  odom_valid: Array | None = None) -> Array:
    """[T, ...] Cloud stack -> [T, 8, B] canvas rows (one program)."""
    if odoms is None:
        return jax.vmap(lambda c: pack_measurement_canvas(spec, c))(clouds)
    if odom_valid is None:
        odom_valid = jnp.ones(odoms.shape[0], jnp.float32)
    return jax.vmap(
        lambda c, o, v: pack_measurement_canvas(spec, c, o, v)
    )(clouds, odoms, odom_valid)


@functools.partial(jax.jit, static_argnames=("spec",))
def seed(spec: FrameSpec, measurement: Cloud, sensor_in_robot: Array,
         robot_in_local_map: Array | None = None,
         odom: Array | None = None) -> FastState:
    """First-frame scene population + initial cache (one XLA program; the
    analog of TrackerSliceProcessor::populateScene + the first clip)."""
    X = (jnp.zeros(3, jnp.float32) if robot_in_local_map is None
         else jnp.asarray(robot_in_local_map, jnp.float32))
    S = jnp.asarray(sensor_in_robot, jnp.float32)
    sensor_in_lm = geometry.compose(X, S)
    meas_lm = cloud_op.compact(cloud_op.transform(measurement, sensor_in_lm))
    scene = cloud_op.repad(meas_lm, spec.scene_capacity)
    count = scene.count().astype(jnp.float32)

    canvas, local = projector_op.project(spec.projection, sensor_in_lm, scene)
    idx = jnp.maximum(canvas.idx, 0)
    B = spec.cols_padded
    pad = B - spec.projection.cols
    cells = jnp.stack(
        [
            local.xy[idx, 0], local.xy[idx, 1],
            local.normal[idx, 0], local.normal[idx, 1],
            canvas.valid.astype(jnp.float32),
            jnp.where(canvas.valid, idx, -1).astype(jnp.float32),
        ]
    )
    cacheT = jnp.concatenate(
        [cells, jnp.zeros((2, spec.projection.cols), jnp.float32)], axis=0
    )
    if pad:
        cacheT = jnp.pad(cacheT, ((0, 0), (0, pad)))
        cacheT = cacheT.at[5, spec.projection.cols:].set(-1.0)

    pose = jnp.zeros((2, 8), jnp.float32)
    pose = pose.at[0, 0:3].set(X)
    pose = pose.at[0, 7].set(count)
    pose = pose.at[1, 0:3].set(S)
    if odom is not None:
        pose = pose.at[0, 3:6].set(jnp.asarray(odom, jnp.float32))
        pose = pose.at[0, 6].set(1.0)
    return FastState(cacheT=cacheT, pose=pose, scene=scene)


@functools.partial(jax.jit, static_argnames=("spec",))
def seed_from_scene(spec: FrameSpec, scene: Cloud, robot_in_local_map: Array,
                    sensor_in_robot: Array, last_odom: Array,
                    has_odom: Array) -> FastState:
    """Rebuild the cache from an existing scene (relocalization jump onto an
    old local map: the analog of LaserTracker.set_scene)."""
    X = jnp.asarray(robot_in_local_map, jnp.float32)
    S = jnp.asarray(sensor_in_robot, jnp.float32)
    sensor_in_lm = geometry.compose(X, S)
    canvas, local = projector_op.project(spec.projection, sensor_in_lm, scene)
    idx = jnp.maximum(canvas.idx, 0)
    B = spec.cols_padded
    pad = B - spec.projection.cols
    cells = jnp.stack(
        [
            local.xy[idx, 0], local.xy[idx, 1],
            local.normal[idx, 0], local.normal[idx, 1],
            canvas.valid.astype(jnp.float32),
            jnp.where(canvas.valid, idx, -1).astype(jnp.float32),
        ]
    )
    cacheT = jnp.concatenate(
        [cells, jnp.zeros((2, spec.projection.cols), jnp.float32)], axis=0
    )
    if pad:
        cacheT = jnp.pad(cacheT, ((0, 0), (0, pad)))
        cacheT = cacheT.at[5, spec.projection.cols:].set(-1.0)
    pose = jnp.zeros((2, 8), jnp.float32)
    pose = pose.at[0, 0:3].set(X)
    pose = pose.at[0, 3:6].set(jnp.asarray(last_odom, jnp.float32))
    pose = pose.at[0, 6].set(jnp.asarray(has_odom, jnp.float32))
    pose = pose.at[0, 7].set(scene.count().astype(jnp.float32))
    pose = pose.at[1, 0:3].set(S)
    return FastState(cacheT=cacheT, pose=pose, scene=scene)


@functools.partial(jax.jit, static_argnames=("spec",))
def materialize(spec: FrameSpec, scene: Cloud, payloads: Array,
                final_count: Array) -> Cloud:
    """Fold [T, 8, B] frame payloads into the scene, last write per row wins.

    Two multi-operand ``lax.sort`` passes + ONE cap-sized scatter. The r3
    version scattered all T*B entries (mostly dropped duplicates) — on TPU a
    non-trivial scatter serializes per update (~90 ns each, measured r4), so
    a 255-frame K=32 batch cost ~565 ms, 18x the tracking kernel itself.
    Here pass 1 sorts entries by (row, t) carrying the values along (stable
    vectorized sort, no gathers), boundary-detection marks the last write
    per row, and pass 2 compacts those winners to a cap-length prefix — so
    the only scatter left has at most ``cap`` unique sorted indices
    (r4 measurement: 565 -> ~8 ms per K=32 batch)."""
    T, _, B = payloads.shape
    cap = spec.scene_capacity
    N = T * B
    rows = payloads[:, 4, :].astype(jnp.int32).reshape(-1)      # [T*B]
    kind = payloads[:, 5, :].reshape(-1)
    px = payloads[:, 0, :].reshape(-1)
    py = payloads[:, 1, :].reshape(-1)
    nx = payloads[:, 2, :].reshape(-1)
    ny = payloads[:, 3, :].reshape(-1)
    live = (kind > 0) & (rows >= 0) & (rows < cap)
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, B)).reshape(-1)
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(live, rows * (T + 1) + t_idx, big)
    # pass 1: stable sort by (row, t); values ride along (num_keys=1).
    # rows/live are recovered from the sorted key instead of riding along —
    # two fewer operands of data movement in the sort network.
    key_s, px_s, py_s, nx_s, ny_s = jax.lax.sort(
        (key, px, py, nx, ny), num_keys=1
    )
    live_s = key_s != big
    rows_s = jnp.where(live_s, key_s // (T + 1), cap)
    last = jnp.concatenate([rows_s[1:] != rows_s[:-1], jnp.array([True])])
    sel = live_s & last
    # pass 2: compact winners to the front, ordered by row (key2 == row for
    # winners, cap for losers -> winners form a sorted unique prefix)
    key2 = jnp.where(sel, rows_s, cap)
    key2_s, px_c, py_c, nx_c, ny_c = jax.lax.sort(
        (key2, px_s, py_s, nx_s, ny_s), num_keys=1
    )
    m = min(cap, N)
    tgt = jnp.where(key2_s[:m] < cap, key2_s[:m], cap)
    vals_p = jnp.stack([px_c[:m], py_c[:m]], axis=1)
    vals_n = jnp.stack([nx_c[:m], ny_c[:m]], axis=1)
    xy = jnp.concatenate([scene.xy, jnp.zeros((1, 2))]).at[tgt].set(
        vals_p, mode="drop", unique_indices=True
    )[:cap]
    nm = jnp.concatenate([scene.normal, jnp.zeros((1, 2))]).at[tgt].set(
        vals_n, mode="drop", unique_indices=True
    )[:cap]
    valid = jnp.arange(cap) < final_count.astype(jnp.int32)
    return Cloud(xy=xy, normal=nm, valid=valid)


class FastTracker:
    """Stateful host wrapper with the LaserTracker API (models/tracker.py),
    backed by the fused frame kernel. ``scene`` reads trigger lazy
    materialization."""

    def __init__(self, spec: FrameSpec, sensor_in_robot=None):
        self.spec = spec
        self.sensor_in_robot = (
            np.zeros(3, np.float32) if sensor_in_robot is None
            else np.asarray(sensor_in_robot, np.float32)
        )
        self.state: FastState | None = None
        self._pending: list[Array] = []
        self._interpret = jax.default_backend() == "cpu"

    @property
    def robot_in_local_map(self) -> Array:
        if self.state is None:
            return jnp.zeros(3, jnp.float32)
        return self.state.pose[0, 0:3]

    @property
    def scene(self) -> Cloud:
        self.flush()
        return self.state.scene

    def flush(self) -> None:
        """Apply pending frame payloads to the scene."""
        if not self._pending:
            return
        payloads = jnp.stack(self._pending)
        self._pending = []
        scene = materialize(
            self.spec, self.state.scene, payloads, self.state.pose[0, 7]
        )
        self.state = self.state._replace(scene=scene)

    def capture_scene(self) -> Cloud:
        return self.scene  # flushes pending payloads

    def reseed(self, measurement: Cloud, odom=None) -> None:
        """Start a new local map at the current measurement."""
        self._pending = []
        prev = self.state
        self.state = seed(self.spec, measurement, self.sensor_in_robot, odom=odom)
        if prev is not None and odom is None:
            # keep odometry continuity across the split
            pose = self.state.pose
            pose = pose.at[0, 3:6].set(prev.pose[0, 3:6])
            pose = pose.at[0, 6].set(prev.pose[0, 6])
            self.state = self.state._replace(pose=pose)

    def set_scene(self, scene: Cloud, robot_in_local_map=None) -> None:
        """Continue tracking on an existing local-map scene (relocalization)."""
        self._pending = []
        X = (jnp.zeros(3, jnp.float32) if robot_in_local_map is None
             else jnp.asarray(robot_in_local_map, jnp.float32))
        if self.state is not None:
            last_odom, has_odom = self.state.pose[0, 3:6], self.state.pose[0, 6]
        else:
            last_odom, has_odom = jnp.zeros(3, jnp.float32), jnp.float32(0.0)
        self.state = seed_from_scene(
            self.spec, scene, X, jnp.asarray(self.sensor_in_robot), last_odom,
            has_odom,
        )

    def compute(self, measurement: Cloud, odom=None):
        if self.state is None:
            self.state = seed(
                self.spec, measurement, self.sensor_in_robot, odom=odom
            )
            return None
        if self.spec.meas_as_canvas:
            measF = pack_measurement_canvas(
                self.spec,
                measurement,
                odom if odom is not None else np.zeros(3, np.float32),
                odom is not None,
            )
        else:
            measF = pack_measurement(
                measurement,
                odom if odom is not None else np.zeros(3, np.float32),
                odom is not None,
            )
        cacheT, pose, payload = frame_step(
            self.spec, measF, self.state.cacheT, self.state.pose,
            interpret=self._interpret,
        )
        self.state = self.state._replace(cacheT=cacheT, pose=pose)
        self._pending.append(payload)
        self._last_payload = payload
        return payload[6, :7]  # [T'(3), chi, n_corr, n_inliers, n_app]

    def iteration_stats(self):
        """Per-GN-iteration [chi, n_inliers] of the last frame ([its, 2]) —
        the reference aligner's iterationStats() surface, decoded from the
        payload's spare row (ops/pallas_frame.py payload row 7)."""
        if getattr(self, "_last_payload", None) is None:
            return None
        its = self.spec.iterations
        row = self._last_payload[7]
        return jnp.stack([row[0:its], row[64:64 + its]], axis=1)


def track_sequence_fast(spec: FrameSpec, state: FastState,
                        measF_stack: Array):
    """Bulk sequential tracking: the whole stack as ONE grid-iterated
    pallas_call. Returns (state', stats [T, 7]) with the scene materialized
    once at the end."""
    interpret = jax.default_backend() == "cpu"
    cacheT, pose, payloads = track_frames_grid(
        spec, state.cacheT, state.pose, measF_stack, interpret=interpret
    )
    scene = materialize(spec, state.scene, payloads, pose[0, 7])
    stats = payloads[:, 6, :7]
    return FastState(cacheT=cacheT, pose=pose, scene=scene), stats
