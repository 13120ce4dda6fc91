"""Scan preprocessing — TPU equivalent of ``RawDataPreprocessorProjective2D``
(sensor_processing/raw_data_preprocessor_projective_2d.{h,cpp}).

Pipeline (reference .cpp:13-50,76-106): clamp range bounds (message ∩ params),
polar unprojection, 1D sliding-window normals, voxel decimation (or plain
valid-point compaction when ``voxelize_resolution`` <= 0).

TPU design: one jitted function over a static-shape range row; the adaptor
state (unprojector intrinsics) is derived from message metadata on the host
once per sensor configuration and treated as static so XLA compiles one kernel
per laser model.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import normals as normals_op
from ..ops import projector as projector_op
from ..utils import cloud as cloud_op
from ..utils.cloud import Cloud

Array = jax.Array


@dataclass(frozen=True)
class PreprocessorConfig:
    """Parameter surface of RawDataPreprocessorProjective2D (+ its unprojector).

    Defaults mirror the reference PARAM defaults
    (raw_data_preprocessor_projective_2d.h:27-49; unprojector params at
    configurations/stage_segway_double_config_LASER_0.json:493-520).
    """

    range_min: float = 0.0
    range_max: float = 1000.0
    voxelize_resolution: float = 0.02
    normal_point_distance: float = 0.3
    normal_min_points: int = 5
    normal_window: int = 16
    scan_topic: str = "/scan"
    # voxel decimation backend: "grid" = exact 4D-cell segment mean
    # (sort + scatter; the reference semantics), "sequential" = consecutive
    # same-cell RUN averaging (scatter-free — every TPU scatter serializes
    # ~90 ns/row, making grid voxelize the largest device cost of the
    # chunked loop; see utils/cloud.voxelize_sequential)
    voxelize_mode: str = "grid"


@dataclass(frozen=True)
class LaserModel:
    """Static per-sensor metadata extracted from a LaserMessage."""

    num_beams: int
    angle_min: float
    angle_max: float
    range_min: float
    range_max: float

    def projection(self, cfg: PreprocessorConfig) -> projector_op.PolarProjection:
        # message ∩ params clamp (reference .cpp:81-82); camera matrix
        # f = 1/res, c = n/2 (reference .cpp:88-89)
        res = (self.angle_max - self.angle_min) / self.num_beams
        return projector_op.PolarProjection.make(
            cols=self.num_beams,
            angle_min=self.angle_min,
            angle_max=self.angle_max,
            range_min=max(self.range_min, cfg.range_min),
            range_max=min(self.range_max, cfg.range_max),
            f=1.0 / res,
            c=self.num_beams / 2.0,
        )


@functools.partial(jax.jit, static_argnames=("proj", "cfg"))
def preprocess_scan(
    proj: projector_op.PolarProjection, cfg: PreprocessorConfig, ranges: Array
) -> Cloud:
    """ranges [num_beams] -> compacted PointNormal cloud in the sensor frame."""
    cloud = projector_op.unproject(proj, ranges)
    cloud = normals_op.compute_normals(
        cloud,
        normal_point_distance=cfg.normal_point_distance,
        normal_min_points=cfg.normal_min_points,
        window=cfg.normal_window,
    )
    if cfg.voxelize_resolution > 0:
        # reference voxelizes with coeffs (res, res, 1, 1): normals binned at
        # resolution 1 (raw_data_preprocessor_projective_2d.cpp:36-41)
        if cfg.voxelize_mode == "sequential":
            cloud = cloud_op.voxelize_sequential(
                cloud, cfg.voxelize_resolution, res_normal=1.0
            )
        else:
            cloud = cloud_op.voxelize(
                cloud, cfg.voxelize_resolution, res_normal=1.0
            )
    else:
        cloud = cloud_op.compact(cloud)
    return cloud


class ScanPreprocessor:
    """Host-side stateful adaptor mirroring the reference's setRawData/compute
    API: feed it laser messages, get masked clouds (sensor frame)."""

    def __init__(self, cfg: PreprocessorConfig = PreprocessorConfig()):
        self.cfg = cfg
        self._model: LaserModel | None = None
        self._proj: projector_op.PolarProjection | None = None
        # per-stage status surface (reference _status = Error/Ready/Successful,
        # raw_data_preprocessor_projective_2d.cpp:15-17); evaluated lazily so
        # the hot path pays no device sync
        self._last_output: Cloud | None = None
        self._error = False

    def set_model(self, model: LaserModel) -> None:
        if model != self._model:
            self._model = model
            self._proj = model.projection(self.cfg)

    @property
    def projection(self) -> projector_op.PolarProjection:
        assert self._proj is not None, "no laser model set"
        return self._proj

    @property
    def status(self):
        from ..utils.status import Status

        if self._error:
            return Status.ERROR
        if self._last_output is None:
            return Status.READY
        return Status.SUCCESS if int(self._last_output.count()) > 0 else Status.ERROR

    def compute(self, ranges: Array) -> Cloud:
        if self._proj is None:
            self._error = True
            raise RuntimeError("no laser model set")
        out = preprocess_scan(self._proj, self.cfg, jnp.asarray(ranges, jnp.float32))
        self._last_output = out
        self._error = False
        return out

    def process_message(self, msg) -> Cloud:
        """Accepts an io.messages.LaserMessage (duck-typed)."""
        self.set_model(
            LaserModel(
                num_beams=len(msg.ranges),
                angle_min=float(msg.angle_min),
                angle_max=float(msg.angle_max),
                range_min=float(msg.range_min),
                range_max=float(msg.range_max),
            )
        )
        return self.compute(msg.ranges)
