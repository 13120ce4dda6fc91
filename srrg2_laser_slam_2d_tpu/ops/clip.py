"""Scene clipping — TPU equivalents of ``SceneClipperProjective2D``
(mapping/scene_clipper_projective_2d.{h,cpp}) and ``SceneClipperBall2D``
(mapping/scene_clipper_ball_2d.{h,cpp}).

Projective clipper semantics (.cpp:11-67): project the full scene from
``robot_in_local_map * sensor_in_robot``, keep the z-buffer-visible cells
(points in sensor coords), optionally voxelize (res 0 in shipped configs),
then express the result in the robot frame via ``transformInPlace(sensor_in_robot)``.

TPU design: projection + gather by canvas index; output capacity = canvas
columns (one visible point per beam, by construction of the z-buffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import cloud as cloud_op
from ..utils import geometry
from ..utils.cloud import Cloud
from . import projector as projector_op
from .projector import PolarProjection

Array = jax.Array


def clip_projective(
    proj: PolarProjection,
    scene: Cloud,
    robot_in_local_map: Array,
    sensor_in_robot: Array,
    voxelize_resolution: float = 0.0,
) -> Cloud:
    """Extract the sensor-visible slice of ``scene`` (local-map frame),
    returned in the ROBOT frame. Output capacity == proj.cols."""
    sensor_in_lm = geometry.compose(robot_in_local_map, sensor_in_robot)
    canvas, local = projector_op.project(proj, sensor_in_lm, scene)
    idx = jnp.maximum(canvas.idx, 0)
    clipped_sensor = Cloud(
        xy=local.xy[idx],
        normal=local.normal[idx],
        valid=canvas.valid,
    )
    if voxelize_resolution > 0:
        # reference voxelizes with coeffs (res, res, .1, .1)
        # (scene_clipper_projective_2d.cpp:46-49)
        clipped_sensor = cloud_op.voxelize(
            clipped_sensor, voxelize_resolution, res_normal=0.1
        )
    return cloud_op.transform(clipped_sensor, sensor_in_robot)


def clip_ball(
    scene: Cloud,
    robot_in_local_map: Array,
    sensor_in_robot: Array,
    max_range: float = 10.0,
) -> Cloud:
    """Radial clip around the sensor origin, output in the robot frame.

    The reference version is dead/untested (scene_clipper_ball_2d.cpp:14
    asserts false); provided for API parity with working semantics.
    """
    sensor_in_lm = geometry.compose(robot_in_local_map, sensor_in_robot)
    kept = cloud_op.clip_ball(scene, sensor_in_lm[:2], max_range)
    # express in robot frame: transform by (robot_in_local_map)^-1
    return cloud_op.transform(kept, geometry.inverse(robot_in_local_map))
