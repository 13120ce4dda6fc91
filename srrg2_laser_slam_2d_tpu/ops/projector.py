"""Polar projection ops — the TPU equivalents of srrg_pcl's
``PointNormal2fProjectorPolar`` / ``PointNormal2fUnprojectorPolar``.

Reference behavior (reconstructed from call sites):
- projector: given a camera pose C and a cloud in world coords, transform
  points by C^-1, compute (range, bearing), map bearing to a canvas column via
  the camera matrix (col = f * angle + c), and z-buffer per column keeping the
  closest point with its source index and transformed coordinates
  (registration/correspondence_finder_projective_2d.cpp:40-48,
  mapping/merger_projective_2d.cpp:19-25, apps/synthetic_scene_generator.cpp:85-103).
- unprojector: given a 1xN range row, emit points r*(cos a_i, sin a_i) with
  a_i derived from the camera matrix (sensor_processing/
  raw_data_preprocessor_projective_2d.cpp:24-31,88-105: f = 1/res, c = N/2).

TPU design: the per-point loop with an in-place z-buffer becomes two
scatter-min passes over a static [cols] canvas (first on depth, then on index
among depth-winners to reproduce the reference's first-wins tie-break), fully
vectorized over points and batchable with vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import geometry
from ..utils.cloud import Cloud

Array = jax.Array

_BIG = jnp.float32(3.0e38)


class PolarProjection(NamedTuple):
    """Projector intrinsics. ``f``/``c`` form the 1D polar camera matrix
    [f, c; 0, 0]; ``cols`` is the canvas width (number of beams)."""

    cols: int
    angle_min: float
    angle_max: float
    range_min: float
    range_max: float
    f: float  # angular focal: col = f * angle + c
    c: float

    @staticmethod
    def make(
        cols: int,
        angle_min: float,
        angle_max: float,
        range_min: float = 0.0,
        range_max: float = 1000.0,
        f: float | None = None,
        c: float | None = None,
    ) -> "PolarProjection":
        """Build intrinsics. Default camera matrix follows the reference's
        convention (apps/synthetic_scene_generator.cpp:66-69 and
        raw_data_preprocessor_projective_2d.cpp:88-89): f = 1/res with
        res = (angle_max-angle_min)/cols, c = cols/2."""
        if f is None:
            f = cols / (angle_max - angle_min)
        if c is None:
            c = cols / 2.0
        return PolarProjection(cols, angle_min, angle_max, range_min, range_max, f, c)


class Canvas(NamedTuple):
    """Result of a polar projection: per-column z-buffer.

    depth:  [cols] closest range per beam (+inf where empty)
    idx:    [cols] source point index in the projected cloud (-1 where empty)
    valid:  [cols] beam has a hit
    """

    depth: Array
    idx: Array
    valid: Array


def beam_angles(proj: PolarProjection) -> Array:
    """Beam bearing per column: angle_i = (i - c) / f (inverse camera matrix)."""
    i = jnp.arange(proj.cols, dtype=jnp.float32)
    return (i - proj.c) / proj.f


def project(proj: PolarProjection, camera_pose: Array, cloud: Cloud) -> tuple[Canvas, Cloud]:
    """Project ``cloud`` (world coords) onto the polar canvas seen from
    ``camera_pose`` (sensor-in-world pose vector).

    Returns the canvas and the cloud transformed into the sensor frame (the
    reference's per-cell ``transformed`` field, kept as a full cloud so
    downstream gathers stay vectorized).
    """
    inv = geometry.inverse(camera_pose)
    local = Cloud(
        xy=geometry.transform_points(inv, cloud.xy),
        normal=geometry.rotate_vectors(inv, cloud.normal),
        valid=cloud.valid,
    )
    canvas = project_local(proj, local)
    return canvas, local


# Backend switch for the z-buffer. "scatter" (the reference formulation) is
# best on CPU; on TPU non-unique scatter-min serializes, so "sort" (keyed
# sorting networks) or "pallas" (dense VMEM min kernel) win. None = auto.
ZBUFFER_BACKEND: str | None = None  # "scatter" | "sort" | "pallas" | None


def _zbuffer_backend() -> str:
    if ZBUFFER_BACKEND is not None:
        return ZBUFFER_BACKEND
    return "scatter" if jax.default_backend() == "cpu" else "sort"


def project_local(proj: PolarProjection, local: Cloud) -> Canvas:
    """Project a cloud already expressed in the sensor frame."""
    backend = _zbuffer_backend()
    if backend == "pallas":
        from . import pallas_projector

        return pallas_projector.project_local_pallas(proj, local.xy, local.valid)
    if backend == "sort":
        return project_local_sort(proj, local)
    return project_local_xla(proj, local)


def project_local_sort(proj: PolarProjection, local: Cloud) -> Canvas:
    """Sort-based z-buffer: O(N log N) instead of the O(N·B) dense compare or
    the serialized scatter-min. Points are keyed by (beam, quantized depth)
    and sorted once (TPU sorting networks, ~57us at 8K points); each beam's
    winner is its first sorted entry, scattered with unique indices.

    Depth quantization (2^21 steps over range_max) only affects winner
    selection between points closer than ~10 um — below f32 resolution at
    typical ranges; canvas depths are exact f32 gathers of the winner."""
    n = local.capacity
    x, y = local.xy[:, 0], local.xy[:, 1]
    depth = jnp.sqrt(x * x + y * y)
    angle = jnp.arctan2(y, x)
    col = jnp.floor(angle * proj.f + proj.c).astype(jnp.int32)
    ok = (
        local.valid
        & (col >= 0)
        & (col < proj.cols)
        & (depth >= proj.range_min)
        & (depth <= proj.range_max)
    )
    dq = jnp.clip(
        (depth * (float(2**21) / proj.range_max)).astype(jnp.int32), 0, 2**21 - 1
    )
    key = jnp.where(ok, col * (2**21) + dq, jnp.int32(2**31 - 1))
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=2)  # lexicographic: ties -> lowest idx
    col_s = key_s >> 21
    valid_s = key_s != 2**31 - 1
    first = jnp.concatenate([jnp.array([True]), key_s[1:] >> 21 != key_s[:-1] >> 21])
    winner = valid_s & first
    tgt = jnp.where(winner, col_s, proj.cols)
    ibuf = (
        jnp.full((proj.cols + 1,), -1, jnp.int32)
        .at[tgt]
        .set(idx_s, unique_indices=True, mode="drop")[: proj.cols]
    )
    dbuf = (
        jnp.full((proj.cols + 1,), _BIG, jnp.float32)
        .at[tgt]
        .set(depth[idx_s], unique_indices=True, mode="drop")[: proj.cols]
    )
    v = ibuf >= 0
    return Canvas(depth=jnp.where(v, dbuf, _BIG), idx=ibuf, valid=v)


def project_local_xla(proj: PolarProjection, local: Cloud) -> Canvas:
    """Scatter-min z-buffer (reference formulation; CPU-friendly)."""
    n = local.capacity
    x, y = local.xy[:, 0], local.xy[:, 1]
    depth = jnp.sqrt(x * x + y * y)
    angle = jnp.arctan2(y, x)
    col = jnp.floor(angle * proj.f + proj.c).astype(jnp.int32)
    ok = (
        local.valid
        & (col >= 0)
        & (col < proj.cols)
        & (depth >= proj.range_min)
        & (depth <= proj.range_max)
    )
    col_s = jnp.where(ok, col, proj.cols)  # invalid -> overflow bucket
    d_s = jnp.where(ok, depth, _BIG)
    # pass 1: min depth per column
    zbuf = jnp.full((proj.cols + 1,), _BIG, jnp.float32).at[col_s].min(d_s)[: proj.cols]
    # pass 2: among points hitting the min depth, keep the smallest source index
    # (the C++ loop keeps the first strictly-closer point: lowest index wins ties,
    #  correspondence_finder_projective_2d.cpp via projector's sequential z-test).
    hit = ok & (depth <= zbuf[jnp.clip(col, 0, proj.cols - 1)])
    idx_s = jnp.where(hit, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**31 - 1))
    col_h = jnp.where(hit, col, proj.cols)
    ibuf = (
        jnp.full((proj.cols + 1,), 2**31 - 1, jnp.int32).at[col_h].min(idx_s)[: proj.cols]
    )
    valid = zbuf < _BIG
    return Canvas(
        depth=jnp.where(valid, zbuf, _BIG),
        idx=jnp.where(valid, ibuf, -1),
        valid=valid,
    )


def ranges_from_canvas(canvas: Canvas, empty_value: float = 0.0) -> Array:
    """Canvas depths -> a LaserMessage-style range array (empty beams get
    ``empty_value``, the reference writes the raw canvas depth which downstream
    range gates discard; 0.0 is below any range_min so it is always dropped)."""
    return jnp.where(canvas.valid, canvas.depth, empty_value)


def unproject(proj: PolarProjection, ranges: Array) -> Cloud:
    """Ranges [cols] -> points in the sensor frame with validity mask.

    Valid iff range in (range_min, range_max) — the reference clamps the
    bounds from message ∩ params first (raw_data_preprocessor_projective_2d.cpp:81-82)
    then the unprojector drops out-of-range returns. Normals are zero; compute
    them with ops.normals afterwards.
    """
    ranges = jnp.asarray(ranges, jnp.float32)
    a = beam_angles(proj)
    xy = jnp.stack([ranges * jnp.cos(a), ranges * jnp.sin(a)], axis=-1)
    valid = (ranges > proj.range_min) & (ranges < proj.range_max) & jnp.isfinite(ranges)
    return Cloud(xy=xy, normal=jnp.zeros_like(xy), valid=valid)
