"""SE(2) geometry, TPU-first (pure jax.numpy, static shapes, batched by construction).

Re-creates the geometry surface the reference pulls from ``srrg2_core``:
``geometry2d::v2t/t2v`` (srrg2_laser_slam_2d/apps/generic_bench_app.cpp:93-95),
``geometry3d::get3dFrom2dPose/t2tqxyzw`` (apps/synthetic_scene_generator.cpp:49,
apps/generic_bench_app.cpp:95) — redesigned as functional ops over ``[..., 3]``
pose vectors ``(x, y, theta)`` instead of Eigen ``Isometry2f`` objects, so every
function maps cleanly onto vmap/jit and the VPU.

A pose vector v = (x, y, theta) corresponds to the isometry
    T = [[cos t, -sin t, x],
         [sin t,  cos t, y],
         [0,      0,     1]].
All ops broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def wrap_angle(theta: Array) -> Array:
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def v2t(v: Array) -> Array:
    """Pose vector [..., 3] -> homogeneous matrix [..., 3, 3] (geometry2d::v2t)."""
    x, y, t = v[..., 0], v[..., 1], v[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, x], axis=-1),
        jnp.stack([s, c, y], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def t2v(T: Array) -> Array:
    """Homogeneous matrix [..., 3, 3] -> pose vector [..., 3] (geometry2d::t2v)."""
    x = T[..., 0, 2]
    y = T[..., 1, 2]
    t = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.stack([x, y, t], axis=-1)


def compose(a: Array, b: Array) -> Array:
    """Compose pose vectors: returns vector of T(a) @ T(b)."""
    xa, ya, ta = a[..., 0], a[..., 1], a[..., 2]
    xb, yb, tb = b[..., 0], b[..., 1], b[..., 2]
    c, s = jnp.cos(ta), jnp.sin(ta)
    x = xa + c * xb - s * yb
    y = ya + s * xb + c * yb
    t = wrap_angle(ta + tb)
    return jnp.stack([x, y, t], axis=-1)


def inverse(a: Array) -> Array:
    """Inverse pose vector: vector of T(a)^-1."""
    x, y, t = a[..., 0], a[..., 1], a[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    xi = -(c * x + s * y)
    yi = -(-s * x + c * y)
    return jnp.stack([xi, yi, -t], axis=-1)


def relative(a: Array, b: Array) -> Array:
    """T(a)^-1 @ T(b) as a pose vector (the 'b seen from a' transform)."""
    return compose(inverse(a), b)


def rot(theta: Array) -> Array:
    """Rotation matrix [..., 2, 2] from angle [...]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def transform_points(pose: Array, pts: Array) -> Array:
    """Apply pose [..., 3] to points [..., N, 2] -> [..., N, 2].

    Rigid transform: R(theta) p + t. Equivalent of
    ``PointNormal2fVectorCloud::transformInPlace<Isometry>`` coordinate part
    (reference: mapping/merger_projective_2d.cpp:23).

    Implemented elementwise (VPU) rather than as a [N,2]@[2,2] matmul: tiny
    matmuls waste the MXU and on TPU default-precision matmuls drop to
    bfloat16, which is not acceptable for pose math.
    """
    c = jnp.cos(pose[..., 2])[..., None]
    s = jnp.sin(pose[..., 2])[..., None]
    x, y = pts[..., 0], pts[..., 1]
    xo = c * x - s * y + pose[..., 0, None]
    yo = s * x + c * y + pose[..., 1, None]
    return jnp.stack([xo, yo], axis=-1)


def rotate_vectors(pose: Array, vecs: Array) -> Array:
    """Apply only the rotation of pose [..., 3] to vectors [..., N, 2]."""
    c = jnp.cos(pose[..., 2])[..., None]
    s = jnp.sin(pose[..., 2])[..., None]
    x, y = vecs[..., 0], vecs[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def exp_se2(v: Array) -> Array:
    """SE(2) exponential map from twist (vx, vy, omega) to pose vector.

    For the GN update we follow the reference's pre-multiply convention
    (octave/solver/nicp.m:96-99: ``T = v2t(dx) * T`` — with v2t the direct
    pose-vector mapping, i.e. the increment is treated as a small pose, not a
    true exponential). We keep the same small-increment convention.
    """
    return v


def get3d_from_2d_pose(v: Array) -> Array:
    """Pose vector (x, y, theta) -> 4x4 3D isometry (geometry3d::get3dFrom2dPose)."""
    x, y, t = v[..., 0], v[..., 1], v[..., 2]
    c, s = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, zero, x], axis=-1),
        jnp.stack([s, c, zero, y], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def t2tqxyzw(v: Array) -> Array:
    """Pose vector -> (x, y, z, qx, qy, qz, qw) (geometry3d::t2tqxyzw for a 2D pose).

    Used by the TUM trajectory export (apps/generic_bench_app.cpp:95-97).
    """
    x, y, t = v[..., 0], v[..., 1], v[..., 2]
    half = 0.5 * t
    zero = jnp.zeros_like(x)
    return jnp.stack([x, y, zero, zero, zero, jnp.sin(half), jnp.cos(half)], axis=-1)
