"""TUM trajectory export — equivalent of the reference's trajectory dump
(apps/generic_bench_app.cpp:106-118: ``timestamp x y z qx qy qz qw``)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils import geometry


def pose2d_to_tum_row(timestamp: float, pose: np.ndarray) -> str:
    v = np.asarray(geometry.t2tqxyzw(jnp.asarray(pose, jnp.float32)))
    fields = [timestamp] + v.tolist()
    return " ".join(f"{x:.6f}" for x in fields)


def write_tum(path: str, timestamps, poses) -> None:
    """poses: iterable of (x, y, theta)."""
    with open(path, "w") as f:
        for t, p in sorted(zip(timestamps, poses), key=lambda x: x[0]):
            f.write(pose2d_to_tum_row(float(t), np.asarray(p)) + "\n")


def read_tum(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps [N], poses2d [N, 3]) — quaternion yaw extracted."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 8 or parts[0].startswith("#"):
                continue
            t, x, y, _, qx, qy, qz, qw = (float(v) for v in parts[:8])
            yaw = np.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
            ts.append(t)
            poses.append([x, y, yaw])
    return np.asarray(ts), np.asarray(poses, np.float32)
