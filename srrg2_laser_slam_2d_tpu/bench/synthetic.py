"""Deterministic synthetic dataset generation — TPU port of
``apps/synthetic_scene_generator.cpp`` (SURVEY.md §3.5).

World: a circle (r=3.5, 2048 pts) plus an L-corner (1024 pts) placed at pose
(2, 0, pi/4) (reference :38-55). A simulated polar laser (1024 beams over
±0.4π, reference :60-82) scans the world from a seeded random-walk trajectory
(100 steps, ±0.05 on x/y/theta, reference :167-237). Output is an in-memory
message log (and optionally JSONL via io.logfile) instead of a BOSS bag.

This is the generator for ground-truth-exact registration and tracking tests:
every scan comes with its exact sensor pose.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops import projector as projector_op
from ..utils import cloud as cloud_op
from ..utils.cloud import Cloud


@dataclass(frozen=True)
class SyntheticConfig:
    num_beams: int = 1024
    angle_min: float = -np.pi * 0.4
    angle_max: float = np.pi * 0.4
    range_min: float = 0.01
    range_max: float = 1000.0
    circle_radius: float = 3.5
    circle_points: int = 2048
    corner_points: int = 1024
    steps: int = 100
    max_variance: float = 0.1  # reference :169: motion ∈ ±max_variance/2
    drift: tuple = (0.0, 0.0, 0.0)  # deterministic per-step motion added to the
    # random walk — lets tests drive trajectories (straight lines, loops) with GT
    seed: int = 0
    sensor_in_robot: tuple = (0.2, 0.2, 0.1)  # reference :77


@dataclass
class SyntheticDataset:
    config: SyntheticConfig
    scene: Cloud                      # world point cloud
    robot_poses: np.ndarray           # [T, 3] robot-in-world (GT)
    sensor_poses: np.ndarray          # [T, 3] sensor-in-world (GT)
    ranges: np.ndarray                # [T, num_beams]
    projection: projector_op.PolarProjection = field(default=None)


def make_scene(cfg: SyntheticConfig) -> Cloud:
    """Circle + corner world (reference createCircle/createCorner :244-282)."""
    a = np.arange(cfg.circle_points) * (2 * np.pi / cfg.circle_points)
    circle = np.stack(
        [cfg.circle_radius * np.cos(a), cfg.circle_radius * np.sin(a)], axis=1
    )
    # corner: two straight segments of lengths 2 and 3 from the origin
    l0, l1 = 2.0, 3.0
    n = cfg.corner_points
    step = (l0 + l1) / n
    n0 = int(l0 / step)
    seg0 = np.stack([step * np.arange(n0), np.zeros(n0)], axis=1)
    n1 = n - n0
    seg1 = np.stack([np.zeros(n1 - 1), -step * np.arange(1, n1)], axis=1)
    corner = np.concatenate([seg0, seg1], axis=0)
    # corner placed at (2, 0, pi/4) (reference :49-51)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = np.array([[c, -s], [s, c]])
    corner = corner @ R.T + np.array([2.0, 0.0])
    pts = np.concatenate([circle, corner], axis=0).astype(np.float32)
    return cloud_op.from_numpy(pts)


def _compose(a, b):
    ca, sa = np.cos(a[2]), np.sin(a[2])
    return np.array(
        [
            a[0] + ca * b[0] - sa * b[1],
            a[1] + sa * b[0] + ca * b[1],
            np.arctan2(np.sin(a[2] + b[2]), np.cos(a[2] + b[2])),
        ]
    )


def to_carmen(ds: SyntheticDataset, path: str) -> None:
    """Write the dataset as a CARMEN log (ROBOTLASER1 lines, which carry the
    laser geometry) — the format family of the reference's AIS benchmark
    fixtures (tests/fixtures.hpp): lets the CARMEN ingest path be
    integration-tested without external data."""
    cfg = ds.config
    fov = cfg.angle_max - cfg.angle_min
    res = fov / cfg.num_beams
    with open(path, "w") as f:
        f.write("# synthetic CARMEN log (tpu-laser-slam-2d)\n")
        for t in range(len(ds.ranges)):
            n = cfg.num_beams
            rs = " ".join(f"{r:.4f}" for r in ds.ranges[t])
            lp = ds.sensor_poses[t]
            op = ds.robot_poses[t]
            ts = 0.1 * t
            f.write(
                f"ROBOTLASER1 0 {cfg.angle_min:.6f} {fov:.6f} {res:.6f} "
                f"{min(cfg.range_max, 80.0):.2f} 0.01 0 {n} {rs} 0 "
                f"{lp[0]:.6f} {lp[1]:.6f} {lp[2]:.6f} "
                f"{op[0]:.6f} {op[1]:.6f} {op[2]:.6f} "
                f"0 0 0 0 0 {ts:.4f} synth {ts:.4f}\n"
            )


def simulate(cfg: SyntheticConfig = SyntheticConfig()) -> SyntheticDataset:
    """Generate the full dataset: GT trajectory + simulated range scans."""
    proj = projector_op.PolarProjection.make(
        cols=cfg.num_beams,
        angle_min=cfg.angle_min,
        angle_max=cfg.angle_max,
        range_min=cfg.range_min,
        range_max=cfg.range_max,
    )
    scene = make_scene(cfg)
    rng = np.random.default_rng(cfg.seed)
    sensor_in_robot = np.array(cfg.sensor_in_robot)

    robot = np.zeros(3)
    robot_poses, sensor_poses = [], []
    import jax
    import jax.numpy as jnp

    for step in range(cfg.steps + 1):
        if step > 0:
            motion = rng.uniform(-0.5, 0.5, size=3) * cfg.max_variance + np.asarray(
                cfg.drift
            )
            robot = _compose(robot, motion)
        sensor = _compose(robot, sensor_in_robot)
        robot_poses.append(robot.copy())
        sensor_poses.append(sensor)

    # simulate every scan in one vmapped device program (the per-step loop
    # would pay a dispatch + possible compile per pose)
    @jax.jit
    def scan_all(poses):
        def one(pose):
            canvas, _ = projector_op.project(proj, pose, scene)
            return projector_op.ranges_from_canvas(canvas)

        return jax.vmap(one)(poses)

    all_ranges = np.asarray(
        scan_all(jnp.asarray(np.stack(sensor_poses), jnp.float32))
    )

    return SyntheticDataset(
        config=cfg,
        scene=scene,
        robot_poses=np.stack(robot_poses).astype(np.float32),
        sensor_poses=np.stack(sensor_poses).astype(np.float32),
        ranges=all_ranges.astype(np.float32),
        projection=proj,
    )
