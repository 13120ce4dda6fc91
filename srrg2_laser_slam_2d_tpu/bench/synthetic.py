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


# ---------------------------------------------------------------------------
# Killian-scale corridor world
# ---------------------------------------------------------------------------
# The reference's acceptance benchmark streams the MIT Killian Court CARMEN
# log (benchmarks/benchmark_carmen.cpp:15-65) — long indoor corridors with
# several large loops. That dataset is not obtainable here (no egress;
# BENCH_NOTES.md records the failed attempt), so this is the stand-in at the
# same structural scale: a corridor network with 3 nested rectangular loops,
# thousands of frames, in-place corner turns, noisy odometry and textured
# walls (periodic alcoves, without which a straight corridor is
# longitudinally unobservable to ICP — the same degeneracy the real Killian
# corridors have).


@dataclass(frozen=True)
class CorridorConfig:
    num_beams: int = 721
    angle_min: float = -np.pi / 2     # SICK-like 180 deg fov
    angle_max: float = np.pi / 2
    range_min: float = 0.1
    range_max: float = 20.0
    # world layout (meters)
    width: float = 56.0               # outer rectangle x extent
    height: float = 36.0              # outer rectangle y extent
    half_width: float = 1.0           # corridor half width
    wall_spacing: float = 0.05        # wall point sampling
    alcove_depth: float = 0.18        # periodic texture (door frames)
    alcove_period: float = 2.5
    alcove_len: float = 0.4
    # drive
    step: float = 0.15                # m per frame along corridors
    turn_step: float = 0.12           # rad per frame for in-place turns
    # noise
    range_noise: float = 0.01         # per-beam range sigma [m]
    odom_trans_noise: float = 0.008   # per-step odometry sigma [m]
    odom_rot_noise: float = 0.0015    # per-step odometry sigma [rad]
    seed: int = 0


def corridor_centerlines(cfg: CorridorConfig) -> list:
    """Corridor centerline segments: outer rectangle + one horizontal and one
    vertical crossing = 3 independent large loops."""
    w, h = cfg.width, cfg.height
    mid_y = h / 2
    mid_x = w / 2
    segs = [
        ((0.0, 0.0), (w, 0.0)),          # bottom
        ((w, 0.0), (w, h)),              # right
        ((w, h), (0.0, h)),              # top
        ((0.0, h), (0.0, 0.0)),          # left
        ((0.0, mid_y), (w, mid_y)),      # middle horizontal
        ((mid_x, 0.0), (mid_x, mid_y)),  # lower-middle vertical
    ]
    return [(np.asarray(a, np.float64), np.asarray(b, np.float64)) for a, b in segs]


def _seg_distance(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance of points [N,2] to segment ab."""
    d = b - a
    L2 = float(d @ d)
    t = np.clip(((p - a) @ d) / max(L2, 1e-12), 0.0, 1.0)
    proj = a + t[:, None] * d
    return np.linalg.norm(p - proj, axis=1)


def corridor_geometry(cfg: CorridorConfig):
    """Corridor wall geometry: (points Cloud, seg_a [S,2], seg_b [S,2]).

    Walls are densely sampled polylines with inward normals; periodic alcoves
    texture the walls and junction openings are carved where corridors cross.
    The micro-segments (consecutive kept samples) are the ray-cast targets —
    scans are TRUE per-beam ray casts, not point z-buffers, so every beam
    returns like a real rangefinder."""
    segs = corridor_centerlines(cfg)
    rng = np.random.default_rng(cfg.seed)
    pts, nrms, owner, chain = [], [], [], []
    chain_id = 0
    for si, (a, b) in enumerate(segs):
        d = b - a
        L = float(np.linalg.norm(d))
        u = d / L
        n = np.array([-u[1], u[0]])
        s = np.arange(0.0, L, cfg.wall_spacing)
        for side in (1.0, -1.0):
            # APERIODIC alcoves (random spacing/length/depth): a periodic
            # texture makes a corridor self-similar at the period, so a
            # drifted revisit aliases onto a shifted match that no validator
            # can tell from the truth — real corridors are irregular
            off = np.full_like(s, cfg.half_width)
            pos = rng.uniform(0.5, cfg.alcove_period)
            while pos < L - cfg.alcove_len:
                ln = rng.uniform(0.6, 1.6) * cfg.alcove_len
                depth = rng.uniform(0.7, 1.5) * cfg.alcove_depth
                off = np.where((s >= pos) & (s < pos + ln), cfg.half_width + depth, off)
                pos += ln + rng.uniform(0.5, 1.6) * cfg.alcove_period

            p = a[None, :] + s[:, None] * u[None, :] + (side * off)[:, None] * n[None, :]
            pts.append(p)
            nrms.append(np.tile(-side * n, (len(s), 1)))
            owner.append(np.full(len(s), si))
            chain.append(np.full(len(s), chain_id))
            chain_id += 1
    pts = np.concatenate(pts)
    nrms = np.concatenate(nrms)
    owner = np.concatenate(owner)
    chain = np.concatenate(chain)
    # carve junction openings: drop wall points that lie inside ANOTHER
    # corridor (distance to its centerline below the corridor half width)
    keep = np.ones(len(pts), bool)
    for si, (a, b) in enumerate(segs):
        inside = _seg_distance(pts, a, b) < cfg.half_width - 0.02
        keep &= ~(inside & (owner != si))
    cloud = cloud_op.from_numpy(pts[keep].astype(np.float32), nrms[keep].astype(np.float32))
    # micro-segments: consecutive kept samples on the same wall chain, close
    # enough to be a wall piece or an alcove jog (carved gaps break the chain)
    kp, kc = pts[keep], chain[keep]
    same = (kc[1:] == kc[:-1]) & (
        np.linalg.norm(kp[1:] - kp[:-1], axis=1) < 6.0 * cfg.wall_spacing
    )
    seg_a = kp[:-1][same].astype(np.float32)
    seg_b = kp[1:][same].astype(np.float32)
    return cloud, seg_a, seg_b


def corridor_world(cfg: CorridorConfig) -> Cloud:
    return corridor_geometry(cfg)[0]


def raycast_ranges(proj, poses: np.ndarray, seg_a: np.ndarray, seg_b: np.ndarray):
    """Per-beam ray casting against wall segments: ranges [T, cols].

    For each pose and beam direction d: the nearest positive intersection
    with any segment (classic cross-product parameterization), vectorized
    [beams, segments] per pose. NumPy on CPU (deterministic, no XLA compile
    cost — this is test-path code); one jitted lax.map on accelerators for
    the bulk thousand-frame generation."""
    import jax

    from ..ops import projector as projector_op

    poses = np.asarray(poses, np.float32)
    if jax.default_backend() != "cpu":
        return _raycast_jax(proj, poses, seg_a, seg_b)

    a = np.asarray(seg_a, np.float32)
    e = np.asarray(seg_b, np.float32) - a
    angles = np.asarray(projector_op.beam_angles(proj))
    out = np.zeros((len(poses), proj.cols), np.float32)
    for k, pose in enumerate(poses):
        o, th = pose[:2], pose[2]
        d = np.stack([np.cos(th + angles), np.sin(th + angles)], axis=-1)
        ao = a - o                                             # [S,2]
        dxe = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
        aoxe = ao[None, :, 0] * e[None, :, 1] - ao[None, :, 1] * e[None, :, 0]
        aoxd = ao[None, :, 0] * d[:, None, 1] - ao[None, :, 1] * d[:, None, 0]
        denom = np.where(np.abs(dxe) > 1e-12, dxe, 1e-12)
        t = aoxe / denom
        u = aoxd / denom
        ok = (np.abs(dxe) > 1e-12) & (t > proj.range_min) & (u >= 0.0) & (u <= 1.0)
        t = np.where(ok, t, np.inf)
        r = np.min(t, axis=1)
        out[k] = np.where(np.isfinite(r) & (r <= proj.range_max), r, 0.0)
    return out


def _raycast_jax(proj, poses, seg_a, seg_b):
    import jax
    import jax.numpy as jnp

    from ..ops import projector as projector_op

    a = jnp.asarray(seg_a)                      # [S, 2]
    e = jnp.asarray(seg_b) - a                  # [S, 2]
    angles = projector_op.beam_angles(proj)     # [B]

    def one(pose):
        o = pose[:2]
        th = pose[2]
        d = jnp.stack([jnp.cos(th + angles), jnp.sin(th + angles)], axis=-1)  # [B,2]
        ao = a[None, :, :] - o[None, None, :2]            # [1,S,2] broadcast
        # cross(d, e): [B,S]
        dxe = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
        aoxe = ao[..., 0] * e[None, :, 1] - ao[..., 1] * e[None, :, 0]
        aoxd = ao[..., 0] * d[:, None, 1] - ao[..., 1] * d[:, None, 0]
        denom = jnp.where(jnp.abs(dxe) > 1e-12, dxe, 1e-12)
        t = aoxe / denom
        u = aoxd / denom
        ok = (jnp.abs(dxe) > 1e-12) & (t > proj.range_min) & (u >= 0.0) & (u <= 1.0)
        t = jnp.where(ok, t, jnp.inf)
        r = jnp.min(t, axis=1)                             # [B]
        return jnp.where(jnp.isfinite(r) & (r <= proj.range_max), r, 0.0)

    return np.asarray(jax.lax.map(one, jnp.asarray(poses, jnp.float32)))


def corridor_waypoints(cfg: CorridorConfig) -> list:
    """Drive plan: three large loops, each returning over already-mapped
    corridor (the loop-closure opportunities), ~450 m total."""
    w, h = cfg.width, cfg.height
    m = cfg.half_width + 0.0  # drive on centerlines
    my, mx = h / 2, w / 2
    return [
        (2.0, 0.0), (w - 2.0, 0.0), (w, 2.0), (w, h - 2.0), (w - 2.0, h),
        (2.0, h), (0.0, h - 2.0), (0.0, 2.0), (2.0, 0.0),          # loop 1: outer
        (mx - 2.0, 0.0), (mx, 2.0), (mx, my - 2.0), (mx - 2.0, my),
        (2.0, my), (0.0, my - 2.0), (0.0, 2.0), (2.0, 0.0),        # loop 2: lower-left
        (w - 2.0, 0.0), (w, 2.0), (w, my - 2.0), (w - 2.0, my),
        (mx + 2.0, my), (mx, my - 2.0), (mx, 2.0), (mx - 2.0, 0.0),
        (2.0, 0.0),                                                 # loop 3: lower-right
    ]


def corridor_trajectory(cfg: CorridorConfig) -> np.ndarray:
    """GT robot poses: straight legs at cfg.step with in-place corner turns."""
    wps = [np.asarray(p, np.float64) for p in corridor_waypoints(cfg)]
    poses = []
    heading = None
    pos = wps[0]
    for nxt in wps[1:]:
        d = nxt - pos
        L = float(np.linalg.norm(d))
        if L < 1e-9:
            continue
        tgt = float(np.arctan2(d[1], d[0]))
        if heading is None:
            heading = tgt
        # in-place turn to the new heading
        dth = np.arctan2(np.sin(tgt - heading), np.cos(tgt - heading))
        n_turn = int(np.ceil(abs(dth) / cfg.turn_step))
        for k in range(n_turn):
            heading = heading + dth / max(n_turn, 1)
            poses.append([pos[0], pos[1], heading])
        heading = tgt
        # straight leg
        n_fwd = int(np.floor(L / cfg.step))
        u = d / L
        for k in range(1, n_fwd + 1):
            p = pos + u * (k * cfg.step)
            poses.append([p[0], p[1], heading])
        pos = pos + u * (n_fwd * cfg.step)
    out = np.asarray(poses, np.float64)
    out[:, 2] = np.arctan2(np.sin(out[:, 2]), np.cos(out[:, 2]))
    return out.astype(np.float32)


def simulate_corridors(
    cfg: CorridorConfig = CorridorConfig(), poses: np.ndarray | None = None
) -> SyntheticDataset:
    """Full Killian-scale dataset: corridor world + GT drive + per-beam
    ray-cast, range-noised scans. ``poses`` overrides the trajectory (tests
    use a slice)."""
    proj = projector_op.PolarProjection.make(
        cols=cfg.num_beams,
        angle_min=cfg.angle_min,
        angle_max=cfg.angle_max,
        range_min=cfg.range_min,
        range_max=cfg.range_max,
    )
    scene, seg_a, seg_b = corridor_geometry(cfg)
    gt = corridor_trajectory(cfg) if poses is None else np.asarray(poses, np.float32)
    rng = np.random.default_rng(cfg.seed + 1)

    ranges = raycast_ranges(proj, gt, seg_a, seg_b)
    hit = ranges > 0
    ranges = np.where(
        hit, ranges + rng.normal(scale=cfg.range_noise, size=ranges.shape), ranges
    ).astype(np.float32)

    synth_cfg = SyntheticConfig(
        num_beams=cfg.num_beams,
        angle_min=cfg.angle_min,
        angle_max=cfg.angle_max,
        range_min=cfg.range_min,
        range_max=cfg.range_max,
        steps=len(gt) - 1,
        seed=cfg.seed,
        sensor_in_robot=(0.0, 0.0, 0.0),
    )
    return SyntheticDataset(
        config=synth_cfg,
        scene=scene,
        robot_poses=gt,
        sensor_poses=gt.copy(),
        ranges=ranges,
        projection=proj,
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
