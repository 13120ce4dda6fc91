"""Synthetic dataset writer — port of apps/synthetic_scene_generator.cpp
(SURVEY.md §3.5): deterministic circle+corner world, simulated polar laser,
seeded random-walk trajectory; writes a JSONL message log (laser + /tf + odom)
plus a ground-truth TUM file.

Usage: python -m srrg2_laser_slam_2d_tpu.apps.synthetic_scene_generator \
           -m laser_messages.jsonl [--gt gt.tum] [--steps 100]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..bench import synthetic
from ..io import logfile, tum
from ..io.messages import (
    LaserMessage,
    OdometryMessage,
    PointCloud2Message,
    TransformEvent,
    TransformEventsMessage,
)


def noisy_odometry(gt: np.ndarray, trans_noise: float, rot_noise: float, seed: int):
    """Integrate noisy relative motions: a realistic odometry stream whose
    drift grows with path length (GT stays separate for the TUM file)."""
    rng = np.random.default_rng(seed)
    odom = [gt[0].astype(np.float32).copy()]
    for t in range(1, len(gt)):
        c, s = np.cos(gt[t - 1][2]), np.sin(gt[t - 1][2])
        Rm = np.array([[c, s], [-s, c]], np.float32)
        rel = np.concatenate(
            [Rm @ (gt[t][:2] - gt[t - 1][:2]),
             [np.arctan2(np.sin(gt[t][2] - gt[t - 1][2]),
                         np.cos(gt[t][2] - gt[t - 1][2]))]]
        )
        rel[:2] += rng.normal(scale=trans_noise, size=2)
        rel[2] += rng.normal(scale=rot_noise)
        c, s = np.cos(odom[-1][2]), np.sin(odom[-1][2])
        R = np.array([[c, -s], [s, c]], np.float32)
        odom.append(
            np.concatenate(
                [odom[-1][:2] + R @ rel[:2], [odom[-1][2] + rel[2]]]
            ).astype(np.float32)
        )
    return np.stack(odom)


def dataset_to_messages(ds: synthetic.SyntheticDataset, odom_poses=None):
    cfg = ds.config
    odometry = ds.robot_poses if odom_poses is None else odom_poses
    msgs = []
    seq = 0
    timestamp = 0.0
    timestep = 0.001
    # initial scene cloud message (reference :105-115)
    msgs.append(
        PointCloud2Message(
            topic="/point_cloud",
            frame_id="world",
            seq=seq,
            timestamp=timestamp,
            points=np.asarray(ds.scene.xy)[np.asarray(ds.scene.valid)],
        )
    )
    seq += 1
    timestamp += timestep
    for t in range(len(ds.ranges)):
        msgs.append(
            TransformEventsMessage(
                topic="/tf",
                seq=seq,
                timestamp=timestamp,
                events=[
                    TransformEvent(
                        timestamp=timestamp,
                        child_frame="scan",
                        parent_frame="base_frame",
                        pose=np.asarray(cfg.sensor_in_robot, np.float32),
                    )
                ],
            )
        )
        seq += 1
        timestamp += timestep
        msgs.append(
            LaserMessage(
                topic="/scan",
                frame_id="scan",
                seq=seq,
                timestamp=timestamp,
                angle_min=cfg.angle_min,
                angle_max=cfg.angle_max,
                angle_increment=(cfg.angle_max - cfg.angle_min) / cfg.num_beams,
                range_min=cfg.range_min,
                range_max=cfg.range_max,
                ranges=ds.ranges[t],
            )
        )
        seq += 1
        timestamp += timestep
        msgs.append(
            OdometryMessage(
                topic="/odom",
                frame_id="odom",
                seq=seq,
                timestamp=timestamp,
                child_frame="base_frame",
                pose=odometry[t],
            )
        )
        seq += 1
        timestamp += timestep
    return msgs


def dual_dataset_to_messages(
    ds_front: synthetic.SyntheticDataset,
    ds_rear: synthetic.SyntheticDataset,
    topics=("/scan_0", "/scan_1"),
    frames=("laser_frame_0", "laser_frame_1"),
    odom_noise: float = 0.0,
    occlude: tuple | None = None,   # (cue_index, start_step, end_step)
    seed: int = 0,
):
    """Dual-rangefinder message log — the MULTI configuration's data shape
    (configurations/stage_segway_double_config_MULTI.json: two laser topics
    with their own TF frames). Both datasets must share the robot trajectory
    (same steps/seed/drift; only ``sensor_in_robot`` differs).

    ``odom_noise`` integrates noisy odometry increments (GT stays in the
    datasets); ``occlude`` blanks one laser's returns over a step interval
    (a fully blocked sensor) — the scenario where the second cue must carry
    the tracking."""
    rng = np.random.default_rng(seed)
    assert len(ds_front.ranges) == len(ds_rear.ranges)
    n_steps = len(ds_front.ranges)
    gt = ds_front.robot_poses
    odom = [gt[0].copy()]
    for t in range(1, n_steps):
        c, s = np.cos(gt[t - 1][2]), np.sin(gt[t - 1][2])
        Rm = np.array([[c, s], [-s, c]], np.float32)
        rel = np.concatenate([Rm @ (gt[t][:2] - gt[t - 1][:2]), [gt[t][2] - gt[t - 1][2]]])
        rel = rel + rng.normal(scale=odom_noise, size=3).astype(np.float32)
        c, s = np.cos(odom[-1][2]), np.sin(odom[-1][2])
        R = np.array([[c, -s], [s, c]], np.float32)
        odom.append(
            np.concatenate([odom[-1][:2] + R @ rel[:2], [odom[-1][2] + rel[2]]]).astype(
                np.float32
            )
        )

    msgs = []
    seq = 0
    timestamp = 0.0
    timestep = 0.001
    datasets = (ds_front, ds_rear)
    for t in range(n_steps):
        events = [
            TransformEvent(
                timestamp=timestamp,
                child_frame=frames[c],
                parent_frame="base_frame",
                pose=np.asarray(datasets[c].config.sensor_in_robot, np.float32),
            )
            for c in range(2)
        ]
        msgs.append(
            TransformEventsMessage(topic="/tf", seq=seq, timestamp=timestamp, events=events)
        )
        seq += 1
        timestamp += timestep
        for c in range(2):
            cfg = datasets[c].config
            ranges = datasets[c].ranges[t]
            if occlude is not None and occlude[0] == c and occlude[1] <= t < occlude[2]:
                ranges = np.full_like(ranges, 2.0 * cfg.range_max)
            msgs.append(
                LaserMessage(
                    topic=topics[c],
                    frame_id=frames[c],
                    seq=seq,
                    timestamp=timestamp,
                    angle_min=cfg.angle_min,
                    angle_max=cfg.angle_max,
                    angle_increment=(cfg.angle_max - cfg.angle_min) / cfg.num_beams,
                    range_min=cfg.range_min,
                    range_max=cfg.range_max,
                    ranges=ranges,
                )
            )
            seq += 1
            timestamp += timestep
        msgs.append(
            OdometryMessage(
                topic="/odom",
                frame_id="odom",
                seq=seq,
                timestamp=timestamp,
                child_frame="base_frame",
                pose=odom[t],
            )
        )
        seq += 1
        timestamp += timestep
    return msgs


def main(argv=None) -> None:
    from ..utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--message", default="laser_messages.jsonl")
    ap.add_argument("--gt", default=None, help="ground-truth TUM output")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--beams", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--drift", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    ap.add_argument(
        "--world", choices=["random", "corridors"], default="random",
        help="'corridors' = the Killian-scale 3-loop corridor benchmark world",
    )
    ap.add_argument("--odom-noise", type=float, default=None,
                    help="integrated odometry noise sigma per step [m]")
    args = ap.parse_args(argv)

    if args.world == "corridors":
        ccfg = synthetic.CorridorConfig(num_beams=args.beams, seed=args.seed)
        ds = synthetic.simulate_corridors(ccfg)
        trans_noise = (
            args.odom_noise if args.odom_noise is not None else ccfg.odom_trans_noise
        )
        odom = noisy_odometry(
            ds.robot_poses, trans_noise, ccfg.odom_rot_noise, args.seed + 7
        )
    else:
        ds = synthetic.simulate(
            synthetic.SyntheticConfig(
                steps=args.steps, num_beams=args.beams, seed=args.seed,
                drift=tuple(args.drift),
            )
        )
        odom = None
        if args.odom_noise:
            odom = noisy_odometry(ds.robot_poses, args.odom_noise,
                                  args.odom_noise / 4, args.seed + 7)
    logfile.write_jsonl(args.message, dataset_to_messages(ds, odom_poses=odom))
    print(f"wrote {args.message} ({len(ds.ranges)} scans)")
    if args.gt:
        # laser timestamps: initial cloud at 0, then (tf, laser, odom) per step
        ts = [0.002 + 0.003 * t for t in range(len(ds.ranges))]
        tum.write_tum(args.gt, ts, ds.robot_poses)
        print(f"wrote {args.gt}")


if __name__ == "__main__":
    main()
