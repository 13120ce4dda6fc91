"""IO layer + benchmark suite tests."""

import os

import numpy as np

from srrg2_laser_slam_2d_tpu.bench import suite as suite_mod
from srrg2_laser_slam_2d_tpu.io import carmen, logfile, sources, tum
from srrg2_laser_slam_2d_tpu.io.messages import (
    LaserMessage,
    MessagePack,
    OdometryMessage,
    TransformEvent,
    TransformEventsMessage,
    extract_message,
)


def test_jsonl_roundtrip(tmp_path):
    msgs = [
        LaserMessage(topic="/scan", seq=0, timestamp=0.1, angle_min=-1, angle_max=1,
                     angle_increment=0.02, range_min=0, range_max=10,
                     ranges=np.ones(100, np.float32)),
        OdometryMessage(topic="/odom", seq=1, timestamp=0.2, pose=np.array([1, 2, 0.3], np.float32)),
        TransformEventsMessage(topic="/tf", seq=2, timestamp=0.3, events=[
            TransformEvent(0.3, "laser", "base", np.array([0.2, 0.0, 0.1], np.float32))
        ]),
    ]
    path = str(tmp_path / "log.jsonl")
    logfile.write_jsonl(path, msgs)
    back = logfile.read_jsonl(path)
    assert len(back) == 3
    np.testing.assert_allclose(back[0].ranges, msgs[0].ranges)
    np.testing.assert_allclose(back[1].pose, msgs[1].pose)
    assert back[2].events[0].child_frame == "laser"


def test_sorted_source_reorders():
    msgs = [OdometryMessage(topic="/odom", seq=i, timestamp=t)
            for i, t in enumerate([0.0, 0.5, 0.3, 0.8, 0.6, 2.5])]
    src = sources.SortedSource(sources.ListSource(msgs), time_interval=1.0)
    out = [m.timestamp for m in src]
    assert out == sorted(out)
    assert len(out) == 6


def test_synchronized_source_builds_packs():
    msgs = []
    for k in range(3):
        t = k * 1.0
        msgs.append(LaserMessage(topic="/scan", timestamp=t, ranges=np.ones(4, np.float32)))
        msgs.append(OdometryMessage(topic="/odom", timestamp=t + 0.01))
    src = sources.SynchronizedSource(
        sources.ListSource(msgs), topics=["/scan", "/odom"], time_interval=0.1
    )
    packs = list(src)
    assert len(packs) == 3
    assert extract_message(packs[0], LaserMessage, "/scan") is not None
    assert extract_message(packs[0], OdometryMessage) is not None


def test_platform_transform_chain():
    p = sources.Platform()
    p.add(TransformEventsMessage(topic="/tf", events=[
        TransformEvent(0.0, "laser", "base", np.array([0.2, 0.0, 0.0], np.float32)),
        TransformEvent(0.0, "base", "world", np.array([1.0, 0.0, np.pi / 2], np.float32)),
    ]))
    tf = p.get_transform("laser", "world")
    np.testing.assert_allclose(tf, [1.0, 0.2, np.pi / 2], atol=1e-6)
    tf2 = p.get_transform("laser", "base")
    np.testing.assert_allclose(tf2, [0.2, 0, 0], atol=1e-6)


def test_carmen_parse(tmp_path):
    path = str(tmp_path / "log.clf")
    ranges = " ".join(["1.5"] * 10)
    with open(path, "w") as f:
        f.write("# comment\n")
        f.write(f"FLASER 10 {ranges} 1.0 2.0 0.5 1.1 2.1 0.6 100.5 host 100.5\n")
        f.write("ODOM 1.1 2.1 0.6 0 0 0 100.6 host 100.6\n")
    packs, gt = carmen.load_packs(path)
    assert len(packs) == 1
    laser = extract_message(packs[0], LaserMessage)
    assert laser.ranges.shape == (10,)
    np.testing.assert_allclose(gt[0], [100.5, 1.0, 2.0, 0.5], atol=1e-5)


def test_tum_roundtrip(tmp_path):
    path = str(tmp_path / "traj.tum")
    ts = [0.0, 1.0, 2.0]
    poses = [np.array([0, 0, 0.0]), np.array([1, 0, 0.5]), np.array([2, 1, -0.5])]
    tum.write_tum(path, ts, poses)
    t2, p2 = tum.read_tum(path)
    np.testing.assert_allclose(t2, ts, atol=1e-6)
    np.testing.assert_allclose(p2, np.stack(poses), atol=1e-5)


def test_benchmark_suite_regression_gate():
    s = suite_mod.BenchmarkSuite()
    t = np.arange(10, dtype=np.float64)
    gt = np.stack([t * 0.1, np.zeros(10), np.zeros(10)], axis=1).astype(np.float32)
    s.set_ground_truth(t, gt)
    for k in range(10):
        s.set_pose_estimate(gt[k] + np.array([0.01, 0, 0], np.float32), t[k])
    stats = s.compute(align=False)
    assert stats["rmse_translation"] < 0.02
    assert not s.is_regression(suite_mod.SIMUL_THRESHOLDS, stats)
    # gross corruption must trip the gate
    s2 = suite_mod.BenchmarkSuite()
    s2.set_ground_truth(t, gt)
    for k in range(10):
        s2.set_pose_estimate(gt[k] + np.array([5.0, 0, 0], np.float32), t[k])
    assert s2.is_regression(suite_mod.SIMUL_THRESHOLDS, s2.compute(align=False))


def test_alignment_removes_gauge():
    s = suite_mod.BenchmarkSuite()
    t = np.arange(20, dtype=np.float64)
    gt = np.stack([np.cos(t * 0.3), np.sin(t * 0.3), t * 0.0], axis=1).astype(np.float32)
    s.set_ground_truth(t, gt)
    # estimate = gt rigidly transformed (gauge offset)
    c, sn = np.cos(0.7), np.sin(0.7)
    R = np.array([[c, -sn], [sn, c]], np.float32)
    for k in range(20):
        p = np.zeros(3, np.float32)
        p[:2] = R @ gt[k, :2] + np.array([3.0, -2.0], np.float32)
        p[2] = gt[k, 2] + 0.7
        s.set_pose_estimate(p, t[k])
    stats = s.compute(align=True)
    assert stats["rmse_translation"] < 1e-3


def test_odom_subsampler():
    msgs = []
    x = 0.0
    for k in range(20):
        x += 0.05
        msgs.append(OdometryMessage(topic="/odom", timestamp=0.1 * k,
                                    pose=np.array([x, 0, 0], np.float32)))
    src = sources.OdomSubsamplerSource(
        sources.ListSource(msgs), translation_step=0.2, rotation_step=0.5
    )
    out = list(src)
    # first passes, then one every 0.2 m of accumulated motion
    assert 4 <= len(out) <= 6, len(out)
    ds = np.diff([m.pose[0] for m in out])
    assert np.all(ds >= 0.2 - 1e-5)


def test_odom_subsampler_rotation_only():
    # translation_step=0, rotation_step>0: only accumulated-rotation gates
    # (reference MessageOdomSubsamplerSource semantics, config :383-479)
    msgs = []
    th = 0.0
    for k in range(20):
        th += 0.1
        msgs.append(OdometryMessage(topic="/odom", timestamp=0.1 * k,
                                    pose=np.array([0, 0, th], np.float32)))
    src = sources.OdomSubsamplerSource(
        sources.ListSource(msgs), translation_step=0.0, rotation_step=0.3
    )
    out = list(src)
    assert 6 <= len(out) <= 8, len(out)
    dth = np.diff([m.pose[2] for m in out])
    assert np.all(dth >= 0.3 - 1e-5)
    # both steps disabled -> pure passthrough
    src2 = sources.OdomSubsamplerSource(sources.ListSource(msgs))
    assert len(list(src2)) == len(msgs)


def test_platform_source_collects_tf():
    msgs = [
        TransformEventsMessage(topic="/tf", timestamp=0.0, events=[
            TransformEvent(0.0, "laser", "base", np.array([0.1, 0, 0], np.float32))
        ]),
        OdometryMessage(topic="/odom", timestamp=0.1),
    ]
    src = sources.PlatformSource(sources.ListSource(msgs))
    out = list(src)
    assert len(out) == 2
    tf = src.platform.get_transform("laser", "base")
    np.testing.assert_allclose(tf, [0.1, 0, 0], atol=1e-6)
