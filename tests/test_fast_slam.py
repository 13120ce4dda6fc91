"""Graph SLAM with the fused-frame fast tracker (use_fast_tracker=True):
same topology, loop closures and accuracy as the standard tracker path."""

import dataclasses

import numpy as np

from srrg2_laser_slam_2d_tpu.bench import synthetic
from tests.test_slam import make_pipeline


def test_fast_slam_topology_straight_line():
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=20, num_beams=512, max_variance=0.0, drift=(0.11, 0.0, 0.0)
        )
    )
    slam, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    cfg = dataclasses.replace(slam.cfg, use_fast_tracker=True)
    from srrg2_laser_slam_2d_tpu.models import slam as slam_mod

    fast = slam_mod.GraphSLAM2D(
        cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
    )
    for k in range(len(ds.ranges)):
        fast.process(pre.compute(ds.ranges[k]), ds.robot_poses[k])
    # same deterministic topology as the standard path
    # (tests/test_slam.py::test_graph_topology_straight_line)
    assert fast.num_variables() == 5, fast.num_variables()
    assert fast.num_factors() == 4, fast.num_factors()
    err = np.abs(fast.robot_in_world() - ds.robot_poses[-1])
    assert err[:2].max() < 0.08, err
    assert err[2] < 0.05, err


def test_fast_slam_loop_closure_and_relocalization():
    """Fast tracker parity with the standard path on a closed loop with
    relocalization: same graph topology and end-pose error (the absolute
    error on this noisy 44-step run with 23 relocalization jumps is ~0.5 m
    for BOTH paths — the parity, not the absolute value, is the check)."""
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=44, num_beams=512, max_variance=0.02,
            drift=(0.15, 0.0, 2 * np.pi / 40), seed=7,
        )
    )
    from srrg2_laser_slam_2d_tpu.models import slam as slam_mod

    results = {}
    # (fast, canvas): canvas=False is the bit-identical parity-oracle mode;
    # canvas=True is the production fast layout (trajectory-equivalent, so
    # the split boundaries may shift by one frame — topology within 1)
    for fast, canvas in ((False, False), (True, False), (True, True)):
        slam, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=True)
        cfg = dataclasses.replace(
            slam.cfg, use_fast_tracker=fast, enable_relocalizer=True,
            fast_canvas_meas=canvas,
        )
        s = slam_mod.GraphSLAM2D(
            cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
        )
        for k in range(len(ds.ranges)):
            s.process(pre.compute(ds.ranges[k]), ds.robot_poses[k])
        err = np.abs(s.robot_in_world() - ds.robot_poses[-1])
        err[2] = abs(np.arctan2(np.sin(err[2]), np.cos(err[2])))
        results[(fast, canvas)] = (
            s.num_variables(), s.num_closures, s.relocalizations,
            float(np.linalg.norm(err[:2])),
        )

    ref, fst = results[(False, False)], results[(True, False)]
    assert fst[1] >= 1, "no loop closures with the fast tracker"
    assert fst[2] >= 1, "no relocalization with the fast tracker"
    assert fst[0] == ref[0], (ref, fst)          # same topology
    assert abs(fst[1] - ref[1]) <= 0.2 * ref[1]  # same closure activity
    assert fst[3] <= ref[3] + 0.15, (ref, fst)   # no worse end-pose error

    cnv = results[(True, True)]
    assert cnv[1] >= 1 and cnv[2] >= 1
    assert abs(cnv[0] - ref[0]) <= 1, (ref, cnv)   # topology within one split
    assert abs(cnv[1] - ref[1]) <= 0.2 * ref[1] + 1
    assert cnv[3] <= ref[3] + 0.15, (ref, cnv)


def test_fast_slam_checkpoint_roundtrip(tmp_path):
    """checkpoint.save/load must handle the fast tracker's FastState (the
    r4 corridor acceptance run crashed on save: FastState has no
    robot_in_local_map). Mirror of test_aux.test_checkpoint_roundtrip on
    the use_fast_tracker path: save mid-run, restore into a fresh
    instance, continue both, identical results."""
    from srrg2_laser_slam_2d_tpu.models import slam as slam_mod
    from srrg2_laser_slam_2d_tpu.utils import checkpoint

    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=12, num_beams=512, max_variance=0.0,
                                  drift=(0.11, 0.0, 0.0))
    )
    slam, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    cfg = dataclasses.replace(slam.cfg, use_fast_tracker=True)
    sensor = np.array(ds.config.sensor_in_robot, np.float32)
    fast = slam_mod.GraphSLAM2D(cfg, sensor_in_robot=sensor)
    clouds = [pre.compute(r) for r in ds.ranges]
    for k in range(8):
        fast.process(clouds[k], ds.robot_poses[k])

    path = str(tmp_path / "fast_ckpt.npz")
    checkpoint.save(path, fast)

    fast2 = slam_mod.GraphSLAM2D(cfg, sensor_in_robot=sensor)
    checkpoint.load(path, fast2)
    assert fast2.n_maps == fast.n_maps
    assert fast2.current_map == fast.current_map
    np.testing.assert_allclose(
        np.asarray(fast2.graph.poses), np.asarray(fast.graph.poses)
    )
    for k in range(8, 13):
        fast.process(clouds[k], ds.robot_poses[k])
        fast2.process(clouds[k], ds.robot_poses[k])
    np.testing.assert_allclose(fast.robot_in_world(), fast2.robot_in_world(),
                               atol=1e-6)
    assert fast.n_maps == fast2.n_maps
