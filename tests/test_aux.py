"""Aux subsystem tests: profiling, checkpoint/resume."""

import numpy as np

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.utils import checkpoint, profiling


def test_profiler_records_when_enabled():
    profiling.reset()
    profiling.enable_logging = True
    with profiling.timed("stage_a"):
        x = sum(range(1000))
    profiling.enable_logging = False
    with profiling.timed("stage_b"):
        pass  # not recorded
    rep = profiling.report()
    assert "stage_a" in rep and rep["stage_a"]["count"] == 1
    assert "stage_b" not in rep
    del x


def test_tic_toc():
    profiling.tic()
    dt = profiling.toc()
    assert 0 <= dt < 1.0


def test_checkpoint_roundtrip(tmp_path):
    # build a small SLAM run, checkpoint it, restore into a fresh instance,
    # verify continued processing gives identical results
    from test_slam import make_pipeline

    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=12, num_beams=512, max_variance=0.0,
                                  drift=(0.11, 0.0, 0.0))
    )
    slam, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    clouds = [pre.compute(r) for r in ds.ranges]
    for k in range(8):
        slam.process(clouds[k], ds.robot_poses[k])

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, slam)

    slam2, _ = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    checkpoint.load(path, slam2)
    assert slam2.n_maps == slam.n_maps
    assert slam2.current_map == slam.current_map
    np.testing.assert_allclose(
        np.asarray(slam2.graph.poses), np.asarray(slam.graph.poses)
    )

    # continue both: trajectories must stay identical
    for k in range(8, 13):
        slam.process(clouds[k], ds.robot_poses[k])
        slam2.process(clouds[k], ds.robot_poses[k])
    np.testing.assert_allclose(slam.robot_in_world(), slam2.robot_in_world(), atol=1e-6)
    assert slam.n_maps == slam2.n_maps
