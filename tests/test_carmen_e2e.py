"""CARMEN ingest path end-to-end: synthetic dataset exported as a CARMEN log,
streamed through the full SLAM runner with exact-count assertions — the
reference's AIS-fixture test pattern (tests/test_measurement_adaptor.cpp
asserts exact adapted-cloud sizes on the first dataset scan;
tests/test_slam.cpp streams packs through a config-built pipeline)."""

import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.bench import suite as suite_mod
from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.io import carmen, native_loader, sources
from srrg2_laser_slam_2d_tpu.io.messages import LaserMessage, extract_message
from srrg2_laser_slam_2d_tpu.models import loop_closure as lc
from srrg2_laser_slam_2d_tpu.models import slam as slam_mod
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig, ScanPreprocessor
from srrg2_laser_slam_2d_tpu.models.runner import SlamRunner
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection


@pytest.fixture(scope="module")
def carmen_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("carmen")
    ds = synthetic.simulate(synthetic.SyntheticConfig(steps=12, num_beams=512))
    path = str(d / "synthetic.clf")
    synthetic.to_carmen(ds, path)
    return path, ds


def test_carmen_pack_loading(carmen_log):
    path, ds = carmen_log
    packs, gt = carmen.load_packs(path)
    assert len(packs) == len(ds.ranges)
    laser = extract_message(packs[0], LaserMessage)
    assert len(laser.ranges) == 512
    np.testing.assert_allclose(laser.angle_min, ds.config.angle_min, atol=1e-5)
    # GT column carries the (sensor) poses
    np.testing.assert_allclose(gt[0, 1:], ds.sensor_poses[0], atol=1e-5)


def test_first_scan_exact_count(carmen_log):
    """The reference's exact-count pattern: adaptor output size on scan 0 is
    deterministic and must match direct preprocessing of the raw ranges."""
    path, ds = carmen_log
    packs, _ = carmen.load_packs(path, max_packs=1)
    laser = extract_message(packs[0], LaserMessage)
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.01))
    cloud = pre.process_message(laser)
    direct = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.01))
    direct.set_model(
        __import__("srrg2_laser_slam_2d_tpu.models.preprocessor", fromlist=["LaserModel"]).LaserModel(
            num_beams=512, angle_min=ds.config.angle_min, angle_max=ds.config.angle_max,
            range_min=0.0, range_max=80.0,
        )
    )
    want = direct.compute(ds.ranges[0])
    assert int(cloud.count()) == int(want.count())
    assert int(cloud.count()) > 300


def test_native_loader_on_synthetic(carmen_log):
    path, ds = carmen_log
    out = native_loader.load_carmen_arrays(path)
    assert out["ranges"].shape == (len(ds.ranges), 512)
    np.testing.assert_allclose(out["laser_pose"], ds.sensor_poses, atol=1e-5)


def test_carmen_slam_end_to_end(carmen_log):
    path, ds = carmen_log
    packs, gt = carmen.load_packs(path)
    proj = PolarProjection.make(cols=512, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.1, range_max=30.0)
    runner = SlamRunner(
        slam_config=slam_mod.GraphSLAMConfig(
            local_map_distance=1.0,
            var_capacity=32,
            edge_capacity=64,
            tracker=tracker_mod.TrackerConfig(
                scene_capacity=2048, projection=proj,
                aligner=icp.AlignerConfig(max_iterations=8),
            ),
            validator=lc.ValidatorConfig(enabled=False),
            enable_loop_closure=False,
            enable_relocalizer=False,
        ),
        preprocessor_config=PreprocessorConfig(voxelize_resolution=0.02, normal_window=8),
        # the CARMEN scans embed the laser pose; odometry rides the same pack
        sensor_in_robot=np.asarray(ds.config.sensor_in_robot, np.float32),
    )
    n = runner.run(sources.ListSource(packs))
    assert n == len(packs)
    bench = suite_mod.BenchmarkSuite()
    bench.set_ground_truth(gt[:, 0], np.stack([p for p in ds.robot_poses]))
    for t, p, dur in runner.trajectory:
        bench.set_pose_estimate(p, t, dur)
    stats = bench.compute(align=False)
    assert stats["rmse_translation"] < 0.1, stats
    assert not bench.is_regression(suite_mod.SIMUL_THRESHOLDS, stats)
