"""Chunk-batched SLAM loop (models/chunked_slam.py): the round-5 device-speed
product path. Parity with the per-frame fast-tracker SLAM on topology,
trajectory and loop closing — the in-kernel split (FrameSpec.split_distance)
must reproduce models/slam.py's host-side splitting criterion."""

import dataclasses

import numpy as np

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models import chunked_slam as cs
from srrg2_laser_slam_2d_tpu.models import slam as slam_mod
from tests.test_slam import make_pipeline


def _run_perframe(ds, pre, cfg):
    slam = slam_mod.GraphSLAM2D(
        cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
    )
    world = []
    for k in range(len(ds.ranges)):
        slam.process(pre.compute(ds.ranges[k]), ds.robot_poses[k])
        world.append(slam.robot_in_world())
    return slam, np.stack(world)


def _run_chunked(ds, pre, cfg, chunk):
    import jax

    slam = cs.ChunkedGraphSLAM2D(
        cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32),
        chunk=chunk,
    )
    clouds = [pre.compute(r) for r in ds.ranges]
    n = len(clouds)
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        batch = jax.tree.map(lambda *xs: np.stack(xs), *clouds[a:b])
        import jax.numpy as jnp

        batch = jax.tree.map(jnp.asarray, batch)
        if b - a < chunk:  # pad the tail like the runner does
            batch = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((chunk - (b - a),) + x.shape[1:], x.dtype)]
                ),
                batch,
            )
            od = np.concatenate(
                [ds.robot_poses[a:b],
                 np.repeat(ds.robot_poses[b - 1:b], chunk - (b - a), axis=0)]
            )
        else:
            od = ds.robot_poses[a:b]
        slam.process_chunk(batch, od, n_frames=b - a)
    return slam, np.stack(slam.world_trajectory)


def test_chunked_straight_line_topology_matches_perframe():
    """Straight 2.3 m drive, local maps every 0.5 m: the in-kernel split must
    produce the same graph topology and end pose as the per-frame fast path
    (tests/test_fast_slam.py::test_fast_slam_topology_straight_line)."""
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=20, num_beams=512, max_variance=0.0, drift=(0.11, 0.0, 0.0)
        )
    )
    base, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    cfg = dataclasses.replace(base.cfg, use_fast_tracker=True)

    ref, world_ref = _run_perframe(ds, pre, cfg)
    chk, world_chk = _run_chunked(ds, pre, cfg, chunk=8)

    assert chk.num_variables() == ref.num_variables(), (
        chk.num_variables(), ref.num_variables())
    assert chk.num_factors() == ref.num_factors()
    # trajectories agree frame-by-frame (same kernel, same split criterion)
    d = np.abs(world_chk - world_ref)
    assert d[:, :2].max() < 0.05, d.max(axis=0)
    assert d[:, 2].max() < 0.05, d.max(axis=0)
    err = np.abs(chk.robot_in_world() - ds.robot_poses[-1])
    assert err[:2].max() < 0.08, err
    assert err[2] < 0.05, err


def test_chunked_loop_closure_closes_and_solves():
    """Noisy loop drive: the chunk-boundary closure round must detect,
    validate, and solve — factors exceed the odometry-chain count and the
    final pose stays near ground truth."""
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=44, num_beams=512, max_variance=0.02,
            drift=(0.15, 0.0, 2 * np.pi / 40), seed=7,
        )
    )
    base, pre = make_pipeline(ds, local_map_distance=0.5, enable_loops=True)
    cfg = dataclasses.replace(
        base.cfg,
        use_fast_tracker=True,
        enable_relocalizer=True,
        # one voting round per chunk: accept on the first consistent check
        validator=dataclasses.replace(
            base.cfg.validator, enabled=True, min_times_checked=1
        ),
    )
    chk, world = _run_chunked(ds, pre, cfg, chunk=16)
    nv, nf = chk.num_variables(), chk.num_factors()
    assert nv >= 3
    assert nf > nv - 1, (nv, nf)  # at least one accepted closure edge
    assert chk.num_closures >= 1
    err = np.abs(chk.robot_in_world() - ds.robot_poses[-1])
    assert err[:2].max() < 0.6, err


def test_chunked_runner_message_surface():
    """ChunkedSlamRunner consumes a message stream (laser + odometry) and
    produces a timestamped trajectory with per-chunk timings."""
    from srrg2_laser_slam_2d_tpu.io.messages import LaserMessage, OdometryMessage
    from srrg2_laser_slam_2d_tpu.io.sources import ListSource
    from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig

    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=14, num_beams=512, max_variance=0.0, drift=(0.11, 0.0, 0.0)
        )
    )
    base, _ = make_pipeline(ds, local_map_distance=0.5, enable_loops=False)
    cfg = dataclasses.replace(base.cfg, use_fast_tracker=True)
    msgs = []
    c = ds.config
    for k in range(len(ds.ranges)):
        msgs.append(OdometryMessage(
            topic="/odom", timestamp=0.1 * k, pose=ds.robot_poses[k]))
        msgs.append(LaserMessage(
            topic="/scan", timestamp=0.1 * k, ranges=ds.ranges[k],
            angle_min=c.angle_min, angle_max=c.angle_max,
            range_min=c.range_min, range_max=c.range_max,
        ))
    runner = cs.ChunkedSlamRunner(
        slam_config=cfg,
        preprocessor_config=PreprocessorConfig(
            voxelize_resolution=0.02, normal_window=8
        ),
        chunk=8,
        sensor_in_robot=np.array(c.sensor_in_robot, np.float32),
    )
    n = runner.run(ListSource(msgs))
    assert n == len(ds.ranges)
    assert len(runner.trajectory) == n
    summary = runner.timing_summary()
    assert summary["frames"] == n
    assert summary["chunks"] >= 2
    end = runner.trajectory[-1][1]
    err = np.abs(end - ds.robot_poses[-1])
    assert err[:2].max() < 0.15, err


def test_stream_corr_refresh_trajectory_equivalent():
    """FrameSpec.corr_refresh=2 (one banded gather feeding two
    frozen-correspondence GN updates — the r5 roofline lever) stays
    trajectory-equivalent to per-iteration refresh on the stream kernel."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
    from srrg2_laser_slam_2d_tpu.models import fast_tracker as ft
    from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
    from srrg2_laser_slam_2d_tpu.ops import pallas_stream as ps
    from srrg2_laser_slam_2d_tpu.ops.pallas_frame import FrameSpec
    from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection

    proj = PolarProjection.make(cols=361, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.3, range_max=20.0)
    spec = FrameSpec(scene_capacity=512, projection=proj, iterations=6,
                     odom_weight=1.0, meas_as_canvas=True)
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    ds = synthetic.simulate(synthetic.SyntheticConfig(steps=12, num_beams=361))
    stack = pipeline.preprocess_batch(ds.projection, pcfg,
                                      jnp.asarray(ds.ranges))
    od = jnp.asarray(ds.robot_poses)
    st = ft.seed(spec, jax.tree.map(lambda x: x[0], stack),
                 np.array(ds.config.sensor_in_robot, np.float32), odom=od[0])
    measC = ft.pack_measurement_canvas_batch(
        spec, jax.tree.map(lambda x: x[1:], stack))
    K = 2
    cacheB, poseB = ps.pack_stream_state(
        jnp.broadcast_to(st.cacheT, (K,) + st.cacheT.shape),
        jnp.broadcast_to(st.pose, (K,) + st.pose.shape))
    mC, oS = ps.pack_stream_measurements(
        jnp.broadcast_to(measC, (K,) + measC.shape),
        jnp.broadcast_to(od[1:], (K,) + od[1:].shape))

    poses = {}
    for refresh in (1, 2, 5):
        sp = dataclasses.replace(spec, corr_refresh=refresh)
        _, pB, _ = ps.track_streams_grid(sp, cacheB, poseB, mC, oS,
                                         interpret=True)
        poses[refresh] = np.asarray(pB[:, 0:3])
    for refresh in (2, 5):
        d = np.abs(poses[1] - poses[refresh])
        assert d[:, :2].max() < 0.02, (refresh, d)
        assert d[:, 2].max() < 0.02, (refresh, d)
