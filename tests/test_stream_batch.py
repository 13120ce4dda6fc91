"""K-stream batched fused frame kernel (ops/pallas_stream.py) parity vs the
single-stream fused kernel (ops/pallas_frame.py): same pose trajectory, same
merge payloads, per stream, when K independent streams run batched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
from srrg2_laser_slam_2d_tpu.models import fast_tracker as ft
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
from srrg2_laser_slam_2d_tpu.ops import pallas_stream as ps
from srrg2_laser_slam_2d_tpu.ops.pallas_frame import FrameSpec, frame_step
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection

K = 3
T = 6
NUM_BEAMS = 181


@pytest.fixture(scope="module")
def setup():
    proj = PolarProjection.make(
        cols=NUM_BEAMS, angle_min=-np.pi, angle_max=np.pi,
        range_min=0.3, range_max=20.0,
    )
    spec = FrameSpec(scene_capacity=512, projection=proj, iterations=5,
                     odom_weight=1.0, meas_as_canvas=True)
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    states, meas, odoms = [], [], []
    for k in range(K):
        ds = synthetic.simulate(synthetic.SyntheticConfig(
            steps=T, num_beams=NUM_BEAMS, seed=17 + k))
        stack = pipeline.preprocess_batch(ds.projection, pcfg,
                                          jnp.asarray(ds.ranges))
        od = jnp.asarray(ds.robot_poses)
        st = ft.seed(spec, jax.tree.map(lambda x: x[0], stack),
                     np.array(ds.config.sensor_in_robot, np.float32),
                     odom=od[0])
        mC = ft.pack_measurement_canvas_batch(
            spec, jax.tree.map(lambda x: x[1:], stack), od[1:])
        states.append(st)
        meas.append(mC)
        odoms.append(od[1:])
    return spec, states, meas, odoms


def _single_rollout(spec, state, measC_stack):
    """Reference: frame_step per frame (meas_as_canvas path)."""
    cacheT, pose = state.cacheT, state.pose
    payloads = []
    for t in range(measC_stack.shape[0]):
        cacheT, pose, pay = frame_step(spec, measC_stack[t], cacheT, pose,
                                       interpret=True)
        payloads.append(pay)
    return cacheT, pose, jnp.stack(payloads)


@pytest.mark.parametrize("gather", ["roll", "onehot"])
def test_stream_batch_matches_single(setup, gather):
    spec, states, meas, odoms = setup
    import dataclasses

    spec = dataclasses.replace(spec, stream_gather=gather)

    # reference single-stream rollouts (canvas row 6 carries odom there)
    refs = [_single_rollout(spec, states[k], meas[k]) for k in range(K)]

    # batched: strip the odom row (travels in odom_stack instead)
    meas_clean = [m.at[:, 6, :].set(0.0) for m in meas]
    cacheB, poseB = ps.pack_stream_state(
        jnp.stack([states[k].cacheT for k in range(K)]),
        jnp.stack([states[k].pose for k in range(K)]),
    )
    measC_stack, odom_stack = ps.pack_stream_measurements(
        jnp.stack(meas_clean), jnp.stack(odoms))
    cacheB2, poseB2, payB = ps.track_streams_grid(
        spec, cacheB, poseB, measC_stack, odom_stack, interpret=True)

    cacheTs, poses = ps.unpack_stream_state(cacheB2, poseB2)
    for k in range(K):
        ref_cache, ref_pose, ref_pay = refs[k]
        np.testing.assert_allclose(
            np.asarray(poses[k, 0, 0:3]), np.asarray(ref_pose[0, 0:3]),
            rtol=0, atol=1e-4, err_msg=f"pose stream {k}")
        np.testing.assert_allclose(
            np.asarray(poses[k, 0, 7]), np.asarray(ref_pose[0, 7]),
            rtol=0, atol=0, err_msg=f"scene count stream {k}")
        # payload parity: targets/kinds identical, geometry close
        np.testing.assert_array_equal(
            np.asarray(payB[:, 5, k, :]), np.asarray(ref_pay[:, 5, :]),
            err_msg=f"merge kinds stream {k}")
        np.testing.assert_allclose(
            np.asarray(payB[:, 4, k, :]), np.asarray(ref_pay[:, 4, :]),
            rtol=0, atol=0, err_msg=f"targets stream {k}")
        np.testing.assert_allclose(
            np.asarray(payB[:, 0:4, k, :]), np.asarray(ref_pay[:, 0:4, :]),
            rtol=0, atol=1e-4, err_msg=f"payload geometry stream {k}")
        np.testing.assert_allclose(
            np.asarray(cacheTs[k, 0:6]), np.asarray(ref_cache[0:6]),
            rtol=0, atol=1e-4, err_msg=f"cache stream {k}")


def test_stream_step_matches_grid(setup):
    """stream_step per frame == track_streams_grid bulk."""
    spec, states, meas, odoms = setup
    meas_clean = [m.at[:, 6, :].set(0.0) for m in meas]
    cacheB, poseB = ps.pack_stream_state(
        jnp.stack([states[k].cacheT for k in range(K)]),
        jnp.stack([states[k].pose for k in range(K)]),
    )
    measC_stack, odom_stack = ps.pack_stream_measurements(
        jnp.stack(meas_clean), jnp.stack(odoms))

    cB, pB = cacheB, poseB
    pays = []
    for t in range(measC_stack.shape[0]):
        cB, pB, pay = ps.stream_step(spec, measC_stack[t], odom_stack[t],
                                     cB, pB, interpret=True)
        pays.append(pay)
    cacheB2, poseB2, payB = ps.track_streams_grid(
        spec, cacheB, poseB, measC_stack, odom_stack, interpret=True)
    np.testing.assert_allclose(np.asarray(pB), np.asarray(poseB2),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.stack(pays)), np.asarray(payB),
                               rtol=0, atol=1e-6)


def test_materialized_scenes_match(setup):
    """Per-stream scenes materialized from batched payloads match the
    single-stream path's scenes."""
    spec, states, meas, odoms = setup
    refs = [_single_rollout(spec, states[k], meas[k]) for k in range(K)]

    meas_clean = [m.at[:, 6, :].set(0.0) for m in meas]
    cacheB, poseB = ps.pack_stream_state(
        jnp.stack([states[k].cacheT for k in range(K)]),
        jnp.stack([states[k].pose for k in range(K)]),
    )
    measC_stack, odom_stack = ps.pack_stream_measurements(
        jnp.stack(meas_clean), jnp.stack(odoms))
    _, poseB2, payB = ps.track_streams_grid(
        spec, cacheB, poseB, measC_stack, odom_stack, interpret=True)

    for k in range(K):
        _, ref_pose, ref_pay = refs[k]
        ref_scene = ft.materialize(spec, states[k].scene, ref_pay,
                                   ref_pose[0, 7])
        got_scene = ft.materialize(spec, states[k].scene, payB[:, :, k, :],
                                   poseB2[k, 7])
        np.testing.assert_allclose(np.asarray(got_scene.xy),
                                   np.asarray(ref_scene.xy),
                                   rtol=0, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_scene.valid),
                                      np.asarray(ref_scene.valid))
