"""Fused frame kernel (ops/pallas_frame.py) + fast tracker
(models/fast_tracker.py): golden z-buffer, trajectory equivalence vs the
lean tracker path, deferred scene materialization."""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
from srrg2_laser_slam_2d_tpu.models import fast_tracker as ft
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops import projector as projector_op
from srrg2_laser_slam_2d_tpu.ops.pallas_frame import FrameSpec
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection
from srrg2_laser_slam_2d_tpu.utils import geometry as g

_C = {}


def dataset():
    if not _C:
        ds = synthetic.simulate(synthetic.SyntheticConfig(steps=15, num_beams=721))
        proj = PolarProjection.make(
            cols=721, angle_min=-np.pi, angle_max=np.pi,
            range_min=0.3, range_max=20.0,
        )
        pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
        meas = pipeline.preprocess_batch(ds.projection, pcfg, jnp.asarray(ds.ranges))
        _C.update(ds=ds, proj=proj, meas=meas)
    return _C["ds"], _C["proj"], _C["meas"]


def _spec(proj, cap=2048):
    return FrameSpec(projection=proj, scene_capacity=cap, iterations=10,
                     odom_weight=1.0)


def test_shift_zbuffer_matches_projector():
    """beam_zbuffer_by_shifts == the projector z-buffer for beam-indexed
    clouds under small motion."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from srrg2_laser_slam_2d_tpu.ops import _beam_kernels as bk

    ds, proj, meas = dataset()
    m0 = jax.tree.map(lambda x: x[0], meas)
    # beam-indexed cloud: project, gather winners
    canvas = projector_op.project_local(proj, m0)
    idx = jnp.maximum(canvas.idx, 0)
    cells = ft.Cloud(
        xy=m0.xy[idx], normal=m0.normal[idx], valid=canvas.valid
    )
    pose = jnp.asarray([0.03, -0.02, 0.05])  # small motion
    moved = ft.cloud_op.transform(cells, pose)
    ref = projector_op.project_local(proj, moved)

    B = 768

    def kernel(geoT_ref, out_ref):
        geoT = geoT_ref[:]
        mov = (geoT[0:1], geoT[1:2], geoT[2:3], geoT[3:4], geoT[4:5])
        f = bk.moving_fields(mov, jnp.zeros(3), proj)
        vals = jnp.concatenate(
            [f["px"], f["py"], geoT[5:6], jnp.zeros((5, B), jnp.float32)], 0)
        smin, svals, s_ok = bk.beam_zbuffer_by_shifts(
            vals, f["d"], f["col_i"], f["okp"], 32)
        out_ref[:] = jnp.concatenate(
            [smin, svals[0:3], s_ok.astype(jnp.float32),
             jnp.zeros((3, B), jnp.float32)], 0)

    geoT = jnp.concatenate([
        moved.xy.T, moved.normal.T,
        moved.valid.astype(jnp.float32)[None, :],
        jnp.arange(721, dtype=jnp.float32)[None, :],  # home row as payload
        jnp.zeros((2, 721), jnp.float32),
    ], axis=0)
    geoT = jnp.pad(geoT, ((0, 0), (0, B - 721)))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )(geoT)
    smin, s_ok = np.asarray(out[0, :721]), np.asarray(out[4, :721]) > 0
    ref_valid = np.asarray(ref.valid)
    ref_depth = np.asarray(ref.depth)
    assert (s_ok == ref_valid).mean() > 0.995, (s_ok.sum(), ref_valid.sum())
    both = s_ok & ref_valid
    assert np.abs(smin[both] - ref_depth[both]).max() < 1e-5


def _run_lean(ds, proj, meas, cap):
    cfg = tracker_mod.TrackerConfig(
        scene_capacity=cap, projection=proj,
        aligner=icp.AlignerConfig(max_iterations=10),
        use_fused_aligner=True, banded_aligner=True,
        reuse_clip_canvas=True, lean_scene_ops=True,
    )
    tr = tracker_mod.LaserTracker(
        cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
    )
    poses = []
    for i in range(len(ds.ranges)):
        m = jax.tree.map(lambda x: x[i], meas)
        tr.compute(m, odom=ds.robot_poses[i])
        poses.append(np.asarray(tr.robot_in_local_map))
    return np.stack(poses), tr.state.scene


def _run_fast(ds, proj, meas, cap, bulk):
    spec = _spec(proj, cap)
    if bulk:
        m0 = jax.tree.map(lambda x: x[0], meas)
        state = ft.seed(spec, m0, np.array(ds.config.sensor_in_robot, np.float32),
                        odom=ds.robot_poses[0])
        measF = ft.pack_measurement_batch(
            jax.tree.map(lambda x: x[1:], meas), jnp.asarray(ds.robot_poses[1:])
        )
        state, stats = ft.track_sequence_fast(spec, state, measF)
        return np.asarray(state.pose[0, 0:3]), state.scene, stats
    tr = ft.FastTracker(spec, sensor_in_robot=np.array(ds.config.sensor_in_robot,
                                                       np.float32))
    poses = []
    for i in range(len(ds.ranges)):
        m = jax.tree.map(lambda x: x[i], meas)
        tr.compute(m, odom=ds.robot_poses[i])
        poses.append(np.asarray(tr.robot_in_local_map))
    return np.stack(poses), tr.scene, None


def test_fast_tracker_matches_lean_path():
    ds, proj, meas = dataset()
    lean_poses, lean_scene = _run_lean(ds, proj, meas, 2048)
    fast_poses, fast_scene, _ = _run_fast(ds, proj, meas, 2048, bulk=False)
    assert np.abs(lean_poses[:, :2] - fast_poses[:, :2]).max() < 0.02
    assert np.abs(lean_poses[:, 2] - fast_poses[:, 2]).max() < 0.02
    # scenes: same fill to within a few percent
    lc = int(np.asarray(lean_scene.count()))
    fc = int(np.asarray(fast_scene.count()))
    assert abs(lc - fc) < 0.1 * lc, (lc, fc)

    # and tracks ground truth
    gt = jnp.asarray(ds.robot_poses)
    gt_rel = np.asarray(jax.vmap(lambda p: g.relative(gt[0], p))(gt))
    assert np.abs(fast_poses[-1, :2] - gt_rel[-1, :2]).max() < 0.05


def test_bulk_sequence_matches_stepwise():
    ds, proj, meas = dataset()
    step_poses, step_scene, _ = _run_fast(ds, proj, meas, 2048, bulk=False)
    final_pose, bulk_scene, stats = _run_fast(ds, proj, meas, 2048, bulk=True)
    assert np.abs(step_poses[-1] - final_pose).max() < 1e-4
    sc = np.asarray(step_scene.count())
    bc = np.asarray(bulk_scene.count())
    assert sc == bc, (sc, bc)
    sv = np.asarray(step_scene.valid)
    assert np.abs(np.asarray(step_scene.xy)[sv] - np.asarray(bulk_scene.xy)[sv]).max() < 1e-4


def test_fast_tracker_teleport_guard():
    ds, proj, meas = dataset()
    spec = _spec(proj)
    tr = ft.FastTracker(spec, sensor_in_robot=np.array(ds.config.sensor_in_robot,
                                                       np.float32))
    for i in range(3):
        tr.compute(jax.tree.map(lambda x: x[i], meas), odom=ds.robot_poses[i])
    st = tr.compute(jax.tree.map(lambda x: x[3], meas),
                    odom=np.array([50.0, -30.0, 2.5], np.float32))
    assert float(st[5]) == 0.0  # no inliers
    assert bool(jnp.all(jnp.isfinite(tr.robot_in_local_map)))


def test_canvas_layout_and_window_match_default_path():
    """meas_as_canvas (pre-z-buffered [8, B] measurement rows) and a narrower
    banded window must be trajectory-equivalent to the default fast path."""
    import dataclasses

    ds, proj, meas = dataset()
    base_poses, base_scene, _ = _run_fast(ds, proj, meas, 2048, bulk=False)

    spec = dataclasses.replace(
        _spec(proj, 2048), meas_as_canvas=True, window=128
    )
    tr = ft.FastTracker(spec, sensor_in_robot=np.array(ds.config.sensor_in_robot,
                                                       np.float32))
    poses = []
    for i in range(len(ds.ranges)):
        m = jax.tree.map(lambda x: x[i], meas)
        tr.compute(m, odom=ds.robot_poses[i])
        poses.append(np.asarray(tr.robot_in_local_map))
    poses = np.stack(poses)
    assert np.abs(base_poses[:, :2] - poses[:, :2]).max() < 0.02
    assert np.abs(base_poses[:, 2] - poses[:, 2]).max() < 0.02
    bc = int(np.asarray(base_scene.count()))
    cc = int(np.asarray(tr.scene.count()))
    assert abs(bc - cc) < 0.1 * bc, (bc, cc)

    # bulk grid program accepts the [T, 8, B] layout too
    m0 = jax.tree.map(lambda x: x[0], meas)
    state = ft.seed(spec, m0, np.array(ds.config.sensor_in_robot, np.float32),
                    odom=ds.robot_poses[0])
    measC = ft.pack_measurement_canvas_batch(
        spec, jax.tree.map(lambda x: x[1:], meas), jnp.asarray(ds.robot_poses[1:])
    )
    state, stats = ft.track_sequence_fast(spec, state, measC)
    assert np.abs(np.asarray(state.pose[0, 0:3]) - poses[-1]).max() < 1e-4
