"""Banded fused aligner (ops/pallas_banded_align.py) vs the dense fused
kernel and the XLA path — estimate and trajectory equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
from srrg2_laser_slam_2d_tpu.ops import clip as clip_op
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops import pallas_banded_align as pba
from srrg2_laser_slam_2d_tpu.ops import pallas_projective_align as ppa
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection

_C = {}


def dataset():
    if not _C:
        ds = synthetic.simulate(
            synthetic.SyntheticConfig(steps=11, num_beams=721)
        )
        proj = PolarProjection.make(
            cols=721, angle_min=-np.pi, angle_max=np.pi,
            range_min=0.3, range_max=20.0,
        )
        pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
        meas = pipeline.preprocess_batch(ds.projection, pcfg, jnp.asarray(ds.ranges))
        _C.update(ds=ds, proj=proj, meas=meas)
    return _C["ds"], _C["proj"], _C["meas"]


def _clipped_scene(proj, meas0):
    """Beam-indexed moving cloud: seed a scene from frame 0, clip it."""
    cfg = tracker_mod.TrackerConfig(scene_capacity=2048, projection=proj)
    st = tracker_mod.init_state(cfg)
    st = tracker_mod.populate(cfg, st, meas0)
    return clip_op.clip_projective(
        proj, st.scene, st.robot_in_local_map, st.sensor_in_robot, 0.0
    )


def test_banded_matches_dense_fused():
    ds, proj, meas = dataset()
    meas0 = jax.tree.map(lambda x: x[0], meas)
    meas1 = jax.tree.map(lambda x: x[1], meas)
    clipped = _clipped_scene(proj, meas0)
    kw = dict(iterations=10, point_distance=0.5, normal_cos=0.8,
              chi_threshold=0.05, odom_weight=0.0, interpret=True)
    dense = ppa.fused_projective_align(
        proj, meas1.xy, meas1.normal, meas1.valid,
        clipped.xy, clipped.normal, clipped.valid, jnp.zeros(3), **kw,
    )
    banded = pba.fused_projective_align_banded(
        proj, meas1.xy, meas1.normal, meas1.valid,
        clipped.xy, clipped.normal, clipped.valid, jnp.zeros(3), **kw,
    )
    de, be = np.asarray(dense.estimate), np.asarray(banded.estimate)
    assert np.abs(de[:2] - be[:2]).max() < 5e-3, (de, be)
    assert abs(de[2] - be[2]) < 5e-3
    # correspondence counts agree to within moving-dedup differences (banded
    # counts per moving point; dense per beam — same-beam pairs both match)
    assert abs(float(dense.num_corr) - float(banded.num_corr)) <= 0.15 * float(
        dense.num_corr
    )


def test_banded_tracking_trajectory_equivalent():
    ds, proj, meas = dataset()
    odoms = jnp.asarray(ds.robot_poses)
    ov = jnp.ones(len(ds.ranges), bool)

    def run(banded):
        cfg = tracker_mod.TrackerConfig(
            scene_capacity=2048,
            projection=proj,
            aligner=icp.AlignerConfig(max_iterations=10),
            use_fused_aligner=True,
            banded_aligner=banded,
        )
        st = tracker_mod.init_state(
            cfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
        )
        st = tracker_mod.populate(cfg, st, jax.tree.map(lambda x: x[0], meas))
        final, traces = pipeline.track_sequence(cfg, st, meas, odoms, ov)
        return np.asarray(traces[0])  # [T, 3] robot_in_local_map

    tr_dense = run(False)
    tr_banded = run(True)
    # trajectory equivalence: sub-centimeter translation, sub-half-degree rot
    assert np.abs(tr_dense[:, :2] - tr_banded[:, :2]).max() < 0.01
    assert np.abs(tr_dense[:, 2] - tr_banded[:, 2]).max() < 0.01

    # and both track ground truth
    from srrg2_laser_slam_2d_tpu.utils import geometry as g

    gt = jnp.asarray(ds.robot_poses)
    gt_rel = np.asarray(jax.vmap(lambda p: g.relative(gt[0], p))(gt))
    assert np.abs(tr_banded[:, :2] - gt_rel[:, :2]).max() < 0.05


def test_banded_rejects_non_beam_indexed():
    ds, proj, meas = dataset()
    meas0 = jax.tree.map(lambda x: x[0], meas)
    meas1 = jax.tree.map(lambda x: x[1], meas)
    try:
        pba.fused_projective_align_banded(
            proj, meas1.xy, meas1.normal, meas1.valid,
            meas0.xy[:100], meas0.normal[:100], meas0.valid[:100],
            jnp.zeros(3), interpret=True,
        )
    except ValueError:
        return
    raise AssertionError("expected ValueError for non-beam-indexed moving")
