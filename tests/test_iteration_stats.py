"""Per-GN-iteration stats emitted by the fused kernels (the reference
aligner's iterationStats() surface, visual_test_aligner_2d.cpp:156).

Exact contract: the record at iteration i is evaluated at that iteration's
linearization point T_i (the pose after i updates) — identical to the FINAL
stats of the same kernel run with iterations=i. The tests below verify that
identity for the fused dense aligner, the banded aligner, and the fused
frame kernel, plus that the XLA-path placeholder replacement in
models/tracker.py surfaces real numbers.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srrg2_laser_slam_2d_tpu.bench import pipeline, synthetic
from srrg2_laser_slam_2d_tpu.models import fast_tracker as ft
from srrg2_laser_slam_2d_tpu.models.preprocessor import PreprocessorConfig
from srrg2_laser_slam_2d_tpu.ops.pallas_banded_align import (
    fused_projective_align_banded,
)
from srrg2_laser_slam_2d_tpu.ops.pallas_frame import FrameSpec, frame_step
from srrg2_laser_slam_2d_tpu.ops.pallas_projective_align import (
    fused_projective_align,
)
from srrg2_laser_slam_2d_tpu.ops.projector import PolarProjection

NUM_BEAMS = 181


@pytest.fixture(scope="module")
def setup():
    proj = PolarProjection.make(
        cols=NUM_BEAMS, angle_min=-np.pi, angle_max=np.pi,
        range_min=0.3, range_max=20.0,
    )
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=3, num_beams=NUM_BEAMS, seed=5)
    )
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    stack = pipeline.preprocess_batch(ds.projection, pcfg,
                                      jnp.asarray(ds.ranges))
    clouds = [jax.tree.map(lambda x, k=k: x[k], stack) for k in range(4)]
    return proj, clouds, jnp.asarray(ds.robot_poses)


def _dense(proj, fixed, moving, iterations):
    return fused_projective_align(
        proj, fixed.xy, fixed.normal, fixed.valid,
        moving.xy, moving.normal, moving.valid,
        jnp.zeros(3), iterations=iterations, interpret=True,
    )


def test_dense_iter_stats_match_truncated_runs(setup):
    proj, clouds, _ = setup
    fixed, moving = clouds[0], clouds[1]
    res = _dense(proj, fixed, moving, 4)
    assert res.iter_stats.shape == (4, 4)
    assert float(res.iter_stats[0, 1]) > 0  # correspondences from iter 0
    for i in range(3):
        trunc = _dense(proj, fixed, moving, i)
        np.testing.assert_allclose(
            np.asarray(res.iter_stats[i]),
            np.asarray(jnp.stack([trunc.chi, trunc.num_corr,
                                  trunc.num_inliers, trunc.chi_inl_sum])),
            rtol=1e-5, atol=1e-6, err_msg=f"iteration {i}",
        )


def test_banded_iter_stats_match_truncated_runs(setup):
    proj, clouds, _ = setup
    fixed = clouds[0]
    # banded aligner needs a beam-indexed moving cloud: use the projective
    # clip of the fixed cloud itself under a small offset
    from srrg2_laser_slam_2d_tpu.ops import clip as clip_op
    from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op

    scene = cloud_op.repad(cloud_op.compact(fixed), 1024)
    moving = clip_op.clip_projective(
        proj, scene, jnp.asarray([0.05, -0.02, 0.01]), jnp.zeros(3), 0.0
    )

    def banded(iterations):
        return fused_projective_align_banded(
            proj, fixed.xy, fixed.normal, fixed.valid,
            moving.xy, moving.normal, moving.valid,
            jnp.zeros(3), iterations=iterations, interpret=True,
        )

    res = banded(4)
    assert res.iter_stats.shape == (4, 4)
    assert float(res.iter_stats[0, 1]) > 0
    for i in range(3):
        trunc = banded(i)
        np.testing.assert_allclose(
            np.asarray(res.iter_stats[i]),
            np.asarray(jnp.stack([trunc.chi, trunc.num_corr,
                                  trunc.num_inliers, trunc.chi_inl_sum])),
            rtol=1e-5, atol=1e-6, err_msg=f"iteration {i}",
        )


def test_frame_kernel_iter_row_matches_truncated_runs(setup):
    proj, clouds, odoms = setup

    def run(iterations):
        spec = FrameSpec(scene_capacity=512, projection=proj,
                         iterations=iterations, odom_weight=1.0,
                         meas_as_canvas=True)
        st = ft.seed(spec, clouds[0], np.zeros(3, np.float32), odom=odoms[0])
        measF = ft.pack_measurement_canvas(spec, clouds[1], odoms[1], True)
        _, _, payload = frame_step(spec, measF, st.cacheT, st.pose,
                                   interpret=True)
        return payload

    pay = run(4)
    its = pay[7]
    chi, inl = its[0:4], its[64:68]
    assert float(pay[6, 4]) > 0  # n_corr
    for i in range(1, 4):
        trunc = run(i)
        # payload row 6 lanes 3/5 = final (chi, n_inliers) at T_i
        np.testing.assert_allclose(float(chi[i]), float(trunc[6, 3]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(inl[i]), float(trunc[6, 5]),
                                   rtol=0, atol=0)


def test_tracker_fused_path_stats_are_real(setup):
    """models/tracker.py fused path: AlignResult.stats is the kernel record,
    not zeros; chi_inliers is the true inlier mean."""
    from srrg2_laser_slam_2d_tpu.models import tracker as tracker_mod
    from srrg2_laser_slam_2d_tpu.ops import icp

    proj, clouds, odoms = setup
    cfg = tracker_mod.TrackerConfig(
        scene_capacity=1024, projection=proj,
        aligner=icp.AlignerConfig(max_iterations=5),
        use_fused_aligner=True, banded_aligner=True,
        reuse_clip_canvas=True, lean_scene_ops=True,
    )
    trk = tracker_mod.LaserTracker(cfg, np.zeros(3, np.float32))
    trk.compute(clouds[0], odoms[0])
    res = trk.compute(clouds[1], odoms[1])
    assert res.iter_stats.shape == (5, 4)
    assert float(jnp.sum(jnp.abs(res.iter_stats))) > 0, \
        "iter_stats must not be placeholder zeros"
    assert float(res.iter_stats[0, 1]) > 0
    # chi_inliers = inlier chi mean (not the chi/num_inliers placeholder)
    assert float(res.chi_inliers) <= \
        float(res.chi) / max(float(res.num_inliers), 1.0) + 1e-6
