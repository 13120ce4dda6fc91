"""Registration tests: golden linearization vs NumPy, and GT-exact
scan-to-scan alignment on the synthetic dataset (the TPU analog of the
reference's visual_test_aligner_2d behavior check — estimate vs ground truth,
apps/visual_test_aligner_2d.cpp:109-156)."""

import jax
import jax.numpy as jnp
import numpy as np

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models.preprocessor import LaserModel, PreprocessorConfig, ScanPreprocessor
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.ops import projector as projector_op
from srrg2_laser_slam_2d_tpu.utils import cloud as cloud_op
from srrg2_laser_slam_2d_tpu.utils import geometry as g


def np_linearize(T, p_m, n_m, p_f, n_f, chi_threshold):
    """Straightforward NumPy port of the nicp.m math in SE(2) for golden checks."""
    c, s = np.cos(T[2]), np.sin(T[2])
    R = np.array([[c, -s], [s, c]])
    H = np.zeros((3, 3))
    b = np.zeros(3)
    chi_tot = 0.0
    for pm, nm, pf, nf in zip(p_m, n_m, p_f, n_f):
        pp = R @ pm + T[:2]
        npred = R @ nm
        e = np.zeros(3)
        e[0] = nf @ (pp - pf)
        e[1:] = npred - nf
        chi = e @ e
        J = np.zeros((3, 3))
        J[0, :2] = nf
        J[0, 2] = nf @ np.array([-pp[1], pp[0]])
        J[1:, 2] = np.array([-npred[1], npred[0]])
        w = 1.0 if chi < chi_threshold else chi_threshold / chi
        H += w * J.T @ J
        b += w * J.T @ e
        chi_tot += chi
    return H, b, chi_tot


def test_linearize_golden():
    rng = np.random.default_rng(3)
    n = 40
    p_m = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    n_m = rng.normal(size=(n, 2)).astype(np.float32)
    n_m /= np.linalg.norm(n_m, axis=1, keepdims=True)
    p_f = (p_m + rng.normal(scale=0.05, size=(n, 2))).astype(np.float32)
    n_f = n_m + rng.normal(scale=0.01, size=(n, 2)).astype(np.float32)
    n_f /= np.linalg.norm(n_f, axis=1, keepdims=True)
    T = np.array([0.05, -0.02, 0.03], np.float32)

    fixed = cloud_op.Cloud(jnp.asarray(p_f), jnp.asarray(n_f), jnp.ones(n, bool))
    moving = cloud_op.Cloud(jnp.asarray(p_m), jnp.asarray(n_m), jnp.ones(n, bool))
    corr = icp.Correspondences(
        fixed_idx=jnp.arange(n, dtype=jnp.int32),
        moving_idx=jnp.arange(n, dtype=jnp.int32),
        valid=jnp.ones(n, bool),
    )
    # threshold disabled -> exact comparison (no f32/f64 boundary flips at
    # the inlier classification edge)
    H, b, chi, n_inl, chi_inl = icp.p2p_linearize(
        jnp.asarray(T), fixed, moving, corr, chi_threshold=0.0
    )
    H_np, b_np, chi_np = np_linearize(T, p_m, n_m, p_f, n_f, np.inf)
    np.testing.assert_allclose(np.asarray(H), H_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), b_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(chi), chi_np, rtol=1e-4)


def test_cauchy_robustifier_downweights_outliers():
    n = 8
    p_m = np.zeros((n, 2), np.float32)
    n_m = np.tile(np.array([[1.0, 0.0]], np.float32), (n, 1))
    p_f = p_m.copy()
    p_f[0, 0] = 5.0  # gross outlier along the normal
    fixed = cloud_op.Cloud(jnp.asarray(p_f), jnp.asarray(n_m), jnp.ones(n, bool))
    moving = cloud_op.Cloud(jnp.asarray(p_m), jnp.asarray(n_m), jnp.ones(n, bool))
    corr = icp.Correspondences(
        jnp.arange(n, dtype=jnp.int32), jnp.arange(n, dtype=jnp.int32), jnp.ones(n, bool)
    )
    H_rob, b_rob, _, n_inl, _ = icp.p2p_linearize(jnp.zeros(3), fixed, moving, corr, 0.05)
    H_raw, b_raw, _, _, _ = icp.p2p_linearize(jnp.zeros(3), fixed, moving, corr, 0.0)
    assert int(n_inl) == n - 1
    # the outlier contributes |b| = 5 unrobustified; Cauchy caps it at t/chi*5
    assert abs(float(b_raw[0])) > 4.0
    assert abs(float(b_rob[0])) < 0.1
    del H_rob, H_raw


def test_odom_prior_pulls_to_prior():
    prior = jnp.array([0.3, -0.1, 0.2])
    # no correspondences at all: pure prior GN step from identity
    H, b, chi = icp.odom_prior_linearize(jnp.zeros(3), prior, 1.0)
    dx = np.linalg.solve(np.asarray(H), -np.asarray(b))
    est = np.asarray(g.compose(jnp.asarray(dx, jnp.float32), jnp.zeros(3)))
    # one GN step of this mildly nonlinear problem lands close to the prior
    np.testing.assert_allclose(est, np.asarray(prior), atol=0.05)
    del chi


_DATASET = {}


def small_dataset():
    if "d" not in _DATASET:
        _DATASET["d"] = synthetic.simulate(synthetic.SyntheticConfig(steps=6, num_beams=512))
    return _DATASET["d"]


def preprocess_all(ds):
    cfg = ds.config
    pre = ScanPreprocessor(PreprocessorConfig(voxelize_resolution=0.02, normal_window=8))
    pre.set_model(
        LaserModel(
            num_beams=cfg.num_beams,
            angle_min=cfg.angle_min,
            angle_max=cfg.angle_max,
            range_min=cfg.range_min,
            range_max=cfg.range_max,
        )
    )
    return [pre.compute(r) for r in ds.ranges]


def test_scan_to_scan_alignment_matches_gt():
    ds = small_dataset()
    clouds = preprocess_all(ds)
    match_proj = projector_op.PolarProjection.make(
        cols=512, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=20.0
    )
    acfg = icp.AlignerConfig(max_iterations=10, point_distance=0.5, normal_cos=0.8)

    align = jax.jit(
        lambda f, m, t0: icp.align(acfg, match_proj, f, m, t0),
        static_argnums=(),
    )
    errs = []
    for k in range(1, 6):
        fixed, moving = clouds[k - 1], clouds[k]
        # moving-in-fixed GT: sensor_{k} seen from sensor_{k-1}
        t_gt = np.asarray(
            g.relative(jnp.asarray(ds.sensor_poses[k - 1]), jnp.asarray(ds.sensor_poses[k]))
        )
        # NOTE fixed/moving: cloud k is "moving", k-1 is "fixed"
        res = align(fixed, moving, jnp.zeros(3))
        est = np.asarray(res.estimate)
        errs.append(np.abs(est - t_gt))
        assert int(res.num_correspondences) > 50
    errs = np.stack(errs)
    assert errs[:, :2].max() < 0.02, errs  # translation within 2 cm
    assert errs[:, 2].max() < 0.01, errs   # rotation within 0.01 rad


def test_alignment_recovers_larger_offset():
    ds = small_dataset()
    clouds = preprocess_all(ds)
    match_proj = projector_op.PolarProjection.make(
        cols=512, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=20.0
    )
    # align scan 0 to itself under a deliberate initial offset
    acfg = icp.AlignerConfig(max_iterations=20, point_distance=1.0, normal_cos=0.7)
    res = icp.align(acfg, match_proj, clouds[0], clouds[0], jnp.array([0.15, -0.1, 0.1]))
    est = np.asarray(res.estimate)
    np.testing.assert_allclose(est, np.zeros(3), atol=5e-3)


def _ring_alignment_setup(outlier_fraction=0.0, seed=11):
    rng = np.random.default_rng(seed)
    n = 256
    t = (np.arange(n) + 0.35) * (2 * np.pi / n) - np.pi
    # ellipse (not a circle — rotation must be observable)
    ea, eb = 3.0, 2.0
    xy = np.stack([ea * np.cos(t), eb * np.sin(t)], 1).astype(np.float32)
    nrm = -np.stack([np.cos(t) / ea, np.sin(t) / eb], 1).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    fixed = cloud_op.from_numpy(xy, nrm)
    gt = np.array([0.12, -0.08, 0.06], np.float32)
    inv = g.inverse(jnp.asarray(gt))
    mov_xy = np.array(g.transform_points(inv, jnp.asarray(xy)))
    mov_n = np.array(g.rotate_vectors(inv, jnp.asarray(nrm)))
    if outlier_fraction > 0:
        k = int(n * outlier_fraction)
        idx = rng.choice(n, k, replace=False)
        mov_xy[idx] += rng.normal(scale=0.4, size=(k, 2)).astype(np.float32)
    moving = cloud_op.from_numpy(mov_xy, mov_n)
    proj = projector_op.PolarProjection.make(
        cols=n, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=10.0
    )
    return proj, fixed, moving, gt


def test_inlier_only_runs_refine_under_outliers():
    # enable_inlier_only_runs (MultiAligner2D toggle, config :13-14): with
    # corrupted points in the moving cloud the inlier-only refinement ends at
    # least as close to GT as the plain run
    proj, fixed, moving, gt = _ring_alignment_setup(outlier_fraction=0.25)
    base = icp.AlignerConfig(max_iterations=15, odom_weight=0.0)
    plain = icp.align(base, proj, fixed, moving, jnp.zeros(3))
    import dataclasses
    refined = icp.align(
        dataclasses.replace(base, enable_inlier_only_runs=True),
        proj, fixed, moving, jnp.zeros(3),
    )
    err_ref = np.linalg.norm(np.asarray(refined.estimate) - gt)
    assert err_ref < 0.05, err_ref
    assert int(refined.iterations) > int(plain.iterations)


def test_keep_only_inlier_correspondences_final_pass():
    proj, fixed, moving, gt = _ring_alignment_setup(outlier_fraction=0.2)
    import dataclasses
    base = icp.AlignerConfig(max_iterations=15, odom_weight=0.0)
    res = icp.align(
        dataclasses.replace(base, keep_only_inlier_correspondences=True),
        proj, fixed, moving, jnp.zeros(3),
    )
    plain = icp.align(base, proj, fixed, moving, jnp.zeros(3))
    # the final pass counts only surviving inliers
    assert int(res.num_inliers) <= int(plain.num_correspondences)
    np.testing.assert_allclose(np.asarray(res.estimate), gt, atol=0.05)


def test_solve_gated_on_actual_inliers():
    # a moving cloud with totally wrong normals produces correspondences but
    # zero inliers: the estimate must stay at the initial guess
    proj, fixed, moving, gt = _ring_alignment_setup()
    flipped = cloud_op.Cloud(moving.xy, -moving.normal, moving.valid)
    init = jnp.asarray([0.3, 0.2, 0.1])
    res = icp.align(
        icp.AlignerConfig(max_iterations=5, odom_weight=0.0, min_num_inliers=10),
        proj, fixed, flipped, init,
    )
    np.testing.assert_allclose(np.asarray(res.estimate), np.asarray(init), atol=1e-6)
