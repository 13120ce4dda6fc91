"""Fused SE(2) projective ICP — the hottest path of the framework.

This single jitted kernel re-creates the whole reference inner stack of
``MultiAligner2D::compute`` (SURVEY.md §3.2):
  - ``CorrespondenceFinderProjective2f::compute``
    (registration/correspondence_finder_projective_2d.cpp:19-78): project fixed
    once at identity, project moving through the current estimate, gate per
    beam on |Δdepth| <= point_distance and normal-dot >= normal_cos;
  - ``SE2Plane2PlaneErrorFactor`` residual/Jacobian (math per
    octave/solver/nicp.m:4-24 reduced to SE(2):
    e = [n_f·(R p_m + t − p_f); R n_m − n_f], pre-multiplied increment);
  - ``AlignerSliceOdom2DPrior`` as one extra residual block
    (configurations/stage_segway_double_config_LASER_0.json:291-310);
  - ``RobustifierCauchy`` weighting (chi_threshold, config :217-222);
  - a 1-iteration Gauss-Newton solve (Solver max_iterations=[1], GN,
    config :193-215) — here a closed-form 3x3 solve;
  - the outer loop <= max_iterations with optional chi-decay termination
    (``SimpleTerminationCriteria`` epsilon semantics, config :224-229).

TPU design: correspondences stay beam-indexed (static [cols] shape — no
dynamic resize), residual/Jacobian/Hessian accumulation is one masked
reduction over beams on the VPU, and the whole iterate lives in a
``lax.while_loop`` so a full alignment is ONE device program. The function is
vmap-compatible, which is what lets loop-closure candidates be aligned in
parallel batches (impossible in the sequential C++).

The sensor-extrinsic variant (SE2Plane2PlaneWithSensorErrorFactor,
registration/aligner_slice_processor_laser_2d.h:22-45) is handled by frame
canonicalization: n_f·(S⁻¹Xp_m − p_f) == (R_S n_f)·(Xp_m − Sp_f), so
pre-transforming the fixed cloud by the sensor extrinsic makes the plain
factor exactly equivalent — done by the caller (models/tracker.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import geometry
from ..utils.cloud import Cloud
from . import projector as projector_op
from .projector import Canvas, PolarProjection

Array = jax.Array


@dataclass(frozen=True)
class AlignerConfig:
    """Parameter surface of MultiAligner2D + its laser/odom slices.

    Defaults follow the LASER_0 tracking assembly
    (configurations/stage_segway_double_config_LASER_0.json:487-517 aligner,
    :577-596 finder, :217-222 robustifier).
    """

    max_iterations: int = 10
    min_num_inliers: int = 10
    # MultiAligner2D toggles (config :9-37; both default 0 in the shipped
    # assemblies): extra refinement runs over the inlier set only, and a
    # final pass that drops non-inlier correspondences before the last solve
    enable_inlier_only_runs: bool = False
    keep_only_inlier_correspondences: bool = False
    # SimpleTerminationCriteria chi-decay ratio; None = always run all
    # iterations (the shipped configs set termination_criteria: -1 on the
    # outer aligner loop)
    epsilon: float | None = None
    damping: float = 0.0
    # laser slice / projective finder
    point_distance: float = 0.5
    normal_cos: float = 0.8
    chi_threshold: float = 0.05  # Cauchy robustifier (None-like <=0 disables)
    min_num_correspondences: int = 0
    # odometry prior slice weight (identity info scaled); 0 disables
    odom_weight: float = 1.0
    # correspondence finder plugged into the loop — the reference's
    # param_finder slot (aligner_slice_processor_laser_2d.h:14):
    #   "projective"  -> CorrespondenceFinderProjective2f (default)
    #   "nn_grid"     -> CorrespondenceFinderNN2D (jump-flooded distance map)
    #   "bruteforce"  -> CorrespondenceFinderKDTree2D role (exact bounded NN)
    finder: str = "projective"
    finder_max_distance: float = 1.0   # max_distance_m of the NN finders
    finder_resolution: float = 0.05    # nn_grid map resolution [m/px]
    finder_grid_size: int = 256        # nn_grid static grid side [px]


def solve3(H: Array, b: Array) -> Array:
    """Closed-form 3x3 solve (Cramer). ``jnp.linalg.solve`` lowers to a
    general LU on TPU — measurable overhead inside the per-iteration loop of
    the aligner; the explicit adjugate is a handful of VPU flops."""
    a00, a01, a02 = H[0, 0], H[0, 1], H[0, 2]
    a10, a11, a12 = H[1, 0], H[1, 1], H[1, 2]
    a20, a21, a22 = H[2, 0], H[2, 1], H[2, 2]
    det = (
        a00 * (a11 * a22 - a12 * a21)
        - a01 * (a10 * a22 - a12 * a20)
        + a02 * (a10 * a21 - a11 * a20)
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    x0 = ((a11 * a22 - a12 * a21) * b[0] + (a02 * a21 - a01 * a22) * b[1]
          + (a01 * a12 - a02 * a11) * b[2]) * inv_det
    x1 = ((a12 * a20 - a10 * a22) * b[0] + (a00 * a22 - a02 * a20) * b[1]
          + (a02 * a10 - a00 * a12) * b[2]) * inv_det
    x2 = ((a10 * a21 - a11 * a20) * b[0] + (a01 * a20 - a00 * a21) * b[1]
          + (a00 * a11 - a01 * a10) * b[2]) * inv_det
    return jnp.stack([x0, x1, x2])


class Correspondences(NamedTuple):
    """Beam-indexed correspondence set (static [cols] shape)."""

    fixed_idx: Array   # [cols] int32, index into fixed cloud
    moving_idx: Array  # [cols] int32, index into moving cloud
    valid: Array       # [cols] bool


class AlignResult(NamedTuple):
    estimate: Array        # [3] moving-in-fixed pose vector
    chi: Array             # [] final total robust chi2
    num_correspondences: Array  # [] int32 (final iteration)
    num_inliers: Array     # [] int32 (chi < chi_threshold)
    chi_inliers: Array     # [] mean chi over inliers
    iterations: Array      # [] int32 iterations actually run
    stats: Array           # [max_iterations, 4]: chi, n_corr, n_inliers, chi_inl_mean


def find_projective(
    proj: PolarProjection,
    fixed_canvas: Canvas,
    fixed: Cloud,
    moving: Cloud,
    estimate: Array,
    point_distance: float,
    normal_cos: float,
) -> Correspondences:
    """Beam-space matching between the cached fixed canvas and the moving
    cloud transformed by ``estimate`` (moving-in-fixed)."""
    moved = Cloud(
        xy=geometry.transform_points(estimate, moving.xy),
        normal=geometry.rotate_vectors(estimate, moving.normal),
        valid=moving.valid,
    )
    mov_canvas = projector_op.project_local(proj, moved)
    both = fixed_canvas.valid & mov_canvas.valid
    close = jnp.abs(fixed_canvas.depth - mov_canvas.depth) <= point_distance
    f_idx = jnp.maximum(fixed_canvas.idx, 0)
    m_idx = jnp.maximum(mov_canvas.idx, 0)
    ndot = jnp.sum(moved.normal[m_idx] * fixed.normal[f_idx], axis=-1)
    ok = both & close & (ndot >= normal_cos)
    return Correspondences(fixed_idx=f_idx, moving_idx=m_idx, valid=ok)


def p2p_linearize(
    estimate: Array,
    fixed: Cloud,
    moving: Cloud,
    corr: Correspondences,
    chi_threshold: float,
    inlier_only: bool = False,
) -> tuple[Array, Array, Array, Array, Array]:
    """Robustified plane-to-plane linearization over a correspondence set.

    Returns (H [3,3], b [3], chi_total, num_inliers, chi_inlier_sum).
    Error model (octave nicp.m:16-23 in SE(2)):
      e1 = n_f . (R p_m + t - p_f)
      e23 = R n_m - n_f
    Jacobian for the pre-multiplied increment T <- v2t(dx) T:
      de1/dt = n_f,  de1/dtheta = n_f . (S p_pred)
      de23/dt = 0,   de23/dtheta = S n_pred        (S = [[0,-1],[1,0]])
    """
    p_m = moving.xy[corr.moving_idx]
    n_m = moving.normal[corr.moving_idx]
    p_f = fixed.xy[corr.fixed_idx]
    n_f = fixed.normal[corr.fixed_idx]
    m = corr.valid

    p_pred = geometry.transform_points(estimate, p_m)
    n_pred = geometry.rotate_vectors(estimate, n_m)

    e1 = jnp.sum(n_f * (p_pred - p_f), axis=-1)          # [C]
    e23 = n_pred - n_f                                    # [C,2]
    chi = e1 * e1 + jnp.sum(e23 * e23, axis=-1)           # [C]

    # S p = (-py, px)
    sp = jnp.stack([-p_pred[:, 1], p_pred[:, 0]], axis=-1)
    sn = jnp.stack([-n_pred[:, 1], n_pred[:, 0]], axis=-1)
    # J rows: [n_f.x, n_f.y, n_f.sp], [0, 0, sn.x], [0, 0, sn.y]
    j1 = jnp.concatenate([n_f, jnp.sum(n_f * sp, axis=-1, keepdims=True)], axis=-1)

    if inlier_only and chi_threshold > 0:
        # hard inlier selection (enable_inlier_only_runs /
        # keep_only_inlier_correspondences refinement passes)
        w = jnp.where(chi < chi_threshold, 1.0, 0.0)
    elif chi_threshold > 0:
        w = jnp.where(chi < chi_threshold, 1.0, chi_threshold / jnp.maximum(chi, 1e-20))
    else:
        w = jnp.ones_like(chi)
    w = jnp.where(m, w, 0.0)

    # H = sum w (j1 j1^T + diag-ish from e23 rows which only touch theta)
    H = jnp.einsum("c,ci,cj->ij", w, j1, j1)
    sn2 = jnp.sum(sn * sn, axis=-1)
    H = H.at[2, 2].add(jnp.sum(w * sn2))
    b = jnp.einsum("c,ci,c->i", w, j1, e1)
    b = b.at[2].add(jnp.sum(w * jnp.sum(sn * e23, axis=-1)))

    mf = m.astype(jnp.float32)
    chi_total = jnp.sum(mf * chi)
    inl = m & (chi < chi_threshold) if chi_threshold > 0 else m
    num_inliers = jnp.sum(inl.astype(jnp.int32))
    chi_inlier_sum = jnp.sum(jnp.where(inl, chi, 0.0))
    return H, b, chi_total, num_inliers, chi_inlier_sum


def odom_prior_linearize(estimate: Array, prior: Array, weight: float):
    """Geodesic prior residual tying the estimate to the odometry prediction
    (AlignerSliceOdom2DPrior, config :291-310): e = t2v(prior^-1 ∘ T).

    Jacobian for the pre-multiplied increment (see ops/icp.py header):
      J = [[R_A, R_A (-T_y, T_x)^T], [0 0 1]],  A = prior^-1.
    """
    A = geometry.inverse(prior)
    e = geometry.compose(A, estimate)
    ca, sa = jnp.cos(A[2]), jnp.sin(A[2])
    tx, ty = estimate[0], estimate[1]
    # columns: d e / d(dtx, dty, dtheta); rotation block R_A, theta column
    # R_A @ (-ty, tx) from d(compose(dx,T))/dtheta at dx=0
    J = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    J = (
        J.at[0, 0].set(ca).at[0, 1].set(-sa)
        .at[1, 0].set(sa).at[1, 1].set(ca)
        .at[0, 2].set(ca * -ty - sa * tx)
        .at[1, 2].set(sa * -ty + ca * tx)
    )
    H = weight * (J.T @ J)
    b = weight * (J.T @ e)
    chi = weight * jnp.sum(e * e)
    return H, b, chi


def align_multi(
    cfg: AlignerConfig,
    proj: PolarProjection,
    fixed_cues: Cloud,
    extrinsics: Array,
    moving: Cloud,
    initial: Array,
    odom_prior: Array | None = None,
) -> AlignResult:
    """Multi-cue alignment — ``MultiAligner2D`` with several laser slices
    (the MULTI config: two rangefinders, configurations/
    stage_segway_double_config_MULTI.json adds a second al_sl_laser slice).

    fixed_cues: [C, N, ...] per-cue measurement clouds, each in its own sensor
    frame; extrinsics: [C, 3] sensor-in-robot poses; moving: shared scene
    cloud in the previous robot frame. The estimate T maps prev-robot ->
    curr-robot. Per cue, matching runs in the cue's sensor frame (its own
    cached canvas) and linearization in the robot frame via the with-sensor
    equivalence (see module header); normal systems are summed across cues —
    a vmapped fan-out the sequential C++ slice loop cannot batch.
    """
    from ..utils import cloud as cloud_lib

    cue_canvases = jax.vmap(lambda c: projector_op.project_local(proj, c))(fixed_cues)
    fixed_rob = jax.vmap(cloud_lib.transform)(fixed_cues, extrinsics)
    inv_extr = jax.vmap(geometry.inverse)(extrinsics)

    def iteration(estimate):
        def per_cue(canvas, fixed_c, fixed_rob_c, inv_e):
            est_cue = geometry.compose(inv_e, estimate)  # moving -> cue frame
            corr = find_projective(
                proj, canvas, fixed_c, moving, est_cue,
                cfg.point_distance, cfg.normal_cos,
            )
            n_corr = jnp.sum(corr.valid.astype(jnp.int32))
            H, b, chi, n_inl, chi_inl_sum = p2p_linearize(
                estimate, fixed_rob_c, moving, corr, cfg.chi_threshold
            )
            return H, b, chi, n_corr, n_inl, chi_inl_sum

        Hs, bs, chis, ncs, nis, cis = jax.vmap(per_cue)(
            cue_canvases, fixed_cues, fixed_rob, inv_extr
        )
        H = jnp.sum(Hs, axis=0)
        b = jnp.sum(bs, axis=0)
        chi = jnp.sum(chis)
        n_corr = jnp.sum(ncs)
        n_inl = jnp.sum(nis)
        chi_inl_sum = jnp.sum(cis)
        if odom_prior is not None and cfg.odom_weight > 0:
            Ho, bo, chio = odom_prior_linearize(estimate, odom_prior, cfg.odom_weight)
            H, b, chi = H + Ho, b + bo, chi + chio
        H = H + cfg.damping * jnp.eye(3, dtype=H.dtype)
        ok = (n_corr >= max(cfg.min_num_correspondences, 1)) & (
            n_inl >= cfg.min_num_inliers
        )
        dx = solve3(H + (1.0 - ok) * jnp.eye(3, dtype=H.dtype) * 1e6, -b)
        dx = jnp.where(ok, dx, jnp.zeros_like(dx))
        new_estimate = geometry.compose(dx, estimate)
        chi_inl_mean = chi_inl_sum / jnp.maximum(n_inl.astype(jnp.float32), 1.0)
        return new_estimate, (chi, n_corr, n_inl, chi_inl_mean)

    return _iterate(cfg, iteration, initial)


def align(
    cfg: AlignerConfig,
    proj: PolarProjection,
    fixed: Cloud,
    moving: Cloud,
    initial: Array,
    odom_prior: Array | None = None,
) -> AlignResult:
    """Full multi-iteration alignment. ``initial`` and the returned estimate
    are moving-in-fixed pose vectors.

    Not jitted here so callers control jit/vmap boundaries; everything inside
    is trace-compatible (static shapes, lax control flow).
    """
    if cfg.finder == "projective":
        fixed_canvas = projector_op.project_local(proj, fixed)

        def find(estimate):
            return find_projective(
                proj, fixed_canvas, fixed, moving, estimate,
                cfg.point_distance, cfg.normal_cos,
            )

    elif cfg.finder == "nn_grid":
        from . import correspond, distance_map

        field = distance_map.build(
            fixed, cfg.finder_grid_size, cfg.finder_grid_size, cfg.finder_resolution
        )

        def find(estimate):
            return correspond.find_nn_grid(
                field, fixed, moving, estimate,
                cfg.finder_max_distance, cfg.normal_cos,
            )

    elif cfg.finder == "bruteforce":
        from . import correspond

        def find(estimate):
            return correspond.find_bruteforce_nn(
                fixed, moving, estimate, cfg.finder_max_distance, cfg.normal_cos
            )

    else:
        raise ValueError(f"unknown finder {cfg.finder!r}")

    def make_iteration(inlier_only: bool):
        def iteration(estimate):
            corr = find(estimate)
            n_corr = jnp.sum(corr.valid.astype(jnp.int32))
            H, b, chi, n_inl, chi_inl_sum = p2p_linearize(
                estimate, fixed, moving, corr, cfg.chi_threshold,
                inlier_only=inlier_only,
            )
            if odom_prior is not None and cfg.odom_weight > 0:
                Ho, bo, chio = odom_prior_linearize(estimate, odom_prior, cfg.odom_weight)
                H, b, chi = H + Ho, b + bo, chi + chio
            H = H + cfg.damping * jnp.eye(3, dtype=H.dtype)
            # guards: rank-deficient systems keep the estimate, and the
            # solve requires min_num_inliers ACTUAL inliers (chi below the
            # robustifier threshold), not merely correspondences
            ok = (n_corr >= max(cfg.min_num_correspondences, 1)) & (
                n_inl >= cfg.min_num_inliers
            )
            dx = solve3(
                H + (1.0 - ok) * jnp.eye(3, dtype=H.dtype) * 1e6, -b
            )
            dx = jnp.where(ok, dx, jnp.zeros_like(dx))
            new_estimate = geometry.compose(dx, estimate)  # pre-multiplied increment
            chi_inl_mean = chi_inl_sum / jnp.maximum(n_inl.astype(jnp.float32), 1.0)
            return new_estimate, (chi, n_corr, n_inl, chi_inl_mean)

        return iteration

    res = _iterate(cfg, make_iteration(False), initial)
    if cfg.enable_inlier_only_runs and cfg.chi_threshold > 0:
        refined = _iterate(cfg, make_iteration(True), res.estimate)
        res = refined._replace(iterations=res.iterations + refined.iterations)
    if cfg.keep_only_inlier_correspondences and cfg.chi_threshold > 0:
        # one last solve over the surviving inlier correspondences only
        est, (chi, n_corr, n_inl, chi_inl) = make_iteration(True)(res.estimate)
        res = AlignResult(
            estimate=est,
            chi=chi,
            num_correspondences=n_corr,
            num_inliers=n_inl,
            chi_inliers=chi_inl,
            iterations=res.iterations + 1,
            stats=res.stats,
        )
    return res


def _iterate(cfg: AlignerConfig, iteration, initial: Array) -> AlignResult:
    """Shared outer ICP loop: <= max_iterations with optional chi-decay stop."""
    max_it = cfg.max_iterations
    stats0 = jnp.zeros((max_it, 4), jnp.float32)

    def body(state):
        it, estimate, chi_prev, stats, _ = state
        new_estimate, (chi, n_corr, n_inl, chi_inl) = iteration(estimate)
        stats = stats.at[it].set(
            jnp.stack([chi, n_corr.astype(jnp.float32), n_inl.astype(jnp.float32), chi_inl])
        )
        if cfg.epsilon is not None:
            decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
            stop = (it > 0) & decayed
        else:
            stop = jnp.asarray(False)
        return it + 1, new_estimate, chi, stats, stop

    def cond(state):
        it, _, _, _, stop = state
        return (it < max_it) & (~stop)

    init_state = (
        jnp.int32(0),
        jnp.asarray(initial, jnp.float32),
        jnp.float32(jnp.inf),
        stats0,
        jnp.asarray(False),
    )
    it, estimate, chi, stats, _ = jax.lax.while_loop(cond, body, init_state)

    last = jnp.maximum(it - 1, 0)
    return AlignResult(
        estimate=estimate,
        chi=chi,
        num_correspondences=stats[last, 1].astype(jnp.int32),
        num_inliers=stats[last, 2].astype(jnp.int32),
        chi_inliers=stats[last, 3],
        iterations=it,
        stats=stats,
    )
