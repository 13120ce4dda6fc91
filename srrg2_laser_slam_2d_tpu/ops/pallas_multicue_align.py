"""Fused multi-cue projective alignment — the MULTI-config fast path.

One Pallas kernel runs the whole multi-rangefinder ``MultiAligner2D`` inner
loop (reference: the MULTI assembly adds a second ``al_sl_laser`` slice,
configurations/stage_segway_double_config_MULTI.json; slice loop semantics
per apps/visual_test_aligner_2d.cpp:109-156): per GN iteration, EVERY cue's
measurement canvas is matched against the shared moving cloud and the per-cue
normal systems are reduced into ONE 3x3 solve — the cue fan-out the C++
slice-sequential loop cannot batch.

Frame handling: the estimate T maps prev-robot -> curr-robot (same convention
as ops/icp.align_multi). Cue c matches in its own sensor frame at
``T_c = inv(extrinsic_c) ∘ T`` against a canvas of its measurement z-buffered
at identity. The per-cue sums from ``bk.banded_stats`` are therefore normal
equations in the CUE-frame left-increment ``dx_c``; a left increment on the
robot estimate maps through the conjugation ``v2t(dx_c) = inv_e · v2t(dx) · e``,
whose first-order linear map is the constant

    A_c = [ R_eᵀ   R_eᵀ·(-t_ey, t_ex)ᵀ ]          dx_c = A_c · dx
          [ 0 0            1           ]

so the robot-frame system is ``H = Σ_c A_cᵀ H_c A_c``, ``b = Σ_c A_cᵀ b_c``
(point-to-plane residuals are frame-invariant, so chi/inlier bookkeeping
passes through unchanged). The odometry prior is added directly in the robot
frame (bk.add_odom_prior).

The per-cue match runs ``bk.banded_stats`` with ``window = cols_padded``
(i.e. dense): cues sit at arbitrary extrinsics (e.g. front/rear lasers), so a
moving point's beam in cue c's canvas has no banded relation to its row
index. C is static and small (2 in the MULTI config); the cue loop unrolls.

Semantics vs icp.align_multi (validated in tests/test_multicue.py):
  - no moving-side z-buffer (same accepted difference as the banded
    single-cue kernel — see ops/pallas_banded_align.py module header);
  - fixed ``iterations`` (no epsilon early-exit), like the other fused paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _beam_kernels as bk
from .pallas_projective_align import ProjAlignResult, _compose, _solve3_sym
from .projector import PolarProjection

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _remap_sums9(sums9, a00, a01, a02, a10, a11, a12):
    """H -> AᵀHA, b -> Aᵀb for A = [[a00,a01,a02],[a10,a11,a12],[0,0,1]]
    (scalar algebra; the third row of A is fixed)."""
    h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
    # M = H·A (rows of the symmetric H)
    m00 = h00 * a00 + h01 * a10
    m01 = h00 * a01 + h01 * a11
    m02 = h00 * a02 + h01 * a12 + h02
    m10 = h01 * a00 + h11 * a10
    m11 = h01 * a01 + h11 * a11
    m12 = h01 * a02 + h11 * a12 + h12
    m22 = h02 * a02 + h12 * a12 + h22
    # Aᵀ·M (symmetric result, unique entries)
    r00 = a00 * m00 + a10 * m10
    r01 = a00 * m01 + a10 * m11
    r02 = a00 * m02 + a10 * m12
    r11 = a01 * m01 + a11 * m11
    r12 = a01 * m02 + a11 * m12
    r22 = a02 * m02 + a12 * m12 + m22
    rb0 = a00 * b0 + a10 * b1
    rb1 = a01 * b0 + a11 * b1
    rb2 = a02 * b0 + a12 * b1 + b2
    return r00, r01, r02, r11, r12, r22, rb0, rb1, rb2


def _make_kernel(n_cues: int, cols_padded: int, iterations: int,
                 proj: PolarProjection, point_distance: float,
                 normal_cos: float, chi_threshold: float, min_inliers: int,
                 min_corr: int, odom_weight: float, damping: float):
    def kernel(fgeoC_ref, mgeoT_ref, t0_ref, prior_ref, cue_ref,
               out_t_ref, out_stats_ref, out_iters_ref):
        # per-cue fixed canvases once (measurement at identity in cue frame)
        canvases = [
            bk.build_canvasT(fgeoC_ref[c], cols_padded, proj)
            for c in range(n_cues)
        ]
        mgeoT = mgeoT_ref[:]                                  # [8, M] robot frame
        mov = (mgeoT[0:1, :], mgeoT[1:2, :], mgeoT[2:3, :], mgeoT[3:4, :],
               mgeoT[4:5, :])
        prior = prior_ref[0, :]
        cue = cue_ref[:]                  # [C, 8]: 0:3 inv_e, 3:5 (a02, a12)

        def all_cues(T):
            """Accumulate robot-frame sums + stats over every cue at T."""
            acc9 = (0.0,) * 9
            n_ok = chi_sum = inl_chi = inl_cnt = 0.0
            for c in range(n_cues):
                inv_e = cue[c, 0:3]
                Tc = bk.compose_s(inv_e, T)
                f = bk.moving_fields(mov, Tc, proj)
                s = bk.banded_stats(
                    canvases[c], f, cols_padded, point_distance,
                    normal_cos, chi_threshold, window=cols_padded,
                )
                ci, si = jnp.cos(inv_e[2]), jnp.sin(inv_e[2])
                r9 = _remap_sums9(
                    (s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7], s[8]),
                    ci, -si, cue[c, 3], si, ci, cue[c, 4],
                )
                acc9 = tuple(a + r for a, r in zip(acc9, r9))
                n_ok = n_ok + s[9]
                chi_sum = chi_sum + s[10]
                inl_chi = inl_chi + s[11]
                inl_cnt = inl_cnt + s[12]
            return acc9, n_ok, chi_sum, inl_chi, inl_cnt

        it_lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)

        def gn_iter(i, carry):
            T, iters_acc = carry
            sums9, n_ok, chi_sum, inl_chi, inl_cnt = all_cues(T)
            rec = jnp.stack([chi_sum, n_ok, inl_cnt, inl_chi])
            iters_acc = jnp.where(it_lane == i, rec[:, None], iters_acc)
            if odom_weight > 0:
                sums9 = bk.add_odom_prior(sums9, T, prior, odom_weight)
            h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
            h00, h11, h22 = h00 + damping, h11 + damping, h22 + damping
            dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22,
                                        -b0, -b1, -b2)
            guard = (inl_cnt >= min_inliers) & (n_ok >= max(min_corr, 1))
            dx = jnp.stack(
                [
                    jnp.where(guard, dx0, 0.0),
                    jnp.where(guard, dx1, 0.0),
                    jnp.where(guard, dx2, 0.0),
                ]
            )
            return _compose(dx, T), iters_acc

        T, iters_acc = jax.lax.fori_loop(
            0, iterations, gn_iter,
            (t0_ref[0, :], jnp.zeros((4, 128), jnp.float32)),
        )
        out_iters_ref[:] = iters_acc

        _, n_ok, chi_sum, inl_chi, inl_cnt = all_cues(T)
        out_t_ref[0, :] = T
        out_stats_ref[0, :] = jnp.stack([chi_sum, n_ok, inl_cnt, inl_chi])

    return kernel


def _pack_cues(xy, normal, valid):
    c, n = xy.shape[0], xy.shape[1]
    return jnp.concatenate(
        [xy, normal, valid.astype(jnp.float32)[..., None],
         jnp.zeros((c, n, 3), jnp.float32)],
        axis=2,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "proj", "iterations", "point_distance", "normal_cos", "chi_threshold",
        "min_inliers", "min_corr", "odom_weight", "damping", "interpret",
    ),
)
def fused_projective_align_multi(
    proj: PolarProjection,
    fixed_xy: Array, fixed_normal: Array, fixed_valid: Array,   # [C, N, ...]
    extrinsics: Array,                                          # [C, 3]
    moving_xy: Array, moving_normal: Array, moving_valid: Array,  # [M, ...]
    initial: Array,
    odom_prior: Array | None = None,
    iterations: int = 10,
    point_distance: float = 0.5,
    normal_cos: float = 0.8,
    chi_threshold: float = 0.05,
    min_inliers: int = 10,
    min_corr: int = 1,
    odom_weight: float = 0.0,
    damping: float = 0.0,
    interpret: bool = False,
) -> ProjAlignResult:
    """Multi-cue drop-in for ``icp.align_multi`` (same frame conventions)."""
    from ..utils import geometry

    n_cues = int(fixed_xy.shape[0])
    cols_padded = _round_up(proj.cols, 128)
    m_pad = _round_up(int(moving_xy.shape[0]), 128)
    pad = m_pad - moving_xy.shape[0]
    mgeo = jnp.concatenate(
        [moving_xy, moving_normal,
         moving_valid.astype(jnp.float32)[:, None],
         jnp.zeros((moving_xy.shape[0], 3), jnp.float32)],
        axis=1,
    )
    if pad:
        mgeo = jnp.pad(mgeo, ((0, pad), (0, 0)))
    if iterations > 128:
        raise ValueError("iterationStats record supports <= 128 iterations")

    # cue constants: inv(extrinsic) pose + the A_c translation column
    # R_eᵀ·(-t_ey, t_ex)ᵀ (see module header)
    inv_e = jax.vmap(geometry.inverse)(extrinsics)
    ce, se = jnp.cos(extrinsics[:, 2]), jnp.sin(extrinsics[:, 2])
    tex, tey = extrinsics[:, 0], extrinsics[:, 1]
    a02 = ce * (-tey) + se * tex
    a12 = -se * (-tey) + ce * tex
    cue_const = jnp.zeros((n_cues, 8), jnp.float32)
    cue_const = cue_const.at[:, 0:3].set(inv_e)
    cue_const = cue_const.at[:, 3].set(a02)
    cue_const = cue_const.at[:, 4].set(a12)

    prior = initial if odom_prior is None else odom_prior
    out_t, out_stats, out_iters = pl.pallas_call(
        _make_kernel(
            n_cues, cols_padded, iterations, proj,
            float(point_distance), float(normal_cos), float(chi_threshold),
            int(min_inliers), int(min_corr), float(odom_weight),
            float(damping),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
            jax.ShapeDtypeStruct((4, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        _pack_cues(fixed_xy, fixed_normal, fixed_valid),
        mgeo.T,
        initial.reshape(1, 3).astype(jnp.float32),
        prior.reshape(1, 3).astype(jnp.float32),
        cue_const,
    )
    return ProjAlignResult(
        estimate=out_t[0],
        chi=out_stats[0, 0],
        num_corr=out_stats[0, 1],
        num_inliers=out_stats[0, 2],
        chi_inl_sum=out_stats[0, 3],
        iter_stats=out_iters[:, :iterations].T,
    )
