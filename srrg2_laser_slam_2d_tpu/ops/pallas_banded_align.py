"""Banded fused projective alignment — the tracker fast-path kernel.

Same role as ops/pallas_projective_align.fused_projective_align (the whole
``MultiAligner2D`` inner loop in ONE Pallas kernel; reference behavior per
apps/visual_test_aligner_2d.cpp:109-156 and the NICP math of
octave/solver/nicp.m:4-24 reduced to SE(2)), but exploiting the tracker's
structural invariant: the MOVING cloud is beam-indexed (row r = winner of
canvas beam r — clip_projective output or the merge-canvas cache), and the
frame-to-frame sensor motion is small, so after any in-loop transform point
r's new beam stays within a band of ±W beams of r.

That turns the per-GN-iteration dense [M, B] masked z-buffer compare (the
O(N*B) formulation BENCH_NOTES.md identifies as the single-stream gap to the
C++ baseline) into M/128 block-local [2W, 128] one-hot windows — ~6x fewer
VPU lane-ops per iteration — with the canvas gather done on the MXU
(dot_general against the per-beam fixed-canvas field matrix).

Layout: everything point-indexed is TRANSPOSED ([fields, points]: fields on
sublanes, points on lanes) so per-point math runs at full lane utilization
and the block gather lands as [8, 2W] x [2W, 128] matmuls. Shared building
blocks live in ops/_beam_kernels.py.

Semantics vs the dense kernel (validated trajectory-equivalent in
tests/test_banded_align.py):
  - no moving-side z-buffer: two moving points landing on the same beam BOTH
    match the fixed cell (the dense kernel keeps the closer one) — measured
    zero to sub-mm trajectory effect, since the depth/normal gates already
    reject occluded pairs;
  - the depth gate compares the fixed winner against each moving point's own
    depth rather than the moving winner's;
  - moving points whose beam drifts farther than W from their home row (or
    across the ±pi seam) go unmatched — bounded by W ~ 32 deg of per-frame
    sensor motion, far above tracking motion. Loop-closure alignment (large
    motions) keeps the dense kernel.
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

_WINDOW = bk.WINDOW


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(m_pad: int, cols_padded: int, iterations: int,
                 proj: PolarProjection, point_distance: float, normal_cos: float,
                 chi_threshold: float, min_inliers: int, odom_weight: float):
    def kernel(fgeo_ref, mgeoT_ref, t0_ref, prior_ref, out_t_ref, out_stats_ref,
               out_iters_ref):
        # fixed canvas once (dense z-buffer: the measurement is not
        # beam-indexed, so no band assumption on this side)
        canvasT = bk.build_canvasT(fgeo_ref[:], cols_padded, proj)

        mgeoT = mgeoT_ref[:]                                    # [8, M]
        mov = (mgeoT[0:1, :], mgeoT[1:2, :], mgeoT[2:3, :], mgeoT[3:4, :],
               mgeoT[4:5, :])
        prior = prior_ref[0, :]

        def moving_pass(T):
            f = bk.moving_fields(mov, T, proj)
            return bk.banded_stats(canvasT, f, cols_padded, point_distance,
                                   normal_cos, chi_threshold)

        it_lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)

        def gn_iter(i, carry):
            T, iters_acc = carry
            s = moving_pass(T)
            # iterationStats record at this linearization point
            rec = jnp.stack([s[10], s[9], s[12], s[11]])
            iters_acc = jnp.where(it_lane == i, rec[:, None], iters_acc)
            sums9 = (s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7], s[8])
            if odom_weight > 0:
                sums9 = bk.add_odom_prior(sums9, T, prior, odom_weight)
            h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
            dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22, -b0, -b1, -b2)
            guard = s[9] >= min_inliers
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

        s = moving_pass(T)
        out_t_ref[0, :] = T
        # [chi_total, num_corr, num_inliers, chi_inl_sum]
        out_stats_ref[0, :] = jnp.stack([s[10], s[9], s[12], s[11]])

    return kernel


def _pack(xy, normal, valid):
    n = xy.shape[0]
    return jnp.concatenate(
        [xy, normal, valid.astype(jnp.float32)[:, None],
         jnp.zeros((n, 3), jnp.float32)],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "proj", "iterations", "point_distance", "normal_cos", "chi_threshold",
        "min_inliers", "odom_weight", "interpret",
    ),
)
def fused_projective_align_banded(
    proj: PolarProjection,
    fixed_xy: Array, fixed_normal: Array, fixed_valid: Array,
    moving_xy: Array, moving_normal: Array, moving_valid: Array,
    initial: Array,
    odom_prior: Array | None = None,
    iterations: int = 10,
    point_distance: float = 0.5,
    normal_cos: float = 0.8,
    chi_threshold: float = 0.05,
    min_inliers: int = 10,
    odom_weight: float = 0.0,
    interpret: bool = False,
) -> ProjAlignResult:
    """Banded drop-in for ``fused_projective_align``. REQUIRES the moving
    cloud to be beam-indexed on ``proj`` (row r = beam r winner: the output
    of clip_projective or the tracker's merge-canvas cache)."""
    if moving_xy.shape[0] != proj.cols:
        raise ValueError(
            f"banded aligner needs beam-indexed moving cloud "
            f"({moving_xy.shape[0]} rows != {proj.cols} beams)"
        )
    cols_padded = max(_round_up(proj.cols, 128), _WINDOW)
    m_pad = cols_padded
    pad = m_pad - moving_xy.shape[0]
    mgeo = _pack(moving_xy, moving_normal, moving_valid)
    if pad:
        mgeo = jnp.pad(mgeo, ((0, pad), (0, 0)))
    if iterations > 128:
        raise ValueError("iterationStats record supports <= 128 iterations")
    prior = initial if odom_prior is None else odom_prior
    out_t, out_stats, out_iters = pl.pallas_call(
        _make_kernel(
            m_pad, cols_padded, iterations, proj,
            float(point_distance), float(normal_cos), float(chi_threshold),
            int(min_inliers), float(odom_weight),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
            jax.ShapeDtypeStruct((4, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        _pack(fixed_xy, fixed_normal, fixed_valid),
        mgeo.T,
        initial.reshape(1, 3).astype(jnp.float32),
        prior.reshape(1, 3).astype(jnp.float32),
    )
    return ProjAlignResult(
        estimate=out_t[0],
        chi=out_stats[0, 0],
        num_corr=out_stats[0, 1],
        num_inliers=out_stats[0, 2],
        chi_inl_sum=out_stats[0, 3],
        iter_stats=out_iters[:, :iterations].T,
    )
