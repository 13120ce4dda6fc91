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
and the block gather lands as [8, 2W] x [2W, 128] matmuls.

Semantics vs the dense kernel (validated trajectory-equivalent in
tests/test_banded_align.py):
  - no moving-side z-buffer: two moving points landing on the same beam BOTH
    match the fixed cell (the dense kernel keeps the closer one) — measure
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

from .pallas_projector import _atan2
from .pallas_projective_align import ProjAlignResult, _compose, _solve3_sym
from .projector import PolarProjection

Array = jax.Array

_BIG = 1.0e30
_WINDOW = 256  # band window width (2W, W = 128 beams ~ 64 deg at 721/2pi)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(n_fixed: int, m_pad: int, cols_padded: int, iterations: int,
                 proj: PolarProjection, point_distance: float, normal_cos: float,
                 chi_threshold: float, min_inliers: int, odom_weight: float):
    n_blocks = m_pad // 128

    def window_start(i: int) -> int:
        return min(max(i * 128 - (_WINDOW - 128) // 2, 0), cols_padded - _WINDOW)

    def kernel(fgeo_ref, mgeoT_ref, t0_ref, prior_ref, out_t_ref, out_stats_ref):
        # ---- fixed canvas, built once (dense z-buffer over the measurement;
        # the measurement is not beam-indexed, so no band assumption here) ----
        fgeo = fgeo_ref[:]
        fx, fy = fgeo[:, 0], fgeo[:, 1]
        fnx, fny = fgeo[:, 2], fgeo[:, 3]
        fv = fgeo[:, 4]
        beam_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols_padded), 1)

        fd = jnp.sqrt(fx * fx + fy * fy)
        fang = _atan2(fy, fx)
        fcolf = jnp.floor(fang * proj.f + proj.c)
        fok = (
            (fv > 0) & (fcolf >= 0) & (fcolf < proj.cols)
            & (fd >= proj.range_min) & (fd <= proj.range_max)
        )
        fcol = fcolf.astype(jnp.int32)
        hit = (fcol[:, None] == beam_ids) & fok[:, None]        # [F, B]
        dm = jnp.where(hit, fd[:, None], _BIG)
        fmin = jnp.min(dm, axis=0)                              # [B]
        is_min = (dm <= fmin[None, :]) & hit
        cnt = jnp.maximum(jnp.sum(is_min.astype(jnp.float32), axis=0), 1.0)
        fhot = is_min.astype(jnp.float32) / cnt[None, :]        # [F, B]

        def gather_beam(field):                                 # [F] -> [1, B]
            return jax.lax.dot_general(
                field[None, :], fhot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        f_has = (jnp.sum(fhot, axis=0) > 0).astype(jnp.float32)
        canvasT = jnp.concatenate(
            [
                fmin[None, :],
                gather_beam(fx), gather_beam(fy),
                gather_beam(fnx), gather_beam(fny),
                f_has[None, :],
                jnp.zeros((2, cols_padded), jnp.float32),
            ],
            axis=0,
        )                                                       # [8, B]

        mgeoT = mgeoT_ref[:]                                    # [8, M]
        mx, my = mgeoT[0:1, :], mgeoT[1:2, :]
        mnx, mny = mgeoT[2:3, :], mgeoT[3:4, :]
        mv = mgeoT[4:5, :]
        prior = prior_ref[0, :]
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (_WINDOW, 128), 0)

        def moving_pass(T):
            """Transform moving, banded-match against the canvas; returns the
            per-block quantities needed by both the GN step and final stats."""
            c_, s_ = jnp.cos(T[2]), jnp.sin(T[2])
            px = c_ * mx - s_ * my + T[0]
            py = s_ * mx + c_ * my + T[1]
            nx = c_ * mnx - s_ * mny
            ny = s_ * mnx + c_ * mny
            d = jnp.sqrt(px * px + py * py)
            ang = _atan2(py, px)
            colf = jnp.floor(ang * proj.f + proj.c)
            okp = (
                (mv > 0) & (colf >= 0) & (colf < proj.cols)
                & (d >= proj.range_min) & (d <= proj.range_max)
            )
            col_i = jnp.where(okp, colf, -1.0).astype(jnp.int32)

            acc = jnp.zeros((13, 128), jnp.float32)
            for i in range(n_blocks):
                sl = slice(i * 128, (i + 1) * 128)
                w0 = window_start(i)
                local = col_i[:, sl] - w0                       # [1, 128]
                hot = ((win_iota == local) & okp[:, sl]).astype(jnp.float32)
                gath = jax.lax.dot_general(                     # [8, 128]
                    canvasT[:, w0:w0 + _WINDOW], hot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                bmin, bfx, bfy = gath[0:1], gath[1:2], gath[2:3]
                bfnx, bfny, bhas = gath[3:4], gath[4:5], gath[5:6]
                px_b, py_b, d_b = px[:, sl], py[:, sl], d[:, sl]
                nx_b, ny_b = nx[:, sl], ny[:, sl]

                close = jnp.abs(bmin - d_b) <= point_distance
                ndot = bfnx * nx_b + bfny * ny_b
                ok = (bhas > 0.5) & close & (ndot >= normal_cos)

                e1 = bfnx * (px_b - bfx) + bfny * (py_b - bfy)
                e2 = nx_b - bfnx
                e3 = ny_b - bfny
                chi = e1 * e1 + e2 * e2 + e3 * e3
                if chi_threshold > 0:
                    w = jnp.where(chi < chi_threshold, 1.0,
                                  chi_threshold / jnp.maximum(chi, 1e-20))
                else:
                    w = jnp.ones_like(chi)
                w = jnp.where(ok, w, 0.0)
                okf = ok.astype(jnp.float32)

                j1c = bfnx * (-py_b) + bfny * px_b
                sn2 = nx_b * nx_b + ny_b * ny_b
                thr = chi_threshold if chi_threshold > 0 else _BIG
                inl = okf * (chi < thr).astype(jnp.float32)
                terms = jnp.concatenate(
                    [
                        w * bfnx * bfnx,                    # 0 h00
                        w * bfnx * bfny,                    # 1 h01
                        w * bfnx * j1c,                     # 2 h02
                        w * bfny * bfny,                    # 3 h11
                        w * bfny * j1c,                     # 4 h12
                        w * (j1c * j1c + sn2),              # 5 h22
                        w * bfnx * e1,                      # 6 b0
                        w * bfny * e1,                      # 7 b1
                        w * (j1c * e1 - ny_b * e2 + nx_b * e3),  # 8 b2
                        okf,                                # 9 n_ok
                        okf * chi,                          # 10 chi sum
                        inl * chi,                          # 11 inlier chi
                        inl,                                # 12 inlier count
                    ],
                    axis=0,
                )
                acc = acc + terms
            return jnp.sum(acc, axis=1)                         # [12]

        def gn_iter(_, T):
            s = moving_pass(T)
            h00, h01, h02, h11, h12, h22 = s[0], s[1], s[2], s[3], s[4], s[5]
            b0, b1, b2 = s[6], s[7], s[8]
            n_ok = s[9]

            if odom_weight > 0:
                # geodesic odometry prior (ops/icp.odom_prior_linearize)
                ca, sa = jnp.cos(-prior[2]), jnp.sin(-prior[2])
                atx = -(jnp.cos(prior[2]) * prior[0] + jnp.sin(prior[2]) * prior[1])
                aty = -(-jnp.sin(prior[2]) * prior[0] + jnp.cos(prior[2]) * prior[1])
                ex = atx + ca * T[0] - sa * T[1]
                ey = aty + sa * T[0] + ca * T[1]
                et = T[2] - prior[2]
                jx2 = ca * -T[1] - sa * T[0]
                jy2 = sa * -T[1] + ca * T[0]
                h00 = h00 + odom_weight * (ca * ca + sa * sa)
                h02 = h02 + odom_weight * (ca * jx2 + sa * jy2)
                h11 = h11 + odom_weight * (ca * ca + sa * sa)
                h12 = h12 + odom_weight * (-sa * jx2 + ca * jy2)
                h22 = h22 + odom_weight * (jx2 * jx2 + jy2 * jy2 + 1.0)
                b0 = b0 + odom_weight * (ca * ex + sa * ey)
                b1 = b1 + odom_weight * (-sa * ex + ca * ey)
                b2 = b2 + odom_weight * (jx2 * ex + jy2 * ey + et)

            dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22, -b0, -b1, -b2)
            guard = n_ok >= min_inliers
            dx = jnp.stack(
                [
                    jnp.where(guard, dx0, 0.0),
                    jnp.where(guard, dx1, 0.0),
                    jnp.where(guard, dx2, 0.0),
                ]
            )
            return _compose(dx, T)

        T = jax.lax.fori_loop(0, iterations, gn_iter, t0_ref[0, :])

        s = moving_pass(T)
        out_t_ref[0, :] = T
        # [chi_total, num_corr, num_inliers, chi_inliers]
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
    prior = initial if odom_prior is None else odom_prior
    out_t, out_stats = pl.pallas_call(
        _make_kernel(
            fixed_xy.shape[0], m_pad, cols_padded, iterations, proj,
            float(point_distance), float(normal_cos), float(chi_threshold),
            int(min_inliers), float(odom_weight),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
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
    )
