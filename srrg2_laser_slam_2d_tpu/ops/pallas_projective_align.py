"""Fused projective ICP alignment — ONE Pallas kernel for the whole
``MultiAligner2D`` inner loop with the reference's beam-space correspondence
model (unlike ops/pallas_icp.py, which uses bounded-NN matching).

Why: the XLA while_loop path (ops/icp.py) costs ~0.5 ms per 10-iteration
alignment on TPU, dominated by per-op overhead of ~50 small ops per iteration
on 721-wide vectors. In this kernel the fixed canvas is built once in VMEM,
and each GN iteration is: transform moving (VPU) -> beam assignment
(polynomial atan2) -> dense [M, B] masked min z-buffer + same-beam match ->
one-hot matmul gathers -> scalar normal-equation reductions -> Cramer solve ->
pose update. Ten iterations never leave VMEM.

Matching semantics == ops/icp.find_projective: both canvases z-buffered,
|Δdepth| <= point_distance, normal-dot >= normal_cos, closest-depth wins with
lowest-index tie-break (the argmin over the point axis picks the first).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_projector import _atan2
from .projector import PolarProjection

Array = jax.Array

_BIG = 1.0e30


class ProjAlignResult(NamedTuple):
    estimate: Array     # [3]
    chi: Array          # []
    num_corr: Array     # [] float32
    num_inliers: Array  # [] float32
    chi_inl_sum: Array  # [] sum of chi over inliers (final pass)
    # per-GN-iteration record, evaluated at each iteration's linearization
    # point — the reference aligner's iterationStats() surface
    # (visual_test_aligner_2d.cpp:156)
    iter_stats: Array   # [iterations, 4]: chi, n_corr, n_inliers, chi_inl_sum


def _compose(a, b):
    ca, sa = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.stack(
        [a[0] + ca * b[0] - sa * b[1], a[1] + sa * b[0] + ca * b[1], a[2] + b[2]]
    )


def _solve3_sym(a00, a01, a02, a11, a12, a22, b0, b1, b2):
    a10, a20, a21 = a01, a02, a12
    det = (
        a00 * (a11 * a22 - a12 * a21)
        - a01 * (a10 * a22 - a12 * a20)
        + a02 * (a10 * a21 - a11 * a20)
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    x0 = ((a11 * a22 - a12 * a21) * b0 + (a02 * a21 - a01 * a22) * b1
          + (a01 * a12 - a02 * a11) * b2) * inv_det
    x1 = ((a12 * a20 - a10 * a22) * b0 + (a00 * a22 - a02 * a20) * b1
          + (a02 * a10 - a00 * a12) * b2) * inv_det
    x2 = ((a10 * a21 - a11 * a20) * b0 + (a01 * a20 - a00 * a21) * b1
          + (a00 * a11 - a01 * a10) * b2) * inv_det
    return x0, x1, x2


def _make_kernel(n_fixed: int, n_moving: int, cols_padded: int, iterations: int,
                 proj: PolarProjection, point_distance: float, normal_cos: float,
                 chi_threshold: float, min_inliers: int, odom_weight: float):
    def beam_fields(x, y, v):
        """Per-point depth/beam/validity from sensor-frame coords."""
        d = jnp.sqrt(x * x + y * y)
        ang = _atan2(y, x)
        colf = jnp.floor(ang * proj.f + proj.c)
        ok = (
            (v > 0)
            & (colf >= 0)
            & (colf < proj.cols)
            & (d >= proj.range_min)
            & (d <= proj.range_max)
        )
        return d, colf, ok

    def zbuffer(x, y, v, beam_ids):
        """Dense masked min/argmin z-buffer + per-point canvas gather.

        Returns per-beam (depth, onehot matrix) where onehot[m, b] = 1 iff
        point m is the canvas winner of beam b."""
        d, colf, ok = beam_fields(x, y, v)
        col = colf.astype(jnp.int32)
        hit = (col[:, None] == beam_ids) & ok[:, None]         # [N, B]
        dm = jnp.where(hit, d[:, None], _BIG)
        bmin = jnp.min(dm, axis=0)                              # [B]
        # winner selection without cumsum/iota (neither lowers in Mosaic):
        # normalized one-hot — exact-equal-depth ties are averaged instead of
        # first-index picked (bitwise-equal f32 depths on one beam are
        # vanishingly rare on real data; duplicates average to themselves)
        is_min = (dm <= bmin[None, :]) & hit
        cnt = jnp.maximum(jnp.sum(is_min.astype(jnp.float32), axis=0), 1.0)
        onehot = is_min.astype(jnp.float32) / cnt[None, :]
        return bmin, onehot

    def kernel(fgeo_ref, mgeo_ref, t0_ref, prior_ref, out_t_ref, out_stats_ref,
               out_iters_ref):
        # fgeo: [F, 8] = (x, y, nx, ny, valid, 0, 0, 0) — fixed cloud (sensor frame)
        # mgeo: [M, 8] — moving cloud (its own frame)
        beam_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols_padded), 1)
        fgeo = fgeo_ref[:]
        fx, fy = fgeo[:, 0], fgeo[:, 1]
        fnx, fny = fgeo[:, 2], fgeo[:, 3]
        fv = fgeo[:, 4]
        mgeo = mgeo_ref[:]
        mx0, my0 = mgeo[:, 0], mgeo[:, 1]
        mnx0, mny0 = mgeo[:, 2], mgeo[:, 3]
        mv = mgeo[:, 4]

        # fixed canvas once: per-beam depth + correspondent fields
        fmin, fhot = zbuffer(fx, fy, fv, beam_ids)              # [B], [F, B]
        # gather fixed winner fields onto beams: [B] = onehot^T-weighted sums
        def beam_gather(hot, *fields):
            return [
                jax.lax.dot_general(
                    f[None, :], hot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
                for f in fields
            ]

        bfx, bfy, bfnx, bfny = beam_gather(fhot, fx, fy, fnx, fny)
        f_has = jnp.sum(fhot, axis=0) > 0                        # [B]

        prior = prior_ref[0, :]
        it_lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)

        def gn_iter(i, carry):
            T, iters_acc = carry
            c, s = jnp.cos(T[2]), jnp.sin(T[2])
            px = c * mx0 - s * my0 + T[0]
            py = s * mx0 + c * my0 + T[1]
            nx = c * mnx0 - s * mny0
            ny = s * mnx0 + c * mny0
            mmin, mhot = zbuffer(px, py, mv, beam_ids)          # [B], [M, B]
            bpx, bpy, bnx, bny = beam_gather(mhot, px, py, nx, ny)
            m_has = jnp.sum(mhot, axis=0) > 0

            close = jnp.abs(fmin - mmin) <= point_distance
            ndot = bfnx * bnx + bfny * bny
            ok = f_has & m_has & close & (ndot >= normal_cos)   # [B]

            e1 = bfnx * (bpx - bfx) + bfny * (bpy - bfy)
            e2 = bnx - bfnx
            e3 = bny - bfny
            chi = e1 * e1 + e2 * e2 + e3 * e3
            if chi_threshold > 0:
                w = jnp.where(chi < chi_threshold, 1.0,
                              chi_threshold / jnp.maximum(chi, 1e-20))
            else:
                w = jnp.ones_like(chi)
            w = jnp.where(ok, w, 0.0)

            j1c = bfnx * (-bpy) + bfny * bpx
            sn2 = bnx * bnx + bny * bny
            h00 = jnp.sum(w * bfnx * bfnx)
            h01 = jnp.sum(w * bfnx * bfny)
            h02 = jnp.sum(w * bfnx * j1c)
            h11 = jnp.sum(w * bfny * bfny)
            h12 = jnp.sum(w * bfny * j1c)
            h22 = jnp.sum(w * (j1c * j1c + sn2))
            b0 = jnp.sum(w * bfnx * e1)
            b1 = jnp.sum(w * bfny * e1)
            b2 = jnp.sum(w * (j1c * e1 + (-bny) * e2 + bnx * e3))

            if odom_weight > 0:
                # geodesic prior (ops/icp.odom_prior_linearize): A = prior^-1
                ca, sa = jnp.cos(-prior[2]), jnp.sin(-prior[2])
                atx = -(jnp.cos(prior[2]) * prior[0] + jnp.sin(prior[2]) * prior[1])
                aty = -(-jnp.sin(prior[2]) * prior[0] + jnp.cos(prior[2]) * prior[1])
                ex = atx + ca * T[0] - sa * T[1]
                ey = aty + sa * T[0] + ca * T[1]
                et = T[2] - prior[2]
                jx2 = ca * -T[1] - sa * T[0]
                jy2 = sa * -T[1] + ca * T[0]
                h00p = h00 + odom_weight * (ca * ca + sa * sa)
                h01p = h01  # R^T R = I -> off-diagonal translation terms are 0
                h02p = h02 + odom_weight * (ca * jx2 + sa * jy2)
                h11p = h11 + odom_weight * (ca * ca + sa * sa)
                h12p = h12 + odom_weight * (-sa * jx2 + ca * jy2)
                h22p = h22 + odom_weight * (jx2 * jx2 + jy2 * jy2 + 1.0)
                b0p = b0 + odom_weight * (ca * ex + sa * ey)
                b1p = b1 + odom_weight * (-sa * ex + ca * ey)
                b2p = b2 + odom_weight * (jx2 * ex + jy2 * ey + et)
                h00, h01, h02, h11, h12, h22 = h00p, h01p, h02p, h11p, h12p, h22p
                b0, b1, b2 = b0p, b1p, b2p

            n_ok = jnp.sum(ok.astype(jnp.float32))
            # iterationStats record at this linearization point (lane i of
            # rows chi / n_corr / n_inliers / chi_inl_sum)
            chi_ok = jnp.where(ok, chi, 0.0)
            thr_i = chi_threshold if chi_threshold > 0 else _BIG
            inl_i = ok & (chi < thr_i)
            rec = jnp.stack(
                [
                    jnp.sum(chi_ok),
                    n_ok,
                    jnp.sum(inl_i.astype(jnp.float32)),
                    jnp.sum(jnp.where(inl_i, chi, 0.0)),
                ]
            )
            iters_acc = jnp.where(it_lane == i, rec[:, None], iters_acc)
            dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22, -b0, -b1, -b2)
            guard = n_ok >= min_inliers
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

        # final stats
        c, s = jnp.cos(T[2]), jnp.sin(T[2])
        px = c * mx0 - s * my0 + T[0]
        py = s * mx0 + c * my0 + T[1]
        nx = c * mnx0 - s * mny0
        ny = s * mnx0 + c * mny0
        mmin, mhot = zbuffer(px, py, mv, beam_ids)
        bpx, bpy, bnx, bny = beam_gather(mhot, px, py, nx, ny)
        m_has = jnp.sum(mhot, axis=0) > 0
        close = jnp.abs(fmin - mmin) <= point_distance
        ndot = bfnx * bnx + bfny * bny
        ok = f_has & m_has & close & (ndot >= normal_cos)
        e1 = bfnx * (bpx - bfx) + bfny * (bpy - bfy)
        e2 = bnx - bfnx
        e3 = bny - bfny
        chi = jnp.where(ok, e1 * e1 + e2 * e2 + e3 * e3, 0.0)
        thr = chi_threshold if chi_threshold > 0 else _BIG
        inl = ok & (chi < thr)
        out_t_ref[0, :] = T
        out_stats_ref[0, :] = jnp.stack(
            [
                jnp.sum(chi),
                jnp.sum(ok.astype(jnp.float32)),
                jnp.sum(inl.astype(jnp.float32)),
                jnp.sum(jnp.where(inl, chi, 0.0)),
            ]
        )

    return kernel


def _pack(xy, normal, valid):
    n = xy.shape[0]
    return jnp.concatenate(
        [xy, normal, valid.astype(jnp.float32)[:, None], jnp.zeros((n, 3), jnp.float32)],
        axis=1,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "proj", "iterations", "point_distance", "normal_cos", "chi_threshold",
        "min_inliers", "odom_weight", "interpret",
    ),
)
def fused_projective_align(
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
    """Whole projective alignment as one kernel. ``initial`` is moving-in-
    fixed; fixed cloud must be in the (identity-camera) fixed frame."""
    if iterations > 128:
        raise ValueError("iterationStats record supports <= 128 iterations")
    cols_padded = _round_up(proj.cols, 128)
    prior = initial if odom_prior is None else odom_prior
    out_t, out_stats, out_iters = pl.pallas_call(
        _make_kernel(
            fixed_xy.shape[0], moving_xy.shape[0], cols_padded, iterations, proj,
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
        _pack(moving_xy, moving_normal, moving_valid),
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
