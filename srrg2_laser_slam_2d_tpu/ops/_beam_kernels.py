"""Shared traced building blocks for the beam-space Pallas kernels
(ops/pallas_banded_align.py, ops/pallas_frame.py).

These are plain functions traced INSIDE Pallas kernels; they assume the
transposed beam layout ([fields, points/beams]: fields on sublanes, points on
lanes) so per-point math runs at full lane utilization.

Conventions:
  - "canvasT" [8, B]: per-beam fixed-canvas fields — rows 0 depth, 1 x, 2 y,
    3 nx, 4 ny, 5 has-point, 6-7 zero (sensor frame, camera at identity).
  - scalar SE(2) pose math on [3] vectors mirrors utils/geometry.py but
    WITHOUT angle wrapping (jnp.mod-free; unwrapped angles are what the
    fused aligner kernels already return).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .pallas_projector import _atan2
from .projector import PolarProjection

_BIG = 1.0e30
WINDOW = 256  # banded-match window width (2W beams)


# ---------------------------------------------------------------- scalar SE2

def compose_s(a, b):
    """compose on [3] pose vectors, unwrapped angle (geometry.compose:52)."""
    ca, sa = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.stack(
        [a[0] + ca * b[0] - sa * b[1], a[1] + sa * b[0] + ca * b[1], a[2] + b[2]]
    )


def inverse_s(a):
    """inverse on [3] pose vectors (geometry.inverse:63)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.stack([-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]), -a[2]])


def relative_s(a, b):
    return compose_s(inverse_s(a), b)


# ------------------------------------------------------------- fixed canvas

def build_canvasT(fgeo, cols_padded: int, proj: PolarProjection):
    """Dense z-buffer of a (non-beam-indexed) cloud at the identity camera.

    fgeo: [F, 8] rows (x, y, nx, ny, valid, ...). Returns canvasT [8, B].
    Equal-depth ties are averaged (bitwise-equal f32 depths on one beam are
    vanishingly rare on real data; duplicates average to themselves)."""
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
    return jnp.concatenate(
        [
            fmin[None, :],
            gather_beam(fx), gather_beam(fy),
            gather_beam(fnx), gather_beam(fny),
            f_has[None, :],
            jnp.zeros((2, cols_padded), jnp.float32),
        ],
        axis=0,
    )


# ------------------------------------------------------------- moving cloud

def moving_fields(mov, T, proj: PolarProjection):
    """Transform the moving rows by pose T and compute beam assignment.

    mov: tuple of [1, M] rows (x, y, nx, ny, valid). Returns dict of [1, M]
    rows: px, py, nx, ny, d, col_i (int32, -1 invalid), okp (bool)."""
    mx, my, mnx, mny, mv = mov
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
    return dict(px=px, py=py, nx=nx, ny=ny, d=d, col_i=col_i, okp=okp)


def window_start(i: int, cols_padded: int, window: int = WINDOW) -> int:
    return min(max(i * 128 - (window - 128) // 2, 0), cols_padded - window)


def banded_stats(canvasT, f, cols_padded: int, point_distance: float,
                 normal_cos: float, chi_threshold: float,
                 window: int = WINDOW):
    """Banded match of transformed moving rows against canvasT + normal-
    equation reduction. ``f`` is moving_fields' output (M = lane count of its
    rows, a multiple of 128; rows are beam-indexed: lane r was beam r).

    ``window`` is the band width in beams (multiple of 128, >= 128): must
    cover the largest per-iteration beam drift (per-frame motion x angular
    focal) plus the convergence basin; the [window, 128] hot-matrix build is
    the banded match's dominant VPU cost, so size it to the platform motion.

    Returns [13] sums: h00 h01 h02 h11 h12 h22 b0 b1 b2 n_ok chi_sum
    inl_chi inl_count."""
    m_pad = f["px"].shape[1]
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (window, 128), 0)
    acc = jnp.zeros((13, 128), jnp.float32)
    for i in range(m_pad // 128):
        sl = slice(i * 128, (i + 1) * 128)
        w0 = window_start(i, cols_padded, window)
        local = f["col_i"][:, sl] - w0                      # [1, 128]
        hot = ((win_iota == local) & f["okp"][:, sl]).astype(jnp.float32)
        gath = jax.lax.dot_general(                         # [8, 128]
            canvasT[:, w0:w0 + window], hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bmin, bfx, bfy = gath[0:1], gath[1:2], gath[2:3]
        bfnx, bfny, bhas = gath[3:4], gath[4:5], gath[5:6]
        px_b, py_b, d_b = f["px"][:, sl], f["py"][:, sl], f["d"][:, sl]
        nx_b, ny_b = f["nx"][:, sl], f["ny"][:, sl]

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
                w * bfnx * bfnx, w * bfnx * bfny, w * bfnx * j1c,
                w * bfny * bfny, w * bfny * j1c, w * (j1c * j1c + sn2),
                w * bfnx * e1, w * bfny * e1,
                w * (j1c * e1 - ny_b * e2 + nx_b * e3),
                okf, okf * chi, inl * chi, inl,
            ],
            axis=0,
        )
        acc = acc + terms
    return jnp.sum(acc, axis=1)


def add_odom_prior(sums9, T, prior, odom_weight: float):
    """Add the geodesic odometry-prior factor to the 9 normal-equation sums
    (ops/icp.odom_prior_linearize semantics)."""
    h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
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
    return h00, h01, h02, h11, h12, h22, b0, b1, b2


# ----------------------------------------------------------- lane utilities

def lane_prefix_sum(x):
    """Inclusive prefix sum along lanes of [1, B] (log-step rolled adds)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < x.shape[1]:
        r = pltpu.roll(s, k, axis=1)
        s = s + jnp.where(lane >= k, r, 0.0)
        k *= 2
    return s


def beam_zbuffer_by_shifts(vals, d, col_i, okp, max_shift: int):
    """Per-beam z-buffer of beam-indexed rows via static shift enumeration.

    Cells live at lane r (their home beam); cell r targets beam col_i[r].
    Only |col_i - r| <= max_shift contributions are considered (the banded
    invariant). vals: [K, B] field rows to carry to the winning beam.

    Returns (smin [1, B], svals [K, B], s_ok [1, B] bool)."""
    B = d.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    delta = col_i - lane                                     # [1, B]

    smin = jnp.full_like(d, _BIG)
    for s in range(-max_shift, max_shift + 1):
        contrib = jnp.where((delta == s) & okp, d, _BIG)
        rolled = pltpu.roll(contrib, s % B, axis=1)
        # mask lanes whose rolled value wrapped around the array edge
        if s > 0:
            rolled = jnp.where(lane >= s, rolled, _BIG)
        elif s < 0:
            rolled = jnp.where(lane < B + s, rolled, _BIG)
        smin = jnp.minimum(smin, rolled)

    s_ok = smin < _BIG
    svals = jnp.zeros_like(vals)
    taken = jnp.zeros_like(d, dtype=jnp.bool_)
    for s in range(-max_shift, max_shift + 1):
        contrib = jnp.where((delta == s) & okp, d, _BIG)
        rolled_d = pltpu.roll(contrib, s % B, axis=1)
        if s > 0:
            rolled_d = jnp.where(lane >= s, rolled_d, _BIG)
        elif s < 0:
            rolled_d = jnp.where(lane < B + s, rolled_d, _BIG)
        win = (rolled_d <= smin) & s_ok & ~taken             # [1, B]
        rolled_vals = pltpu.roll(vals, s % B, axis=1)
        svals = jnp.where(win, rolled_vals, svals)
        taken = taken | win
    return smin, svals, s_ok
