"""K-stream batched fused frame kernel — the per-chip THROUGHPUT path.

The single-stream fused frame kernel (ops/pallas_frame.py) runs every
per-beam row as [1, B]: one VPU sublane out of eight does work. A 721-beam
scan cannot fill the chip alone. This module batches K independent tracking
streams (robots / sessions / dataset shards) through ONE grid-iterated
pallas_call, with every row op widened to [K, B] (full sublane utilization).
The banded canvas gather has two backends (FrameSpec.stream_gather): the
default "onehot" is the K-batched ``dot_general`` MXU gather (fastest
measured on the real chip — see FrameSpec.stream_gather notes) and "roll"
enumerates static shifts over ±stream_band_shift beams — one 3D
``pltpu.roll`` of the [8, K, B] canvas per shift serves all streams and
fields at once, keeping VMEM flat in K (the fallback for K large enough
that the [K, window, 128] hot matrix overflows VMEM). Stream semantics are
UNCHANGED:
each stream carries its own cache canvas, pose, odometry and scene-slot
counter. Parity with the single-stream kernel (validated per backend in
tests/test_stream_batch.py against pallas_frame.frame_step) is bit-for-bit
for points whose per-frame beam drift stays inside the backend's band:
±stream_band_shift beams (default ±64 ≈ 32° at 721 beams/2π) for "roll",
up to ±(window - 65) beams for "onehot" (window-start placement in
bk.window_start). Points drifting beyond the band go unmatched — the same
semantics class as the single-stream banded window, bounded by per-frame
sensor motion; size stream_band_shift up for fast-rotation workloads.

Reference behavior covered per frame per stream: identical to
ops/pallas_frame.py (SceneClipperProjective2D via the carried canvas,
MultiAligner2D banded GN with odometry prior, MergerProjective2D lean
beam-window semantics — srrg2_laser_slam_2d merger_projective_2d.cpp:46-87,
correspondence_finder_projective_2d.cpp:54-76 roles).

Layouts (all float32):
  canvases / caches  [8, K, B]: field-major — slice f gives a dense [K, B]
      tile (rows 0 depth, 1 x, 2 y, 3 nx, 4 ny, 5 has/valid, 6 scene-row for
      caches, 7 zero).  B = spec.cols_padded lanes, K streams on sublanes.
  poseB [K, 16]: lanes 0:3 X (robot-in-local-map), 3:6 last_odom, 6 has_odom,
      7 scene count, 8:11 sensor_in_robot, 11:16 zero.
  odomB [K, 8]: lanes 0:3 = odom x, y, theta, valid.
  payloads [T, 8, K, B]: per frame per stream — rows 0-3 scene-frame
      (x, y, nx, ny), 4 target scene row, 5 kind (0/1 modify/2 append),
      row 6 lanes 0-6 = [T'(3), chi, n_corr, n_inliers, n_app], row 7 =
      per-GN-iteration record: lanes [0:its] chi, [64:64+its] inliers.

Measurement input is the PRE-z-buffered canvas layout only (the
``meas_as_canvas`` mode of the single-stream kernel): rows 0 depth, 1-4
x/y/nx/ny, 5 has; odometry travels in the separate odomB block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _beam_kernels as bk
from .pallas_frame import FrameSpec
from .pallas_projective_align import _solve3_sym
from .pallas_projector import _atan2

Array = jax.Array

_BIG = 1.0e30

# Scoped-VMEM ceiling for the stream kernels. The platform default (16 MiB,
# --xla_tpu_scoped_vmem_limit_kib) rejects the onehot gather's
# [K, window, 128] hot matrix at K >= 64 — surfaced as an opaque HTTP 500
# from the axon compile helper until round 4 captured the real error
# ("Scoped allocation ... exceeded scoped vmem limit"). v5e has 128 MiB of
# physical VMEM; 100 MiB leaves room for the framework's own buffers.
# Overridable for TPU generations with smaller VMEM (ADVICE r4):
# SRRG2_TPU_VMEM_LIMIT_MB=<n> caps the scoped budget.


def _vmem_limit_bytes() -> int:
    import os

    mb = os.environ.get("SRRG2_TPU_VMEM_LIMIT_MB")
    return (int(mb) if mb else 100) * 1024 * 1024


_VMEM_LIMIT_BYTES = _vmem_limit_bytes()


# ------------------------------------------------------ batched scalar SE(2)
# Pose "scalars" are [K, 1] columns so they broadcast against [K, B] rows
# without lane->sublane relayouts. A pose is a 3-tuple (x, y, theta).

def _compose_b(a, b):
    ca, sa = jnp.cos(a[2]), jnp.sin(a[2])
    return (a[0] + ca * b[0] - sa * b[1],
            a[1] + sa * b[0] + ca * b[1],
            a[2] + b[2])


def _inverse_b(a):
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    return (-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]), -a[2])


def _relative_b(a, b):
    return _compose_b(_inverse_b(a), b)


def _where_b(cond, a, b):
    return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))


# --------------------------------------------------- batched banded matching

def _moving_fields_b(mov, T, proj):
    """Transform [K, B] moving rows by per-stream pose T ([K,1] triple)."""
    mx, my, mnx, mny, mv = mov
    c_, s_ = jnp.cos(T[2]), jnp.sin(T[2])
    px = c_ * mx - s_ * my + T[0]
    py = s_ * mx + c_ * my + T[1]
    nx = c_ * mnx - s_ * mny
    ny = s_ * mnx + c_ * mny
    d = jnp.sqrt(px * px + py * py)
    ang = _atan2(py, px)
    colf = jnp.floor(ang * proj.f + proj.c)
    okp = ((mv > 0) & (colf >= 0) & (colf < proj.cols)
           & (d >= proj.range_min) & (d <= proj.range_max))
    col_i = jnp.where(okp, colf, -1.0).astype(jnp.int32)
    return dict(px=px, py=py, nx=nx, ny=ny, d=d, col_i=col_i, okp=okp)


def _roll_gather_b(canvasF, f, spec: FrameSpec):
    """Banded canvas gather by static shift enumeration.

    canvasF: [8, K, B] FIELD-major measurement canvas (no stream-major copy
    needed). Each moving point at home lane r wants canvas beam
    ``col_i[r] = r + delta``; for every shift s in ±stream_band_shift, one
    3D ``pltpu.roll`` of the whole canvas brings beam r+s to lane r for all
    8 fields x K streams at once, and a [K, B] mask selects the points whose
    delta is exactly s. All ops are [8, K, B]/[K, B] row ops: per-stream
    cost is constant in K (sublane packing), unlike the one-hot gather whose
    [K, window, 128] hot matrix and K-batched small matmuls scale linearly.

    Exactness: each valid point has exactly one delta, so the select is an
    exact gather; points drifting beyond the band go unmatched (same
    semantics class as the single-stream band — bounded by per-frame sensor
    motion; ±64 beams = 32 deg at 721/2pi).

    The shift loop is a ``fori_loop`` with a DYNAMIC roll amount
    (tpu.DynamicRotate): program size is constant in the band width — a
    statically-unrolled variant trips the TPU compiler's program-size limits
    at ~50+ distinct static rotate amounts inside the GN fori_loop."""
    B = spec.cols_padded
    S = spec.stream_band_shift
    lane = jax.lax.broadcasted_iota(jnp.int32, f["col_i"].shape, 1)
    delta = f["col_i"] - lane
    okp = f["okp"]

    def shift_body(i, gath):
        s = i - S                                            # in [-S, S]
        sel = (delta == s) & okp                             # [K, B]
        rolled = pltpu.roll(canvasF, jnp.mod(B - s, B), axis=2)
        return jnp.where(jnp.expand_dims(sel, 0), rolled, gath)

    return jax.lax.fori_loop(
        0, 2 * S + 1, shift_body, jnp.zeros(canvasF.shape, jnp.float32)
    )


def _stats_from_gather_b(gath, f, spec: FrameSpec):
    """Normal-equation reduction from gathered canvas rows ([8, K, B]) and
    moving fields ([K, B]) — the whole-row counterpart of the per-128-block
    tail of ``_banded_stats_b``. Returns 13 x [K, 1] sums."""
    bmin, bfx, bfy = gath[0], gath[1], gath[2]
    bfnx, bfny, bhas = gath[3], gath[4], gath[5]
    px_b, py_b, d_b = f["px"], f["py"], f["d"]
    nx_b, ny_b = f["nx"], f["ny"]

    close = jnp.abs(bmin - d_b) <= spec.point_distance
    ndot = bfnx * nx_b + bfny * ny_b
    ok = (bhas > 0.5) & close & (ndot >= spec.normal_cos)

    e1 = bfnx * (px_b - bfx) + bfny * (py_b - bfy)
    e2 = nx_b - bfnx
    e3 = ny_b - bfny
    chi = e1 * e1 + e2 * e2 + e3 * e3
    if spec.chi_threshold > 0:
        w = jnp.where(chi < spec.chi_threshold, 1.0,
                      spec.chi_threshold / jnp.maximum(chi, 1e-20))
    else:
        w = jnp.ones_like(chi)
    w = jnp.where(ok, w, 0.0)
    okf = ok.astype(jnp.float32)

    j1c = bfnx * (-py_b) + bfny * px_b
    sn2 = nx_b * nx_b + ny_b * ny_b
    thr = spec.chi_threshold if spec.chi_threshold > 0 else _BIG
    inl = okf * (chi < thr).astype(jnp.float32)
    terms = (
        w * bfnx * bfnx, w * bfnx * bfny, w * bfnx * j1c,
        w * bfny * bfny, w * bfny * j1c, w * (j1c * j1c + sn2),
        w * bfnx * e1, w * bfny * e1,
        w * (j1c * e1 - ny_b * e2 + nx_b * e3),
        okf, okf * chi, inl * chi, inl,
    )
    return [jnp.sum(t, axis=1, keepdims=True) for t in terms]


def _onehot_gather_b(canvasK, f, spec: FrameSpec):
    """Banded one-hot MXU gather producing PER-FIELD [K, B] rows — the
    split-out gather half of ``_banded_stats_b``, for the
    correspondence-refresh path (FrameSpec.corr_refresh > 1: one gather
    feeds several GN updates via ``_stats_from_gather_b``). Per-field
    [K, 1, window] x [K, window, 128] dots (a middle-dim slice of the fused
    [K, 8, 128] result would be an offset layout Mosaic rejects)."""
    B = spec.cols_padded
    window = spec.window
    K = f["px"].shape[0]
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (1, window, 128), 1)
    fields = [[] for _ in range(6)]
    for i in range(B // 128):
        sl = slice(i * 128, (i + 1) * 128)
        w0 = bk.window_start(i, B, window)
        local = f["col_i"][:, sl] - w0
        okp_b = jnp.expand_dims(f["okp"][:, sl], 1)
        hot = ((win_iota == jnp.expand_dims(local, 1))
               & okp_b).astype(jnp.float32)                  # [K, window, 128]
        for j in range(6):
            g = jax.lax.dot_general(
                canvasK[:, j:j + 1, w0:w0 + window], hot,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                # [K, 1, 128]
            fields[j].append(g.reshape(K, 128))
    return tuple(jnp.concatenate(rows, axis=1) for rows in fields)


def _banded_stats_b(canvasK, f, spec: FrameSpec):
    """K-batched banded match + normal-equation reduction.

    canvasK: [K, 8, B] measurement canvas (stream-major: per-stream [8, B]
    field blocks, the layout the batched MXU gather wants — Mosaic supports
    batched matmul but not batched vec-mat). f: _moving_fields_b output
    ([K, B] rows). Returns [13] sums as [K, 1] columns:
    h00 h01 h02 h11 h12 h22 b0 b1 b2 n_ok chi_sum inl_chi inl_count.
    Same window placement as the single-stream bk.banded_stats."""
    B = spec.cols_padded
    window = spec.window
    K = f["px"].shape[0]
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (1, window, 128), 1)
    acc = [jnp.zeros((K, 128), jnp.float32) for _ in range(13)]
    for i in range(B // 128):
        sl = slice(i * 128, (i + 1) * 128)
        w0 = bk.window_start(i, B, window)
        local = f["col_i"][:, sl] - w0                       # [K, 128]
        # NB: slice-then-expand — `x[:, None, sl]` (None mixed with a slice)
        # lowers to lax.gather, which Mosaic rejects inside fori bodies
        okp_b = jnp.expand_dims(f["okp"][:, sl], 1)          # [K, 1, 128]
        hot = ((win_iota == jnp.expand_dims(local, 1))
               & okp_b).astype(jnp.float32)                  # [K, window, 128]

        # one batched MXU gather for all 6 canvas fields at once:
        # [K, 8, window] x [K, window, 128] -> [K, 8, 128]
        gath = jax.lax.dot_general(
            canvasK[:, :, w0:w0 + window], hot,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        bmin = gath[:, 0, :]
        bfx = gath[:, 1, :]
        bfy = gath[:, 2, :]
        bfnx = gath[:, 3, :]
        bfny = gath[:, 4, :]
        bhas = gath[:, 5, :]
        px_b, py_b, d_b = f["px"][:, sl], f["py"][:, sl], f["d"][:, sl]
        nx_b, ny_b = f["nx"][:, sl], f["ny"][:, sl]

        close = jnp.abs(bmin - d_b) <= spec.point_distance
        ndot = bfnx * nx_b + bfny * ny_b
        ok = (bhas > 0.5) & close & (ndot >= spec.normal_cos)

        e1 = bfnx * (px_b - bfx) + bfny * (py_b - bfy)
        e2 = nx_b - bfnx
        e3 = ny_b - bfny
        chi = e1 * e1 + e2 * e2 + e3 * e3
        if spec.chi_threshold > 0:
            w = jnp.where(chi < spec.chi_threshold, 1.0,
                          spec.chi_threshold / jnp.maximum(chi, 1e-20))
        else:
            w = jnp.ones_like(chi)
        w = jnp.where(ok, w, 0.0)
        okf = ok.astype(jnp.float32)

        j1c = bfnx * (-py_b) + bfny * px_b
        sn2 = nx_b * nx_b + ny_b * ny_b
        thr = spec.chi_threshold if spec.chi_threshold > 0 else _BIG
        inl = okf * (chi < thr).astype(jnp.float32)
        terms = (
            w * bfnx * bfnx, w * bfnx * bfny, w * bfnx * j1c,
            w * bfny * bfny, w * bfny * j1c, w * (j1c * j1c + sn2),
            w * bfnx * e1, w * bfny * e1,
            w * (j1c * e1 - ny_b * e2 + nx_b * e3),
            okf, okf * chi, inl * chi, inl,
        )
        acc = [a + t for a, t in zip(acc, terms)]
    return [jnp.sum(a, axis=1, keepdims=True) for a in acc]   # 13 x [K, 1]


def _add_odom_prior_b(sums9, T, prior, odom_weight: float):
    """Batched geodesic odometry prior (bk.add_odom_prior on [K,1] columns)."""
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


# ------------------------------------------------------- batched lane utils

def _lane_prefix_sum_b(x):
    """Inclusive prefix sum along lanes of [K, B]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < x.shape[1]:
        r = pltpu.roll(s, k, axis=1)
        s = s + jnp.where(lane >= k, r, 0.0)
        k *= 2
    return s


def _beam_zbuffer_b(vals, d, col_i, okp, max_shift: int):
    """Batched per-beam z-buffer via static shift enumeration.

    vals: tuple of [K, B] field rows; d/col_i/okp [K, B]. Cells live at
    lane r (home beam), target beam col_i; only |col_i - r| <= max_shift
    considered. Returns (smin [K,B], svals tuple, s_ok [K,B] bool)."""
    B = d.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    delta = col_i - lane

    smin = jnp.full_like(d, _BIG)
    for s in range(-max_shift, max_shift + 1):
        contrib = jnp.where((delta == s) & okp, d, _BIG)
        rolled = pltpu.roll(contrib, s % B, axis=1)
        if s > 0:
            rolled = jnp.where(lane >= s, rolled, _BIG)
        elif s < 0:
            rolled = jnp.where(lane < B + s, rolled, _BIG)
        smin = jnp.minimum(smin, rolled)

    s_ok = smin < _BIG
    svals = tuple(jnp.zeros_like(v) for v in vals)
    taken = jnp.zeros_like(d, dtype=jnp.bool_)
    for s in range(-max_shift, max_shift + 1):
        contrib = jnp.where((delta == s) & okp, d, _BIG)
        rolled_d = pltpu.roll(contrib, s % B, axis=1)
        if s > 0:
            rolled_d = jnp.where(lane >= s, rolled_d, _BIG)
        elif s < 0:
            rolled_d = jnp.where(lane < B + s, rolled_d, _BIG)
        win = (rolled_d <= smin) & s_ok & ~taken
        svals = tuple(
            jnp.where(win, pltpu.roll(v, s % B, axis=1), sv)
            for v, sv in zip(vals, svals)
        )
        taken = taken | win
    return smin, svals, s_ok


# ------------------------------------------------------------- frame body

def _frame_body_b(spec: FrameSpec, measC, measCk, cacheB, poseB, odomB):
    """One tracking frame for K streams at once on VMEM values.

    measC/cacheB [8, K, B] (field-major, for [K, B] elementwise rows),
    measCk [K, 8, B] (stream-major copy of the same canvas for the batched
    MXU gather — only with spec.stream_gather == "onehot"; None for the
    default "roll" backend), poseB [K, 16], odomB [K, 8].
    Returns (cacheB', poseB', payload [8, K, B])."""
    proj = spec.projection
    B = spec.cols_padded
    cap = float(spec.scene_capacity)

    X_old = (poseB[:, 0:1], poseB[:, 1:2], poseB[:, 2:3])
    last_odom = (poseB[:, 3:4], poseB[:, 4:5], poseB[:, 5:6])
    has_odom = poseB[:, 6:7]
    count = poseB[:, 7:8]
    S = (poseB[:, 8:9], poseB[:, 9:10], poseB[:, 10:11])
    odom = (odomB[:, 0:1], odomB[:, 1:2], odomB[:, 2:3])
    ov = odomB[:, 3:4]

    # odometry-predicted initial guess / prior: T0 = (D o S)^-1
    use_prior = (has_odom > 0) & (ov > 0)
    zero3 = tuple(jnp.zeros_like(has_odom) for _ in range(3))
    D = _where_b(use_prior, _relative_b(last_odom, odom), zero3)
    T0 = _inverse_b(_compose_b(D, S))

    # moving cloud = cache cells re-framed prev-sensor -> prev-robot
    cS, sS = jnp.cos(S[2]), jnp.sin(S[2])
    cx, cy = cacheB[0], cacheB[1]
    cnx, cny = cacheB[2], cacheB[3]
    cval, crow = cacheB[4], cacheB[5]
    mov = (cS * cx - sS * cy + S[0], sS * cx + cS * cy + S[1],
           cS * cnx - sS * cny, sS * cnx + cS * cny, cval)

    # ---- banded GN alignment ----
    # per-iteration chi/inliers recorded into the spare payload row
    # (iterationStats surface; same lanes as the single-stream kernel)
    K = poseB.shape[0]
    it_lane = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)

    if spec.stream_gather == "roll":
        def stats_of(f):
            return _stats_from_gather_b(_roll_gather_b(measC, f, spec), f, spec)

        def gather_of(f):
            return _roll_gather_b(measC, f, spec)
    else:
        def stats_of(f):
            return _banded_stats_b(measCk, f, spec)

        def gather_of(f):
            return _onehot_gather_b(measCk, f, spec)

    def solve_update(s, T, iter_row, step):
        iter_row = jnp.where(it_lane == step, s[10], iter_row)
        iter_row = jnp.where(it_lane == 64 + step, s[12], iter_row)
        sums9 = tuple(s[:9])
        if spec.odom_weight > 0:
            sums9 = _add_odom_prior_b(sums9, T, T0, spec.odom_weight)
        h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
        dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22,
                                    -b0, -b1, -b2)
        guard = s[9] >= spec.min_inliers
        dx = (jnp.where(guard, dx0, 0.0), jnp.where(guard, dx1, 0.0),
              jnp.where(guard, dx2, 0.0))
        return _compose_b(dx, T), iter_row

    T0st = jnp.concatenate(T0, axis=1)                       # [K, 3]
    refresh = max(int(spec.corr_refresh), 1)
    if refresh == 1:
        def gn_iter(i, carry):
            Tst, iter_row = carry
            T = (Tst[:, 0:1], Tst[:, 1:2], Tst[:, 2:3])
            s = stats_of(_moving_fields_b(mov, T, proj))
            Tn, iter_row = solve_update(s, T, iter_row, i)
            return jnp.concatenate(Tn, axis=1), iter_row

        Tst, iter_row = jax.lax.fori_loop(
            0, spec.iterations, gn_iter,
            (T0st, jnp.zeros((K, B), jnp.float32)),
        )
    else:
        # correspondence-refresh: ONE gather per outer step feeds `refresh`
        # frozen-correspondence GN updates (spec.corr_refresh doc)
        outer = -(-spec.iterations // refresh)

        def gn_outer(i, carry):
            Tst, iter_row = carry
            T = (Tst[:, 0:1], Tst[:, 1:2], Tst[:, 2:3])
            f = _moving_fields_b(mov, T, proj)
            g = gather_of(f)
            for sub in range(refresh):
                step = i * refresh + sub
                active = step < spec.iterations
                s = _stats_from_gather_b(g, f, spec)
                Tn, ir_new = solve_update(s, T, iter_row, step)
                T = _where_b(active, Tn, T)
                iter_row = jnp.where(active, ir_new, iter_row)
                if sub + 1 < refresh:
                    f = _moving_fields_b(mov, T, proj)
            return jnp.concatenate(T, axis=1), iter_row

        Tst, iter_row = jax.lax.fori_loop(
            0, outer, gn_outer,
            (T0st, jnp.zeros((K, B), jnp.float32)),
        )
    T = (Tst[:, 0:1], Tst[:, 1:2], Tst[:, 2:3])

    # final fields: stats + the transformed cache (cur-sensor frame)
    f = _moving_fields_b(mov, T, proj)
    s = stats_of(f)

    # ---- merge (beam-window lean semantics) ----
    smin, svals, s_ok = _beam_zbuffer_b(
        (f["px"], f["py"], f["nx"], f["ny"], crow),
        f["d"], f["col_i"], f["okp"] & (crow >= 0), spec.merge_shift,
    )
    spx, spy, snx, sny, srow = svals

    fmin = measC[0]
    bfx, bfy, bfnx, bfny = measC[1], measC[2], measC[3], measC[4]
    fhas = measC[5]
    m_ok = (fhas > 0.5) & (fmin <= 0.9 * proj.range_max)

    dr = fmin - smin
    both = m_ok & s_ok
    do_merge = both & (jnp.abs(dr) < spec.merge_threshold)
    do_replace = both & ~do_merge & (dr > 0)
    do_append = (m_ok & ~s_ok) | (both & ~do_merge & ~do_replace)
    modify = do_merge | do_replace

    avg_px = 0.5 * (spx + bfx)
    avg_py = 0.5 * (spy + bfy)
    avg_nx = 0.5 * (snx + bfnx)
    avg_ny = 0.5 * (sny + bfny)
    nrm = jnp.maximum(jnp.sqrt(avg_nx * avg_nx + avg_ny * avg_ny), 1e-12)
    avg_nx, avg_ny = avg_nx / nrm, avg_ny / nrm
    upd_px = jnp.where(do_merge, avg_px, bfx)
    upd_py = jnp.where(do_merge, avg_py, bfy)
    upd_nx = jnp.where(do_merge, avg_nx, bfnx)
    upd_ny = jnp.where(do_merge, avg_ny, bfny)

    # append slots from the carried per-stream scene count
    appf = do_append.astype(jnp.float32)
    slot = count + _lane_prefix_sum_b(appf) - 1.0
    app_ok = do_append & (slot < cap)
    n_app = jnp.sum(appf, axis=1, keepdims=True)
    target = jnp.where(modify, srow, jnp.where(app_ok, slot, -1.0))
    kind = jnp.where(modify, 1.0, jnp.where(app_ok, 2.0, 0.0))

    # new robot pose + payload in the scene (local-map) frame
    X_new = _compose_b(X_old, _inverse_b(_compose_b(S, T)))
    M = _compose_b(X_new, S)
    cM, sM = jnp.cos(M[2]), jnp.sin(M[2])
    pay_x = cM * upd_px - sM * upd_py + M[0]
    pay_y = sM * upd_px + cM * upd_py + M[1]
    pay_nx = cM * upd_nx - sM * upd_ny
    pay_ny = sM * upd_nx + cM * upd_ny

    # stats row: [T'(3), chi, n_corr, n_inliers, n_app] in lanes 0-6
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)
    n_app_ok = jnp.sum(app_ok.astype(jnp.float32), axis=1, keepdims=True)
    stats_vals = (T[0], T[1], T[2], s[10], s[9], s[12], n_app_ok)
    stats_row = jnp.zeros((K, B), jnp.float32)
    for k, v in enumerate(stats_vals):
        stats_row = jnp.where(lane == k, v, stats_row)

    payload = jnp.stack(
        [pay_x, pay_y, pay_nx, pay_ny, target, kind, stats_row, iter_row],
        axis=0,
    )

    # new cache: post-merge visible cell per beam, cur-sensor frame
    ncx = jnp.where(m_ok, upd_px, spx)
    ncy = jnp.where(m_ok, upd_py, spy)
    nnx = jnp.where(m_ok, upd_nx, snx)
    nny = jnp.where(m_ok, upd_ny, sny)
    nrow = jnp.where(
        modify, srow,
        jnp.where(app_ok, slot, jnp.where(s_ok & ~m_ok, srow, -1.0)),
    )
    nvalid = ((m_ok | s_ok) & (nrow >= 0)).astype(jnp.float32)
    cacheB_new = jnp.stack(
        [ncx, ncy, nnx, nny, nvalid, nrow,
         jnp.zeros((K, B), jnp.float32), jnp.zeros((K, B), jnp.float32)],
        axis=0,
    )

    count_new = jnp.minimum(count + n_app, cap)
    new_last_odom = _where_b(ov > 0, odom, last_odom)
    new_has = jnp.maximum(has_odom, ov)
    poseB_new = jnp.concatenate(
        [X_new[0], X_new[1], X_new[2],
         new_last_odom[0], new_last_odom[1], new_last_odom[2],
         new_has, count_new, S[0], S[1], S[2],
         jnp.zeros((K, 5), jnp.float32)],
        axis=1,
    )
    return cacheB_new, poseB_new, payload


# ---------------------------------------------------------------- drivers

@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def stream_step(spec: FrameSpec, measC: Array, odomB: Array, cacheB: Array,
                poseB: Array, interpret: bool = False):
    """One fused frame for K streams. Returns (cacheB', poseB', payload).

    measC is the field-major [8, K, B] canvas; the stream-major gather copy
    is derived here (one XLA transpose outside the kernel)."""
    K = poseB.shape[0]
    B = spec.cols_padded
    roll = spec.stream_gather == "roll"
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)

    if roll:
        def kernel(measC_ref, odomB_ref, cacheB_ref, poseB_ref,
                   oc_ref, op_ref, opay_ref):
            c, p, pay = _frame_body_b(spec, measC_ref[:], None,
                                      cacheB_ref[:], poseB_ref[:],
                                      odomB_ref[:])
            oc_ref[:] = c
            op_ref[:] = p
            opay_ref[:] = pay

        inputs = (measC, odomB, cacheB, poseB)
    else:
        def kernel(measC_ref, measCk_ref, odomB_ref, cacheB_ref, poseB_ref,
                   oc_ref, op_ref, opay_ref):
            c, p, pay = _frame_body_b(spec, measC_ref[:], measCk_ref[:],
                                      cacheB_ref[:], poseB_ref[:],
                                      odomB_ref[:])
            oc_ref[:] = c
            op_ref[:] = p
            opay_ref[:] = pay

        inputs = (measC, jnp.transpose(measC, (1, 0, 2)), odomB, cacheB,
                  poseB)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, K, B), jnp.float32),
            jax.ShapeDtypeStruct((K, 16), jnp.float32),
            jax.ShapeDtypeStruct((8, K, B), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def track_streams_grid(spec: FrameSpec, cacheB: Array, poseB: Array,
                       measC_stack: Array, odom_stack: Array,
                       interpret: bool = False, measCk_stack: Array = None):
    """[T, 8, K, B] measurement canvases for K streams as ONE pallas_call.

    grid=(T,): sequential grid steps carry all K stream states in VMEM
    scratch; measurement/odometry blocks stream in via the grid pipeline,
    payload blocks stream out. Returns (cacheB', poseB',
    payloads [T, 8, K, B]).

    ``measCk_stack``: optional PRE-transposed stream-major copy
    [T, K, 8, B] for the onehot gather (pack_stream_measurements returns
    it). When omitted it is derived here — one XLA transpose per call,
    cheap on-device but worth hoisting out of a chained-dispatch loop.

    Throughput note (measured r4): through the axon tunnel, the FIRST host
    sync after any device->host transfer in the process pays a ~24 ms
    completion-poll penalty — a per-sync latency artifact, NOT kernel time
    (30 chained calls complete in ~30 ms total). Steady-state serving must
    dispatch sequence chunks asynchronously and sync rarely; benchmarks
    must amortize the sync over chained calls (bench/stream_bench.py)."""
    T, _, K, B = measC_stack.shape
    roll = spec.stream_gather == "roll"
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT_BYTES,
    )

    if roll:
        def kernel(measC_ref, odomB_ref, cache0_ref, pose0_ref,
                   oc_ref, op_ref, opay_ref, cache_s, pose_s):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                cache_s[:] = cache0_ref[:]
                pose_s[:] = pose0_ref[:]

            c, p, pay = _frame_body_b(spec, measC_ref[0], None,
                                      cache_s[:], pose_s[:], odomB_ref[0])
            cache_s[:] = c
            pose_s[:] = p
            opay_ref[0] = pay

            @pl.when(t == T - 1)
            def _():
                oc_ref[:] = c
                op_ref[:] = p

        inputs = (measC_stack, odom_stack, cacheB, poseB)
        in_specs = [
            pl.BlockSpec((1, 8, K, B), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K, B), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 16), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        def kernel(measC_ref, measCk_ref, odomB_ref, cache0_ref, pose0_ref,
                   oc_ref, op_ref, opay_ref, cache_s, pose_s):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                cache_s[:] = cache0_ref[:]
                pose_s[:] = pose0_ref[:]

            c, p, pay = _frame_body_b(spec, measC_ref[0], measCk_ref[0],
                                      cache_s[:], pose_s[:], odomB_ref[0])
            cache_s[:] = c
            pose_s[:] = p
            opay_ref[0] = pay

            @pl.when(t == T - 1)
            def _():
                oc_ref[:] = c
                op_ref[:] = p

        if measCk_stack is None:
            measCk_stack = jnp.transpose(measC_stack, (0, 2, 1, 3))
        inputs = (measC_stack, measCk_stack, odom_stack, cacheB, poseB)
        in_specs = [
            pl.BlockSpec((1, 8, K, B), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 8, B), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K, B), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 16), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((8, K, B), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 16), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K, B), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, K, B), jnp.float32),
            jax.ShapeDtypeStruct((K, 16), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, K, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, K, B), jnp.float32),
            pltpu.VMEM((K, 16), jnp.float32),
        ],
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*inputs)


# ----------------------------------------------------- host-side adapters

def pack_stream_state(cacheTs, poses):
    """K single-stream states -> batched (cacheB [8,K,B], poseB [K,16]).

    cacheTs: [K, 8, B] stacked single-stream caches (pallas_frame layout);
    poses: [K, 2, 8] stacked single-stream pose blocks."""
    cacheB = jnp.transpose(jnp.asarray(cacheTs), (1, 0, 2))
    poses = jnp.asarray(poses)
    K = poses.shape[0]
    poseB = jnp.zeros((K, 16), jnp.float32)
    poseB = poseB.at[:, 0:8].set(poses[:, 0, 0:8])
    poseB = poseB.at[:, 8:11].set(poses[:, 1, 0:3])
    return cacheB, poseB


def unpack_stream_state(cacheB, poseB):
    """Inverse of pack_stream_state -> ([K,8,B] caches, [K,2,8] poses)."""
    cacheTs = jnp.transpose(cacheB, (1, 0, 2))
    K = poseB.shape[0]
    poses = jnp.zeros((K, 2, 8), jnp.float32)
    poses = poses.at[:, 0, 0:8].set(poseB[:, 0:8])
    poses = poses.at[:, 1, 0:3].set(poseB[:, 8:11])
    return cacheTs, poses


def pack_stream_measurements(measC_stacks, odoms, odom_valid=None):
    """K per-stream canvas stacks -> batched kernel inputs.

    measC_stacks: [K, T, 8, B] (pallas_frame meas_as_canvas layout, WITHOUT
    the odom row-6 block); odoms: [K, T, 3].
    Returns (measC_stack [T, 8, K, B], odom_stack [T, K, 8])."""
    m = jnp.asarray(measC_stacks)
    K, T = m.shape[0], m.shape[1]
    measC_stack = jnp.transpose(m, (1, 2, 0, 3))
    odoms = jnp.asarray(odoms)
    if odom_valid is None:
        odom_valid = jnp.ones((K, T), jnp.float32)
    odom_stack = jnp.zeros((T, K, 8), jnp.float32)
    odom_stack = odom_stack.at[:, :, 0:3].set(
        jnp.transpose(odoms, (1, 0, 2)))
    odom_stack = odom_stack.at[:, :, 3].set(jnp.transpose(odom_valid))
    return measC_stack, odom_stack
