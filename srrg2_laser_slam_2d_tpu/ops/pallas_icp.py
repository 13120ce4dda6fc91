"""Fused whole-alignment Pallas kernel — the speed-of-light registration path.

Motivation: the XLA path (ops/icp.py) is a ``lax.while_loop`` over ~dozens of
small ops per GN iteration; on TPU the wall clock of this tiny workload
(<=8K points) is dominated by per-op overhead and HBM round-trips, not FLOPs.
This kernel runs the ENTIRE multi-iteration alignment inside ONE Pallas
program: clouds live in VMEM for the whole solve, matching is a tiled
matmul-style distance argmin, correspondent gathers are one-hot matmuls (MXU —
no dynamic vector gathers, which Mosaic lowers poorly), the normal equations
are an [M,3]^T@[M,3] MXU reduction, the 3x3 solve is closed-form Cramer
in-register, and the GN loop is a ``fori_loop`` in-kernel. Ten iterations =
one kernel launch instead of ~500 dispatched ops.

Correspondence model: bounded nearest-neighbor with normal gating — the
matmul formulation of CorrespondenceFinderKDTree2D/NN2D (see ops/correspond.py).
The beam-space projective finder stays on the XLA path where its scatter-min
is natural; trajectory-parity runs use that path, throughput-critical serving
uses this kernel (both share the residual model, octave solver/nicp.m:4-24 in
SE(2)).

VMEM budget: clouds [F,2]x2 + [M,2]x2 + one [M, TF] distance tile.
F=M=4096, TF=512 -> ~8.5 MB peak, under the ~16 MB/core limit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1.0e30  # plain float: jnp scalars become captured consts in Pallas kernels


class FusedAlignResult(NamedTuple):
    estimate: Array     # [3]
    chi: Array          # [] total chi over correspondences
    num_inliers: Array  # [] float32 — correspondences with chi < threshold
    num_correspondences: Array  # [] float32 — gated matches
    chi_inliers: Array  # [] mean chi over inliers (detector gate surface)


def _compose(a, b):
    ca, sa = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.stack(
        [
            a[0] + ca * b[0] - sa * b[1],
            a[1] + sa * b[0] + ca * b[1],
            a[2] + b[2],
        ]
    )


def _solve3_sym(a00, a01, a02, a11, a12, a22, b):
    """Closed-form symmetric 3x3 solve (Cramer) on scalars — no lax.linalg
    and no in-kernel array updates (Mosaic lowers neither)."""
    a10, a20, a21 = a01, a02, a12
    det = (
        a00 * (a11 * a22 - a12 * a21)
        - a01 * (a10 * a22 - a12 * a20)
        + a02 * (a10 * a21 - a11 * a20)
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    x0 = ((a11 * a22 - a12 * a21) * b[0] + (a02 * a21 - a01 * a22) * b[1]
          + (a01 * a12 - a02 * a11) * b[2]) * inv_det
    x1 = ((a12 * a20 - a10 * a22) * b[0] + (a00 * a22 - a02 * a20) * b[1]
          + (a02 * a10 - a00 * a12) * b[2]) * inv_det
    x2 = ((a10 * a21 - a11 * a20) * b[0] + (a01 * a20 - a00 * a21) * b[1]
          + (a00 * a11 - a01 * a10) * b[2]) * inv_det
    return jnp.stack([x0, x1, x2])


def _make_kernel(n_moving: int, n_fixed: int, tile_f: int, iterations: int,
                 max_distance2: float, normal_cos: float, chi_threshold: float,
                 min_inliers: int, corr_refresh: int = 1):
    n_tiles = n_fixed // tile_f

    def kernel(fgeo_ref, mgeo_ref, t0_ref, out_t_ref, out_stats_ref):
        # Layouts (r5, first REAL-Mosaic-compiling revision — the original
        # [F, 8]/[M, 8] column slices produced sublane-offset vectors whose
        # reductions Mosaic rejects with 'Not implemented: Offset change'):
        #   fgeo [8, F] ROWS (x, y, nx, ny, valid, |f|^2+penalty, 0, 0) —
        #     row slices of [8, X] blocks are the proven-safe pattern
        #     (ops/pallas_frame.py canvas rows);
        #   mgeo [M, 8] with [M, 1] COLUMNS extracted via basis-vector MXU
        #     dots (a dot output has a clean layout; a column slice does not).
        mgeo = mgeo_ref[:]

        def col(k):
            e = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            basis = (e == k).astype(jnp.float32)
            return jax.lax.dot_general(
                mgeo, basis, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [M, 1]

        mx0, my0 = col(0), col(1)
        mnx0, mny0 = col(2), col(3)
        mval = col(4)
        m2 = mx0 * mx0 + my0 * my0                               # [M, 1]

        def nn_pass(T):
            """Bounded-NN match at pose T ([M, 1] column quantities).

            d2 expansion keeps every vector in a clean layout:
              |p - f|^2 = |m|^2 + 2 (R^T t).m + |t|^2 + |f|^2 - 2 p.f
              p.f = m.(R^T f) + t.f
            — [M,1] columns broadcast against [1,TF] rows, and the cross
            term is two [M,1]x[1,TF] MXU products."""
            c, s = jnp.cos(T[2]), jnp.sin(T[2])
            tx, ty = T[0], T[1]
            # R^T t
            a = c * tx + s * ty
            b = -s * tx + c * ty
            p2 = m2 + 2.0 * (a * mx0 + b * my0) + (tx * tx + ty * ty)
            px = c * mx0 - s * my0 + tx
            py = s * mx0 + c * my0 + ty
            nx = c * mnx0 - s * mny0
            ny = s * mnx0 + c * mny0

            def scan_tile(t, carry):
                best_d2, pfx, pfy, nfx, nfy = carry
                tile = fgeo_ref[:, pl.ds(t * tile_f, tile_f)]    # [8, TF]
                fxx = tile[0:1, :]
                fxy = tile[1:2, :]
                f2_t = tile[5:6, :]
                # R^T f rows
                fxr = c * fxx + s * fxy
                fyr = -s * fxx + c * fxy
                tf = tx * fxx + ty * fxy                         # [1, TF]
                cross = (
                    jax.lax.dot_general(
                        mx0, fxr, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + jax.lax.dot_general(
                        my0, fyr, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + tf
                )                                                # [M, TF]
                d2 = p2 + f2_t - 2.0 * cross
                tile_best = jnp.min(d2, axis=1, keepdims=True)   # [M, 1]
                # one-hot gather of the argmin row -> MXU matmuls
                onehot = (d2 <= tile_best).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(onehot, axis=1, keepdims=True), 1.0)

                def gather(row):                                 # [1,TF]->[M,1]
                    return jax.lax.dot_general(
                        onehot, row,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) / cnt

                take = tile_best < best_d2
                return (
                    jnp.where(take, tile_best, best_d2),
                    jnp.where(take, gather(tile[0:1, :]), pfx),
                    jnp.where(take, gather(tile[1:2, :]), pfy),
                    jnp.where(take, gather(tile[2:3, :]), nfx),
                    jnp.where(take, gather(tile[3:4, :]), nfy),
                )

            zero = jnp.zeros((n_moving, 1), jnp.float32)
            init = (jnp.full((n_moving, 1), _BIG, jnp.float32),
                    zero, zero, zero, zero)
            best_d2, pfx, pfy, nfx, nfy = jax.lax.fori_loop(
                0, n_tiles, scan_tile, init
            )
            ndot = nfx * nx + nfy * ny
            ok = (mval > 0) & (best_d2 <= max_distance2) & (ndot >= normal_cos)
            return px, py, nx, ny, pfx, pfy, nfx, nfy, ok

        def transform(T):
            c, s = jnp.cos(T[2]), jnp.sin(T[2])
            px = c * mx0 - s * my0 + T[0]
            py = s * mx0 + c * my0 + T[1]
            nx = c * mnx0 - s * mny0
            ny = s * mnx0 + c * mny0
            return px, py, nx, ny

        def solve_from(px, py, nx, ny, pfx, pfy, nfx, nfy, ok, T):
            e1 = nfx * (px - pfx) + nfy * (py - pfy)
            e2 = nx - nfx
            e3 = ny - nfy
            chi = e1 * e1 + e2 * e2 + e3 * e3
            if chi_threshold > 0:
                w = jnp.where(
                    chi < chi_threshold, 1.0,
                    chi_threshold / jnp.maximum(chi, 1e-20),
                )
            else:
                w = jnp.ones_like(chi)
            w = jnp.where(ok, w, 0.0)
            j1c = nfx * (-py) + nfy * px
            sn2 = nx * nx + ny * ny
            # symmetric normal-equation entries as plain scalar reductions
            h00 = jnp.sum(w * nfx * nfx)
            h01 = jnp.sum(w * nfx * nfy)
            h02 = jnp.sum(w * nfx * j1c)
            h11 = jnp.sum(w * nfy * nfy)
            h12 = jnp.sum(w * nfy * j1c)
            h22 = jnp.sum(w * (j1c * j1c + sn2))
            bvec = jnp.stack(
                [
                    jnp.sum(w * nfx * e1),
                    jnp.sum(w * nfy * e1),
                    jnp.sum(w * (j1c * e1 + (-ny) * e2 + nx * e3)),
                ]
            )
            n_ok = jnp.sum(ok.astype(jnp.float32))
            dx = _solve3_sym(h00, h01, h02, h11, h12, h22, -bvec)
            dx = jnp.where(n_ok >= min_inliers, dx, jnp.zeros_like(dx))
            return _compose(dx, T)

        refresh = max(int(corr_refresh), 1)
        if refresh == 1:
            def gn_iter(_, T):
                px, py, nx, ny, pfx, pfy, nfx, nfy, ok = nn_pass(T)
                return solve_from(px, py, nx, ny, pfx, pfy, nfx, nfy, ok, T)

            T = jax.lax.fori_loop(0, iterations, gn_iter, t0_ref[0, :])
        else:
            # correspondence refresh: the NN pass (the whole kernel cost) runs
            # every `refresh` GN iterations; in between, updates reuse the
            # FROZEN matches/gates while re-transforming the moving side
            outer = -(-iterations // refresh)

            def gn_outer(i, T):
                px, py, nx, ny, pfx, pfy, nfx, nfy, ok = nn_pass(T)
                for sub in range(refresh):
                    step = i * refresh + sub
                    if sub > 0:
                        px, py, nx, ny = transform(T)
                    Tn = solve_from(px, py, nx, ny, pfx, pfy, nfx, nfy, ok, T)
                    T = jnp.where(step < iterations, Tn, T)
                return T

            T = jax.lax.fori_loop(0, outer, gn_outer, t0_ref[0, :])

        # final stats at the solution: total chi, inlier count, plus the
        # loop-detector gate ingredients (num_correspondences and the
        # inlier-only chi sum — MultiLoopDetectorBruteForce2D gates on
        # inliers / correspondences and mean inlier chi, config :621-634)
        px, py, nx, ny, pfx, pfy, nfx, nfy, ok = nn_pass(T)
        e1 = nfx * (px - pfx) + nfy * (py - pfy)
        e2 = nx - nfx
        e3 = ny - nfy
        chi_pt = e1 * e1 + e2 * e2 + e3 * e3
        chi = jnp.where(ok, chi_pt, 0.0)
        inl = ok & (chi_pt < chi_threshold)
        out_t_ref[0, :] = T
        # row store (scalar stores to VMEM are not lowerable)
        out_stats_ref[0, :] = jnp.stack(
            [
                jnp.sum(chi),
                jnp.sum(inl.astype(jnp.float32)),
                jnp.sum(ok.astype(jnp.float32)),
                jnp.sum(jnp.where(inl, chi_pt, 0.0)),
            ]
        )

    return kernel


def _pack_fixed(xy, normal, valid):
    """[8, F] ROW layout (see kernel layout note)."""
    f = xy.shape[0]
    valid_f = valid.astype(jnp.float32)
    f2 = jnp.sum(xy * xy, axis=1) + jnp.where(valid_f > 0, 0.0, _BIG)
    return jnp.concatenate(
        [xy.T, normal.T, valid_f[None, :], f2[None, :],
         jnp.zeros((2, f), jnp.float32)],
        axis=0,
    )


def _pack_moving(xy, normal, valid):
    m = xy.shape[0]
    return jnp.concatenate(
        [xy, normal, valid.astype(jnp.float32)[:, None], jnp.zeros((m, 3), jnp.float32)],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "max_distance", "normal_cos", "chi_threshold",
        "min_inliers", "tile_f", "interpret", "corr_refresh",
    ),
)
def fused_align_nn(
    fixed_xy: Array, fixed_normal: Array, fixed_valid: Array,
    moving_xy: Array, moving_normal: Array, moving_valid: Array,
    initial: Array,
    iterations: int = 10,
    max_distance: float = 0.5,
    normal_cos: float = 0.8,
    chi_threshold: float = 0.05,
    min_inliers: int = 10,
    tile_f: int = 512,
    interpret: bool = False,
    corr_refresh: int = 1,
) -> FusedAlignResult:
    """One-kernel NN-ICP alignment. fixed [F,2] (F % tile_f == 0), moving
    [M,2]; ``initial`` [3] is moving-in-fixed. Set ``interpret=True`` to run
    the same kernel on CPU (tests)."""
    f = fixed_xy.shape[0]
    m = moving_xy.shape[0]
    assert f % tile_f == 0, (f, tile_f)

    kernel = _make_kernel(
        m, f, tile_f, iterations,
        float(max_distance) ** 2, float(normal_cos), float(chi_threshold),
        int(min_inliers), int(corr_refresh),
    )
    out_t, out_stats = pl.pallas_call(
        kernel,
        # default scoped-VMEM budget is 16 MiB; the [M, TF] distance tile +
        # cloud buffers need ~18 MiB at M=2048/TF=512 (same raise as the
        # stream kernels, ops/pallas_stream.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        _pack_fixed(fixed_xy, fixed_normal, fixed_valid),
        _pack_moving(moving_xy, moving_normal, moving_valid),
        initial.reshape(1, 3).astype(jnp.float32),
    )
    return FusedAlignResult(
        estimate=out_t[0],
        chi=out_stats[0, 0],
        num_inliers=out_stats[0, 1],
        num_correspondences=out_stats[0, 2],
        chi_inliers=out_stats[0, 3]
        / jnp.maximum(out_stats[0, 1], 1.0),
    )


def fused_align_cloud(fixed, moving, initial, **kw) -> FusedAlignResult:
    """Cloud-typed convenience wrapper."""
    return fused_align_nn(
        fixed.xy, fixed.normal, fixed.valid,
        moving.xy, moving.normal, moving.valid,
        initial, **kw,
    )


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "max_distance", "normal_cos",
                     "chi_threshold", "min_inliers", "tile_f", "interpret",
                     "corr_refresh"),
)
def fused_align_pairs(
    fixed, moving, initials,
    iterations: int = 30,
    max_distance: float = 1.414,
    normal_cos: float = 0.8,
    chi_threshold: float = 0.05,
    min_inliers: int = 10,
    tile_f: int = 512,
    interpret: bool = False,
    corr_refresh: int = 1,
) -> FusedAlignResult:
    """J independent (fixed, moving) Cloud pairs through the fused NN-ICP
    kernel as ONE program (lax.map over pairs — each pair is a single
    kernel launch, so J launches replace the XLA path's ~J*500 dispatched
    ops). The loop-closure detection backend of the chunked SLAM loop
    (models/chunked_slam.py, LoopDetectorConfig.backend='fused_nn'):
    candidate alignment is the CorrespondenceFinderKDTree2D-role bounded-NN
    model rather than the beam-projective finder — same residuals, same
    gate surface (inliers / correspondences / mean inlier chi)."""

    def one(args):
        f, m, t0 = args
        return fused_align_nn(
            f.xy, f.normal, f.valid, m.xy, m.normal, m.valid, t0,
            iterations=iterations, max_distance=max_distance,
            normal_cos=normal_cos, chi_threshold=chi_threshold,
            min_inliers=min_inliers, tile_f=tile_f, interpret=interpret,
            corr_refresh=corr_refresh,
        )

    return jax.lax.map(one, (fixed, moving, initials))
