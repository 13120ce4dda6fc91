"""The whole tracking frame as ONE Pallas kernel — clip-from-cache + banded
projective alignment + beam-window merge, with deferred scene materialization
— and the whole SEQUENCE as one grid-iterated pallas_call.

Why this shape: measurements on this system show per-frame cost is dominated
by the NUMBER of XLA ops inside the frame loop, not device FLOPs (each tiny
fusion costs dispatch time; the kernels themselves run in microseconds). So
the fast tracking path carries ONLY beam-sized state (the merge-canvas cache
+ pose scalars), runs one kernel per frame with zero auxiliary ops, and never
touches the full scene inside the loop: per-frame merge decisions are EMITTED
as a beam-sized payload and applied to the scene array lazily
(models/fast_tracker.py), only when the SLAM layer actually reads the scene
(local-map split, loop closure, visualization).

Two drivers over the same frame body:
  - ``frame_step``: one frame, one pallas_call (host-stepped SLAM loop);
  - ``track_frames_grid``: a [T, ...] measurement stack as ONE pallas_call
    with grid=(T,). TPU grid steps run sequentially; the tracker state lives
    in VMEM scratch across steps, per-frame measurement blocks stream in via
    the automatic grid pipeline (double-buffered HBM->VMEM DMA), payloads
    stream out. The frame loop costs ZERO XLA ops per frame.

Reference behavior covered per frame (SURVEY.md §3.1-3.2):
  - SceneClipperProjective2D: the clip IS the carried cache canvas
    (models/tracker.py reuse_clip_canvas semantics).
  - MultiAligner2D + projective finder + odom prior: the banded GN loop
    (ops/pallas_banded_align.py semantics, same helpers).
  - MergerProjective2D: beam-window lean semantics (ops/merge.py
    merge_projective_lean — scene side from the carried canvas; per-beam
    merge/replace/append of the reference's merger_projective_2d.cpp:46-87).

State layout (all float32):
  cacheT [8, B]: canvas cells in the CURRENT sensor frame — rows 0 x, 1 y,
      2 nx, 3 ny, 4 valid, 5 scene row (-1 none), 6-7 zero.
  pose [2, 8]: row 0 = [X (robot-in-local-map) 0:3, last_odom 3:6,
      has_odom 6, scene count 7]; row 1 = [sensor_in_robot 0:3, ...].
Per-frame IO (two measurement layouts, selected by spec.meas_as_canvas):
  measF [F, 8] (meas_as_canvas=False): raw measurement point rows
      (x, y, nx, ny, valid, aux, 0, 0) where column 5 rows 0-3 carry
      [odom x, odom y, odom theta, odom_valid]; the kernel z-buffers them
      into a beam canvas densely ([F, B] compare).
  measF [8, B] (meas_as_canvas=True): PRE-z-buffered canvas rows from
      fast_tracker.pack_measurement_canvas — row 0 depth, 1 x, 2 y, 3 nx,
      4 ny, 5 has, 6 lanes 0-3 = [odom x, odom y, odom theta, odom_valid],
      7 zero. The odometry is split OUT of row 6 XLA-side
      (_split_odom_block) and enters the kernel as a separate odomF [8, 8]
      block (rows 0:3 lane 0 = x, y, theta, valid) so the canvas block
      itself stays pure measurement data in the grid pipeline.
  payload [8, B]: rows 0-3 scene-frame (x, y, nx, ny), 4 target scene row,
      5 kind (0 none / 1 modify / 2 append), row 6 lanes 0-6 = stats
      [estimate T' 0:3, chi, n_corr, n_inliers, n_app], row 7 = per-GN-
      iteration record (iterationStats surface): lanes [0:its] chi,
      lanes [64:64+its] inlier count (its = spec.iterations <= 64).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _beam_kernels as bk
from .pallas_projective_align import _compose, _solve3_sym
from .projector import PolarProjection

Array = jax.Array

_BIG = 1.0e30


@dataclass(frozen=True)
class FrameSpec:
    """Static configuration of the fused frame kernel."""

    projection: PolarProjection
    scene_capacity: int = 8192
    iterations: int = 10
    point_distance: float = 0.5
    normal_cos: float = 0.8
    chi_threshold: float = 0.05
    min_inliers: int = 10
    odom_weight: float = 1.0
    merge_threshold: float = 0.2
    # max per-frame beam drift handled by the merge z-buffer (the align band
    # is window/2; 32 beams ~ 16 deg of combined per-frame sensor motion)
    merge_shift: int = 32
    # banded-match window width in beams (multiple of 128): the [window, 128]
    # hot-matrix build dominates the align iteration's VPU cost, so size it
    # to the platform's per-frame motion + convergence basin
    window: int = 256
    # measurement input layout: False = raw [F, 8] point rows (the kernel
    # z-buffers them densely), True = [8, B] PRE-z-buffered canvas rows from
    # fast_tracker.pack_measurement_canvas (one batched XLA projection
    # outside the frame loop) — removes the [F, B] dense compare, the
    # largest single in-kernel cost
    meas_as_canvas: bool = False
    # In-kernel local-map splitting (LocalMapSplittingCriterionDistance2D,
    # models/slam.py:231-233 moved onto the device): when > 0 and the
    # post-frame robot translation |X'| within the local map reaches this
    # distance, the SAME kernel invocation reseeds — X resets to 0 (the new
    # local map frame = the robot frame at this measurement), the cache and
    # scene-count reseed from the measurement canvas, and the frame's payload
    # becomes the new scene's seed appends (kind=2, slots 0..n). The host
    # discovers splits from the stats row (lane 7 flag, lanes 8-10 the
    # pre-reset X' = the odometry edge measurement, lane 11 the post-frame
    # scene count) ONCE PER CHUNK instead of syncing every frame — the round-5
    # device-speed SLAM loop (models/chunked_slam.py). 0 disables (default;
    # bit-identical to the round-4 kernel).
    split_distance: float = 0.0
    # K-stream kernel (ops/pallas_stream.py) only — canvas-gather backend.
    # "onehot" (default) = per-128-block one-hot + batched MXU gather: the
    # fastest measured backend on the real chip (r4 sweep: K=32 onehot
    # 500 us/step vs roll 1302 us/step; the batched dot_general amortizes
    # over K far better than predicted) AND the wider matching band
    # (±(window-65) beams vs roll's ±stream_band_shift). "roll" = static
    # shift enumeration over ±stream_band_shift beams via 3D pltpu.roll —
    # VMEM-flat in K (no [K, window, 128] hot matrix), kept for large-K
    # configurations where the onehot hot-matrix VMEM (K*window*128*4 B)
    # does not fit (onehot K=64 at window 256 fails to compile on v5e).
    stream_gather: str = "onehot"
    stream_band_shift: int = 64
    # K-stream kernel only — correspondence refresh period: the banded
    # canvas gather (the VPU-bound one-hot hot-matrix build, ~60% of the
    # kernel per the r4 roofline) runs every `corr_refresh` GN iterations;
    # in between, updates reuse the FROZEN correspondences (classic
    # fixed-correspondence ICP inner steps — the moving side and all gates
    # are still re-evaluated at the current pose). 1 = rebuild every
    # iteration (exact r4 semantics, the parity default); 2 = serving
    # (trajectory-equivalence verified in tests/test_stream_batch.py)
    corr_refresh: int = 1

    @property
    def cols_padded(self) -> int:
        c = self.projection.cols
        return max(((c + 127) // 128) * 128, self.window)


def _frame_body(spec: FrameSpec, measF, cacheT, pose, odomF=None):
    """One tracking frame on VMEM values. Returns (cacheT', pose', payload)."""
    if spec.iterations > 64:
        raise ValueError("payload iterationStats row supports <= 64 iterations")
    proj = spec.projection
    B = spec.cols_padded
    cap = float(spec.scene_capacity)

    X_old = pose[0, 0:3]
    last_odom = pose[0, 3:6]
    has_odom = pose[0, 6]
    count = pose[0, 7]
    S = pose[1, 0:3]
    if spec.meas_as_canvas:
        # odom arrives as a separate [8, 8] block (rows 0:3 lane 0 = x, y,
        # theta, valid): a row-6 lane slice of the canvas (measF[6, 0:3])
        # trips Mosaic's vector-layout inference on real TPU (sublane-offset
        # 1D slice), so the XLA wrapper splits it out before the kernel.
        odom = odomF[0:3, 0]
        ov = odomF[3, 0]
    else:
        odom = measF[0:3, 5]
        ov = measF[3, 5]

    # odometry-predicted initial guess / prior: T0 = (D ∘ S)^-1
    use_prior = (has_odom > 0) & (ov > 0)
    D = jnp.where(use_prior, bk.relative_s(last_odom, odom), jnp.zeros(3))
    T0 = bk.inverse_s(bk.compose_s(D, S))

    # measurement canvas (doubles as the aligner's fixed canvas AND the
    # merger's measurement side); pre-z-buffered layout skips the dense
    # [F, B] in-kernel compare entirely
    if spec.meas_as_canvas:
        canvasT = measF
    else:
        canvasT = bk.build_canvasT(measF, B, proj)

    # moving cloud = cache cells re-framed prev-sensor -> prev-robot
    cS, sS = jnp.cos(S[2]), jnp.sin(S[2])
    cx, cy = cacheT[0:1, :], cacheT[1:2, :]
    cnx, cny = cacheT[2:3, :], cacheT[3:4, :]
    cval, crow = cacheT[4:5, :], cacheT[5:6, :]
    mov = (
        cS * cx - sS * cy + S[0],
        sS * cx + cS * cy + S[1],
        cS * cnx - sS * cny,
        sS * cnx + cS * cny,
        cval,
    )

    # ---- banded GN alignment (MultiAligner2D inner loop) ----
    # per-iteration chi/inliers are recorded into a spare payload row
    # (iterationStats surface): lanes [0:its] = chi, [64:64+its] = inliers
    it_lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def gn_iter(i, carry):
        T, iter_row = carry
        s = bk.banded_stats(
            canvasT, bk.moving_fields(mov, T, proj), B,
            spec.point_distance, spec.normal_cos, spec.chi_threshold,
            window=spec.window,
        )
        iter_row = jnp.where(it_lane == i, s[10], iter_row)
        iter_row = jnp.where(it_lane == 64 + i, s[12], iter_row)
        sums9 = (s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7], s[8])
        if spec.odom_weight > 0:
            sums9 = bk.add_odom_prior(sums9, T, T0, spec.odom_weight)
        h00, h01, h02, h11, h12, h22, b0, b1, b2 = sums9
        dx0, dx1, dx2 = _solve3_sym(h00, h01, h02, h11, h12, h22, -b0, -b1, -b2)
        guard = s[9] >= spec.min_inliers
        dx = jnp.stack(
            [
                jnp.where(guard, dx0, 0.0),
                jnp.where(guard, dx1, 0.0),
                jnp.where(guard, dx2, 0.0),
            ]
        )
        return _compose(dx, T), iter_row

    T, iter_row = jax.lax.fori_loop(
        0, spec.iterations, gn_iter,
        (T0, jnp.zeros((1, B), jnp.float32)),
    )

    # final fields: stats + the transformed cache (cur-sensor frame)
    f = bk.moving_fields(mov, T, proj)
    s = bk.banded_stats(canvasT, f, B, spec.point_distance,
                        spec.normal_cos, spec.chi_threshold,
                        window=spec.window)

    # ---- merge (beam-window lean semantics) ----
    # scene side: z-buffer the transformed cache cells per target beam
    vals = jnp.concatenate(
        [f["px"], f["py"], f["nx"], f["ny"], crow,
         jnp.zeros((3, B), jnp.float32)],
        axis=0,
    )
    smin, svals, s_ok = bk.beam_zbuffer_by_shifts(
        vals, f["d"], f["col_i"], f["okp"] & (crow >= 0), spec.merge_shift
    )
    spx, spy = svals[0:1, :], svals[1:2, :]
    snx, sny = svals[2:3, :], svals[3:4, :]
    srow = svals[4:5, :]

    fmin = canvasT[0:1, :]
    bfx, bfy = canvasT[1:2, :], canvasT[2:3, :]
    bfnx, bfny = canvasT[3:4, :], canvasT[4:5, :]
    fhas = canvasT[5:6, :]
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

    # append slots from the carried scene count
    appf = do_append.astype(jnp.float32)
    slot = count + bk.lane_prefix_sum(appf) - 1.0
    app_ok = do_append & (slot < cap)
    n_app = jnp.sum(appf)
    target = jnp.where(modify, srow, jnp.where(app_ok, slot, -1.0))
    kind = jnp.where(modify, 1.0, jnp.where(app_ok, 2.0, 0.0))

    # new robot pose + payload in the scene (local-map) frame
    X_new = bk.compose_s(X_old, bk.inverse_s(bk.compose_s(S, T)))
    M = bk.compose_s(X_new, S)  # measurement-in-scene
    cM, sM = jnp.cos(M[2]), jnp.sin(M[2])
    pay_x = cM * upd_px - sM * upd_py + M[0]
    pay_y = sM * upd_px + cM * upd_py + M[1]
    pay_nx = cM * upd_nx - sM * upd_ny
    pay_ny = sM * upd_nx + cM * upd_ny

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
    count_new = jnp.minimum(count + n_app, cap)

    # ---- in-kernel local-map split (spec.split_distance > 0) ----
    # |X'| reached the splitting distance: this frame both ends the old map
    # and seeds the new one (models/slam.py _split semantics: reseed on the
    # SAME measurement). The old map keeps the payloads of frames BEFORE
    # this one; this frame's payload turns into the fresh scene's seed
    # appends, the cache reseeds from the measurement canvas, X resets to 0.
    do_split = jnp.float32(0.0)
    if spec.split_distance > 0:
        do_split = (
            jnp.sqrt(X_new[0] * X_new[0] + X_new[1] * X_new[1])
            >= spec.split_distance
        ).astype(jnp.float32)
        seed_ok = m_ok
        seedf = seed_ok.astype(jnp.float32)
        seed_slot = bk.lane_prefix_sum(seedf) - 1.0
        seed_count = jnp.minimum(jnp.sum(seedf), cap)
        # seed payload coords: measurement cells -> NEW local-map frame
        # (= robot frame at this measurement), i.e. transform by S only
        spay_x = cS * bfx - sS * bfy + S[0]
        spay_y = sS * bfx + cS * bfy + S[1]
        spay_nx = cS * bfnx - sS * bfny
        spay_ny = sS * bfnx + cS * bfny
        sp = do_split > 0
        pay_x = jnp.where(sp, spay_x, pay_x)
        pay_y = jnp.where(sp, spay_y, pay_y)
        pay_nx = jnp.where(sp, spay_nx, pay_nx)
        pay_ny = jnp.where(sp, spay_ny, pay_ny)
        target = jnp.where(sp, jnp.where(seed_ok, seed_slot, -1.0), target)
        kind = jnp.where(sp, jnp.where(seed_ok, 2.0, 0.0), kind)
        # reseed cache from the measurement canvas (sensor frame == cache frame)
        ncx = jnp.where(sp, bfx, ncx)
        ncy = jnp.where(sp, bfy, ncy)
        nnx = jnp.where(sp, bfnx, nnx)
        nny = jnp.where(sp, bfny, nny)
        nrow = jnp.where(sp, jnp.where(seed_ok, seed_slot, -1.0), nrow)
        nvalid = jnp.where(sp, seedf, nvalid)
        count_new = jnp.where(do_split > 0, seed_count, count_new)

    # stats row: [T'(3), chi, n_corr, n_inliers, n_app] in lanes 0-6;
    # lane 7 split flag, lanes 8-10 pre-reset X' (the robot pose in the OLD
    # local map = the split odometry edge), lane 11 post-frame scene count
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    stats_vals = jnp.concatenate(
        [
            T,
            jnp.stack([s[10], s[9], s[12], jnp.sum(app_ok.astype(jnp.float32))]),
            jnp.stack([do_split]),
            X_new,
            jnp.stack([count_new]),
        ]
    )  # [12]
    stats_row = jnp.zeros((1, B), jnp.float32)
    for k in range(12):
        stats_row = jnp.where(lane == k, stats_vals[k], stats_row)

    payload = jnp.concatenate(
        [pay_x, pay_y, pay_nx, pay_ny, target, kind, stats_row, iter_row],
        axis=0,
    )

    cacheT_new = jnp.concatenate(
        [ncx, ncy, nnx, nny, nvalid, nrow, jnp.zeros((2, B), jnp.float32)],
        axis=0,
    )

    if spec.split_distance > 0:
        X_new = jnp.where(do_split > 0, jnp.zeros(3, jnp.float32), X_new)
    new_last_odom = jnp.where(ov > 0, odom, last_odom)
    new_has = jnp.maximum(has_odom, ov)
    pose_row0 = jnp.concatenate(
        [X_new, new_last_odom, jnp.stack([new_has, count_new])]
    )
    pose_new = jnp.concatenate([pose_row0[None, :], pose[1:2, :]], axis=0)
    return cacheT_new, pose_new, payload


def _split_odom_block(measF: Array) -> Array:
    """[..., 8, B] canvas rows -> [..., 8, 8] odom block (rows 0:3 lane 0 =
    x, y, theta, valid), XLA-side (see _frame_body's meas_as_canvas note)."""
    blk = measF[..., 6, 0:4]                              # [..., 4]
    out = jnp.zeros(measF.shape[:-2] + (8, 8), jnp.float32)
    return out.at[..., 0:4, 0].set(blk)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def frame_step(spec: FrameSpec, measF: Array, cacheT: Array, pose: Array,
               interpret: bool = False):
    """One fused tracking frame. Returns (cacheT', pose', payload)."""
    B = spec.cols_padded

    if spec.meas_as_canvas:
        def kernel(measF_ref, odomF_ref, cacheT_ref, pose_ref,
                   out_cache_ref, out_pose_ref, out_payload_ref):
            c, p, pay = _frame_body(spec, measF_ref[:], cacheT_ref[:],
                                    pose_ref[:], odomF_ref[:])
            out_cache_ref[:] = c
            out_pose_ref[:] = p
            out_payload_ref[:] = pay

        inputs = (measF, _split_odom_block(measF), cacheT, pose)
    else:
        def kernel(measF_ref, cacheT_ref, pose_ref,
                   out_cache_ref, out_pose_ref, out_payload_ref):
            c, p, pay = _frame_body(spec, measF_ref[:], cacheT_ref[:],
                                    pose_ref[:])
            out_cache_ref[:] = c
            out_pose_ref[:] = p
            out_payload_ref[:] = pay

        inputs = (measF, cacheT, pose)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, B), jnp.float32),
            jax.ShapeDtypeStruct((2, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def track_frames_grid(spec: FrameSpec, cacheT: Array, pose: Array,
                      measF_stack: Array, interpret: bool = False):
    """The whole [T, F, 8] measurement stack as ONE pallas_call.

    grid=(T,): TPU grid steps are sequential; tracker state persists in VMEM
    scratch, measurement blocks stream in and payload blocks stream out
    through the automatic grid pipeline. Returns (cacheT', pose',
    payloads [T, 8, B]). measF_stack is [T, F, 8] raw rows or [T, 8, B]
    pre-z-buffered canvases (spec.meas_as_canvas)."""
    T = measF_stack.shape[0]
    meas_blk = (1,) + measF_stack.shape[1:]
    B = spec.cols_padded
    canvas_mode = spec.meas_as_canvas

    if canvas_mode:
        def kernel(measF_ref, odomF_ref, cache0_ref, pose0_ref,
                   out_cache_ref, out_pose_ref, out_payload_ref,
                   cache_s, pose_s):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                cache_s[:] = cache0_ref[:]
                pose_s[:] = pose0_ref[:]

            c, p, pay = _frame_body(spec, measF_ref[0], cache_s[:],
                                    pose_s[:], odomF_ref[0])
            cache_s[:] = c
            pose_s[:] = p
            out_payload_ref[0] = pay

            @pl.when(t == T - 1)
            def _():
                out_cache_ref[:] = c
                out_pose_ref[:] = p

        extra_in = [
            pl.BlockSpec((1, 8, 8), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = (measF_stack, _split_odom_block(measF_stack), cacheT, pose)
    else:
        def kernel(measF_ref, cache0_ref, pose0_ref,
                   out_cache_ref, out_pose_ref, out_payload_ref,
                   cache_s, pose_s):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                cache_s[:] = cache0_ref[:]
                pose_s[:] = pose0_ref[:]

            c, p, pay = _frame_body(spec, measF_ref[0], cache_s[:], pose_s[:])
            cache_s[:] = c
            pose_s[:] = p
            out_payload_ref[0] = pay

            @pl.when(t == T - 1)
            def _():
                out_cache_ref[:] = c
                out_pose_ref[:] = p

        extra_in = []
        inputs = (measF_stack, cacheT, pose)

    out_cache, out_pose, payloads = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(meas_blk, lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            *extra_in,
            pl.BlockSpec((8, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, B), jnp.float32),
            jax.ShapeDtypeStruct((2, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((2, 8), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return out_cache, out_pose, payloads
