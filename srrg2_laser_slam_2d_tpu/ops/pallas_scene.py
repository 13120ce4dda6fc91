"""Pallas scene kernels: fused projective clip and merge.

The scene-sized ops (SceneClipperProjective2D, MergerProjective2D) are the
remaining per-frame cost after the fused aligner: on the XLA path each costs
0.15-0.19 ms dominated by HBM traffic of [scene, beams] intermediates and
scatter lowering. These kernels keep everything in VMEM:

- z-buffer over the scene runs in point CHUNKS (a [chunk, B] compare tile at
  a time, fori_loop carry of per-beam winner fields) so the working set stays
  ~3 MB regardless of scene capacity;
- the merge writes back through one-hot MATMULS instead of scatters (the
  winner one-hot of each chunk right-multiplies the per-beam update rows);
- append slot assignment uses a triangular-matrix matmul as the prefix sum
  (Mosaic lowers neither cumsum nor scatter).

Semantics mirror ops/clip.clip_projective and ops/merge.merge_projective
(ties averaged instead of first-index, as in ops/pallas_projective_align).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_projector import _atan2
from .projector import PolarProjection
from ..utils.cloud import Cloud

Array = jax.Array

_BIG = 1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack(cloud: Cloud) -> Array:
    n = cloud.capacity
    return jnp.concatenate(
        [
            cloud.xy,
            cloud.normal,
            cloud.valid.astype(jnp.float32)[:, None],
            jnp.zeros((n, 3), jnp.float32),
        ],
        axis=1,
    )


def _beam_fields(x, y, v, proj: PolarProjection):
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
    return d, colf.astype(jnp.int32), ok


def _chunked_zbuffer(geo_ref, n_pad, chunk, beam_ids, proj, cam):
    """Winner fields per beam from a packed cloud ref transformed into the
    camera frame (cam = camera pose; points are mapped by cam^-1).

    Returns (depth[B], x[B], y[B], nx[B], ny[B], has[B], row[B]) — winner
    coords in the CAMERA frame plus the winner's global row index (argmin:
    lowest index wins ties, matching the reference's sequential z-test)."""
    cc, cs = jnp.cos(cam[2]), jnp.sin(cam[2])
    # inverse transform: p' = R^T (p - t)
    n_chunks = n_pad // chunk

    def body(k, carry):
        bd, bx, by, bnx, bny, brow = carry
        tile = geo_ref[pl.ds(k * chunk, chunk), :]
        wx = tile[:, 0] - cam[0]
        wy = tile[:, 1] - cam[1]
        x = cc * wx + cs * wy
        y = -cs * wx + cc * wy
        nx = cc * tile[:, 2] + cs * tile[:, 3]
        ny = -cs * tile[:, 2] + cc * tile[:, 3]
        v = tile[:, 4]
        d, col, ok = _beam_fields(x, y, v, proj)
        hit = (col[:, None] == beam_ids) & ok[:, None]
        dm = jnp.where(hit, d[:, None], _BIG)
        cmin = jnp.min(dm, axis=0)
        crow = jnp.argmin(dm, axis=0).astype(jnp.int32) + k * chunk
        is_min = (dm <= cmin[None, :]) & hit
        cnt = jnp.maximum(jnp.sum(is_min.astype(jnp.float32), axis=0), 1.0)
        hot = is_min.astype(jnp.float32) / cnt[None, :]

        def g(f):
            return jax.lax.dot_general(
                f[None, :], hot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]

        take = cmin < bd
        return (
            jnp.where(take, cmin, bd),
            jnp.where(take, g(x), bx),
            jnp.where(take, g(y), by),
            jnp.where(take, g(nx), bnx),
            jnp.where(take, g(ny), bny),
            jnp.where(take, crow, brow),
        )

    cols_padded = beam_ids.shape[1]
    z = jnp.zeros((cols_padded,), jnp.float32)
    bd, bx, by, bnx, bny, brow = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.full((cols_padded,), _BIG, jnp.float32), z, z, z, z,
         jnp.full((cols_padded,), -1, jnp.int32)),
    )
    return bd, bx, by, bnx, bny, bd < _BIG, brow


@functools.partial(jax.jit, static_argnames=("proj", "chunk", "interpret"))
def canvas_pallas(
    proj: PolarProjection,
    cloud: Cloud,
    camera_pose: Array,
    chunk: int = 1024,
    interpret: bool = False,
):
    """Full z-buffer canvas of a cloud seen from ``camera_pose``, one kernel.

    Returns per-(padded-)beam arrays: depth, winner coords/normals in the
    CAMERA frame, validity, and the winner's row index in the cloud."""
    n = cloud.capacity
    n_pad = _round_up(n, chunk)
    cols_padded = _round_up(proj.cols, 128)
    geo = _pack(cloud)
    if n_pad != n:
        geo = jnp.pad(geo, ((0, n_pad - n), (0, 0)))

    def kernel(geo_ref, cam_ref, out_ref, row_ref):
        beam_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols_padded), 1)
        camv = cam_ref[0, :]
        bd, bx, by, bnx, bny, has, brow = _chunked_zbuffer(
            geo_ref, n_pad, min(chunk, n_pad), beam_ids, proj, camv
        )
        in_range = beam_ids[0, :] < proj.cols
        out_ref[0, :] = bd
        out_ref[1, :] = bx
        out_ref[2, :] = by
        out_ref[3, :] = bnx
        out_ref[4, :] = bny
        out_ref[5, :] = (has & in_range).astype(jnp.float32)
        row_ref[0, :] = jnp.where(has & in_range, brow, -1)

    out, rows = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((6, cols_padded), jnp.float32),
            jax.ShapeDtypeStruct((1, cols_padded), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(geo, jnp.asarray(camera_pose, jnp.float32).reshape(1, 3))
    return out, rows[0]


@functools.partial(
    jax.jit,
    static_argnames=("proj", "merge_threshold", "chunk", "interpret", "return_canvas"),
)
def merge_projective_pallas(
    proj: PolarProjection,
    scene: Cloud,
    measurement: Cloud,
    measurement_in_scene: Array,
    merge_threshold: float = 0.2,
    chunk: int = 1024,
    interpret: bool = False,
    return_canvas: bool = False,
):
    """Hybrid fused MergerProjective2D: both z-buffers run as Pallas canvas
    kernels (the HBM-heavy part), the per-beam decisions and the winner-row
    updates/appends run in XLA — winner rows are unique per beam (a point
    projects to exactly one beam), so the scatters carry unique_indices=True
    and lower to the fast path. Appends land in the free tail (scene must be
    kept compacted, as models/tracker.py does)."""
    cam = jnp.asarray(measurement_in_scene, jnp.float32)
    s_canvas, s_rows = canvas_pallas(proj, scene, cam, chunk, interpret)
    # the measurement is in its own sensor frame == camera frame; project at
    # identity then express winners in the scene frame
    m_canvas, _ = canvas_pallas(
        proj, measurement, jnp.zeros(3, jnp.float32), chunk, interpret
    )
    from ..utils import geometry

    sd = s_canvas[0]
    s_has = s_canvas[5] > 0
    md = m_canvas[0]
    m_has = (m_canvas[5] > 0) & (md <= 0.9 * proj.range_max)
    # measurement winner in the SCENE frame
    mp = geometry.transform_points(cam, jnp.stack([m_canvas[1], m_canvas[2]], 1))
    mn = geometry.rotate_vectors(cam, jnp.stack([m_canvas[3], m_canvas[4]], 1))

    dr = md - sd
    both = m_has & s_has
    do_merge = both & (jnp.abs(dr) < merge_threshold)
    do_replace = both & ~do_merge & (dr > 0)
    do_append = (m_has & ~s_has) | (both & ~do_merge & ~do_replace)
    modify = do_merge | do_replace

    n = scene.capacity
    rows = jnp.where(modify, s_rows, n)  # unique per beam; masked -> dropped
    sp = geometry.transform_points(cam, jnp.stack([s_canvas[1], s_canvas[2]], 1))
    sn = geometry.rotate_vectors(cam, jnp.stack([s_canvas[3], s_canvas[4]], 1))
    avg_p = 0.5 * (sp + mp)
    avg_n = 0.5 * (sn + mn)
    nrm = jnp.sqrt(jnp.sum(avg_n * avg_n, axis=1, keepdims=True))
    avg_n = avg_n / jnp.maximum(nrm, 1e-12)
    upd_p = jnp.where(do_merge[:, None], avg_p, mp)
    upd_n = jnp.where(do_merge[:, None], avg_n, mn)

    xy = jnp.concatenate([scene.xy, jnp.zeros((1, 2))]).at[rows].set(
        upd_p, unique_indices=True, mode="drop"
    )[:n]
    nm = jnp.concatenate([scene.normal, jnp.zeros((1, 2))]).at[rows].set(
        upd_n, unique_indices=True, mode="drop"
    )[:n]

    count = jnp.sum(scene.valid.astype(jnp.int32))
    slot = count + jnp.cumsum(do_append.astype(jnp.int32)) - 1
    dest = jnp.where(do_append & (slot < n), slot, n)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2))]).at[dest].set(
        mp, unique_indices=True, mode="drop"
    )[:n]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2))]).at[dest].set(
        mn, unique_indices=True, mode="drop"
    )[:n]
    new_count = jnp.minimum(count + jnp.sum(do_append.astype(jnp.int32)), n)
    valid = jnp.arange(n) < new_count
    new_scene = Cloud(xy=xy, normal=nm, valid=valid)
    if not return_canvas:
        return new_scene
    # post-merge visible cell per beam in the CAMERA frame (ops/merge.py
    # return_canvas semantics): merged -> average, replaced/appended -> meas,
    # untouched -> scene winner
    s_loc = jnp.stack([s_canvas[1], s_canvas[2]], 1)
    s_loc_n = jnp.stack([s_canvas[3], s_canvas[4]], 1)
    m_loc = jnp.stack([m_canvas[1], m_canvas[2]], 1)
    m_loc_n = jnp.stack([m_canvas[3], m_canvas[4]], 1)
    avg_l = 0.5 * (s_loc + m_loc)
    avg_ln = 0.5 * (s_loc_n + m_loc_n)
    nl = jnp.sqrt(jnp.sum(avg_ln * avg_ln, axis=1, keepdims=True))
    avg_ln = avg_ln / jnp.maximum(nl, 1e-12)
    cell_p = jnp.where(do_merge[:, None], avg_l, jnp.where(m_has[:, None], m_loc, s_loc))
    cell_n = jnp.where(
        do_merge[:, None], avg_ln, jnp.where(m_has[:, None], m_loc_n, s_loc_n)
    )
    canvas_cloud = Cloud(xy=cell_p, normal=cell_n, valid=m_has | s_has)
    return new_scene, canvas_cloud


@functools.partial(jax.jit, static_argnames=("proj", "chunk", "interpret"))
def clip_projective_pallas(
    proj: PolarProjection,
    scene: Cloud,
    robot_in_local_map: Array,
    sensor_in_robot: Array,
    chunk: int = 1024,
    interpret: bool = False,
) -> Cloud:
    """Fused SceneClipperProjective2D: one canvas kernel, winners expressed in
    the ROBOT frame (beam-indexed output, capacity = padded beam count)."""
    from ..utils import geometry

    cam = geometry.compose(robot_in_local_map, sensor_in_robot)
    canvas, _ = canvas_pallas(proj, scene, cam, chunk, interpret)
    xy_sensor = jnp.stack([canvas[1], canvas[2]], axis=1)
    nm_sensor = jnp.stack([canvas[3], canvas[4]], axis=1)
    return Cloud(
        xy=geometry.transform_points(sensor_in_robot, xy_sensor),
        normal=geometry.rotate_vectors(sensor_in_robot, nm_sensor),
        valid=canvas[5] > 0,
    )
