"""Projective scan-to-scene merging — TPU equivalent of ``MergerProjective2D``
(mapping/merger_projective_2d.{h,cpp}).

Reference semantics (.cpp:9-102), per beam of a polar canvas seen from the
estimated measurement pose:
  - measurement cell with depth > 0.9*range_max is discarded (:46-49)
  - empty measurement cell: nothing
  - empty scene cell: append the transformed measurement point (:56-62)
  - both present, |Δdepth| < merge_threshold: average the two points and
    renormalize the normal (:69-75)
  - measurement behind scene point: replace the scene point (:77-82)
  - scene point behind measurement: append measurement as new point (:84-87)

TPU design: the sequential append-with-index-reuse loop becomes (1) a
vectorized per-beam action classification, (2) scatter updates for
merge/replace (scene z-buffer indices are unique per beam, so scatters don't
collide), and (3) a prefix-sum compaction that places appended points into the
free tail of the fixed-capacity scene. SURVEY.md §7 notes this reformulation
must be trajectory-equivalent, not line-equivalent — the only semantic
difference is append order within one frame, which no downstream consumer
observes (the scene is an unordered set to the projector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import geometry
from ..utils.cloud import Cloud
from . import projector as projector_op
from .projector import PolarProjection

Array = jax.Array


def merge_correspondence(
    scene: Cloud,
    moving: Cloud,
    fixed_idx: Array,
    moving_idx: Array,
    corr_valid: Array,
    moving_in_scene: Array,
    maximum_distance_geometry_squared: float = 0.25,
    target_number_of_merges: int = 200,
    enable_binning: bool = True,
    binning_resolution: float = 0.25,
) -> Cloud:
    """Closure-time map merge — equivalent of
    ``MergerCorrespondencePointNormal2f`` (external; params at
    configurations/stage_segway_double_config_LASER_0.json:656-670:
    enable_binning, maximum_distance_geometry_squared 0.25, maximum_response,
    target_number_of_merges 200).

    Behavior re-created: corresponding point pairs within the squared
    geometric distance bound are fused (average + normal renormalization);
    non-corresponded moving points are appended up to
    ``target_number_of_merges``, optionally decimated onto a coarse grid first
    (binning = distribution homogenization).
    """
    cam = moving_in_scene
    mov = Cloud(
        xy=geometry.transform_points(cam, moving.xy),
        normal=geometry.rotate_vectors(cam, moving.normal),
        valid=moving.valid,
    )
    cap = scene.capacity
    m_idx = jnp.maximum(moving_idx, 0)
    f_idx = jnp.maximum(fixed_idx, 0)
    mp = mov.xy[m_idx]
    mn = mov.normal[m_idx]
    sp = scene.xy[f_idx]
    sn = scene.normal[f_idx]
    d2 = jnp.sum((mp - sp) ** 2, axis=-1)
    do_merge = corr_valid & (d2 <= maximum_distance_geometry_squared)

    avg_p = 0.5 * (sp + mp)
    avg_n = 0.5 * (sn + mn)
    nrm = jnp.linalg.norm(avg_n, axis=-1, keepdims=True)
    avg_n = avg_n / jnp.maximum(nrm, 1e-12)
    tgt = jnp.where(do_merge, f_idx, cap)
    xy = jnp.concatenate([scene.xy, jnp.zeros((1, 2))]).at[tgt].set(avg_p)[:cap]
    nm = jnp.concatenate([scene.normal, jnp.zeros((1, 2))]).at[tgt].set(avg_n)[:cap]

    # moving points not claimed by any correspondence -> append candidates
    claimed = jnp.zeros((mov.capacity,), jnp.bool_).at[
        jnp.where(do_merge, m_idx, mov.capacity)
    ].set(True, mode="drop")
    cand = mov.valid & ~claimed
    if enable_binning:
        # keep one candidate per coarse grid cell (first index wins)
        cell = (
            jnp.floor(mov.xy[:, 0] / binning_resolution).astype(jnp.int32) * 8192
            + jnp.floor(mov.xy[:, 1] / binning_resolution).astype(jnp.int32)
        )
        order = jnp.argsort(jnp.where(cand, cell, 2**31 - 1))
        sorted_cell = cell[order]
        sorted_cand = cand[order]
        first = jnp.concatenate(
            [jnp.array([True]), sorted_cell[1:] != sorted_cell[:-1]]
        )
        keep_sorted = sorted_cand & first
        cand = jnp.zeros_like(cand).at[order].set(keep_sorted)
    # budget: at most target_number_of_merges appended
    rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
    cand = cand & (rank < target_number_of_merges)

    count = jnp.sum(scene.valid.astype(jnp.int32))
    slot = count + jnp.cumsum(cand.astype(jnp.int32)) - 1
    dest = jnp.where(cand & (slot < cap), slot, cap)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2))]).at[dest].set(mov.xy)[:cap]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2))]).at[dest].set(mov.normal)[:cap]
    new_count = jnp.minimum(count + jnp.sum(cand.astype(jnp.int32)), cap)
    valid = jnp.arange(cap) < new_count
    return Cloud(xy=xy, normal=nm, valid=valid)


def merge_projective_lean(
    proj: PolarProjection,
    scene: Cloud,
    cache_cells: Cloud,
    cache_rows: Array,
    measurement: Cloud,
    old_sensor_in_new: Array,
    measurement_in_scene: Array,
    merge_threshold: float = 0.2,
):
    """Beam-window merge: the scene side comes from the previous frame's
    post-merge canvas (``cache_cells`` in the OLD sensor frame with their
    scene ``cache_rows``) re-projected through the measured sensor motion —
    NO full-scene projection at all, every op is beam-sized.

    Semantics deviation vs merge_projective: scene points that became visible
    only from the new pose are not on the cached canvas, so their beams look
    empty and the measurement appends instead of merging/replacing — a
    sub-beam-rate effect bounded by the sensor motion between frames
    (serving fast path; parity runs use merge_projective).

    Returns (new_scene, new_cache_cells (NEW sensor frame), new_cache_rows).
    """
    cap = scene.capacity
    moved = Cloud(
        xy=geometry.transform_points(old_sensor_in_new, cache_cells.xy),
        normal=geometry.rotate_vectors(old_sensor_in_new, cache_cells.normal),
        valid=cache_cells.valid,
    )
    scene_canvas = projector_op.project_local(proj, moved)
    meas_canvas = projector_op.project_local(proj, measurement)

    m_ok = meas_canvas.valid & (meas_canvas.depth <= 0.9 * proj.range_max)
    s_ok = scene_canvas.valid
    m_idx = jnp.maximum(meas_canvas.idx, 0)
    w_idx = jnp.maximum(scene_canvas.idx, 0)       # winner among cached cells
    s_row = cache_rows[w_idx]                      # scene row of the winner
    dr = meas_canvas.depth - scene_canvas.depth

    both = m_ok & s_ok
    do_merge = both & (jnp.abs(dr) < merge_threshold)
    do_replace = both & ~do_merge & (dr > 0)
    do_append = (m_ok & ~s_ok) | (both & ~do_merge & ~do_replace)
    modify = do_merge | do_replace

    # values in the NEW SENSOR frame (measurement's own frame)
    mp_s = measurement.xy[m_idx]
    mn_s = measurement.normal[m_idx]
    sp_s = moved.xy[w_idx]
    sn_s = moved.normal[w_idx]
    avg_p = 0.5 * (sp_s + mp_s)
    avg_n = 0.5 * (sn_s + mn_s)
    nrm = jnp.linalg.norm(avg_n, axis=-1, keepdims=True)
    avg_n = avg_n / jnp.maximum(nrm, 1e-12)
    upd_p_s = jnp.where(do_merge[:, None], avg_p, mp_s)
    upd_n_s = jnp.where(do_merge[:, None], avg_n, mn_s)

    # scene-frame scatter (winner rows unique per beam: a scene point wins
    # at most one beam of the cached canvas)
    upd_p = geometry.transform_points(measurement_in_scene, upd_p_s)
    upd_n = geometry.rotate_vectors(measurement_in_scene, upd_n_s)
    tgt = jnp.where(modify & (s_row >= 0), s_row, cap)
    xy = jnp.concatenate([scene.xy, jnp.zeros((1, 2))]).at[tgt].set(
        upd_p, unique_indices=True, mode="drop"
    )[:cap]
    nm = jnp.concatenate([scene.normal, jnp.zeros((1, 2))]).at[tgt].set(
        upd_n, unique_indices=True, mode="drop"
    )[:cap]

    count = jnp.sum(scene.valid.astype(jnp.int32))
    slot = count + jnp.cumsum(do_append.astype(jnp.int32)) - 1
    dest = jnp.where(do_append & (slot < cap), slot, cap)
    app_p = geometry.transform_points(measurement_in_scene, mp_s)
    app_n = geometry.rotate_vectors(measurement_in_scene, mn_s)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2))]).at[dest].set(
        app_p, unique_indices=True, mode="drop"
    )[:cap]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2))]).at[dest].set(
        app_n, unique_indices=True, mode="drop"
    )[:cap]
    new_count = jnp.minimum(count + jnp.sum(do_append.astype(jnp.int32)), cap)
    valid = jnp.arange(cap) < new_count
    new_scene = Cloud(xy=xy, normal=nm, valid=valid)

    # next cache: post-merge cells in the NEW sensor frame + their scene rows
    cell_p = jnp.where(m_ok[:, None], upd_p_s, sp_s)
    cell_n = jnp.where(m_ok[:, None], upd_n_s, sn_s)
    cell_valid = m_ok | s_ok
    cell_rows = jnp.where(
        do_append, jnp.where(slot < cap, slot, -1),
        jnp.where(modify, s_row, jnp.where(s_ok, s_row, -1)),
    ).astype(jnp.int32)
    new_cells = Cloud(xy=cell_p, normal=cell_n, valid=cell_valid & (cell_rows >= 0))
    return new_scene, new_cells, cell_rows


def merge_projective(
    proj: PolarProjection,
    scene: Cloud,
    measurement: Cloud,
    measurement_in_scene: Array,
    merge_threshold: float = 0.2,
    return_canvas: bool = False,
    return_dropped: bool = False,
):
    """Fuse ``measurement`` (own frame) into ``scene`` (scene frame) given the
    estimated measurement pose. Returns the updated scene (same capacity).

    With ``return_canvas`` also returns the post-merge visible cell per beam
    as a beam-indexed cloud in the CAMERA (sensor) frame: exactly the view the
    next frame's clipper would extract from this camera pose, letting the
    tracker skip one full scene projection per frame (models/tracker.py
    ``reuse_clip_canvas``). Cell values: merged -> averaged point, replaced/
    appended -> measurement point, untouched -> scene winner. (A true
    re-projection of the merged scene can differ on cells whose averaged
    point drifts across a beam boundary — sub-resolution effects the aligner
    is robust to; parity runs keep the flag off.)"""
    cam = measurement_in_scene
    scene_canvas, scene_local = projector_op.project(proj, cam, scene)
    meas_in_scene = Cloud(
        xy=geometry.transform_points(cam, measurement.xy),
        normal=geometry.rotate_vectors(cam, measurement.normal),
        valid=measurement.valid,
    )
    meas_canvas, meas_local = projector_op.project(proj, cam, meas_in_scene)

    # per-beam cells
    m_ok = meas_canvas.valid & (meas_canvas.depth <= 0.9 * proj.range_max)
    s_ok = scene_canvas.valid
    m_idx = jnp.maximum(meas_canvas.idx, 0)
    s_idx = jnp.maximum(scene_canvas.idx, 0)
    dr = meas_canvas.depth - scene_canvas.depth

    do_append_empty = m_ok & ~s_ok
    both = m_ok & s_ok
    do_merge = both & (jnp.abs(dr) < merge_threshold)
    do_replace = both & ~do_merge & (dr > 0)
    do_append_front = both & ~do_merge & ~do_replace
    do_append = do_append_empty | do_append_front

    mp = meas_in_scene.xy[m_idx]
    mn = meas_in_scene.normal[m_idx]

    xy, nm, valid = scene.xy, scene.normal, scene.valid
    cap = scene.capacity

    # merge: scene[s_idx] = normalize((scene + meas)/2); normal renormalized
    sp = xy[s_idx]
    sn = nm[s_idx]
    avg_p = 0.5 * (sp + mp)
    avg_n = 0.5 * (sn + mn)
    norm = jnp.linalg.norm(avg_n, axis=-1, keepdims=True)
    avg_n = avg_n / jnp.maximum(norm, 1e-12)

    tgt_merge = jnp.where(do_merge, s_idx, cap)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2), xy.dtype)]).at[tgt_merge].set(avg_p)[:cap]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2), nm.dtype)]).at[tgt_merge].set(avg_n)[:cap]

    # replace: scene[s_idx] = meas point
    tgt_rep = jnp.where(do_replace, s_idx, cap)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2), xy.dtype)]).at[tgt_rep].set(mp)[:cap]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2), nm.dtype)]).at[tgt_rep].set(mn)[:cap]

    # append: pack appended points into free rows at the tail of the valid
    # region. Scene is kept compacted (models/tracker.py compacts after
    # populate), so free rows start at count.
    count = jnp.sum(valid.astype(jnp.int32))
    slot = count + jnp.cumsum(do_append.astype(jnp.int32)) - 1
    dest = jnp.where(do_append & (slot < cap), slot, cap)
    xy = jnp.concatenate([xy, jnp.zeros((1, 2), xy.dtype)]).at[dest].set(mp)[:cap]
    nm = jnp.concatenate([nm, jnp.zeros((1, 2), nm.dtype)]).at[dest].set(mn)[:cap]
    new_count = jnp.minimum(count + jnp.sum(do_append.astype(jnp.int32)), cap)
    valid = jnp.arange(cap) < new_count
    new_scene = Cloud(xy=xy, normal=nm, valid=valid)
    # capacity-saturation accounting (the reference resizes dynamically,
    # merger_projective_2d.cpp:31-33; the static-shape equivalent reports
    # how many appends did not fit so the host can regrow at a safe boundary)
    dropped = jnp.sum((do_append & (slot >= cap)).astype(jnp.int32))
    if not return_canvas:
        return (new_scene, dropped) if return_dropped else new_scene

    # post-merge per-beam cell in the camera frame (see docstring)
    s_loc_p = scene_local.xy[s_idx]
    s_loc_n = scene_local.normal[s_idx]
    m_loc_p = meas_local.xy[m_idx]
    m_loc_n = meas_local.normal[m_idx]
    avg_loc_p = 0.5 * (s_loc_p + m_loc_p)
    avg_loc_n = 0.5 * (s_loc_n + m_loc_n)
    nrm_loc = jnp.linalg.norm(avg_loc_n, axis=-1, keepdims=True)
    avg_loc_n = avg_loc_n / jnp.maximum(nrm_loc, 1e-12)
    cell_p = jnp.where(
        do_merge[:, None], avg_loc_p, jnp.where(m_ok[:, None], m_loc_p, s_loc_p)
    )
    cell_n = jnp.where(
        do_merge[:, None], avg_loc_n, jnp.where(m_ok[:, None], m_loc_n, s_loc_n)
    )
    cell_valid = m_ok | s_ok
    canvas_cloud = Cloud(xy=cell_p, normal=cell_n, valid=cell_valid)
    # scene row behind each cell (for merge_projective_lean chaining):
    # merged/replaced -> the winner row, appended -> its tail slot,
    # scene-only -> the canvas winner row
    cell_rows = jnp.where(
        do_append,
        jnp.where(slot < cap, slot, -1),
        jnp.where(m_ok | s_ok, s_idx, -1),
    ).astype(jnp.int32)
    cell_rows = jnp.where(cell_valid, cell_rows, -1)
    if return_dropped:
        return new_scene, canvas_cloud, cell_rows, dropped
    return new_scene, canvas_cloud, cell_rows
