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


def merge_projective(
    proj: PolarProjection,
    scene: Cloud,
    measurement: Cloud,
    measurement_in_scene: Array,
    merge_threshold: float = 0.2,
) -> Cloud:
    """Fuse ``measurement`` (own frame) into ``scene`` (scene frame) given the
    estimated measurement pose. Returns the updated scene (same capacity)."""
    cam = measurement_in_scene
    scene_canvas, _ = projector_op.project(proj, cam, scene)
    meas_in_scene = Cloud(
        xy=geometry.transform_points(cam, measurement.xy),
        normal=geometry.rotate_vectors(cam, measurement.normal),
        valid=measurement.valid,
    )
    meas_canvas, _ = projector_op.project(proj, cam, meas_in_scene)

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

    return Cloud(xy=xy, normal=nm, valid=valid)
