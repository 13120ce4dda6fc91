"""Alternative correspondence finders — TPU equivalents of
``CorrespondenceFinderNN2D`` (grid distance-map matching,
registration/correspondence_finder_nn_2d.{h,cpp}) and
``CorrespondenceFinderKDTree2D`` (bounded nearest-neighbor matching,
registration/correspondence_finder_kd_tree_2d.{h,cpp}).

The projective finder (ops/icp.py) is the primary design (beam-indexed static
shapes); these cover the regimes where the projective model degrades (large
viewpoint changes, non-bijective beam assignment):

- grid finder: rasterized nearest field via jump flooding (ops/distance_map),
  O(1) gather per moving point — the PathMatrix design, TPU-parallel.
- brute-force matmul finder: exact bounded NN through a [M, F] squared-
  distance matrix computed as |a|^2 + |b|^2 - 2 a.b on the MXU — the KD-tree's
  role (exact bounded NN + normal gate) delivered by dense linear algebra,
  which on TPU beats tree traversal by orders of magnitude (SURVEY.md §7
  'Alternative finders').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import geometry
from ..utils.cloud import Cloud
from . import distance_map
from .icp import Correspondences

Array = jax.Array


def find_nn_grid(
    field: distance_map.NearestField,
    fixed: Cloud,
    moving: Cloud,
    estimate: Array,
    max_distance_m: float = 1.0,
    normal_cos: float = 0.8,
) -> Correspondences:
    """Distance-map matching: per moving point (transformed by ``estimate``)
    gather the nearest fixed index from the precomputed field, gate by true
    distance and normal agreement (reference params resolution 0.05,
    max_distance_m 1, normal_cos 0.8 — correspondence_finder_nn_2d.h:26-41)."""
    moved_xy = geometry.transform_points(estimate, moving.xy)
    moved_nrm = geometry.rotate_vectors(estimate, moving.normal)
    idx, _ = distance_map.lookup(field, moved_xy)
    safe = jnp.maximum(idx, 0)
    d2 = jnp.sum((fixed.xy[safe] - moved_xy) ** 2, axis=-1)
    ndot = jnp.sum(fixed.normal[safe] * moved_nrm, axis=-1)
    ok = (
        moving.valid
        & (idx >= 0)
        & fixed.valid[safe]
        & (d2 <= max_distance_m * max_distance_m)
        & (ndot >= normal_cos)
    )
    return Correspondences(
        fixed_idx=safe,
        moving_idx=jnp.arange(moving.capacity, dtype=jnp.int32),
        valid=ok,
    )


def find_bruteforce_nn(
    fixed: Cloud,
    moving: Cloud,
    estimate: Array,
    max_distance_m: float = 1e-2,
    normal_cos: float = 0.8,
) -> Correspondences:
    """Exact bounded NN via an MXU distance matrix (KD-tree equivalent;
    reference defaults max_distance_m 1e-2, normal_cos 0.8 —
    correspondence_finder_kd_tree_2d.h:24-35)."""
    moved_xy = geometry.transform_points(estimate, moving.xy)
    moved_nrm = geometry.rotate_vectors(estimate, moving.normal)
    big = jnp.float32(3.0e38)
    fx = jnp.where(fixed.valid[:, None], fixed.xy, big)
    # |a - b|^2 = |a|^2 + |b|^2 - 2 a.b ; the cross term is one [M,2]x[2,F]
    # matmul — tiny K, but XLA maps the whole [M,F] computation onto wide
    # vector/matrix units instead of a tree walk
    cross = jax.lax.dot_general(
        moved_xy,
        fx.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = (
        jnp.sum(moved_xy * moved_xy, axis=1, keepdims=True)
        + jnp.sum(fx * fx, axis=1)[None, :]
        - 2.0 * cross
    )
    d2 = jnp.where(fixed.valid[None, :], d2, big)
    nn = jnp.argmin(d2, axis=1).astype(jnp.int32)
    nn_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
    ndot = jnp.sum(fixed.normal[nn] * moved_nrm, axis=-1)
    ok = (
        moving.valid
        & (nn_d2 <= max_distance_m * max_distance_m)
        & (ndot >= normal_cos)
    )
    return Correspondences(
        fixed_idx=nn,
        moving_idx=jnp.arange(moving.capacity, dtype=jnp.int32),
        valid=ok,
    )
