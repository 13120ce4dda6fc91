"""Grid nearest-neighbor fields via jump flooding — the TPU-native equivalent
of srrg2_core's ``PathMatrix`` + ``PathMatrixDistanceSearch`` (used by
``CorrespondenceFinderNN2D``, registration/correspondence_finder_nn_2d.{h,cpp}:
rasterize the fixed cloud into a grid, run a distance/parent-map search, then
answer nearest-fixed-point queries in O(1) per lookup).

The C++ runs a sequential Dijkstra-like expansion; on TPU the same field is
computed with the Jump Flooding Algorithm: O(log N) full-grid passes, each a
9-way shifted argmin on the VPU — massively parallel, static shapes, exact for
all but adversarial layouts (and those only off by a cell at equidistant
boundaries).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.cloud import Cloud

Array = jax.Array

_INF = jnp.float32(3.0e38)


class NearestField(NamedTuple):
    """Per-cell nearest fixed point.

    idx:    [H, W] int32 index into the fixed cloud (-1 = none in range)
    dist2:  [H, W] squared distance in METERS from cell center
    origin: [2] world coords of cell (0,0) center
    resolution: [] meters per cell
    """

    idx: Array
    dist2: Array
    origin: Array
    resolution: Array


def build(
    fixed: Cloud,
    rows: int,
    cols: int,
    resolution: float,
    origin: Array | None = None,
) -> NearestField:
    """Rasterize ``fixed`` and jump-flood the nearest-point field.

    ``origin`` defaults to the valid bounding-box minimum minus one cell of
    padding (the dynamic-value/static-shape split: grid SIZE is static, grid
    PLACEMENT follows the data like the reference's _adjustSize).
    """
    if origin is None:
        big = jnp.float32(1e30)
        xy_min = jnp.min(jnp.where(fixed.valid[:, None], fixed.xy, big), axis=0)
        origin = xy_min - resolution
    origin = jnp.asarray(origin, jnp.float32)

    # rasterize: one representative point per cell (closest to cell center
    # is overkill; the reference keeps the last written — we keep the min idx)
    ij = jnp.floor((fixed.xy - origin) / resolution).astype(jnp.int32)
    ok = (
        fixed.valid
        & (ij[:, 0] >= 0)
        & (ij[:, 0] < cols)
        & (ij[:, 1] >= 0)
        & (ij[:, 1] < rows)
    )
    flat = jnp.where(ok, ij[:, 1] * cols + ij[:, 0], rows * cols)
    n = fixed.capacity
    seed_idx = (
        jnp.full((rows * cols + 1,), 2**31 - 1, jnp.int32)
        .at[flat]
        .min(jnp.where(ok, jnp.arange(n, dtype=jnp.int32), 2**31 - 1))[: rows * cols]
    )
    seed_idx = jnp.where(seed_idx == 2**31 - 1, -1, seed_idx).reshape(rows, cols)

    # cell-center world coordinates
    gx = origin[0] + (jnp.arange(cols, dtype=jnp.float32) + 0.5) * resolution
    gy = origin[1] + (jnp.arange(rows, dtype=jnp.float32) + 0.5) * resolution
    cx = jnp.broadcast_to(gx[None, :], (rows, cols))
    cy = jnp.broadcast_to(gy[:, None], (rows, cols))

    def point_of(idx):
        safe = jnp.maximum(idx, 0)
        p = fixed.xy[safe]
        return jnp.where((idx >= 0)[..., None], p, _INF)

    def dist2_of(idx):
        p = point_of(idx)
        d = (p[..., 0] - cx) ** 2 + (p[..., 1] - cy) ** 2
        return jnp.where(idx >= 0, d, _INF)

    idx = seed_idx
    best = dist2_of(idx)

    # jump flooding: steps N/2, N/4, ..., 1 (+1 extra refinement pass)
    steps = []
    s = max(rows, cols) // 2
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)

    for s in steps:
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dx == 0 and dy == 0:
                    continue
                cand = jnp.roll(idx, (dy, dx), axis=(0, 1))
                # cells rolled across the border are invalid
                if dy > 0:
                    cand = cand.at[:dy, :].set(-1)
                elif dy < 0:
                    cand = cand.at[dy:, :].set(-1)
                if dx > 0:
                    cand = cand.at[:, :dx].set(-1)
                elif dx < 0:
                    cand = cand.at[:, dx:].set(-1)
                d = dist2_of(cand)
                take = d < best
                idx = jnp.where(take, cand, idx)
                best = jnp.where(take, d, best)

    return NearestField(idx=idx, dist2=best, origin=origin, resolution=jnp.float32(resolution))


def lookup(field: NearestField, queries: Array) -> tuple[Array, Array]:
    """Nearest fixed index + squared distance for query points [N, 2].

    Out-of-grid queries return (-1, +inf) — matching the reference's
    parent_map.inside() gate (correspondence_finder_nn_2d.cpp:69-75).
    """
    rows, cols = field.idx.shape
    ij = jnp.floor((queries - field.origin) / field.resolution).astype(jnp.int32)
    inside = (
        (ij[:, 0] >= 0) & (ij[:, 0] < cols) & (ij[:, 1] >= 0) & (ij[:, 1] < rows)
    )
    jx = jnp.clip(ij[:, 0], 0, cols - 1)
    jy = jnp.clip(ij[:, 1], 0, rows - 1)
    idx = jnp.where(inside, field.idx[jy, jx], -1)
    d2 = jnp.where(inside, field.dist2[jy, jx], _INF)
    return idx, d2
