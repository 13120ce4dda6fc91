"""1D sliding-window normal estimation over scan-ordered points.

TPU equivalent of srrg_pcl ``NormalComputator1DSlidingWindow[Normal]``
(declared at sensor_processing/raw_data_preprocessor_projective_2d.h:25,33-37;
parameters ``normal_min_points`` / ``normal_point_distance`` per
configurations/stage_segway_double_config_LASER_0.json:711-719).

Behavior re-created: for each point, collect scan-order neighbors on both
sides while they stay within ``normal_point_distance`` of the center point
(contiguous window — a depth discontinuity cuts it); if at least
``normal_min_points`` points are gathered, fit a line through the window
(2x2 covariance eigen-decomposition) and take the perpendicular direction,
oriented to face the sensor (n . p < 0); otherwise the point is invalidated.

TPU design: the two-pointer scan loop becomes a static stencil of width
2*W+1 computed with shifted copies (jnp.roll on a padded array) and a
cumulative-AND to enforce window contiguity — branch-free, fully on the VPU,
vmappable over batched scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.cloud import Cloud

Array = jax.Array


def compute_normals(
    cloud: Cloud,
    normal_point_distance: float = 0.3,
    normal_min_points: int = 5,
    window: int = 16,
    invalidate_failures: bool = True,
) -> Cloud:
    """Estimate per-point normals in scan order.

    cloud points must be in the sensor frame (orientation check uses the
    origin as the viewpoint). ``window`` is the static one-sided stencil
    width; 16 neighbors a side at typical angular resolutions covers the
    reference's 0.2-0.3 m gating distance with margin.
    """
    n = cloud.capacity
    xy = cloud.xy
    valid = cloud.valid
    d2_max = jnp.float32(normal_point_distance * normal_point_distance)

    # Shifted neighbor views: pad so shifts never wrap into real data.
    pad_xy = jnp.pad(xy, ((window, window), (0, 0)))
    pad_valid = jnp.pad(valid, (window, window))

    def neighbor(offset: int):
        sl = slice(window + offset, window + offset + n)
        return pad_xy[sl], pad_valid[sl]

    # Accumulate window statistics with contiguity: walking outwards from the
    # center, a neighbor is admitted only if every point between it and the
    # center was admitted (cumulative AND), mirroring the C++ two-pointer scan.
    s_w = valid.astype(jnp.float32)  # weights (center always in)
    s_x = jnp.where(valid[:, None], xy, 0.0)
    s_xx = jnp.where(valid[:, None], xy * xy, 0.0)
    s_xy = jnp.where(valid, xy[:, 0] * xy[:, 1], 0.0)

    for sign in (-1, 1):
        alive = valid
        for k in range(1, window + 1):
            nb_xy, nb_valid = neighbor(sign * k)
            d2 = jnp.sum((nb_xy - xy) ** 2, axis=-1)
            alive = alive & nb_valid & (d2 <= d2_max)
            w = alive.astype(jnp.float32)
            s_w = s_w + w
            s_x = s_x + w[:, None] * nb_xy
            s_xx = s_xx + w[:, None] * nb_xy * nb_xy
            s_xy = s_xy + w * nb_xy[:, 0] * nb_xy[:, 1]

    cnt = s_w
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    mean = s_x * inv[:, None]
    # covariance entries
    cov_xx = s_xx[:, 0] * inv - mean[:, 0] * mean[:, 0]
    cov_yy = s_xx[:, 1] * inv - mean[:, 1] * mean[:, 1]
    cov_xy = s_xy * inv - mean[:, 0] * mean[:, 1]

    # Smallest-eigenvalue eigenvector of [[cov_xx, cov_xy], [cov_xy, cov_yy]]:
    # direction perpendicular to the fitted line. Closed form on the VPU.
    tr = cov_xx + cov_yy
    det_half = jnp.sqrt(jnp.maximum((cov_xx - cov_yy) ** 2 / 4.0 + cov_xy**2, 0.0))
    lam_min = tr / 2.0 - det_half
    # (A - lam_min I) v = 0 -> v = (cov_xy, lam_min - cov_xx) or (lam_min - cov_yy, cov_xy)
    v1 = jnp.stack([cov_xy, lam_min - cov_xx], axis=-1)
    v2 = jnp.stack([lam_min - cov_yy, cov_xy], axis=-1)
    use_v1 = jnp.sum(v1 * v1, axis=-1) >= jnp.sum(v2 * v2, axis=-1)
    v = jnp.where(use_v1[:, None], v1, v2)
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    degenerate = norm[:, 0] < 1e-12
    # perfectly straight window: normal is the perpendicular of the line direction
    line_dir = jnp.stack([cov_xx, cov_xy], axis=-1)  # dominant eigvec if degenerate
    perp = jnp.stack([-line_dir[:, 1], line_dir[:, 0]], axis=-1)
    perp_n = jnp.sqrt(jnp.sum(perp * perp, axis=-1, keepdims=True))
    v = jnp.where(degenerate[:, None], perp / jnp.maximum(perp_n, 1e-20), v / jnp.maximum(norm, 1e-20))

    # orient toward the sensor (viewpoint at the origin): n . p < 0
    flip = jnp.sum(v * xy, axis=-1) > 0
    v = jnp.where(flip[:, None], -v, v)

    ok = cnt >= normal_min_points
    normal = jnp.where(ok[:, None], v, 0.0)
    new_valid = cloud.valid & ok if invalidate_failures else cloud.valid
    return Cloud(xy=cloud.xy, normal=normal, valid=new_valid)
