"""Render the Killian-scale corridor benchmark: world walls + GT vs estimated
trajectory + per-frame error curve -> PNG. Pure host work (forces the CPU
backend so it can run beside a TPU job).

Usage: python -m srrg2_laser_slam_2d_tpu.apps.corridor_report \
           --gt gt.tum --est traj.tum -o corridor_report.png
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    from ..utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ..bench import synthetic
    from ..io import tum

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--est", required=True)
    ap.add_argument("-o", "--output", default="corridor_report.png")
    ap.add_argument("--beams", type=int, default=721)
    args = ap.parse_args(argv)

    cfg = synthetic.CorridorConfig(num_beams=args.beams)
    world = synthetic.corridor_world(cfg)
    wxy = np.asarray(world.xy)[np.asarray(world.valid)]

    t_g, gt = tum.read_tum(args.gt)
    t_e, est = tum.read_tum(args.est)
    n = min(len(gt), len(est))
    gt, est = np.asarray(gt)[:n], np.asarray(est)[:n]
    # the SLAM frame anchors at the first pose; move estimates into GT frame
    c, s = np.cos(gt[0, 2]), np.sin(gt[0, 2])
    R = np.array([[c, -s], [s, c]], np.float32)
    est_w = est.copy()
    est_w[:, :2] = (R @ est[:, :2].T).T + gt[0, :2]
    est_w[:, 2] = est[:, 2] + gt[0, 2]
    err = np.linalg.norm(est_w[:, :2] - gt[:, :2], axis=1)

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(14, 6), gridspec_kw={"width_ratios": [1.6, 1.0]}
    )
    ax1.scatter(wxy[:, 0], wxy[:, 1], s=0.3, c="#A5ADBB", linewidths=0)
    ax1.plot(gt[:, 0], gt[:, 1], color="#5A7DCF", lw=1.6, label="ground truth")
    ax1.plot(est_w[:, 0], est_w[:, 1], color="#C46A4B", lw=1.2, label="estimate")
    ax1.set_aspect("equal")
    ax1.set_title(
        f"corridor benchmark ({n} frames, "
        f"final err {err[-1]:.2f} m, max {err.max():.2f} m)"
    )
    ax1.legend(loc="upper right", frameon=False)
    ax2.plot(err, color="#C46A4B", lw=1.0)
    ax2.set_xlabel("frame")
    ax2.set_ylabel("translation error [m]")
    ax2.set_title("per-frame error vs ground truth")
    for ax in (ax1, ax2):
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    fig.tight_layout()
    fig.savefig(args.output, dpi=130)
    print(f"wrote {args.output}  (rmse {np.sqrt(np.mean(err**2)):.3f} m)")


if __name__ == "__main__":
    main()
