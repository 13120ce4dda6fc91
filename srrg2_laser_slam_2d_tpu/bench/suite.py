"""SLAM benchmark suite — equivalent of srrg_benchmark's
``SLAMBenchmarkSuiteSE2`` / ``...CARMEN`` / ``...Simul`` (usage at
benchmarks/benchmark_carmen.cpp:21-64, tests/fixtures.hpp:64-95): dataset
loading, GT alignment, per-axis RMSE statistics, a regression gate with the
same threshold semantics, and TUM export.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from ..utils import geometry
from ..io import tum as tum_io


@dataclass
class RegressionThresholds:
    """Mirrors the compiled-in bounds of the reference benchmarks
    (benchmark_carmen.cpp:15-18 / benchmark_simul.cpp:15-18)."""

    max_mean_translation: tuple = (25.0, 25.0)
    max_std_translation: tuple = (100.0, 100.0)
    max_mean_rotation: float = 1.0
    max_std_rotation: float = 1.0


KILLIAN_THRESHOLDS = RegressionThresholds((25.0, 25.0), (100.0, 100.0), 1.0, 1.0)
SIMUL_THRESHOLDS = RegressionThresholds((0.1, 0.1), (0.5, 0.5), 1.0, 1.0)
# the Killian-scale corridor stand-in (bench/synthetic.py simulate_corridors):
# 2,871 frames / 405 m / 3 large loops — gate at sub-meter ATE (the real
# Killian gate is 25 m, benchmark_carmen.cpp:15; the synthetic world is
# cleaner, so the bar is far tighter)
CORRIDOR_THRESHOLDS = RegressionThresholds((1.0, 1.0), (2.0, 2.0), 0.5, 0.5)


@dataclass
class BenchmarkSuite:
    """Collects timestamped pose estimates, compares against GT."""

    gt_timestamps: np.ndarray = None     # [N]
    gt_poses: np.ndarray = None          # [N, 3]
    estimates: list = field(default_factory=list)  # (timestamp, pose, duration)

    def set_ground_truth(self, timestamps, poses) -> None:
        self.gt_timestamps = np.asarray(timestamps, np.float64)
        self.gt_poses = np.asarray(poses, np.float32)

    def set_pose_estimate(self, pose, timestamp: float, duration: float = 0.0) -> None:
        self.estimates.append((float(timestamp), np.asarray(pose, np.float32), duration))

    # -- metrics -------------------------------------------------------------
    def _matched(self):
        """Associate estimates to GT by nearest timestamp."""
        assert self.gt_timestamps is not None, "ground truth not loaded"
        est_t = np.array([e[0] for e in self.estimates])
        est_p = np.stack([e[1] for e in self.estimates])
        idx = np.searchsorted(self.gt_timestamps, est_t)
        idx = np.clip(idx, 0, len(self.gt_timestamps) - 1)
        prev = np.clip(idx - 1, 0, len(self.gt_timestamps) - 1)
        use_prev = np.abs(self.gt_timestamps[prev] - est_t) < np.abs(
            self.gt_timestamps[idx] - est_t
        )
        idx = np.where(use_prev, prev, idx)
        return est_p, self.gt_poses[idx]

    def compute(self, align: bool = True) -> dict:
        """Absolute trajectory error statistics. ``align`` removes the rigid
        gauge between the two trajectories (Horn/Umeyama on SE(2)) — the
        benchmark suites align estimate to GT before the RMSE."""
        est, gt = self._matched()
        if align:
            est = _align_se2(est, gt)
        d = est[:, :2] - gt[:, :2]
        dth = np.arctan2(np.sin(est[:, 2] - gt[:, 2]), np.cos(est[:, 2] - gt[:, 2]))
        stats = {
            "mean_translation": np.abs(d).mean(axis=0),
            "std_translation": d.std(axis=0),
            "rmse_translation": float(np.sqrt((d**2).sum(axis=1).mean())),
            "mean_rotation": float(np.abs(dth).mean()),
            "std_rotation": float(dth.std()),
            "num_poses": len(est),
            "mean_duration": float(np.mean([e[2] for e in self.estimates])),
        }
        return stats

    def is_regression(self, thr: RegressionThresholds, stats: dict | None = None) -> bool:
        """Exit-code gate semantics of benchmark_carmen.cpp:57-64."""
        s = stats or self.compute()
        mt = s["mean_translation"]
        st = s["std_translation"]
        if mt[0] > thr.max_mean_translation[0] or mt[1] > thr.max_mean_translation[1]:
            return True
        if abs(st[0]) > thr.max_std_translation[0] or abs(st[1]) > thr.max_std_translation[1]:
            return True
        if s["mean_rotation"] > thr.max_mean_rotation:
            return True
        if s["std_rotation"] > thr.max_std_rotation:
            return True
        return False

    def write_trajectory(self, path: str) -> None:
        ts = [e[0] for e in self.estimates]
        ps = [e[1] for e in self.estimates]
        tum_io.write_tum(path, ts, ps)


def _align_se2(est: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Closed-form SE(2) alignment of est onto gt (2D Umeyama, no scale)."""
    a = est[:, :2]
    b = gt[:, :2]
    ca, cb = a.mean(0), b.mean(0)
    a0, b0 = a - ca, b - cb
    # optimal rotation from the 2x2 cross-covariance
    h = a0.T @ b0
    theta = np.arctan2(h[0, 1] - h[1, 0], h[0, 0] + h[1, 1])
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]])
    t = cb - R @ ca
    out = est.copy()
    out[:, :2] = a @ R.T + t
    out[:, 2] = est[:, 2] + theta
    return out
