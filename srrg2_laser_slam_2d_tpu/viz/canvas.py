"""Offline drawing canvas — the framework's substitute for the reference's
``srrg2_qgl_viewport`` live viewer (SURVEY.md §2.2 'Viewer': an offline
renderer is acceptable but must expose equivalent draw hooks).

API mirrors ``ViewerCanvas`` (apps/visual_test_aligner_2d.cpp:158-212):
``put_points / put_segments / put_reference_system / push_matrix / mult_matrix
/ pop_matrix / set_color / set_point_size / flush``. Rendering goes to a
matplotlib figure saved to PNG (headless Agg backend), so every visual_test_*
app and ``GraphSLAM2D.draw`` produce inspectable artifacts in CI.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _compose_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a @ b


def _pose_to_mat(pose) -> np.ndarray:
    x, y, t = np.asarray(pose, np.float64)
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1]])


class Canvas:
    def __init__(self, title: str = "canvas", figsize=(8, 8)):
        self.title = title
        self._fig, self._ax = plt.subplots(figsize=figsize)
        self._matrix_stack = [np.eye(3)]
        self._color = "#1f77b4"
        self._point_size = 2.0
        self._attr_stack: list = []

    # -- transform stack -----------------------------------------------------
    def push_matrix(self) -> None:
        self._matrix_stack.append(self._matrix_stack[-1].copy())

    def mult_matrix(self, pose) -> None:
        self._matrix_stack[-1] = _compose_mat(
            self._matrix_stack[-1], _pose_to_mat(pose)
        )

    def pop_matrix(self) -> None:
        self._matrix_stack.pop()

    # -- attributes ----------------------------------------------------------
    def push_color(self) -> None:
        self._attr_stack.append(("color", self._color))

    def push_point_size(self) -> None:
        self._attr_stack.append(("size", self._point_size))

    def pop_attribute(self) -> None:
        kind, val = self._attr_stack.pop()
        if kind == "color":
            self._color = val
        else:
            self._point_size = val

    def set_color(self, color) -> None:
        self._color = color

    def set_point_size(self, size: float) -> None:
        self._point_size = size

    # -- primitives ----------------------------------------------------------
    def _apply(self, pts: np.ndarray) -> np.ndarray:
        m = self._matrix_stack[-1]
        return pts @ m[:2, :2].T + m[:2, 2]

    def put_points(self, xy, valid=None, color=None) -> None:
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        if valid is not None:
            xy = xy[np.asarray(valid, bool)[: len(xy)]]
        if len(xy) == 0:
            return
        p = self._apply(xy)
        self._ax.scatter(
            p[:, 0], p[:, 1], s=self._point_size, c=color or self._color, linewidths=0
        )

    def put_cloud(self, cloud, color=None) -> None:
        self.put_points(np.asarray(cloud.xy), np.asarray(cloud.valid), color)

    def put_segments(self, starts, ends, color=None) -> None:
        a = self._apply(np.asarray(starts, np.float64).reshape(-1, 2))
        b = self._apply(np.asarray(ends, np.float64).reshape(-1, 2))
        for p, q in zip(a, b):
            self._ax.plot(
                [p[0], q[0]], [p[1], q[1]], color=color or self._color, linewidth=0.5
            )

    def put_reference_system(self, scale: float = 0.25) -> None:
        o = self._apply(np.zeros((1, 2)))[0]
        ex = self._apply(np.array([[scale, 0.0]]))[0]
        ey = self._apply(np.array([[0.0, scale]]))[0]
        self._ax.plot([o[0], ex[0]], [o[1], ex[1]], color="red", linewidth=1.5)
        self._ax.plot([o[0], ey[0]], [o[1], ey[1]], color="green", linewidth=1.5)

    def put_trajectory(self, poses, color="black") -> None:
        poses = np.asarray(poses, np.float64)
        p = self._apply(poses[:, :2])
        self._ax.plot(p[:, 0], p[:, 1], color=color, linewidth=1.0)

    # -- output --------------------------------------------------------------
    def flush(self, path: str | None = None) -> str:
        self._ax.set_aspect("equal")
        self._ax.set_title(self.title)
        out = path or f"{self.title}.png"
        self._fig.savefig(out, dpi=120, bbox_inches="tight")
        return out

    def close(self) -> None:
        plt.close(self._fig)
