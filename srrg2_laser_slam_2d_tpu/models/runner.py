"""Message-driven SLAM runner — the ``slammer->putMessage(msg)`` surface of
``MultiGraphSLAM2D`` (apps/slam_app.cpp:78-85) plus the odometry raw-data
preprocessor (``RawDataPreprocessorOdom2D``, config
configurations/stage_segway_double_config_LASER_0.json:703-709) and the
TF-driven sensor extrinsic lookup (frame_id/base_frame_id on the slices).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..io.messages import LaserMessage, MessagePack, OdometryMessage, extract_message
from ..io.sources import Platform
from .preprocessor import PreprocessorConfig, ScanPreprocessor
from .slam import GraphSLAM2D, GraphSLAMConfig


@dataclass
class OdomPreprocessor:
    """RawDataPreprocessorOdom2D: pull the odometry pose for a topic."""

    topic: str = "/odom"

    def process(self, msg):
        odom = extract_message(msg, OdometryMessage, self.topic)
        return None if odom is None else np.asarray(odom.pose, np.float32)


@dataclass
class SlamRunner:
    """Drives GraphSLAM2D from a message source. Collects the timestamped
    trajectory (for TUM export / benchmark suites) and per-frame timings."""

    slam_config: GraphSLAMConfig = field(default_factory=GraphSLAMConfig)
    preprocessor_config: PreprocessorConfig = field(default_factory=PreprocessorConfig)
    scan_topic: str | None = None
    # MULTI config: several laser topics, one per cue. Per-cue extrinsics are
    # either given in slam_config.cue_extrinsics or derived from the TF tree
    # via sensor_frames/base_frame (the reference's frame_id/base_frame_id on
    # each tracker slice, configurations/..._MULTI.json)
    scan_topics: list | None = None
    sensor_frames: list | None = None
    odom_topic: str = "/odom"
    sensor_frame: str | None = None
    base_frame: str | None = None
    sensor_in_robot: np.ndarray | None = None
    # resume support: skip the first N laser frames (still feeding TF/odom to
    # the platform), then restore state from ``resume_checkpoint`` before the
    # first processed frame — long flaky-device runs restart mid-dataset
    skip_frames: int = 0
    resume_checkpoint: str | None = None

    def __post_init__(self):
        self.platform = Platform()
        self.preprocessor = ScanPreprocessor(self.preprocessor_config)
        self.odom_pre = OdomPreprocessor(self.odom_topic)
        self.slam: GraphSLAM2D | None = None
        self.trajectory: list = []  # (timestamp, pose, duration)

    def _ensure_slam(self):
        if self.slam is None:
            cfg = self.slam_config
            if self.scan_topics and self.sensor_frames and self.base_frame:
                # MULTI: per-cue extrinsics from the TF tree
                import dataclasses

                extrs = []
                for f in self.sensor_frames:
                    tf = self.platform.get_transform(f, self.base_frame)
                    if tf is None:
                        raise RuntimeError(f"no TF {f} -> {self.base_frame} yet")
                    extrs.append(tuple(float(v) for v in tf))
                cfg = dataclasses.replace(cfg, cue_extrinsics=tuple(extrs))
                self.slam_config = cfg
            extr = self.sensor_in_robot
            if extr is None and self.sensor_frame and self.base_frame:
                tf = self.platform.get_transform(self.sensor_frame, self.base_frame)
                extr = tf
            self.slam = GraphSLAM2D(cfg, sensor_in_robot=extr)
        return self.slam

    def put_message(self, msg) -> bool:
        """Feed one message (or pack). Returns True if a frame was processed."""
        self.platform.add(msg)
        if self.scan_topics:
            # multi-cue: one laser message per topic must be present
            import jax

            lasers = [extract_message(msg, LaserMessage, t) for t in self.scan_topics]
            if any(m is None for m in lasers):
                return False
            clouds = [self.preprocessor.process_message(m) for m in lasers]
            import jax.numpy as jnp

            cloud = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
            laser = lasers[0]
        else:
            laser = extract_message(msg, LaserMessage, self.scan_topic)
            if laser is None:
                return False
            cloud = self.preprocessor.process_message(laser)
        if self.skip_frames > 0:
            self.skip_frames -= 1
            if self.skip_frames == 0 and self.resume_checkpoint:
                from ..utils import checkpoint as ckpt

                slam = self._ensure_slam()
                ckpt.load(self.resume_checkpoint, slam)
                self.trajectory = [
                    (t, p, 0.0) for t, p in ckpt.trajectory_from(self.resume_checkpoint)
                ]
            return False
        odom = self.odom_pre.process(msg)
        slam = self._ensure_slam()
        t0 = time.perf_counter()
        slam.process(cloud, odom)
        dt = time.perf_counter() - t0
        self.trajectory.append((laser.timestamp, slam.robot_in_world(), dt))
        return True

    def run(self, source, max_frames: int | None = None) -> int:
        n = 0
        for msg in source:
            if self.put_message(msg):
                n += 1
                if max_frames is not None and n >= max_frames:
                    break
        return n

    # -- observability -------------------------------------------------------
    def timing_summary(self) -> dict:
        ts = [d for _, _, d in self.trajectory]
        if not ts:
            return {"frames": 0}
        return {
            "frames": len(ts),
            "total_compute_time": float(np.sum(ts)),
            "mean_frame_time": float(np.mean(ts)),
            "mean_frame_hz": float(1.0 / np.mean(ts)),
        }

    def draw(self, canvas) -> None:
        """MultiGraphSLAM2D::draw equivalent: local map scenes at their
        optimized poses + trajectory + graph edges."""
        slam = self.slam
        if slam is None:
            return
        poses = slam.poses_np
        colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b"]
        for m in range(slam.n_maps):
            canvas.push_matrix()
            canvas.mult_matrix(poses[m])
            canvas.put_reference_system(0.3)
            scene = slam.scene_of(m)
            if scene is not None:
                canvas.put_cloud(scene, color=colors[m % len(colors)])
            canvas.pop_matrix()
        if self.trajectory:
            canvas.put_trajectory(np.stack([p for _, p, _ in self.trajectory]))
        # graph edges
        ei = np.asarray(slam.graph.edge_i)[: slam.n_edges]
        ej = np.asarray(slam.graph.edge_j)[: slam.n_edges]
        canvas.put_segments(poses[ei, :2], poses[ej, :2], color="gray")
