"""Sensor message types — host-side equivalents of srrg2_core's message layer
(``LaserMessage``, ``OdometryMessage``, ``TransformEventsMessage``,
``PointCloud2Message``; usage at apps/synthetic_scene_generator.cpp:105-165 and
SURVEY.md §1-L0).

Messages are plain dataclasses; heavy payloads are NumPy arrays that convert
to device arrays at the pipeline boundary (the TPU analog of the reference's
message pointers handed to the preprocessor).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class BaseMessage:
    topic: str = ""
    frame_id: str = ""
    seq: int = 0
    timestamp: float = 0.0


@dataclass
class LaserMessage(BaseMessage):
    angle_min: float = 0.0
    angle_max: float = 0.0
    angle_increment: float = 0.0
    time_increment: float = 0.0
    scan_time: float = 0.0
    range_min: float = 0.0
    range_max: float = 0.0
    ranges: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    intensities: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))


@dataclass
class OdometryMessage(BaseMessage):
    child_frame: str = ""
    pose: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))  # (x, y, theta)


@dataclass
class TransformEvent:
    timestamp: float = 0.0
    child_frame: str = ""
    parent_frame: str = ""
    pose: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))


@dataclass
class TransformEventsMessage(BaseMessage):
    events: list = field(default_factory=list)


@dataclass
class PointCloud2Message(BaseMessage):
    points: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))


@dataclass
class MessagePack(BaseMessage):
    """Synchronized bundle of messages (MessageSynchronizedSource output)."""

    messages: list = field(default_factory=list)

    def get(self, msg_type, topic: str | None = None):
        for m in self.messages:
            if isinstance(m, msg_type) and (topic is None or m.topic == topic):
                return m
        return None


def extract_message(msg, msg_type, topic: str | None = None):
    """srrg2_slam_interfaces::extractMessage equivalent
    (raw_data_preprocessor_projective_2d.cpp:62): pull one typed/topic message
    from either a pack or a bare message."""
    if isinstance(msg, MessagePack):
        return msg.get(msg_type, topic)
    if isinstance(msg, msg_type) and (topic is None or msg.topic == topic):
        return msg
    return None
