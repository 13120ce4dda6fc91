"""JSONL message log format — the framework's analog of the reference's BOSS
message files (written by apps/synthetic_scene_generator.cpp via
``Serializer::writeObject``). One JSON object per line with a ``type`` tag."""

from __future__ import annotations

import json

import numpy as np

from .messages import (
    LaserMessage,
    OdometryMessage,
    PointCloud2Message,
    TransformEvent,
    TransformEventsMessage,
)


def _msg_to_dict(m):
    if isinstance(m, LaserMessage):
        return {
            "type": "LaserMessage",
            "topic": m.topic,
            "frame_id": m.frame_id,
            "seq": m.seq,
            "timestamp": m.timestamp,
            "angle_min": m.angle_min,
            "angle_max": m.angle_max,
            "angle_increment": m.angle_increment,
            "range_min": m.range_min,
            "range_max": m.range_max,
            "ranges": np.asarray(m.ranges).tolist(),
        }
    if isinstance(m, OdometryMessage):
        return {
            "type": "OdometryMessage",
            "topic": m.topic,
            "frame_id": m.frame_id,
            "seq": m.seq,
            "timestamp": m.timestamp,
            "child_frame": m.child_frame,
            "pose": np.asarray(m.pose).tolist(),
        }
    if isinstance(m, TransformEventsMessage):
        return {
            "type": "TransformEventsMessage",
            "topic": m.topic,
            "seq": m.seq,
            "timestamp": m.timestamp,
            "events": [
                {
                    "timestamp": e.timestamp,
                    "child_frame": e.child_frame,
                    "parent_frame": e.parent_frame,
                    "pose": np.asarray(e.pose).tolist(),
                }
                for e in m.events
            ],
        }
    if isinstance(m, PointCloud2Message):
        return {
            "type": "PointCloud2Message",
            "topic": m.topic,
            "seq": m.seq,
            "timestamp": m.timestamp,
            "points": np.asarray(m.points).tolist(),
        }
    raise TypeError(f"unserializable message {type(m)}")


def _dict_to_msg(d):
    t = d["type"]
    if t == "LaserMessage":
        return LaserMessage(
            topic=d["topic"],
            frame_id=d.get("frame_id", ""),
            seq=d["seq"],
            timestamp=d["timestamp"],
            angle_min=d["angle_min"],
            angle_max=d["angle_max"],
            angle_increment=d["angle_increment"],
            range_min=d["range_min"],
            range_max=d["range_max"],
            ranges=np.asarray(d["ranges"], np.float32),
        )
    if t == "OdometryMessage":
        return OdometryMessage(
            topic=d["topic"],
            frame_id=d.get("frame_id", ""),
            seq=d["seq"],
            timestamp=d["timestamp"],
            child_frame=d.get("child_frame", ""),
            pose=np.asarray(d["pose"], np.float32),
        )
    if t == "TransformEventsMessage":
        return TransformEventsMessage(
            topic=d["topic"],
            seq=d["seq"],
            timestamp=d["timestamp"],
            events=[
                TransformEvent(
                    timestamp=e["timestamp"],
                    child_frame=e["child_frame"],
                    parent_frame=e["parent_frame"],
                    pose=np.asarray(e["pose"], np.float32),
                )
                for e in d["events"]
            ],
        )
    if t == "PointCloud2Message":
        return PointCloud2Message(
            topic=d["topic"],
            seq=d["seq"],
            timestamp=d["timestamp"],
            points=np.asarray(d["points"], np.float32),
        )
    raise TypeError(f"unknown message type {t}")


def write_jsonl(path: str, messages) -> None:
    with open(path, "w") as f:
        for m in messages:
            f.write(json.dumps(_msg_to_dict(m)) + "\n")


def read_jsonl(path: str):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(_dict_to_msg(json.loads(line)))
    return out
