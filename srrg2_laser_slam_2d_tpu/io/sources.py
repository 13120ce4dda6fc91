"""Message source pipeline — host-side equivalents of srrg2_core's source
filters (composed at apps/slam_app.cpp:156-165 and in config
configurations/stage_segway_double_config_LASER_0.json:383-479):
``MessageFileSource`` -> ``MessageSortedSource`` (lag-window time sort) ->
``MessageSourcePlatform`` (TF collection) -> ``MessageOdomSubsamplerSource``
-> ``MessageSynchronizedSource`` (topic packs within a time window).

This is deliberately a streaming/iterator design: the device pipeline consumes
packs while the host prefetches and reorders — the IO analog of the message
pipeline called out in SURVEY.md §5 (distributed backend notes).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from .messages import (
    BaseMessage,
    LaserMessage,
    MessagePack,
    OdometryMessage,
    TransformEvent,
    TransformEventsMessage,
)


class MessageSource:
    """Base: iterable of messages."""

    def __iter__(self):
        while True:
            m = self.get_message()
            if m is None:
                return
            yield m

    def get_message(self):
        raise NotImplementedError


class ListSource(MessageSource):
    def __init__(self, messages):
        self._messages = list(messages)
        self._i = 0

    def get_message(self):
        if self._i >= len(self._messages):
            return None
        m = self._messages[self._i]
        self._i += 1
        return m


class JsonlFileSource(MessageSource):
    """Reads message logs written by io.logfile.write_jsonl (the BOSS-file
    analog used by the synthetic generator app)."""

    def __init__(self, path: str):
        from . import logfile

        self._messages = logfile.read_jsonl(path)
        self._i = 0

    def get_message(self):
        if self._i >= len(self._messages):
            return None
        m = self._messages[self._i]
        self._i += 1
        return m


class SortedSource(MessageSource):
    """MessageSortedSource: re-emit messages in timestamp order using a lag
    window (``time_interval``, config :736-744: 1 s)."""

    def __init__(self, source: MessageSource, time_interval: float = 1.0):
        self.source = source
        self.time_interval = time_interval
        self._heap: list = []
        self._counter = 0
        self._exhausted = False

    def get_message(self):
        while not self._exhausted:
            m = self.source.get_message()
            if m is None:
                self._exhausted = True
                break
            heapq.heappush(self._heap, (m.timestamp, self._counter, m))
            self._counter += 1
            # emit once the lag window is covered
            if m.timestamp - self._heap[0][0] > self.time_interval:
                return heapq.heappop(self._heap)[2]
        if self._heap:
            return heapq.heappop(self._heap)[2]
        return None


class OdomSubsamplerSource(MessageSource):
    """MessageOdomSubsamplerSource: pass odometry through only every
    ``translation_step``/``rotation_step`` of accumulated motion."""

    def __init__(self, source, translation_step: float = 0.0, rotation_step: float = 0.0):
        self.source = source
        self.t_step = translation_step
        self.r_step = rotation_step
        self._last = None

    def get_message(self):
        while True:
            m = self.source.get_message()
            if m is None:
                return None
            if not isinstance(m, OdometryMessage) or (self.t_step <= 0 and self.r_step <= 0):
                return m
            if self._last is None:
                self._last = m.pose.copy()
                return m
            dt = np.linalg.norm(m.pose[:2] - self._last[:2])
            dr = abs(float(np.arctan2(np.sin(m.pose[2] - self._last[2]), np.cos(m.pose[2] - self._last[2]))))
            # each gate only fires when its step is enabled (reference
            # MessageOdomSubsamplerSource: translation_step / rotation_step,
            # config :383-479 — rotation-only subsampling must work too)
            if (self.t_step > 0 and dt >= self.t_step) or (
                self.r_step > 0 and dr >= self.r_step
            ):
                self._last = m.pose.copy()
                return m
            # drop subsampled odometry, keep reading


class SynchronizedSource(MessageSource):
    """MessageSynchronizedSource: bundle one message per requested topic into
    a MessagePack when all arrive within ``time_interval`` (config :746-764:
    0.1 s)."""

    def __init__(self, source, topics: list[str], time_interval: float = 0.1,
                 output_topic: str = "pack"):
        self.source = source
        self.topics = list(topics)
        self.time_interval = time_interval
        self.output_topic = output_topic
        self._slots: dict[str, BaseMessage] = {}

    def get_message(self):
        while True:
            m = self.source.get_message()
            if m is None:
                return None
            if m.topic not in self.topics:
                continue
            self._slots[m.topic] = m
            if len(self._slots) == len(self.topics):
                times = [x.timestamp for x in self._slots.values()]
                if max(times) - min(times) <= self.time_interval:
                    pack = MessagePack(
                        topic=self.output_topic,
                        timestamp=max(times),
                        messages=list(self._slots.values()),
                    )
                    self._slots = {}
                    return pack
                # drop the oldest and keep collecting
                oldest = min(self._slots, key=lambda k: self._slots[k].timestamp)
                del self._slots[oldest]


@dataclass
class Platform:
    """TF tree — srrg2_core ``Platform`` (apps/visual_test_aligner_2d.cpp:68-107):
    collect TransformEvents, answer child-in-parent queries by chaining."""

    edges: dict = field(default_factory=dict)  # child -> (parent, pose)

    def add(self, msg) -> None:
        if isinstance(msg, TransformEventsMessage):
            for ev in msg.events:
                self.edges[ev.child_frame] = (ev.parent_frame, np.asarray(ev.pose, np.float32))
        elif isinstance(msg, MessagePack):
            for m in msg.messages:
                self.add(m)

    def is_well_formed(self) -> bool:
        return len(self.edges) > 0

    def get_transform(self, child: str, parent: str):
        """Pose of ``child`` frame in ``parent`` frame, or None."""

        def chain_to_root(frame):
            chain = []
            cur = frame
            seen = set()
            while cur in self.edges and cur not in seen:
                seen.add(cur)
                p, pose = self.edges[cur]
                chain.append(pose)
                cur = p
            return cur, chain

        def compose_np(a, b):
            c, s = np.cos(a[2]), np.sin(a[2])
            return np.array(
                [a[0] + c * b[0] - s * b[1], a[1] + s * b[0] + c * b[1], a[2] + b[2]],
                np.float32,
            )

        def invert_np(a):
            c, s = np.cos(a[2]), np.sin(a[2])
            return np.array(
                [-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]), -a[2]], np.float32
            )

        root_c, chain_c = chain_to_root(child)
        root_p, chain_p = chain_to_root(parent)
        if root_c != root_p:
            return None
        # child-in-root = parentN_in_root ∘ ... ∘ child_in_parent0
        pose_c = np.zeros(3, np.float32)
        for p in reversed(chain_c):
            pose_c = compose_np(pose_c, p)
        pose_p = np.zeros(3, np.float32)
        for p in reversed(chain_p):
            pose_p = compose_np(pose_p, p)
        return compose_np(invert_np(pose_p), pose_c)


class PlatformSource(MessageSource):
    """MessageSourcePlatform: accumulate TF messages into a Platform while
    passing everything through."""

    def __init__(self, source, tf_topics=("/tf",)):
        self.source = source
        self.tf_topics = set(tf_topics)
        self.platform = Platform()

    def get_message(self):
        m = self.source.get_message()
        if m is not None and getattr(m, "topic", None) in self.tf_topics:
            self.platform.add(m)
        return m
