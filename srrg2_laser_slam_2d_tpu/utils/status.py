"""Per-stage status surface — the reference's ``_status`` enums on every
processing stage (Error/Ready/Successful, e.g.
sensor_processing/raw_data_preprocessor_projective_2d.cpp:15-17,
mapping/scene_clipper_projective_2d.cpp:13-18).

Values are plain ints so they can live inside jitted programs (a TrackStats
field) as well as on host-side wrappers.
"""

from __future__ import annotations

import enum


class Status(enum.IntEnum):
    ERROR = 0        # stage ran and failed (e.g. alignment below min inliers)
    READY = 1        # stage initialized, nothing processed yet
    SUCCESS = 2      # stage ran and produced a valid result


def describe(code: int) -> str:
    try:
        return Status(int(code)).name
    except ValueError:
        return f"UNKNOWN({code})"
