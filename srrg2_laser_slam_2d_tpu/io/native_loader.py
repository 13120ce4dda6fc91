"""ctypes bindings for the native C++ data loader (native/dataloader.cpp),
with transparent fallback to the pure-Python CARMEN parser (io/carmen.py).

The native path parses a whole log in one pass into contiguous arrays — the
bulk-ingest design that feeds bench/pipeline.preprocess_batch without
per-message Python overhead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_library():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    native_dir = os.path.join(_repo_root(), "native")
    so = os.path.join(native_dir, "libdataloader.so")
    src = os.path.join(native_dir, "dataloader.cpp")
    try:
        if not os.path.exists(so) or (
            os.path.exists(src) and os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.carmen_open.restype = ctypes.c_void_p
        lib.carmen_open.argtypes = [ctypes.c_char_p]
        lib.carmen_num_scans.restype = ctypes.c_int
        lib.carmen_num_scans.argtypes = [ctypes.c_void_p]
        lib.carmen_num_beams.restype = ctypes.c_int
        lib.carmen_num_beams.argtypes = [ctypes.c_void_p]
        lib.carmen_fill.restype = None
        lib.carmen_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
        lib.carmen_close.restype = None
        lib.carmen_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load_library() is not None


def load_carmen_arrays(path: str):
    """Parse a CARMEN log into flat arrays.

    Returns dict with: ranges [N, B] (padded -1), laser_pose [N, 3],
    odom_pose [N, 3], timestamp [N], meta [N, 4] = (n_beams, angle_min, fov,
    range_max). Uses the native parser when available, else pure Python.
    """
    lib = _load_library()
    if lib is not None:
        h = lib.carmen_open(path.encode())
        if h:
            try:
                n = lib.carmen_num_scans(h)
                b = lib.carmen_num_beams(h)
                ranges = np.empty((n, b), np.float32)
                laser_pose = np.empty((n, 3), np.float32)
                odom_pose = np.empty((n, 3), np.float32)
                timestamp = np.empty((n,), np.float64)
                meta = np.empty((n, 4), np.float32)
                lib.carmen_fill(
                    h,
                    ranges.ctypes.data_as(ctypes.c_void_p),
                    laser_pose.ctypes.data_as(ctypes.c_void_p),
                    odom_pose.ctypes.data_as(ctypes.c_void_p),
                    timestamp.ctypes.data_as(ctypes.c_void_p),
                    meta.ctypes.data_as(ctypes.c_void_p),
                )
                return {
                    "ranges": ranges,
                    "laser_pose": laser_pose,
                    "odom_pose": odom_pose,
                    "timestamp": timestamp,
                    "meta": meta,
                    "backend": "native",
                }
            finally:
                lib.carmen_close(h)
    # Python fallback
    from . import carmen as carmen_py

    scans = [s for s in carmen_py.parse_carmen(path) if isinstance(s, carmen_py.CarmenScan)]
    n = len(scans)
    b = max((len(s.ranges) for s in scans), default=0)
    ranges = np.full((n, b), -1.0, np.float32)
    laser_pose = np.zeros((n, 3), np.float32)
    odom_pose = np.zeros((n, 3), np.float32)
    timestamp = np.zeros((n,), np.float64)
    meta = np.zeros((n, 4), np.float32)
    for k, s in enumerate(scans):
        ranges[k, : len(s.ranges)] = s.ranges
        laser_pose[k] = s.laser_pose
        odom_pose[k] = s.odom_pose
        timestamp[k] = s.timestamp
        meta[k] = (len(s.ranges), s.angle_min, s.fov, s.range_max)
    return {
        "ranges": ranges,
        "laser_pose": laser_pose,
        "odom_pose": odom_pose,
        "timestamp": timestamp,
        "meta": meta,
        "backend": "python",
    }
