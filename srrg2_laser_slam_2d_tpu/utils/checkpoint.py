"""Checkpoint/resume — a capability the reference lacks (SURVEY.md §5: 'no
mid-run checkpointing in any app', only the BOSS serialization substrate).
Long multi-host runs need it, so the TPU framework makes the full SLAM state
durable: pose graph, per-local-map scenes, tracker state, trajectory.

Format: a single .npz (host arrays) + a JSON sidecar for scalars/metadata —
dependency-free and fast; the arrays re-device on load.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from ..solver import pgo
from ..utils.cloud import Cloud


def save(path: str, slam, trajectory=None) -> None:
    """Serialize a models.slam.GraphSLAM2D to ``path`` (.npz) + ``path.json``."""
    arrays: dict[str, np.ndarray] = {}
    g = slam.graph
    for f in g._fields:
        arrays[f"graph.{f}"] = np.asarray(getattr(g, f))
    for m, scene in enumerate(slam.scenes):
        if scene is None:
            continue
        arrays[f"scene.{m}.xy"] = np.asarray(scene.xy)
        arrays[f"scene.{m}.normal"] = np.asarray(scene.normal)
        arrays[f"scene.{m}.valid"] = np.asarray(scene.valid)
    meta = {
        "n_maps": slam.n_maps,
        "n_edges": slam.n_edges,
        "current_map": slam.current_map,
        "num_closures": slam.num_closures,
        "relocalizations": slam.relocalizations,
        "adjacency": [sorted(s) for s in slam.adjacency],
    }
    tracker = slam.tracker
    if hasattr(tracker, "spec"):
        # fast tracker (models/fast_tracker.FastTracker): pending payloads
        # fold into the scene on flush; cacheT + pose carry everything else
        meta["tracker.kind"] = "fast"
        tracker.flush()
        fs = tracker.state
        meta["tracker.seeded"] = fs is not None
        if fs is not None:
            arrays["tracker.scene.xy"] = np.asarray(fs.scene.xy)
            arrays["tracker.scene.normal"] = np.asarray(fs.scene.normal)
            arrays["tracker.scene.valid"] = np.asarray(fs.scene.valid)
            arrays["fast.cacheT"] = np.asarray(fs.cacheT)
            arrays["fast.pose"] = np.asarray(fs.pose)
    else:
        meta["tracker.kind"] = "xla"
        ts = tracker.state
        arrays["tracker.scene.xy"] = np.asarray(ts.scene.xy)
        arrays["tracker.scene.normal"] = np.asarray(ts.scene.normal)
        arrays["tracker.scene.valid"] = np.asarray(ts.scene.valid)
        arrays["tracker.robot_in_local_map"] = np.asarray(ts.robot_in_local_map)
        arrays["tracker.last_odom"] = np.asarray(ts.last_odom)
        arrays["tracker.sensor_in_robot"] = np.asarray(ts.sensor_in_robot)
        meta["tracker.has_odom"] = bool(ts.has_odom)
        meta["tracker.seeded"] = tracker._seeded
    if trajectory:
        arrays["trajectory.t"] = np.asarray([t for t, _, _ in trajectory])
        arrays["trajectory.pose"] = np.stack([p for _, p, _ in trajectory])
    base = path[:-4] if path.endswith(".npz") else path
    np.savez_compressed(base + ".npz", **arrays)
    with open(base + ".meta.json", "w") as f:
        json.dump(meta, f)


def load(path: str, slam) -> None:
    """Restore state saved by ``save`` into a freshly constructed GraphSLAM2D
    (its config must match the checkpoint's shapes)."""
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    with open(base + ".meta.json") as f:
        meta = json.load(f)

    g_fields = {
        f: jnp.asarray(data[f"graph.{f}"]) for f in pgo.PoseGraph._fields
    }
    slam.graph = pgo.PoseGraph(**g_fields)
    slam.n_maps = meta["n_maps"]
    slam.n_edges = meta["n_edges"]
    slam.current_map = meta["current_map"]
    slam.num_closures = meta["num_closures"]
    slam.relocalizations = meta["relocalizations"]
    slam.adjacency = [set(s) for s in meta["adjacency"]]
    slam.scenes = []
    for m in range(slam.n_maps):
        key = f"scene.{m}.xy"
        if key in data:
            slam.scenes.append(
                Cloud(
                    xy=jnp.asarray(data[key]),
                    normal=jnp.asarray(data[f"scene.{m}.normal"]),
                    valid=jnp.asarray(data[f"scene.{m}.valid"]),
                )
            )
        else:
            slam.scenes.append(None)
    if meta.get("tracker.kind", "xla") == "fast":
        from ..models.fast_tracker import FastState

        slam.tracker._pending = []
        if meta["tracker.seeded"]:
            slam.tracker.state = FastState(
                cacheT=jnp.asarray(data["fast.cacheT"]),
                pose=jnp.asarray(data["fast.pose"]),
                scene=Cloud(
                    xy=jnp.asarray(data["tracker.scene.xy"]),
                    normal=jnp.asarray(data["tracker.scene.normal"]),
                    valid=jnp.asarray(data["tracker.scene.valid"]),
                ),
            )
        else:
            slam.tracker.state = None
        return
    ts = slam.tracker.state
    slam.tracker.state = ts._replace(
        scene=Cloud(
            xy=jnp.asarray(data["tracker.scene.xy"]),
            normal=jnp.asarray(data["tracker.scene.normal"]),
            valid=jnp.asarray(data["tracker.scene.valid"]),
        ),
        robot_in_local_map=jnp.asarray(data["tracker.robot_in_local_map"]),
        last_odom=jnp.asarray(data["tracker.last_odom"]),
        sensor_in_robot=jnp.asarray(data["tracker.sensor_in_robot"]),
        has_odom=jnp.asarray(meta["tracker.has_odom"]),
    )
    slam.tracker._seeded = meta["tracker.seeded"]


def trajectory_from(path: str):
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    if "trajectory.t" not in data:
        return []
    return list(zip(data["trajectory.t"], data["trajectory.pose"]))
