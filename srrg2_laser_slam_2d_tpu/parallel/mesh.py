"""Device-mesh helpers for multi-chip scaling.

The reference is single-process/single-thread (SURVEY.md §2.3); the parallel
layer is new design: a 1-D mesh axis ``graph`` shards pose-graph edges and
loop-closure candidate batches across chips; collectives ride ICI via
``jax.lax.psum`` inside ``shard_map`` (or GSPMD-inserted reductions under
``jit`` with sharding annotations).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


GRAPH_AXIS = "graph"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (GRAPH_AXIS,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(GRAPH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
