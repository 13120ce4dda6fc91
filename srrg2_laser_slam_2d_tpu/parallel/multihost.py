"""True multi-process distribution — ``jax.distributed`` over N processes.

The reference is single-process (SURVEY.md §2.3); this is the TPU-native
design stated there: multi-process JAX with a host×device mesh, host-sharded
storage (each process materializes only ITS shard of the edge/keyframe
arrays), and XLA collectives that ride ICI within a process's devices and the
DCN between processes — the same ``psum`` program as parallel/dist_pgo.py,
now spanning process boundaries.

On CI this runs as N CPU processes with gloo-backed cross-process collectives
(tests/test_multiprocess.py spawns the workers); on real hardware the same
code paths initialize from the TPU pod runtime.
"""

from __future__ import annotations

import os

import numpy as np

Array = object  # jax.Array after init; this module must be importable pre-jax


def init_multiprocess(
    process_id: int,
    num_processes: int,
    coordinator: str = "localhost:12387",
    local_devices: int = 4,
    platform: str = "cpu",
):
    """Initialize this process's slot in the multi-process runtime.

    Must run before any JAX backend initialization. On CPU each process
    contributes ``local_devices`` virtual devices and collectives go through
    gloo over the coordination service (the DCN stand-in).
    """
    if platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax


def global_mesh(axis: str = "graph"):
    """One flat mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()).reshape(-1), (axis,))


def edges_from_host_local(local, mesh, axis: str = "graph"):
    """Build a globally edge-sharded array from each process's LOCAL shard.

    ``local`` is this process's slice of the edge array (length = global
    edge capacity / num_processes). No process ever materializes the full
    edge set — the host-sharded keyframe/edge storage design."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(
        np.asarray(local), mesh, P(axis)
    )


def replicate(x, mesh):
    """Replicate a host value across all processes/devices."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, P()
    )


def to_host(x, mesh):
    """Fetch a replicated global array back to this host."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(x, mesh, P())
    )


def optimize_pgo_multihost(cfg, poses, var_valid, var_fixed, local_edges, mesh):
    """Distributed PGO across processes: each process holds only its local
    edge shard; variables are replicated; the normal-system psum crosses the
    DCN. ``local_edges`` = (ei, ej, meas, info, valid) host-local arrays.

    Returns (optimized poses [V,3] on host, chi, iterations)."""
    from ..solver.pgo import PoseGraph
    from . import dist_pgo

    ei, ej, em, einfo, ev = local_edges
    graph = PoseGraph(
        poses=replicate(poses, mesh),
        var_valid=replicate(var_valid, mesh),
        var_fixed=replicate(var_fixed, mesh),
        edge_i=edges_from_host_local(ei, mesh),
        edge_j=edges_from_host_local(ej, mesh),
        edge_meas=edges_from_host_local(em, mesh),
        edge_info=edges_from_host_local(einfo, mesh),
        edge_valid=edges_from_host_local(ev, mesh),
    )
    out, chi, it = dist_pgo.optimize_sharded(cfg, graph, mesh)
    return to_host(out.poses, mesh), float(np.asarray(chi)), int(np.asarray(it))


class HostShardedSceneStore:
    """Local-map scene storage sharded across hosts: map ``m`` lives on
    process ``m % num_processes`` only (the 'keyframe/local-map sharding
    across hosts' design of SURVEY.md §5). ``get`` broadcasts a map's scene
    from its owner to every process when the SLAM layer needs it (loop
    detection against remote maps)."""

    def __init__(self, process_id: int, num_processes: int):
        self.pid = process_id
        self.n = num_processes
        self._scenes: dict[int, tuple] = {}

    def owner(self, map_id: int) -> int:
        return map_id % self.n

    def put(self, map_id: int, scene) -> None:
        if self.owner(map_id) == self.pid:
            self._scenes[map_id] = tuple(np.asarray(x) for x in scene)

    def local_ids(self) -> list[int]:
        return sorted(self._scenes)

    def get(self, map_id: int, template):
        """Scene of ``map_id`` on every process (owner broadcasts). ``template``
        provides shapes/dtypes for non-owners.

        COLLECTIVE: every process must call ``get`` with the SAME map_id in
        the same order (the broadcast pairs across processes).

        Traffic is O(scene): ``broadcast_one_to_all`` ships exactly one copy
        of the owner's arrays (non-owners contribute zeros into a psum-style
        reduce) — not the O(P * scene) allgather-everything-everywhere this
        used before (round-3 review weak #5)."""
        from jax.experimental import multihost_utils

        is_owner = self.owner(map_id) == self.pid
        if is_owner:
            val = self._scenes[map_id]
        else:
            val = tuple(np.zeros_like(np.asarray(x)) for x in template)
        out = multihost_utils.broadcast_one_to_all(val, is_source=is_owner)
        return tuple(np.asarray(x) for x in out)
