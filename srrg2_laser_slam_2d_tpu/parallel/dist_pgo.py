"""Distributed pose-graph optimization over a device mesh.

New design (the reference has no distributed anything — SURVEY.md §2.3): the
edge set of the pose graph is sharded across chips on the ``graph`` mesh axis;
each chip linearizes its edge shard locally and the per-edge normal-equation
contributions are reduced with ``jax.lax.psum`` over ICI inside ``shard_map``.
The (small) reduced system solve is replicated. This is the
"psum of block Hessians" scheme from BASELINE.json's north star; the
Schur-complement partitioning for million-node graphs builds on the same
shards (interior variables eliminated per shard before the psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..solver import pgo
from ..solver.pgo import PGOConfig, PoseGraph
from ..utils import geometry
from .mesh import GRAPH_AXIS

Array = jax.Array


def _local_normal_system(poses, edge_i, edge_j, edge_meas, edge_info, edge_valid,
                         chi_threshold: float):
    """Dense [3V,3V] normal system from a (local) edge shard; poses replicated."""
    g = PoseGraph(
        poses=poses,
        var_valid=jnp.ones(poses.shape[0], jnp.bool_),
        var_fixed=jnp.zeros(poses.shape[0], jnp.bool_),
        edge_i=edge_i,
        edge_j=edge_j,
        edge_meas=edge_meas,
        edge_info=edge_info,
        edge_valid=edge_valid,
    )
    H, b, chi, _ = pgo.linearize(g, chi_threshold)
    return H, b, chi


def optimize_sharded(
    cfg: PGOConfig,
    graph: PoseGraph,
    mesh: Mesh,
) -> tuple[PoseGraph, Array, Array]:
    """GN loop with edge-sharded linearization + psum reduction.

    Edge arrays must have length divisible by mesh size (pad with invalid
    edges). Variable arrays are replicated.
    """
    n_dev = mesh.shape[GRAPH_AXIS]
    ec = graph.edge_capacity
    assert ec % n_dev == 0, f"edge capacity {ec} not divisible by {n_dev} devices"
    v = graph.var_capacity

    diag_extra = jnp.where(
        graph.var_fixed | ~graph.var_valid, cfg.anchor_weight, cfg.damping
    )
    diag_extra = jnp.repeat(diag_extra, 3)

    edge_spec = P(GRAPH_AXIS)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, edge_spec, edge_spec, edge_spec, edge_spec, edge_spec, rep),
        out_specs=rep,
        check_vma=False,
    )
    def distributed_gn_step(poses, ei, ej, em, einfo, ev, diag):
        # local shard linearization, ICI all-reduce of the normal system
        H, b, chi = _local_normal_system(poses, ei, ej, em, einfo, ev, cfg.chi_threshold)
        H = jax.lax.psum(H, GRAPH_AXIS)
        b = jax.lax.psum(b, GRAPH_AXIS)
        chi = jax.lax.psum(chi, GRAPH_AXIS)
        H = H + jnp.diag(diag)
        dx = jnp.linalg.solve(H, -b).reshape(v, 3)
        return dx, chi

    @jax.jit
    def run(graph_in: PoseGraph):
        movable = graph_in.var_valid & ~graph_in.var_fixed

        def body(state):
            it, poses, chi_prev, _ = state
            dx, chi = distributed_gn_step(
                poses,
                graph_in.edge_i,
                graph_in.edge_j,
                graph_in.edge_meas,
                graph_in.edge_info,
                graph_in.edge_valid,
                diag_extra,
            )
            dx = jnp.where(movable[:, None], dx, 0.0)
            return it + 1, geometry.compose(dx, poses), chi, chi_prev

        def cond(state):
            it, _, chi, chi_prev = state
            decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
            return (it < cfg.max_iterations) & ~((it > 1) & decayed)

        it, poses, chi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), graph_in.poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf)),
        )
        return poses, chi, it

    poses, chi, it = run(graph)
    return graph._replace(poses=poses), chi, it


def shard_edges(graph: PoseGraph, mesh: Mesh) -> PoseGraph:
    """Place edge arrays with the graph-axis sharding, variables replicated."""
    e_sh = NamedSharding(mesh, P(GRAPH_AXIS))
    r_sh = NamedSharding(mesh, P())
    return PoseGraph(
        poses=jax.device_put(graph.poses, r_sh),
        var_valid=jax.device_put(graph.var_valid, r_sh),
        var_fixed=jax.device_put(graph.var_fixed, r_sh),
        edge_i=jax.device_put(graph.edge_i, e_sh),
        edge_j=jax.device_put(graph.edge_j, e_sh),
        edge_meas=jax.device_put(graph.edge_meas, e_sh),
        edge_info=jax.device_put(graph.edge_info, e_sh),
        edge_valid=jax.device_put(graph.edge_valid, e_sh),
    )
