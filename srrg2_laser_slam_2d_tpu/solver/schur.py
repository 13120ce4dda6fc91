"""Schur-complement partitioned Gauss-Newton for pose graphs.

The BASELINE.json north-star design: partition the graph, eliminate each
partition's INTERIOR variables locally (dense per-partition algebra — MXU
matmuls), reduce the SEPARATOR system across partitions (a psum when the
partition axis is sharded over a mesh), solve the small separator system, and
back-substitute. Communication per GN iteration is separator-sized instead of
graph-sized — the property that lets pose-graph optimization scale across a
pod slice (SURVEY.md §2.3, §5 'distributed communication backend').

Structure (all static shapes):
  host:   partition assignment + interior/separator classification + index
          maps (once per graph topology)
  device: per-partition [vmapped or shard_mapped]:
            linearize local edges -> dense H_ii [3I,3I], H_is [3I,3S],
            contribution to H_ss/b_s
          Schur: S = H_ss - sum_p H_si H_ii^-1 H_is   (psum over partitions)
          solve separator (dense), back-substitute interiors per partition.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import geometry
from .pgo import PGOConfig, PoseGraph, _edge_jac, _edge_res

Array = jax.Array


class Partitioning(NamedTuple):
    """Static partition layout (host-built, device-consumed).

    interior_idx: [P, I] global var index per interior slot (pad: var_capacity)
    separator_idx: [S] global var index per separator slot (pad: var_capacity)
    edge_part: [E] partition owning each edge (cross edges touch only
        separator variables, so either side works)
    ei_local: [E] local slot of endpoint i: 0..I-1 interior, I..I+S-1 separator
    ej_local: [E] same for endpoint j
    edge_perm: [P, Ep] edge indices owned by each partition, padded — the
        per-partition CONTIGUOUS edge slices that make the device work
        O(E/P) per partition instead of O(E)-masked (round-2 review item)
    edge_mask: [P, Ep] validity of edge_perm entries
    """

    interior_idx: Array
    separator_idx: Array
    edge_part: Array
    ei_local: Array
    ej_local: Array
    edge_perm: Array
    edge_mask: Array

    @property
    def n_parts(self) -> int:
        return self.interior_idx.shape[0]

    @property
    def interior_cap(self) -> int:
        return self.interior_idx.shape[1]

    @property
    def separator_cap(self) -> int:
        return self.separator_idx.shape[0]

    @property
    def edges_per_part(self) -> int:
        return self.edge_perm.shape[1]


def _pow2(n: int) -> int:
    return max(8, 1 << int(np.ceil(np.log2(max(n, 1)))))


def partition_graph(graph: PoseGraph, n_parts: int,
                    n_vars: int | None = None, n_edges: int | None = None
                    ) -> Partitioning:
    """Index-range partitioning (local maps are created in trajectory order,
    so contiguous ranges are spatially coherent); separator = every variable
    touched by a cross-partition edge. Fully vectorized host pass: O(V + E)
    time / memory (no [P, V] tables), so million-node graphs partition in
    milliseconds."""
    v_cap = graph.var_capacity
    ei = np.asarray(graph.edge_i)
    ej = np.asarray(graph.edge_j)
    ev = np.asarray(graph.edge_valid)
    vv = np.asarray(graph.var_valid)
    nv = int(n_vars if n_vars is not None else vv.sum())

    part_of = np.minimum((np.arange(v_cap) * n_parts) // max(nv, 1), n_parts - 1)
    cross = ev & (part_of[ei] != part_of[ej])
    is_sep = np.zeros(v_cap, bool)
    is_sep[ei[cross]] = True
    is_sep[ej[cross]] = True
    # anchored/fixed variables also go to the separator (their gauge prior
    # must be visible in the reduced system)
    is_sep |= np.asarray(graph.var_fixed) & vv

    sep_list = np.where(is_sep & vv)[0]
    s_cap = _pow2(len(sep_list))
    sep_slot = np.full(v_cap, -1, np.int64)
    sep_slot[sep_list] = np.arange(len(sep_list))

    # interior rank of each variable within its own partition (vectorized:
    # interiors are index-sorted, so rank = position - partition start)
    int_ids = np.where(vv & ~is_sep)[0]                     # sorted
    int_parts = part_of[int_ids]
    part_counts = np.bincount(int_parts, minlength=n_parts)
    part_starts = np.concatenate([[0], np.cumsum(part_counts)[:-1]])
    int_rank = np.full(v_cap, -1, np.int64)
    int_rank[int_ids] = np.arange(len(int_ids)) - part_starts[int_parts]
    i_cap = _pow2(int(part_counts.max()) if len(int_ids) else 1)

    interior_idx = np.full((n_parts, i_cap), v_cap, np.int32)
    interior_idx[int_parts, int_rank[int_ids]] = int_ids
    separator_idx = np.full(s_cap, v_cap, np.int32)
    separator_idx[: len(sep_list)] = sep_list

    # edge ownership: partition of endpoint i. A cross-partition edge has
    # BOTH endpoints in the separator (by construction above), so every edge's
    # endpoints are addressable in its owner's [interior_p ++ separator] frame.
    edge_part = np.where(ev, part_of[ei], 0).astype(np.int64)
    ei_local = np.where(is_sep[ei], i_cap + sep_slot[ei], int_rank[ei])
    ej_local = np.where(is_sep[ej], i_cap + sep_slot[ej], int_rank[ej])
    ei_local = np.where(ev, ei_local, 0).astype(np.int32)
    ej_local = np.where(ev, ej_local, 0).astype(np.int32)

    # per-partition contiguous edge slices (stable sort by owner)
    valid_e = np.where(ev)[0]
    order = valid_e[np.argsort(edge_part[valid_e], kind="stable")]
    counts_e = np.bincount(edge_part[valid_e], minlength=n_parts)
    starts_e = np.concatenate([[0], np.cumsum(counts_e)[:-1]])
    ep_cap = _pow2(int(counts_e.max()) if len(valid_e) else 1)
    edge_perm = np.zeros((n_parts, ep_cap), np.int32)
    edge_mask = np.zeros((n_parts, ep_cap), bool)
    ranks = np.arange(len(order)) - starts_e[edge_part[order]]
    edge_perm[edge_part[order], ranks] = order
    edge_mask[edge_part[order], ranks] = True

    return Partitioning(
        interior_idx=jnp.asarray(interior_idx),
        separator_idx=jnp.asarray(separator_idx),
        edge_part=jnp.asarray(edge_part.astype(np.int32)),
        ei_local=jnp.asarray(ei_local),
        ej_local=jnp.asarray(ej_local),
        edge_perm=jnp.asarray(edge_perm),
        edge_mask=jnp.asarray(edge_mask),
    )


def optimize_schur_sharded(cfg: PGOConfig, graph: PoseGraph, part: Partitioning,
                           mesh) -> tuple[PoseGraph, Array, Array]:
    """Multi-chip Schur: partitions shard over the mesh's ``graph`` axis;
    each chip eliminates its partitions' interiors locally and the reduced
    separator system + interior increments reduce with ``psum`` over ICI —
    per-GN-iteration communication is separator-sized, not graph-sized."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_
    from ..parallel.mesh import GRAPH_AXIS

    n_dev = mesh.shape[GRAPH_AXIS]
    assert part.n_parts % n_dev == 0, (part.n_parts, n_dev)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P_(), P_(GRAPH_AXIS), P_(GRAPH_AXIS, None)),
        out_specs=P_(),
        check_vma=False,
    )
    def device_step(poses, my_parts, my_interior_idx):
        Hp, bp, chi_p = _partition_systems(cfg, graph, part, poses, my_parts)
        d_i = 3 * part.interior_cap
        H_ii = Hp[:, :d_i, :d_i]
        H_is = Hp[:, :d_i, d_i:]
        H_ss_l = jnp.sum(Hp[:, d_i:, d_i:], 0)
        b_i = bp[:, :d_i]
        b_s_l = jnp.sum(bp[:, d_i:], 0)
        Hii_inv = jnp.linalg.inv(H_ii)
        G = jnp.einsum("pij,pjk->pik", Hii_inv, H_is)
        S_l = H_ss_l - jnp.einsum("pji,pjk->ik", H_is, G)
        b_l = b_s_l - jnp.einsum(
            "pji,pj->i", H_is, jnp.einsum("pij,pj->pi", Hii_inv, b_i)
        )
        # ICI reduction of the separator system (the only cross-chip traffic)
        S_red = jax.lax.psum(S_l, GRAPH_AXIS)
        b_red = jax.lax.psum(b_l, GRAPH_AXIS)
        chi = jax.lax.psum(jnp.sum(chi_p), GRAPH_AXIS)
        dx_s = jnp.linalg.solve(S_red, -b_red)
        dx_i = -jnp.einsum("pij,pj->pi", Hii_inv, b_i) - jnp.einsum(
            "pik,k->pi", G, dx_s
        )
        v_cap = graph.var_capacity
        dxg = jnp.zeros((v_cap + 1, 3))
        dxg = dxg.at[my_interior_idx.reshape(-1)].add(
            dx_i.reshape(-1, 3), mode="drop"
        )
        dxg = jax.lax.psum(dxg, GRAPH_AXIS)
        dxg = dxg.at[part.separator_idx].add(dx_s.reshape(-1, 3), mode="drop")
        return dxg[:v_cap], chi

    movable = graph.var_valid & ~graph.var_fixed
    parts_arr = jnp.arange(part.n_parts)

    @jax.jit
    def run(poses0):
        def body(state):
            it, poses, chi_prev, _ = state
            dx, chi = device_step(poses, parts_arr, part.interior_idx)
            dx = jnp.where(movable[:, None], dx, 0.0)
            return it + 1, geometry.compose(dx, poses), chi, chi_prev

        def cond(state):
            it, _, chi, chi_prev = state
            decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
            return (it < cfg.max_iterations) & ~((it > 1) & decayed)

        return jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), poses0, jnp.float32(jnp.inf), jnp.float32(jnp.inf)),
        )

    it, poses, chi, _ = run(graph.poses)
    return graph._replace(poses=poses), chi, it


def _partition_systems(cfg: PGOConfig, graph: PoseGraph, part: Partitioning,
                       poses, part_ids):
    """Dense local systems for a batch of partitions (vmapped).

    O(E/P) per partition: each partition gathers ONLY its own contiguous
    edge slice (part.edge_perm) and linearizes those — no masked all-edge
    einsums (the round-1/2 review's Schur memory/work finding)."""
    v_cap = graph.var_capacity
    I, S = part.interior_cap, part.separator_cap
    anchor = jnp.where(
        graph.var_fixed | ~graph.var_valid, cfg.anchor_weight, cfg.damping
    )

    def build_partition(p):
        perm = part.edge_perm[p]                             # [Ep]
        valid = part.edge_mask[p] & graph.edge_valid[perm]
        xi = poses[graph.edge_i[perm]]
        xj = poses[graph.edge_j[perm]]
        meas = graph.edge_meas[perm]
        omega = graph.edge_info[perm]
        e = _edge_res(xi, xj, meas)
        Ji, Jj = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi, xj, meas)
        chi_e = jnp.sum(e * e * omega, axis=-1)
        if cfg.chi_threshold > 0:
            w = jnp.where(chi_e < cfg.chi_threshold,
                          1.0, cfg.chi_threshold / jnp.maximum(chi_e, 1e-20))
        else:
            w = jnp.ones_like(chi_e)
        w = jnp.where(valid, w, 0.0)
        wo = w[:, None] * omega

        n_loc = I + S
        H = jnp.zeros((n_loc, 3, n_loc, 3), jnp.float32)
        b = jnp.zeros((n_loc, 3), jnp.float32)
        Hii_e = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Ji)
        Hjj_e = jnp.einsum("eki,ek,ekj->eij", Jj, wo, Jj)
        Hij_e = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Jj)
        bi_e = jnp.einsum("eki,ek,ek->ei", Ji, wo, e)
        bj_e = jnp.einsum("eki,ek,ek->ei", Jj, wo, e)
        li, lj = part.ei_local[perm], part.ej_local[perm]
        H = H.at[li, :, li, :].add(Hii_e)
        H = H.at[lj, :, lj, :].add(Hjj_e)
        H = H.at[li, :, lj, :].add(Hij_e)
        H = H.at[lj, :, li, :].add(jnp.swapaxes(Hij_e, -1, -2))
        b = b.at[li].add(bi_e).at[lj].add(bj_e)
        own_gids = jnp.concatenate([part.interior_idx[p], part.separator_idx])
        own_anchor = jnp.concatenate([anchor, jnp.zeros(1)])[
            jnp.minimum(own_gids, v_cap)
        ]
        scale = jnp.concatenate([jnp.ones(I), jnp.full((S,), 1.0 / part.n_parts)])
        invalid_slot = own_gids >= v_cap
        diag_add = jnp.where(invalid_slot, cfg.anchor_weight, own_anchor * scale)
        slots = jnp.arange(n_loc)
        H = H.at[slots, :, slots, :].add(diag_add[:, None, None] * jnp.eye(3)[None])
        chi_mine = jnp.sum(jnp.where(valid, chi_e, 0.0))
        return H.reshape(3 * n_loc, 3 * n_loc), b.reshape(3 * n_loc), chi_mine

    return jax.vmap(build_partition)(part_ids)


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_schur(cfg: PGOConfig, graph: PoseGraph, part: Partitioning
                   ) -> tuple[PoseGraph, Array, Array]:
    """GN loop with per-iteration Schur elimination. Same contract as
    pgo.optimize. The vmap over partitions becomes a shard_map on a real
    mesh; the psum-equivalent is the sum over the partition axis."""
    v_cap = graph.var_capacity
    P, I = part.n_parts, part.interior_cap
    S = part.separator_cap
    d_i, d_s = 3 * I, 3 * S

    def gn_step(poses):
        Hp, bp, chi_p = _partition_systems(cfg, graph, part, poses,
                                           jnp.arange(P))
        chi = jnp.sum(chi_p)
        H_ii = Hp[:, :d_i, :d_i]
        H_is = Hp[:, :d_i, d_i:]
        H_ss_p = Hp[:, d_i:, d_i:]
        b_i = bp[:, :d_i]
        b_s_p = bp[:, d_i:]

        # interior elimination (dense per partition; MXU batched solves)
        Hii_inv = jnp.linalg.inv(H_ii)                       # [P, dI, dI]
        G = jnp.einsum("pij,pjk->pik", Hii_inv, H_is)        # Hii^-1 His
        S_red = jnp.sum(H_ss_p, 0) - jnp.einsum("pji,pjk->ik", H_is, G)
        b_red = jnp.sum(b_s_p, 0) - jnp.einsum("pji,pj->i", H_is,
                                               jnp.einsum("pij,pj->pi", Hii_inv, b_i))
        dx_s = jnp.linalg.solve(S_red, -b_red)               # [dS]
        # back-substitution
        dx_i = -jnp.einsum("pij,pj->pi", Hii_inv, b_i) - jnp.einsum(
            "pik,k->pi", G, dx_s
        )                                                     # [P, dI]

        # scatter increments back to global variables
        dx = jnp.zeros((v_cap + 1, 3))
        dx = dx.at[part.interior_idx.reshape(-1)].add(
            dx_i.reshape(P * I, 3), mode="drop"
        )
        dx = dx.at[part.separator_idx].add(dx_s.reshape(S, 3), mode="drop")
        dx = dx[:v_cap]
        movable = graph.var_valid & ~graph.var_fixed
        dx = jnp.where(movable[:, None], dx, 0.0)
        return geometry.compose(dx, poses), chi

    def body(state):
        it, poses, chi_prev, _ = state
        new_poses, chi = gn_step(poses)
        return it + 1, new_poses, chi, chi_prev

    def cond(state):
        it, _, chi, chi_prev = state
        decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
        return (it < cfg.max_iterations) & ~((it > 1) & decayed)

    it, poses, chi, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), graph.poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf)),
    )
    return graph._replace(poses=poses), chi, it
