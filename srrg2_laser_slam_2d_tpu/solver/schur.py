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
from . import pgo as pgo_mod
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
    # LOCAL separator slots (r4): sep_local_idx[p, l] = GLOBAL separator
    # slot (0..S-1) of partition p's l-th local separator variable (pad: S).
    # Per-partition dense systems are [3(I+L)]-sized with L = max local
    # separator count, NOT [3(I+S)] — the O(P*I*S) H_is materialization was
    # the blocker past ~4k nodes (a 65k chain needed a 10 GB H_is).
    sep_local_idx: Array

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

    @property
    def sep_local_cap(self) -> int:
        return self.sep_local_idx.shape[1]


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
    # endpoints are addressable in its owner's [interior_p ++ local-sep] frame.
    edge_part = np.where(ev, part_of[ei], 0).astype(np.int64)

    # ---- per-partition LOCAL separator sets ----
    # pairs (owner partition, global separator slot) from owned edges'
    # separator endpoints, plus every separator var's home partition (so its
    # reduced-system row exists even with no owned edge)
    s_len = len(sep_list)
    valid_idx = np.where(ev)[0]
    own_e = edge_part[valid_idx]
    pair_keys = []
    for endp in (ei, ej):
        v_ = endp[valid_idx]
        m = is_sep[v_]
        pair_keys.append(own_e[m] * s_len + sep_slot[v_[m]])
    pair_keys.append(part_of[sep_list] * s_len + np.arange(s_len))
    uniq = np.unique(np.concatenate(pair_keys)) if s_len else np.zeros(0, np.int64)
    up_, ul_ = uniq // max(s_len, 1), uniq % max(s_len, 1)
    cnt_l = np.bincount(up_, minlength=n_parts)
    start_l = np.concatenate([[0], np.cumsum(cnt_l)[:-1]])
    l_cap = _pow2(int(cnt_l.max()) if len(uniq) else 1)
    sep_local_idx = np.full((n_parts, l_cap), s_cap, np.int32)
    ranks_l = np.arange(len(uniq)) - start_l[up_]
    sep_local_idx[up_, ranks_l] = ul_

    def _local_sep_rank(p_arr, slot_arr):
        key = p_arr * s_len + slot_arr
        pos = np.searchsorted(uniq, key)
        return (pos - start_l[p_arr]).astype(np.int64)

    sep_i = is_sep[ei]
    sep_j = is_sep[ej]
    ei_local = np.where(ev, int_rank[ei], 0)
    ej_local = np.where(ev, int_rank[ej], 0)
    mi = ev & sep_i
    mj = ev & sep_j
    if s_len:
        ei_local = ei_local.copy()
        ej_local = ej_local.copy()
        ei_local[mi] = i_cap + _local_sep_rank(edge_part[mi], sep_slot[ei[mi]])
        ej_local[mj] = i_cap + _local_sep_rank(edge_part[mj], sep_slot[ej[mj]])
    ei_local = ei_local.astype(np.int32)
    ej_local = ej_local.astype(np.int32)

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
        sep_local_idx=jnp.asarray(sep_local_idx),
    )


def _eliminate(Hp, bp, rows3, anchor_sep, d_i: int, d_s: int):
    """Interior elimination + reduced-system assembly + separator solve.

    Numerics (r4): the elimination runs in f32 but via BACKWARD-STABLE LU
    solves (``jnp.linalg.solve``) rather than explicit ``inv`` — pose
    CHAINS have beam-like interior Hessians whose transverse modes scale as
    n^-4, and inv() + multiply put O(eps * cond) error anywhere, which made
    the assembled reduced system INDEFINITE (eigenvalues at -36 on a
    256-node chain; NaN poses). With solves, the computed complement is the
    exact complement of a nearby PSD matrix, so S_red stays PSD to O(eps);
    the separator damping absorbs the residual. (f64 would also work
    numerically but XLA:TPU cannot compile f64 linalg.)

    Returns (dx_s [dS], y [P, dI], G [P, dI, dL])."""
    H_ii = Hp[:, :d_i, :d_i]
    H_il = Hp[:, :d_i, d_i:]
    H_ll_p = Hp[:, d_i:, d_i:]
    b_i = bp[:, :d_i]
    b_l_p = bp[:, d_i:]
    # Jacobi-scaled solves (pgo.solve_spd_scaled_batched): chain interiors
    # mix damping/anchor/info scales on the diagonal and exceed unscaled
    # f32 LU exactly like the dense global solve (r4 schur_r04 NaN).
    # Large partition counts chunk the batched solve through lax.map — the
    # fully-fused [P, dI, dI] elimination overflows the XLA scoped-VMEM
    # budget at P=1024/dI=768 (262k-chain shape; the r4 262k compile
    # failure), and the tunnel's client cannot raise that compiler limit.
    P = H_ii.shape[0]
    if P >= 512:
        chunks = P // 256

        def _one(args):
            hii, hil, bi = args
            g_ = pgo_mod.solve_spd_scaled_batched(hii, hil)
            y_ = pgo_mod.solve_spd_scaled_batched(hii, bi[..., None])[..., 0]
            return g_, y_

        G, y = jax.lax.map(_one, (
            H_ii.reshape((chunks, 256) + H_ii.shape[1:]),
            H_il.reshape((chunks, 256) + H_il.shape[1:]),
            b_i.reshape((chunks, 256) + b_i.shape[1:]),
        ))
        G = G.reshape((P,) + G.shape[2:])
        y = y.reshape((P,) + y.shape[2:])
    else:
        G = pgo_mod.solve_spd_scaled_batched(H_ii, H_il)     # [P, dI, dL]
        y = pgo_mod.solve_spd_scaled_batched(H_ii, b_i[..., None])[..., 0]
    S_loc = H_ll_p - jnp.einsum("pji,pjk->pik", H_il, G)
    b_loc = b_l_p - jnp.einsum("pji,pj->pi", H_il, y)
    # local -> global reduced system (scatter-add; pad rows drop)
    S_red = jnp.zeros((d_s + 1, d_s + 1))
    S_red = S_red.at[rows3[:, :, None], rows3[:, None, :]].add(S_loc)
    S_red = S_red[:d_s, :d_s] + jnp.diag(jnp.repeat(anchor_sep, 3))
    b_red = jnp.zeros(d_s + 1).at[rows3].add(b_loc)[:d_s]
    dx_s = _solve_separator(S_red, -b_red)
    return dx_s, y, G


def _solve_separator(S_red: Array, b: Array) -> Array:
    """Separator solve: dense scaled LU up to ~3k separator variables;
    Jacobi-PCG on the materialized system beyond that — the TPU LU panel
    (f32[d_s, 128] LuDecompositionBlock) overflows the 16 MiB scoped-VMEM
    compiler budget near d_s ~ 11k (the r4 262k-chain compile failure,
    reproduced verbatim in r5 and not raisable through the serving tunnel)."""
    d_s = S_red.shape[0]
    if d_s <= 8192:
        return pgo_mod.solve_spd_scaled(S_red, b)
    d = jnp.maximum(jnp.diag(S_red), 1e-12)

    def body(_, st):
        x, r, p, rz = st
        Sp = S_red @ p
        alpha = rz / jnp.maximum(jnp.dot(p, Sp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Sp
        z = r / d
        rz_new = jnp.dot(r, z)
        p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
        return x, r, p, rz_new

    x0 = jnp.zeros_like(b)
    z0 = b / d
    st = jax.lax.fori_loop(0, 200, body, (x0, b, z0, jnp.dot(b, z0)))
    x = st[0]
    return jnp.where(jnp.isfinite(x), x, 0.0)


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

    d_s_g = 3 * part.separator_cap
    d_l_g = 3 * part.sep_local_cap
    rows3 = jnp.minimum(
        3 * part.sep_local_idx[:, :, None] + jnp.arange(3)[None, None, :],
        d_s_g,
    ).reshape(part.n_parts, d_l_g)
    v_cap_g = graph.var_capacity
    sep_fixed = jnp.concatenate([graph.var_fixed, jnp.zeros(1, bool)])[
        jnp.minimum(part.separator_idx, v_cap_g)]
    sep_valid = jnp.concatenate([graph.var_valid, jnp.zeros(1, bool)])[
        jnp.minimum(part.separator_idx, v_cap_g)]
    anchor_sep = jnp.where(
        (part.separator_idx >= v_cap_g) | sep_fixed | ~sep_valid,
        cfg.anchor_weight, cfg.damping,
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P_(), P_(GRAPH_AXIS), P_(GRAPH_AXIS, None),
                  P_(GRAPH_AXIS, None)),
        out_specs=P_(),
        check_vma=False,
    )
    def device_step(poses, my_parts, my_interior_idx, my_rows3):
        Hp, bp, chi_p = _partition_systems(cfg, graph, part, poses, my_parts)
        d_i = 3 * part.interior_cap
        d_s = 3 * part.separator_cap
        # solve-based f32 elimination (see _eliminate); the psum of the
        # reduced system is the only cross-chip traffic — separator-sized
        H_ii = Hp[:, :d_i, :d_i]
        H_il = Hp[:, :d_i, d_i:]
        H_ll_p = Hp[:, d_i:, d_i:]
        b_i = bp[:, :d_i]
        b_l_p = bp[:, d_i:]
        G = pgo_mod.solve_spd_scaled_batched(H_ii, H_il)
        y = pgo_mod.solve_spd_scaled_batched(H_ii, b_i[..., None])[..., 0]
        S_loc = H_ll_p - jnp.einsum("pji,pjk->pik", H_il, G)
        b_loc = b_l_p - jnp.einsum("pji,pj->pi", H_il, y)
        S_l = jnp.zeros((d_s + 1, d_s + 1))
        S_l = S_l.at[my_rows3[:, :, None], my_rows3[:, None, :]].add(S_loc)
        b_l = jnp.zeros(d_s + 1).at[my_rows3].add(b_loc)
        S_red = jax.lax.psum(S_l[:d_s, :d_s], GRAPH_AXIS) + jnp.diag(
            jnp.repeat(anchor_sep, 3)
        )
        b_red = jax.lax.psum(b_l[:d_s], GRAPH_AXIS)
        dx_s = pgo_mod.solve_spd_scaled(S_red, -b_red)
        chi = jax.lax.psum(jnp.sum(chi_p), GRAPH_AXIS)
        dx_sl = jnp.concatenate([dx_s, jnp.zeros(1)])[my_rows3]
        dx_i = -y - jnp.einsum("pik,pk->pi", G, dx_sl)
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
            dx, chi = device_step(poses, parts_arr, part.interior_idx, rows3)
            dx = jnp.where(movable[:, None], dx, 0.0)
            cand = geometry.compose(dx, poses)
            chi_cand = pgo_mod.graph_chi(graph._replace(poses=cand))
            ok = jnp.isfinite(chi_cand) & (chi_cand <= 1e3 * chi + 1e3)
            return it + 1, jnp.where(ok, cand, poses), chi, chi_prev

        def cond(state):
            it, _, chi, chi_prev = state
            decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
            return (it < cfg.max_iterations) & ~((it > 1) & decayed)

        # f32 matmuls for the dense elimination — same divergence-on-TPU
        # fix as optimize_schur
        with jax.default_matmul_precision("float32"):
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
    I, L = part.interior_cap, part.sep_local_cap
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

        # LOCAL frame: [interior_p (I) ++ local separator (L)] — dense size
        # is O(I + L) per partition, independent of the global separator.
        # H accumulates FLAT ([n3*n3] with linear indices): a block-indexed
        # [n_loc, 3, n_loc, 3] buffer pads each trailing 3 to a (4, 128)
        # tile — 19.4 GB at P=512, n_loc=136 (the r4 chain-compile OOM).
        n_loc = I + L
        n3 = 3 * n_loc
        io_r = jnp.arange(3)[None, :, None]
        io_c = jnp.arange(3)[None, None, :]

        def flat(lr, lc):
            r = 3 * lr[:, None, None] + io_r
            c = 3 * lc[:, None, None] + io_c
            return (r * n3 + c).reshape(-1)

        Hii_e = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Ji)
        Hjj_e = jnp.einsum("eki,ek,ekj->eij", Jj, wo, Jj)
        Hij_e = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Jj)
        bi_e = jnp.einsum("eki,ek,ek->ei", Ji, wo, e)
        bj_e = jnp.einsum("eki,ek,ek->ei", Jj, wo, e)
        li, lj = part.ei_local[perm], part.ej_local[perm]
        H = (
            jnp.zeros(n3 * n3, jnp.float32)
            .at[flat(li, li)].add(Hii_e.reshape(-1))
            .at[flat(lj, lj)].add(Hjj_e.reshape(-1))
            .at[flat(li, lj)].add(Hij_e.reshape(-1))
            .at[flat(lj, li)].add(
                jnp.swapaxes(Hij_e, -1, -2).reshape(-1))
        )
        b = (
            jnp.zeros(n3, jnp.float32)
            .at[(3 * li[:, None] + jnp.arange(3)[None, :]).reshape(-1)]
            .add(bi_e.reshape(-1))
            .at[(3 * lj[:, None] + jnp.arange(3)[None, :]).reshape(-1)]
            .add(bj_e.reshape(-1))
        )
        # interior anchors/damping only; separator anchors are applied ONCE
        # on the reduced system by the driver (a local separator slot exists
        # in every partition that touches the variable)
        own_gids = part.interior_idx[p]
        own_anchor = jnp.concatenate([anchor, jnp.zeros(1)])[
            jnp.minimum(own_gids, v_cap)
        ]
        # pad slots are decoupled — any positive diag works; matching the
        # edge-information scale (1.0) keeps cond(H_ii) f32-friendly
        # (anchor_weight=1e6 here put cond at 1e12 on chains)
        diag_add = jnp.where(own_gids >= v_cap, 1.0, own_anchor)
        # empty local-separator slots get a unit diag so H_ii/H stay
        # invertible wherever sliced (they never touch the reduced system)
        empty_sep = part.sep_local_idx[p] >= part.separator_cap
        diag_all = jnp.repeat(
            jnp.concatenate([diag_add, jnp.where(empty_sep, 1.0, 0.0)]), 3
        )
        dslots = jnp.arange(n3)
        H = H.at[dslots * n3 + dslots].add(diag_all)
        chi_mine = jnp.sum(jnp.where(valid, chi_e, 0.0))
        return H.reshape(n3, n3), b, chi_mine

    return jax.vmap(build_partition)(part_ids)


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_schur(cfg: PGOConfig, graph: PoseGraph, part: Partitioning
                   ) -> tuple[PoseGraph, Array, Array]:
    """GN loop with per-iteration Schur elimination. Same contract as
    pgo.optimize. The vmap over partitions becomes a shard_map on a real
    mesh; the psum-equivalent is the sum over the partition axis."""
    v_cap = graph.var_capacity
    P, I = part.n_parts, part.interior_cap
    S, L = part.separator_cap, part.sep_local_cap
    d_i, d_s, d_l = 3 * I, 3 * S, 3 * L

    # [P, dL] global ROW index of each local separator row (pad -> d_s,
    # the drop row of the (d_s+3)-sized scatter targets)
    rows3 = jnp.minimum(
        3 * part.sep_local_idx[:, :, None] + jnp.arange(3)[None, None, :],
        d_s,
    ).reshape(P, d_l)
    anchor_sep = jnp.where(
        part.separator_idx >= v_cap,
        cfg.anchor_weight,
        jnp.where(
            jnp.concatenate([graph.var_fixed, jnp.zeros(1, bool)])[
                jnp.minimum(part.separator_idx, v_cap)]
            | ~jnp.concatenate([graph.var_valid, jnp.zeros(1, bool)])[
                jnp.minimum(part.separator_idx, v_cap)],
            cfg.anchor_weight, cfg.damping,
        ),
    )

    def gn_step(poses):
        Hp, bp, chi_p = _partition_systems(cfg, graph, part, poses,
                                           jnp.arange(P))
        chi = jnp.sum(chi_p)
        dx_s, y, G = _eliminate(Hp, bp, rows3, anchor_sep, d_i, d_s)
        # back-substitution through the local frames
        dx_sl = jnp.concatenate([dx_s, jnp.zeros(1)])[rows3]  # [P, dL]
        dx_i = -y - jnp.einsum("pik,pk->pi", G, dx_sl)       # [P, dI]

        # scatter increments back to global variables
        dx = jnp.zeros((v_cap + 1, 3))
        dx = dx.at[part.interior_idx.reshape(-1)].add(
            dx_i.reshape(P * I, 3), mode="drop"
        )
        dx = dx.at[part.separator_idx].add(dx_s.reshape(S, 3), mode="drop")
        dx = dx[:v_cap]
        movable = graph.var_valid & ~graph.var_fixed
        dx = jnp.where(movable[:, None], dx, 0.0)
        cand = geometry.compose(dx, poses)
        # divergence guard (same as pgo.optimize): chain-shaped graphs have
        # soft interior modes whose f32 elimination error corrupts the
        # reduced system (see BENCH_NOTES r5 'Schur f32 analysis') — keep
        # the current poses instead of diverging; such graphs belong to PCG
        chi_cand = pgo_mod.graph_chi(graph._replace(poses=cand))
        ok = jnp.isfinite(chi_cand) & (chi_cand <= 1e3 * chi + 1e3)
        return jnp.where(ok, cand, poses), chi

    def body(state):
        it, poses, chi_prev, _ = state
        new_poses, chi = gn_step(poses)
        return it + 1, new_poses, chi, chi_prev

    def cond(state):
        it, _, chi, chi_prev = state
        decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
        return (it < cfg.max_iterations) & ~((it > 1) & decayed)

    # full-f32 matmuls: the TPU default (bf16 passes) destroys the dense
    # interior elimination — Hii^-1 on 3I-sized blocks diverged on-device
    # (r4: chi 962k vs the CPU/CG 120 on the same graph) while every CPU
    # test passed. Tracing inside this context pins every einsum /
    # linalg.inv / solve in the loop to float32.
    with jax.default_matmul_precision("float32"):
        it, poses, chi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), graph.poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf)),
        )
    return graph._replace(poses=poses), chi, it
