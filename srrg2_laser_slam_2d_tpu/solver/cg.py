"""Matrix-free preconditioned conjugate gradient for large pose graphs.

The reference's global solve uses CHOLMOD/CSparse block-Cholesky
(SparseBlockLinearSolver*, configurations/...LASER_0.json:777-779) — sparse
triangular factorization has no efficient TPU analog (SURVEY.md §7 'hard
parts'). The TPU-scale design: Gauss-Newton outer iterations whose normal
system H dx = -b is solved by block-Jacobi-preconditioned CG where H is never
materialized — the operator x -> Hx is two gathers, a per-edge 3x3 block
product batch, and two scatter-adds, all O(E) and fully parallel. This is the
path for the city-scale (1M+ node) synthetic config in BASELINE.json; the
dense solver (solver/pgo.py) remains the exactness oracle for small graphs.

Distribution: shard the edge arrays over the mesh and psum the scattered
products (parallel/dist_pgo.py pattern) — CG's only cross-shard communication
is that reduction plus scalar dot products.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import geometry
from .pgo import PoseGraph, _edge_jac, _edge_res

Array = jax.Array


@dataclass(frozen=True)
class CGConfig:
    gn_iterations: int = 10
    cg_iterations: int = 50
    cg_tolerance: float = 1e-6
    epsilon: float = 1e-5          # GN chi-decay termination
    chi_threshold: float = 0.0     # Cauchy on edges
    damping: float = 1e-6
    anchor_weight: float = 1e6
    # million-node controls: linearize edge Jacobians in chunks of this many
    # edges (bounds jacfwd working memory; 0 = one shot)
    jac_chunk: int = 0


class EdgeOrder(NamedTuple):
    """Static row-sorted ordering of the 2E per-edge contributions
    (i-endpoint then j-endpoint rows). Built once per graph topology on the
    host; turns the Hx scatter-adds into SORTED segment sums — the
    non-unique scatter-min/add lowering that serializes on TPU is the
    documented scaling bottleneck (BENCH_NOTES.md r1)."""

    perm: Array   # [2E] int32 permutation into row-sorted order
    rows: Array   # [2E] int32 sorted destination rows


def prepare_edge_order(graph: PoseGraph) -> EdgeOrder:
    """Host-side: sort the stacked (edge_i ++ edge_j) destination rows."""
    rows = np.concatenate([np.asarray(graph.edge_i), np.asarray(graph.edge_j)])
    perm = np.argsort(rows, kind="stable").astype(np.int32)
    return EdgeOrder(perm=jnp.asarray(perm), rows=jnp.asarray(rows[perm]))


def _scatter_rows(ci: Array, cj: Array, v: int, graph: PoseGraph,
                  order: EdgeOrder | None) -> Array:
    """sum_e (ci_e -> row edge_i[e]) + (cj_e -> row edge_j[e]); [*, 3]-shaped."""
    if order is None:
        return (
            jnp.zeros((v,) + ci.shape[1:], ci.dtype)
            .at[graph.edge_i]
            .add(ci)
            .at[graph.edge_j]
            .add(cj)
        )
    data = jnp.concatenate([ci, cj])[order.perm]
    return jax.ops.segment_sum(
        data, order.rows, num_segments=v, indices_are_sorted=True
    )


# --------------------------------------------------------- component layout
#
# Everything below works in EDGE-MAJOR-LAST component layout: per-edge
# quantities are tuples/stacks of 1-D [E] arrays ([3, E] residuals,
# [3, 3, E] Jacobian blocks), per-variable vectors are 3-tuples of [V].
# Rationale (r4, the 1M-node OOM root cause): TPU pads the last two dims of
# every array to (8, 128) tiles, so an [E, 3, 3] block array or even an
# [E, 3] residual materializes at 100-150x its logical size — the einsum
# formulation's HLO temps hit 16.6 GB (4.6% utilization) at 1M nodes /
# 2.1M edges. With E on the lane dimension every op is a dense [E] row op
# and the whole 1M-node linearization fits in a few hundred MB.


def _scatter1(ci: Array, cj: Array, v: int, graph: PoseGraph,
              order: EdgeOrder | None) -> Array:
    """Per-component scatter: [E] + [E] -> [V]."""
    if order is None:
        return (
            jnp.zeros((v,), ci.dtype).at[graph.edge_i].add(ci)
            .at[graph.edge_j].add(cj)
        )
    data = jnp.concatenate([ci, cj])[order.perm]
    return jax.ops.segment_sum(
        data, order.rows, num_segments=v, indices_are_sorted=True
    )


def _linearize_blocks(graph: PoseGraph, chi_threshold: float, jac_chunk: int = 0):
    """Per-edge Jacobian blocks + robust weights + residuals, in component
    layout: JiT/JjT [3, 3, E] (JiT[k, i, e] = d res_k / d xi_i at edge e),
    woT/eT [3, E], chi scalar.

    With ``jac_chunk`` > 0 the jacfwd evaluation streams over edge chunks via
    ``lax.map`` (memory bounded by the chunk, not by E) — the fix that takes
    the city-scale config past the 262k-node compile ceiling of round 1."""
    ec = graph.edge_capacity
    if jac_chunk and ec > jac_chunk and ec % jac_chunk == 0:
        poses = graph.poses

        def chunk_fn(args):
            # endpoint GATHERS live inside the chunk too: materializing
            # poses[edge_i] for all E as a padded [E, 3] costs 2 GB at 2.1M
            # edges (r4 1M-node device-fault root cause)
            ei_c, ej_c, measT_c = args
            xi_c, xj_c = poses[ei_c], poses[ej_c]
            meas_c = measT_c.T
            e_c = _edge_res(xi_c, xj_c, meas_c)
            Ji_c, Jj_c = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi_c, xj_c, meas_c)
            # transpose INSIDE the chunk: the padded [C, 3, 3] layout only
            # ever exists at chunk size
            return (e_c.T, jnp.transpose(Ji_c, (1, 2, 0)),
                    jnp.transpose(Jj_c, (1, 2, 0)))

        n_chunks = ec // jac_chunk
        measT_chunks = jnp.moveaxis(
            graph.edge_meas.T.reshape(3, n_chunks, jac_chunk), 1, 0
        )
        eT, JiT, JjT = jax.lax.map(chunk_fn, (
            graph.edge_i.reshape(n_chunks, jac_chunk),
            graph.edge_j.reshape(n_chunks, jac_chunk),
            measT_chunks,
        ))
        eT = jnp.moveaxis(eT, 0, 1).reshape(3, ec)
        JiT = jnp.moveaxis(JiT, 0, 2).reshape(3, 3, ec)
        JjT = jnp.moveaxis(JjT, 0, 2).reshape(3, 3, ec)
    else:
        xi = graph.poses[graph.edge_i]
        xj = graph.poses[graph.edge_j]
        eT = _edge_res(xi, xj, graph.edge_meas).T
        Ji, Jj = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi, xj, graph.edge_meas)
        JiT = jnp.transpose(Ji, (1, 2, 0))
        JjT = jnp.transpose(Jj, (1, 2, 0))
    omegaT = graph.edge_info.T                                # [3, E]
    chi_e = jnp.sum(eT * eT * omegaT, axis=0)                 # [E]
    if chi_threshold > 0:
        w = jnp.where(chi_e < chi_threshold, 1.0,
                      chi_threshold / jnp.maximum(chi_e, 1e-20))
    else:
        w = jnp.ones_like(chi_e)
    w = jnp.where(graph.edge_valid, w, 0.0)
    woT = w[None, :] * omegaT                                 # [3, E]
    chi = jnp.sum(jnp.where(graph.edge_valid, chi_e, 0.0))
    return JiT, JjT, woT, eT, chi


def _gather_x(x3, idx):
    """(x0, x1, x2) [V]-tuples gathered at [E] indices -> 3 x [E]."""
    return tuple(c[idx] for c in x3)


def _jtu(JT, u):
    """y_i = sum_k JT[k, i, :] * u[k] for 3-component u ([3, E] stack)."""
    return tuple(
        JT[0, i] * u[0] + JT[1, i] * u[1] + JT[2, i] * u[2] for i in range(3)
    )


def _apply_H(graph: PoseGraph, JiT, JjT, woT, diag_extra, x3, order=None):
    """y = (H + diag_extra) x without materializing H. x3: 3-tuple of [V]."""
    v = graph.var_capacity
    xi = _gather_x(x3, graph.edge_i)
    xj = _gather_x(x3, graph.edge_j)
    # u_k = w*omega_k * (sum_i Ji[k,i] xi_i + Jj[k,i] xj_i)
    u = tuple(
        woT[k] * (JiT[k, 0] * xi[0] + JiT[k, 1] * xi[1] + JiT[k, 2] * xi[2]
                  + JjT[k, 0] * xj[0] + JjT[k, 1] * xj[1] + JjT[k, 2] * xj[2])
        for k in range(3)
    )
    yi = _jtu(JiT, u)
    yj = _jtu(JjT, u)
    return tuple(
        _scatter1(yi[i], yj[i], v, graph, order) + diag_extra * x3[i]
        for i in range(3)
    )


def _block_jacobi(graph: PoseGraph, JiT, JjT, woT, diag_extra, order=None):
    """Inverse 3x3 diagonal blocks of H (preconditioner) as 9 [V] components
    (D_ij), inverted in closed form (adjugate / det)."""
    v = graph.var_capacity
    D = {}
    for i in range(3):
        for j in range(i, 3):
            hii = (JiT[0, i] * woT[0] * JiT[0, j]
                   + JiT[1, i] * woT[1] * JiT[1, j]
                   + JiT[2, i] * woT[2] * JiT[2, j])
            hjj = (JjT[0, i] * woT[0] * JjT[0, j]
                   + JjT[1, i] * woT[1] * JjT[1, j]
                   + JjT[2, i] * woT[2] * JjT[2, j])
            D[i, j] = _scatter1(hii, hjj, v, graph, order)
            if i == j:
                D[i, j] = D[i, j] + diag_extra
    a, b_, c = D[0, 0], D[0, 1], D[0, 2]
    d, e_ = D[1, 1], D[1, 2]
    f = D[2, 2]
    # symmetric 3x3 inverse via cofactors
    A = d * f - e_ * e_
    B = c * e_ - b_ * f
    C = b_ * e_ - c * d
    Dd = a * f - c * c
    E = b_ * c - a * e_
    F = a * d - b_ * b_
    det = a * A + b_ * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    safe = jnp.abs(det) > 1e-30
    P = {}
    P[0, 0], P[0, 1], P[0, 2] = A * inv_det, B * inv_det, C * inv_det
    P[1, 1], P[1, 2] = Dd * inv_det, E * inv_det
    P[2, 2] = F * inv_det
    # degenerate rows (empty variables): identity, keeps PCG well-posed
    P[0, 0] = jnp.where(safe, P[0, 0], 1.0)
    P[1, 1] = jnp.where(safe, P[1, 1], 1.0)
    P[2, 2] = jnp.where(safe, P[2, 2], 1.0)
    for i, j in ((0, 1), (0, 2), (1, 2)):
        P[i, j] = jnp.where(safe, P[i, j], 0.0)
        P[j, i] = P[i, j]
    P[1, 0], P[2, 0], P[2, 1] = P[0, 1], P[0, 2], P[1, 2]
    return P


def _apply_precond(P, r3):
    return tuple(
        P[i, 0] * r3[0] + P[i, 1] * r3[1] + P[i, 2] * r3[2] for i in range(3)
    )


def _pcg(apply_h, P, b3, iters: int, tol: float):
    """Standard PCG on the component ([V] x 3) block vector space."""

    def dot(a3, c3):
        return sum(jnp.sum(a * c) for a, c in zip(a3, c3))

    x0 = tuple(jnp.zeros_like(b) for b in b3)
    r0 = b3
    z0 = _apply_precond(P, r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b2 = jnp.maximum(dot(b3, b3), 1e-30)

    def body(state):
        k, x, r, p, rz = state
        hp = apply_h(p)
        alpha = rz / jnp.maximum(dot(p, hp), 1e-30)
        x = tuple(xc + alpha * pc for xc, pc in zip(x, p))
        r = tuple(rc - alpha * hc for rc, hc in zip(r, hp))
        z = _apply_precond(P, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = tuple(zc + beta * pc for zc, pc in zip(z, p))
        return k + 1, x, r, p, rz_new

    def cond(state):
        k, x, r, p, rz = state
        return (k < iters) & (dot(r, r) > tol * tol * b2)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, r0, p0, rz0))
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_cg(cfg: CGConfig, graph: PoseGraph, order: EdgeOrder | None = None
                ) -> tuple[PoseGraph, Array, Array]:
    """GN + matrix-free PCG. Same contract as pgo.optimize.

    Pass ``order = prepare_edge_order(graph)`` for large graphs: the Hx /
    gradient / preconditioner scatters become sorted segment sums."""
    diag_extra = jnp.where(
        graph.var_fixed | ~graph.var_valid, cfg.anchor_weight, cfg.damping
    )
    movable = graph.var_valid & ~graph.var_fixed

    def body(state):
        it, poses, chi_prev, _ = state
        g = graph._replace(poses=poses)
        JiT, JjT, woT, eT, chi = _linearize_blocks(
            g, cfg.chi_threshold, cfg.jac_chunk
        )
        # b = J^T Omega_w e (gradient), per component
        u = tuple(woT[k] * eT[k] for k in range(3))
        bi = _jtu(JiT, u)
        bj = _jtu(JjT, u)
        b3 = tuple(
            _scatter1(bi[i], bj[i], graph.var_capacity, graph, order)
            for i in range(3)
        )
        P = _block_jacobi(g, JiT, JjT, woT, diag_extra, order)
        dx3 = _pcg(
            lambda x3: _apply_H(g, JiT, JjT, woT, diag_extra, x3, order),
            P,
            tuple(-b for b in b3),
            cfg.cg_iterations,
            cfg.cg_tolerance,
        )
        dx = jnp.stack(dx3, axis=1)                           # [V, 3]
        dx = jnp.where(movable[:, None], dx, 0.0)
        return it + 1, geometry.compose(dx, poses), chi, chi_prev

    def cond(state):
        it, _, chi, chi_prev = state
        decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
        return (it < cfg.gn_iterations) & ~((it > 1) & decayed)

    it, poses, chi, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), graph.poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf))
    )
    return graph._replace(poses=poses), chi, it
