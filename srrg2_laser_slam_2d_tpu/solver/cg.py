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


def _linearize_blocks(graph: PoseGraph, chi_threshold: float, jac_chunk: int = 0):
    """Per-edge Jacobian blocks + robust weights + residuals.

    With ``jac_chunk`` > 0 the jacfwd evaluation streams over edge chunks via
    ``lax.map`` (memory bounded by the chunk, not by E) — the fix that takes
    the city-scale config past the 262k-node compile ceiling of round 1."""
    ec = graph.edge_capacity
    if jac_chunk and ec > jac_chunk and ec % jac_chunk == 0:
        def chunk_fn(args):
            xi_c, xj_c, meas_c = args
            e_c = _edge_res(xi_c, xj_c, meas_c)
            Ji_c, Jj_c = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi_c, xj_c, meas_c)
            return e_c, Ji_c, Jj_c

        n_chunks = ec // jac_chunk
        xi = graph.poses[graph.edge_i].reshape(n_chunks, jac_chunk, 3)
        xj = graph.poses[graph.edge_j].reshape(n_chunks, jac_chunk, 3)
        meas = graph.edge_meas.reshape(n_chunks, jac_chunk, 3)
        e, Ji, Jj = jax.lax.map(chunk_fn, (xi, xj, meas))
        e = e.reshape(ec, 3)
        Ji = Ji.reshape(ec, 3, 3)
        Jj = Jj.reshape(ec, 3, 3)
    else:
        xi = graph.poses[graph.edge_i]
        xj = graph.poses[graph.edge_j]
        e = _edge_res(xi, xj, graph.edge_meas)
        Ji, Jj = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi, xj, graph.edge_meas)
    omega = graph.edge_info
    chi_e = jnp.sum(e * e * omega, axis=-1)
    if chi_threshold > 0:
        w = jnp.where(chi_e < chi_threshold, 1.0, chi_threshold / jnp.maximum(chi_e, 1e-20))
    else:
        w = jnp.ones_like(chi_e)
    w = jnp.where(graph.edge_valid, w, 0.0)
    wo = w[:, None] * omega  # [E, 3]
    chi = jnp.sum(jnp.where(graph.edge_valid, chi_e, 0.0))
    return Ji, Jj, wo, e, chi


def _apply_H(graph: PoseGraph, Ji, Jj, wo, diag_extra, x, order=None):
    """y = (H + diag_extra) x without materializing H. x: [V, 3]."""
    v = graph.var_capacity
    xi = x[graph.edge_i]  # [E, 3]
    xj = x[graph.edge_j]
    # u_e = Omega_w (Ji xi + Jj xj)
    u = wo * (
        jnp.einsum("eij,ej->ei", Ji, xi) + jnp.einsum("eij,ej->ei", Jj, xj)
    )
    yi = jnp.einsum("eji,ej->ei", Ji, u)  # Ji^T u
    yj = jnp.einsum("eji,ej->ei", Jj, u)
    y = _scatter_rows(yi, yj, v, graph, order)
    return y + diag_extra[:, None] * x


def _block_jacobi(graph: PoseGraph, Ji, Jj, wo, diag_extra, order=None):
    """Inverse 3x3 diagonal blocks of H (preconditioner)."""
    v = graph.var_capacity
    Hii = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Ji)
    Hjj = jnp.einsum("eki,ek,ekj->eij", Jj, wo, Jj)
    D = _scatter_rows(Hii.reshape(-1, 9), Hjj.reshape(-1, 9), v, graph, order)
    D = D.reshape(v, 3, 3) + diag_extra[:, None, None] * jnp.eye(3)
    return jnp.linalg.inv(D)


def _pcg(apply_h, precond, b, iters: int, tol: float):
    """Standard PCG on the [V, 3] block vector space."""

    def dot(a, c):
        return jnp.sum(a * c)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = jnp.einsum("vij,vj->vi", precond, r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b2 = jnp.maximum(dot(b, b), 1e-30)

    def body(state):
        k, x, r, p, rz = state
        hp = apply_h(p)
        alpha = rz / jnp.maximum(dot(p, hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = jnp.einsum("vij,vj->vi", precond, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
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
        Ji, Jj, wo, e, chi = _linearize_blocks(g, cfg.chi_threshold, cfg.jac_chunk)
        # b = J^T Omega_w e (gradient)
        u = wo * e
        bi = jnp.einsum("eji,ej->ei", Ji, u)
        bj = jnp.einsum("eji,ej->ei", Jj, u)
        b = _scatter_rows(bi, bj, graph.var_capacity, graph, order)
        precond = _block_jacobi(g, Ji, Jj, wo, diag_extra, order)
        dx = _pcg(
            lambda x: _apply_H(g, Ji, Jj, wo, diag_extra, x, order),
            precond,
            -b,
            cfg.cg_iterations,
            cfg.cg_tolerance,
        )
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
