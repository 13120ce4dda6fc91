"""SE(2) pose-graph optimization — TPU equivalent of the reference's global
solver stack: ``Solver`` + ``IterationAlgorithmGN`` + ``SimpleTerminationCriteria``
+ ``RobustifierCauchy`` over ``SE2PosePoseGeodesicErrorFactor`` edges with a
sparse block Cholesky (srrg2_solver; config evidence
configurations/stage_segway_double_config_LASER_0.json:90-113 (global solver),
:76-81 (Cauchy), :164-169 (termination); factor type wired at
apps/slam_app.cpp:147-153).

TPU design decisions:
- Edge residual e = t2v(Z^-1 ∘ (Xi^-1 ∘ Xj)); per-edge Jacobians come from
  ``jax.jacfwd`` of the residual w.r.t. the two pre-multiplied increments
  (exact, vmapped over all edges — no hand-derived 3x3 blocks to get wrong).
- The normal system H dx = -b is assembled densely ([3V, 3V]) via
  scatter-adds of 3x3 blocks. 2D pose graphs at the reference's scale
  (hundreds to a few thousand local maps) fit comfortably; the distributed /
  larger-scale path lives in parallel/dist_pgo.py (Schur-complement over
  shard_map) and solver/cg.py (matrix-free PCG).
- Gauge freedom: fixed variables get a large diagonal prior instead of row
  elimination, keeping shapes static.
- Everything runs inside one jitted ``lax.while_loop`` (chi-decay
  termination), float32 with float64-free stabilization (diagonal damping).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import geometry

Array = jax.Array


@dataclass(frozen=True)
class PGOConfig:
    max_iterations: int = 20        # Solver max_iterations (config :99)
    epsilon: float = 1e-5           # SimpleTerminationCriteria (config :164-169)
    chi_threshold: float = 0.0      # Cauchy on PGO edges; <=0 disables
    damping: float = 1e-6           # numeric stabilization of the dense solve
    anchor_weight: float = 1e6      # gauge prior on fixed variables
    # iteration algorithm — the reference Solver's pluggable
    # IterationAlgorithmGN / IterationAlgorithmLM ("GN/LM or others",
    # config :92): "gn" (default, matching the shipped assemblies) or "lm"
    # (adaptive Levenberg-Marquardt with accept/reject steps)
    algorithm: str = "gn"
    lm_lambda_init: float = 1e-4
    lm_lambda_factor: float = 4.0


class PoseGraph(NamedTuple):
    """Static-capacity pose graph (a pytree).

    poses:      [V, 3] variable estimates (pose vectors, world frame)
    var_valid:  [V] bool
    var_fixed:  [V] bool (gauge anchors)
    edge_i/j:   [E] int32 endpoints
    edge_meas:  [E, 3] relative measurement Z (j in i's frame)
    edge_info:  [E, 3] diagonal information (tx, ty, theta weights)
    edge_valid: [E] bool
    """

    poses: Array
    var_valid: Array
    var_fixed: Array
    edge_i: Array
    edge_j: Array
    edge_meas: Array
    edge_info: Array
    edge_valid: Array

    @property
    def var_capacity(self) -> int:
        return self.poses.shape[0]

    @property
    def edge_capacity(self) -> int:
        return self.edge_i.shape[0]

    def num_variables(self):
        return jnp.sum(self.var_valid.astype(jnp.int32))

    def num_edges(self):
        return jnp.sum(self.edge_valid.astype(jnp.int32))


def empty_graph(var_capacity: int, edge_capacity: int) -> PoseGraph:
    return PoseGraph(
        poses=jnp.zeros((var_capacity, 3), jnp.float32),
        var_valid=jnp.zeros(var_capacity, jnp.bool_),
        var_fixed=jnp.zeros(var_capacity, jnp.bool_),
        edge_i=jnp.zeros(edge_capacity, jnp.int32),
        edge_j=jnp.zeros(edge_capacity, jnp.int32),
        edge_meas=jnp.zeros((edge_capacity, 3), jnp.float32),
        edge_info=jnp.ones((edge_capacity, 3), jnp.float32),
        edge_valid=jnp.zeros(edge_capacity, jnp.bool_),
    )


def edge_residual(xi: Array, xj: Array, meas: Array) -> Array:
    """Geodesic edge error e = t2v(Z^-1 ∘ (Xi^-1 ∘ Xj)) (SE2PosePoseGeodesic)."""
    rel = geometry.relative(xi, xj)
    return geometry.compose(geometry.inverse(meas), rel)


def _residual_wrt_increments(dxi, dxj, xi, xj, meas):
    """Residual as a function of pre-multiplied increments (for jacfwd)."""
    xi_p = geometry.compose(dxi, xi)
    xj_p = geometry.compose(dxj, xj)
    return edge_residual(xi_p, xj_p, meas)


_edge_jac = jax.vmap(
    jax.jacfwd(_residual_wrt_increments, argnums=(0, 1)),
    in_axes=(None, None, 0, 0, 0),
)
_edge_res = jax.vmap(edge_residual, in_axes=(0, 0, 0))


def linearize(graph: PoseGraph, chi_threshold: float):
    """Build the dense normal system. Returns (H [3V,3V], b [3V], chi, per-edge chi)."""
    v = graph.var_capacity
    xi = graph.poses[graph.edge_i]
    xj = graph.poses[graph.edge_j]
    e = _edge_res(xi, xj, graph.edge_meas)            # [E, 3]
    Ji, Jj = _edge_jac(jnp.zeros(3), jnp.zeros(3), xi, xj, graph.edge_meas)  # [E,3,3]

    omega = graph.edge_info                            # [E, 3] diagonal
    chi_e = jnp.sum(e * e * omega, axis=-1)            # [E]
    if chi_threshold > 0:
        w = jnp.where(chi_e < chi_threshold, 1.0, chi_threshold / jnp.maximum(chi_e, 1e-20))
    else:
        w = jnp.ones_like(chi_e)
    w = jnp.where(graph.edge_valid, w, 0.0)

    wo = w[:, None] * omega                            # [E, 3]
    # block contributions
    Hii = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Ji)
    Hjj = jnp.einsum("eki,ek,ekj->eij", Jj, wo, Jj)
    Hij = jnp.einsum("eki,ek,ekj->eij", Ji, wo, Jj)
    bi = jnp.einsum("eki,ek,ek->ei", Ji, wo, e)
    bj = jnp.einsum("eki,ek,ek->ei", Jj, wo, e)

    H = jnp.zeros((v, 3, v, 3), jnp.float32)
    ei, ej = graph.edge_i, graph.edge_j
    H = H.at[ei, :, ei, :].add(Hii)
    H = H.at[ej, :, ej, :].add(Hjj)
    H = H.at[ei, :, ej, :].add(Hij)
    H = H.at[ej, :, ei, :].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((v, 3), jnp.float32).at[ei].add(bi).at[ej].add(bj)

    chi = jnp.sum(jnp.where(graph.edge_valid, chi_e, 0.0))
    return H.reshape(3 * v, 3 * v), b.reshape(3 * v), chi, chi_e


def graph_chi(graph: PoseGraph) -> Array:
    """Total information-weighted chi over live edges (no linearization)."""
    e = _edge_res(
        graph.poses[graph.edge_i], graph.poses[graph.edge_j], graph.edge_meas
    )
    chi_e = jnp.sum(e * e * graph.edge_info, axis=-1)
    return jnp.sum(jnp.where(graph.edge_valid, chi_e, 0.0))


def solve_spd_scaled(H: Array, b: Array) -> Array:
    """Jacobi-scaled dense solve with a finite guard — the f32-safe normal-
    equation solve. The raw system mixes anchor weight (1e6), damping (1e-6)
    and edge info (1e2-1e3) on the diagonal; unscaled f32 LU of that spread
    explodes (measured: chain graphs >= 256 nodes return 1e7-sized steps,
    then NaN poses — the round-4 schur_r04 'chi: NaN' root cause; see
    BENCH_NOTES). Symmetric diagonal scaling removes the spread; the finite
    guard zeroes the step if the scaled system is still beyond f32 (long
    anchored chains are genuinely indefinite-to-f32 — their true smallest
    eigenvalue sits below f32 accumulation noise; the reference's CSparse
    solves those in double, which TPUs do not have natively — chain-dominant
    graphs belong to the LM or PCG paths)."""
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
    Hs = H / d[:, None] / d[None, :]
    dx = jnp.linalg.solve(Hs, b / d) / d
    return jnp.where(jnp.isfinite(dx), dx, 0.0)


def solve_spd_scaled_batched(H: Array, B: Array) -> Array:
    """Batched ([P, n, n] @ [P, n, k]) variant of ``solve_spd_scaled`` —
    the Schur interior eliminations run one such solve per partition
    (solver/schur.py), with the same f32 conditioning hazard on chain
    interiors."""
    d = jnp.sqrt(jnp.maximum(
        jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))            # [P, n]
    Hs = H / d[..., :, None] / d[..., None, :]
    X = jnp.linalg.solve(Hs, B / d[..., :, None]) / d[..., :, None]
    return jnp.where(jnp.isfinite(X), X, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize(cfg: PGOConfig, graph: PoseGraph) -> tuple[PoseGraph, Array, Array]:
    """Gauss-Newton loop. Returns (graph with updated poses, final chi, iters)."""
    v = graph.var_capacity

    # gauge + inactive-variable prior
    diag_extra = jnp.where(
        graph.var_fixed | ~graph.var_valid, cfg.anchor_weight, cfg.damping
    )
    diag_extra = jnp.repeat(diag_extra, 3)

    movable = graph.var_valid & ~graph.var_fixed

    if cfg.algorithm == "lm":

        def body(state):
            it, poses, chi_cur, chi_prev, lam = state
            g = graph._replace(poses=poses)
            H, b, chi, _ = linearize(g, cfg.chi_threshold)
            H = H + jnp.diag(diag_extra)
            # LM damping on the diagonal; try the step, accept on chi decrease
            Hlm = H + lam * jnp.diag(jnp.diag(H))
            dx = solve_spd_scaled(Hlm, -b).reshape(v, 3)
            dx = jnp.where(movable[:, None], dx, 0.0)
            cand = geometry.compose(dx, poses)
            _, _, chi_new, _ = linearize(graph._replace(poses=cand), cfg.chi_threshold)
            accept = chi_new < chi
            poses = jnp.where(accept, cand, poses)
            lam = jnp.clip(
                jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor),
                1e-9,
                1e8,
            )
            return it + 1, poses, jnp.where(accept, chi_new, chi), chi, lam

        def cond(state):
            it, _, chi, chi_prev, _ = state
            not_done = it < cfg.max_iterations
            decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
            return not_done & ~((it > 1) & decayed)

        it, poses, chi, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.int32(0),
                graph.poses,
                jnp.float32(jnp.inf),
                jnp.float32(jnp.inf),
                jnp.float32(cfg.lm_lambda_init),
            ),
        )
        return graph._replace(poses=poses), chi, it

    def body(state):
        it, poses, chi_prev, _ = state
        g = graph._replace(poses=poses)
        H, b, chi, _ = linearize(g, cfg.chi_threshold)
        H = H + jnp.diag(diag_extra)
        dx = solve_spd_scaled(H, -b).reshape(v, 3)
        dx = jnp.where(movable[:, None], dx, 0.0)
        cand = geometry.compose(dx, poses)  # pre-multiplied block update
        # divergence guard: a chain-dominant system can exceed the f32 solve
        # (see solve_spd_scaled) and return a garbage step whose chi explodes
        # by many orders of magnitude — keep the current poses instead of
        # oscillating to infinity (such graphs belong to LM/PCG). Ordinary
        # GN overshoot (a few x, recovered next iteration) stays accepted.
        chi_cand = graph_chi(graph._replace(poses=cand))
        ok = jnp.isfinite(chi_cand) & (chi_cand <= 1e3 * chi + 1e3)
        new_poses = jnp.where(ok, cand, poses)
        return it + 1, new_poses, chi, chi_prev

    def cond(state):
        it, _, chi, chi_prev = state
        not_done = it < cfg.max_iterations
        decayed = jnp.abs(chi_prev - chi) < cfg.epsilon * jnp.maximum(chi_prev, 1e-20)
        return not_done & ~((it > 1) & decayed)

    it, poses, chi, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), graph.poses, jnp.float32(jnp.inf), jnp.float32(jnp.inf))
    )
    return graph._replace(poses=poses), chi, it


def _round_capacity(n: int, minimum: int = 16) -> int:
    c = minimum
    while c < n:
        c *= 2
    return c


def trim(graph: PoseGraph, n_vars: int, n_edges: int) -> tuple[PoseGraph, int, int]:
    """Slice the static-capacity graph down to power-of-two capacities that
    cover the live variables/edges — keeps the dense solve sized to the
    problem while bounding the number of distinct compiled shapes."""
    vc = _round_capacity(n_vars)
    ec = _round_capacity(n_edges)
    vc = min(vc, graph.var_capacity)
    ec = min(ec, graph.edge_capacity)
    trimmed = PoseGraph(
        poses=graph.poses[:vc],
        var_valid=graph.var_valid[:vc],
        var_fixed=graph.var_fixed[:vc],
        edge_i=graph.edge_i[:ec],
        edge_j=graph.edge_j[:ec],
        edge_meas=graph.edge_meas[:ec],
        edge_info=graph.edge_info[:ec],
        edge_valid=graph.edge_valid[:ec],
    )
    return trimmed, vc, ec


def untrim_poses(full: PoseGraph, solved: PoseGraph) -> PoseGraph:
    """Write the solved pose block back into the full-capacity graph."""
    vc = solved.var_capacity
    return full._replace(poses=full.poses.at[:vc].set(solved.poses))


def graph_chi(graph: PoseGraph) -> Array:
    """Total unrobustified chi2 of the graph (diagnostic)."""
    _, _, chi, _ = linearize(graph, 0.0)
    return chi
