"""City-scale pose-graph benchmark — BASELINE.json config #5: a synthetic
multi-session grid-world graph at up to 1M+ nodes, solved with the matrix-free
PCG Gauss-Newton (solver/cg.py), optionally distributed over a device mesh.

The generator builds a Manhattan-world lattice (odometry chain per row +
column ties + long-range closures) with controlled noise — the structural
shape of large indoor/urban 2D SLAM graphs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..solver import cg, pgo
from ..utils import geometry


@dataclass
class PGOBenchResult:
    nodes: int
    edges: int
    chi0: float
    chi1: float
    seconds_per_gn_iteration: float
    iterations: int


def make_grid_graph(side: int, noise: float = 0.02, closure_every: int = 8,
                    seed: int = 0, edge_align: int | None = None) -> pgo.PoseGraph:
    """side x side lattice graph with noisy edges and periodic long closures.

    ``edge_align``: edge-capacity alignment. Must match the solver's
    ``jac_chunk`` when chunked linearization is used (run() passes it from
    the same ``large`` decision — ADVICE r4: the two thresholds must not
    diverge, or _linearize_blocks silently disables chunking)."""
    rng = np.random.default_rng(seed)
    v = side * side
    cols = np.arange(side, dtype=np.float32)
    gx, gy = np.meshgrid(cols, cols)
    gt = np.stack([gx.ravel(), gy.ravel(), np.zeros(v, np.float32)], axis=1)

    # edges: right neighbors + down neighbors (+ sparse diagonal closures)
    idx = np.arange(v).reshape(side, side)
    ei = [idx[:, :-1].ravel(), idx[:-1, :].ravel()]
    ej = [idx[:, 1:].ravel(), idx[1:, :].ravel()]
    if closure_every > 1:
        ci = idx[::closure_every, ::closure_every]
        ei.append(ci[:-1, :-1].ravel())
        ej.append(ci[1:, 1:].ravel())
    ei = np.concatenate(ei).astype(np.int32)
    ej = np.concatenate(ej).astype(np.int32)
    e = len(ei)

    # measurements = GT relative + noise (vectorized, no per-edge Python)
    rel = np.asarray(
        geometry.relative(jnp.asarray(gt[ei]), jnp.asarray(gt[ej]))
    )
    meas = rel + rng.normal(scale=noise, size=(e, 3)).astype(np.float32)
    init = gt + rng.normal(scale=0.1, size=(v, 3)).astype(np.float32)
    init[0] = gt[0]

    def up(x, m):
        # align, don't double: a power-of-2 capacity at 2.1M edges wastes
        # 2x on every padded [E, 3] edge array (r4 1M-node memory finding)
        return ((x + m - 1) // m) * m

    # large graphs: capacity aligned to the jac_chunk size so lax.map chunks
    # divide evenly (cg.CGConfig.jac_chunk = 131072)
    em = edge_align if edge_align is not None else (131072 if v > 100_000 else 16)
    graph = pgo.empty_graph(up(v, 16), up(e, em))
    return graph._replace(
        poses=graph.poses.at[:v].set(jnp.asarray(init)),
        var_valid=graph.var_valid.at[:v].set(True),
        var_fixed=graph.var_fixed.at[0].set(True),
        edge_i=graph.edge_i.at[:e].set(jnp.asarray(ei)),
        edge_j=graph.edge_j.at[:e].set(jnp.asarray(ej)),
        edge_meas=graph.edge_meas.at[:e].set(jnp.asarray(meas)),
        edge_valid=graph.edge_valid.at[:e].set(True),
    )


def make_chain_graph(n: int, noise: float = 0.02, closure_every: int = 50,
                     closure_span: int = 40, seed: int = 0) -> pgo.PoseGraph:
    """Multi-session SLAM-shaped graph: a long odometry chain of local maps
    with periodic short-range loop closures (every ``closure_every`` nodes,
    back ``closure_span``). Index-contiguous partitioning of this shape
    yields O(P) separators — the geometry the Schur solver is designed for
    (grid worlds give it O(V) separators; those belong to the CG path)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32) * 0.5
    gt = np.stack([t, 2.0 * np.sin(t * 0.05), np.zeros(n, np.float32)], 1)
    ei = [np.arange(n - 1)]
    ej = [np.arange(1, n)]
    ci = np.arange(closure_span + closure_every, n, closure_every)
    ei.append(ci)
    ej.append(ci - closure_span)
    ei = np.concatenate(ei).astype(np.int32)
    ej = np.concatenate(ej).astype(np.int32)
    e = len(ei)
    rel = np.asarray(
        geometry.relative(jnp.asarray(gt[ei]), jnp.asarray(gt[ej]))
    )
    meas = rel + rng.normal(scale=noise, size=(e, 3)).astype(np.float32)
    init = gt + rng.normal(scale=0.1, size=(n, 3)).astype(np.float32)
    init[0] = gt[0]
    graph = pgo.empty_graph(((n + 15) // 16) * 16, ((e + 15) // 16) * 16)
    return graph._replace(
        poses=graph.poses.at[:n].set(jnp.asarray(init)),
        var_valid=graph.var_valid.at[:n].set(True),
        var_fixed=graph.var_fixed.at[0].set(True),
        edge_i=graph.edge_i.at[:e].set(jnp.asarray(ei)),
        edge_j=graph.edge_j.at[:e].set(jnp.asarray(ej)),
        edge_meas=graph.edge_meas.at[:e].set(jnp.asarray(meas)),
        edge_valid=graph.edge_valid.at[:e].set(True),
    )


def edge_chi(graph: pgo.PoseGraph, chunk: int = 131072) -> float:
    """Edge-wise chi2 (the dense pgo.graph_chi materializes an O(V^2) Hessian
    and cannot be used at city scale). Residuals only — no Jacobians; chunked
    so the [C, 3] residual intermediates stay bounded at city scale (an
    unchunked call was the 1M-node runtime fault in r4: jacfwd's padded
    [E, 3, 3] blocks at 2.1M edges exceed HBM)."""
    import jax

    ec = graph.edge_capacity

    @jax.jit
    def total(poses, ei, ej, meas, info, valid):
        xi, xj = poses[ei], poses[ej]
        if chunk and ec > chunk and ec % chunk == 0:
            n = ec // chunk

            def chunk_fn(args):
                xi_c, xj_c, meas_c, info_c, valid_c = args
                e = cg._edge_res(xi_c, xj_c, meas_c)
                chi_e = jnp.sum(e * e * info_c, axis=-1)
                return jnp.sum(jnp.where(valid_c, chi_e, 0.0))

            parts = jax.lax.map(chunk_fn, (
                xi.reshape(n, chunk, 3), xj.reshape(n, chunk, 3),
                meas.reshape(n, chunk, 3), info.reshape(n, chunk, 3),
                valid.reshape(n, chunk),
            ))
            return jnp.sum(parts)
        e = cg._edge_res(xi, xj, meas)
        chi_e = jnp.sum(e * e * info, axis=-1)
        return jnp.sum(jnp.where(valid, chi_e, 0.0))

    return float(total(graph.poses, graph.edge_i, graph.edge_j,
                       graph.edge_meas, graph.edge_info, graph.edge_valid))


def run(side: int = 64, gn_iterations: int = 5, cg_iterations: int = 50,
        reps: int = 3, large: bool | None = None) -> PGOBenchResult:
    if large is None:
        large = side * side > 100_000
    # edge capacity aligned from the SAME large decision as jac_chunk below,
    # so chunked linearization never silently degrades to full-E jacfwd
    graph = make_grid_graph(side, edge_align=131072 if large else 16)
    # million-node mode: row-sorted segment-sum scatters + chunked jacfwd
    order = cg.prepare_edge_order(graph) if large else None
    cfg = cg.CGConfig(
        gn_iterations=gn_iterations,
        cg_iterations=cg_iterations,
        jac_chunk=131072 if large else 0,
    )
    chi0 = edge_chi(graph)
    out, chi, it = cg.optimize_cg(cfg, graph, order)   # compile + run
    jax.block_until_ready(out.poses)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, chi, it = cg.optimize_cg(cfg, graph, order)
    jax.block_until_ready(out.poses)
    dt = (time.perf_counter() - t0) / reps
    chi1 = edge_chi(out)
    return PGOBenchResult(
        nodes=side * side,
        edges=int(graph.num_edges()),
        chi0=chi0,
        chi1=chi1,
        seconds_per_gn_iteration=dt / max(int(it), 1),
        iterations=int(it),
    )


if __name__ == "__main__":
    import sys

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    r = run(side)
    print(
        f"nodes={r.nodes} edges={r.edges} chi {r.chi0:.1f}->{r.chi1:.1f} "
        f"{r.seconds_per_gn_iteration*1000:.1f} ms/GN-iter ({r.iterations} iters)"
    )
