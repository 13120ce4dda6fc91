"""Scaling-efficiency harness: distributed PGO and batched alignment measured
at 1..N devices on whatever mesh is available (real pod slice, or the
8-device virtual CPU mesh in CI — the latter validates correctness and the
harness itself; true efficiency numbers require real chips + ICI).

Usage: python -m srrg2_laser_slam_2d_tpu.parallel.scaling [--side 64]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..bench import pgo_bench
from ..solver import pgo
from . import dist_pgo
from .mesh import make_mesh


def measure_pgo_scaling(side: int = 32, device_counts=None, reps: int = 3) -> list[dict]:
    counts = device_counts or [1, 2, 4, len(jax.devices())]
    counts = sorted({c for c in counts if c <= len(jax.devices())})
    graph = pgo_bench.make_grid_graph(side)
    cfg = pgo.PGOConfig(max_iterations=3)
    results = []
    for n in counts:
        mesh = make_mesh(n)
        g = dist_pgo.shard_edges(graph, mesh)
        out, chi, it = dist_pgo.optimize_sharded(cfg, g, mesh)  # compile
        jax.block_until_ready(out.poses)
        t0 = time.perf_counter()
        for _ in range(reps):
            out, chi, it = dist_pgo.optimize_sharded(cfg, g, mesh)
        jax.block_until_ready(out.poses)
        dt = (time.perf_counter() - t0) / reps
        results.append({"devices": n, "seconds": dt, "chi": float(chi)})
    base = results[0]["seconds"]
    for r in results:
        r["speedup"] = base / r["seconds"]
        r["efficiency"] = r["speedup"] / r["devices"]
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--side", type=int, default=32)
    args = ap.parse_args(argv)
    for r in measure_pgo_scaling(args.side):
        print(
            f"devices={r['devices']}: {r['seconds']*1000:.1f} ms "
            f"speedup={r['speedup']:.2f} efficiency={r['efficiency']:.2f}"
        )


if __name__ == "__main__":
    main()
