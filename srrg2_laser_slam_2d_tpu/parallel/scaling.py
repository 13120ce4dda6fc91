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


def measure_batch_align_scaling(
    k_per_device: int = 4, n_points: int = 512, device_counts=None, reps: int = 3
) -> list[dict]:
    """Device-parallel loop-closure candidate alignment at 1..N devices
    (fixed PER-DEVICE batch: measures weak scaling of the detector's
    batched ICP)."""
    from ..ops import icp
    from ..ops.projector import PolarProjection
    from ..utils import cloud as cloud_op
    from . import batch_align

    counts = device_counts or [1, 2, 4, len(jax.devices())]
    counts = sorted({c for c in counts if c <= len(jax.devices())})
    rng = np.random.default_rng(0)
    a = (np.arange(n_points) + 0.4) * (2 * np.pi / n_points) - np.pi
    xy = np.stack([3.0 * np.cos(a), 2.0 * np.sin(a)], 1).astype(np.float32)
    nrm = -np.stack([np.cos(a) / 3.0, np.sin(a) / 2.0], 1).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    base = cloud_op.from_numpy(xy, nrm)
    proj = PolarProjection.make(
        cols=n_points, angle_min=-np.pi, angle_max=np.pi, range_min=0.1, range_max=10.0
    )
    acfg = icp.AlignerConfig(max_iterations=10, odom_weight=0.0)
    results = []
    for n in counts:
        k = k_per_device * n
        fixed = jax.tree.map(lambda x: jnp.stack([x] * k), base)
        initials = jnp.asarray(rng.normal(scale=0.05, size=(k, 3)).astype(np.float32))
        mesh = make_mesh(n)
        from .batch_align import batch_align_sharded

        out = batch_align_sharded(acfg, proj, mesh, fixed, fixed, initials)
        jax.block_until_ready(out.estimate)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = batch_align_sharded(acfg, proj, mesh, fixed, fixed, initials)
        jax.block_until_ready(out.estimate)
        dt = (time.perf_counter() - t0) / reps
        results.append({"devices": n, "candidates": k, "seconds": dt})
    base_rate = results[0]["candidates"] / results[0]["seconds"]
    for r in results:
        rate = r["candidates"] / r["seconds"]
        r["speedup"] = rate / base_rate
        r["efficiency"] = r["speedup"] / r["devices"]
    return results


def measure_schur_scaling(side: int = 24, device_counts=None, reps: int = 3) -> list[dict]:
    """Schur-partitioned distributed GN at 1..N devices (one partition per
    device; strong scaling of the separator-reduced solve)."""
    from ..solver import schur

    counts = device_counts or [1, 2, 4, len(jax.devices())]
    counts = sorted({c for c in counts if c <= len(jax.devices())})
    graph = pgo_bench.make_grid_graph(side)
    n_vars = side * side
    cfg = pgo.PGOConfig(max_iterations=2)
    results = []
    for n in counts:
        mesh = make_mesh(n)
        part = schur.partition_graph(graph, n_parts=n, n_vars=n_vars)
        out, chi, it = schur.optimize_schur_sharded(cfg, graph, part, mesh)
        jax.block_until_ready(out.poses)
        t0 = time.perf_counter()
        for _ in range(reps):
            out, chi, it = schur.optimize_schur_sharded(cfg, graph, part, mesh)
        jax.block_until_ready(out.poses)
        dt = (time.perf_counter() - t0) / reps
        results.append({"devices": n, "seconds": dt, "chi": float(chi)})
    base = results[0]["seconds"]
    for r in results:
        r["speedup"] = base / r["seconds"]
        r["efficiency"] = r["speedup"] / r["devices"]
    return results


def measure_stream_scaling(
    k_per_device: int = 4, frames: int = 16, num_beams: int = 181,
    device_counts=None, reps: int = 3
) -> list[dict]:
    """Tracking frames/s WEAK scaling: K independent tracking streams per
    device through the K-stream fused frame kernel (ops/pallas_stream.py),
    sharded over the device mesh with shard_map. This is the north-star
    frames/s-per-chip metric at N devices; streams are independent, so the
    design target is ~1.0 efficiency (any loss is dispatch/collective
    overhead). On the CPU mesh the kernel runs interpreted —
    correctness/harness validation only, not a performance number."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..bench import pipeline, synthetic
    from ..models import fast_tracker as ft
    from ..models.preprocessor import PreprocessorConfig
    from ..ops import pallas_stream as ps
    from ..ops.pallas_frame import FrameSpec
    from ..ops.projector import PolarProjection

    counts = device_counts or [1, 2, 4, len(jax.devices())]
    counts = sorted({c for c in counts if c <= len(jax.devices())})
    interpret = jax.default_backend() == "cpu"

    proj = PolarProjection.make(cols=num_beams, angle_min=-np.pi,
                                angle_max=np.pi, range_min=0.3,
                                range_max=20.0)
    spec = FrameSpec(scene_capacity=512, projection=proj, iterations=5,
                     odom_weight=1.0, meas_as_canvas=True)
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=frames, num_beams=num_beams)
    )
    stack = pipeline.preprocess_batch(ds.projection, pcfg,
                                      jnp.asarray(ds.ranges))
    od = jnp.asarray(ds.robot_poses)
    st = ft.seed(spec, jax.tree.map(lambda x: x[0], stack),
                 np.array(ds.config.sensor_in_robot, np.float32), odom=od[0])
    measC = ft.pack_measurement_canvas_batch(
        spec, jax.tree.map(lambda x: x[1:], stack)
    )

    results = []
    for n in counts:
        k = k_per_device * n
        mesh = make_mesh(n)
        cacheB, poseB = ps.pack_stream_state(
            jnp.broadcast_to(st.cacheT, (k,) + st.cacheT.shape),
            jnp.broadcast_to(st.pose, (k,) + st.pose.shape),
        )
        measC_stack, odom_stack = ps.pack_stream_measurements(
            jnp.broadcast_to(measC, (k,) + measC.shape),
            jnp.broadcast_to(od[1:], (k,) + od[1:].shape),
        )

        from .mesh import GRAPH_AXIS

        @jax.jit
        def run(cacheB, poseB, measC_stack, odom_stack, _mesh=mesh):
            fn = shard_map(
                lambda c, p, m, o: ps.track_streams_grid(
                    spec, c, p, m, o, interpret=interpret
                ),
                mesh=_mesh,
                in_specs=(P(None, GRAPH_AXIS), P(GRAPH_AXIS),
                          P(None, None, GRAPH_AXIS), P(None, GRAPH_AXIS)),
                out_specs=(P(None, GRAPH_AXIS), P(GRAPH_AXIS),
                           P(None, None, GRAPH_AXIS)),
                check_vma=False,
            )
            cB, pB, _pay = fn(cacheB, poseB, measC_stack, odom_stack)
            return cB, pB

        # CHAINED methodology (VERDICT r4 weak #3 / BENCH_NOTES r4): state
        # feeds back through `reps` chained sequence calls and the host
        # syncs ONCE — per-call block_until_ready timing measures the ~24 ms
        # per-sync tunnel artifact, not the device
        cB, pB = run(cacheB, poseB, measC_stack, odom_stack)
        jax.block_until_ready(pB)
        chain = max(reps, 5)
        t0 = time.perf_counter()
        cB, pB = cacheB, poseB
        for _ in range(chain):
            cB, pB = run(cB, pB, measC_stack, odom_stack)
        jax.block_until_ready(pB)
        dt = (time.perf_counter() - t0) / chain
        t_frames = measC_stack.shape[0]
        results.append({
            "devices": n, "streams": k, "seconds": dt,
            "chained_calls": chain,
            "aggregate_scans_per_sec": k * t_frames / dt,
        })
    base = results[0]["aggregate_scans_per_sec"]
    for r in results:
        r["speedup"] = r["aggregate_scans_per_sec"] / base
        r["efficiency"] = r["speedup"] / r["devices"]
    return results


def main(argv=None) -> None:
    # JAX_PLATFORMS=cpu + xla_force_host_platform_device_count is the
    # virtual-mesh mode; the axon plugin force-overrides the env var, so
    # honor it explicitly (otherwise this harness silently grabs the single
    # TPU and reports a 1-device "mesh")
    from ..utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument(
        "--what", choices=["pgo", "align", "schur", "streams", "all"],
        default="pgo",
    )
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args(argv)
    jobs = {
        "pgo": lambda: measure_pgo_scaling(args.side),
        "align": measure_batch_align_scaling,
        "schur": lambda: measure_schur_scaling(min(args.side, 24)),
        "streams": measure_stream_scaling,
    }
    names = list(jobs) if args.what == "all" else [args.what]
    all_results = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "note": ("virtual CPU mesh: correctness/harness validation only"
                 if jax.default_backend() == "cpu" else "real hardware"),
    }
    for name in names:
        print(f"== {name} ==")
        all_results[name] = jobs[name]()
        for r in all_results[name]:
            extra = f" candidates={r['candidates']}" if "candidates" in r else ""
            extra += f" streams={r['streams']}" if "streams" in r else ""
            print(
                f"devices={r['devices']}: {r['seconds']*1000:.1f} ms "
                f"speedup={r['speedup']:.2f} efficiency={r['efficiency']:.2f}{extra}"
            )
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(all_results, f, indent=1)


if __name__ == "__main__":
    main()
