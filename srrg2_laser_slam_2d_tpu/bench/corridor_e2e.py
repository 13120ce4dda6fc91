"""Corridor acceptance benchmark — the END-TO-END pipeline artifact.

Runs the full 2,871-frame corridor dataset (the Killian-scale stand-in,
bench/synthetic.py) through the chunk-batched product SLAM loop
(models/chunked_slam.py) on the live device, TWICE in one process:

  pass 1 (cold):  includes every compile and remote program load — the
                  one-time session cost;
  pass 2 (warm):  the steady-state serving number — every program compiled
                  and loaded, timing dominated by device work + the per-chunk
                  host syncs. This mirrors how the reference's own
                  benchmark_carmen gate measures a warmed process (no JIT in
                  C++, so its cold == warm; the C++ e2e baseline
                  native/baseline_slam.cpp is the comparison).

Gate semantics per benchmark_carmen.cpp:57-64: exit code 0 only if the ATE
stays inside the corridor thresholds (bench/suite.py CORRIDOR_THRESHOLDS)
AND loop closures were actually accepted (graph_factors > graph_variables-1)
— the round-4 review found a passing artifact that had silently closed zero
loops; this gate makes that impossible.

Usage:
  python -m srrg2_laser_slam_2d_tpu.bench.corridor_e2e \
      [--chunk 256] [--config configurations/corridor.json] \
      [--out bench/results/corridor_r05.json] [--tum bench/results/r05.tum]
      [--max-frames N] [--single-pass]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_pass(cfg_path: str | None, chunk: int, max_frames: int | None):
    import numpy as np

    from ..bench import suite as suite_mod
    from ..io import tum
    from ..io.sources import JsonlFileSource
    from ..models.chunked_slam import ChunkedSlamRunner
    from ..utils import presets

    slam_cfg = pre_cfg = None
    if cfg_path:
        from ..utils import config as config_mod

        mgr = config_mod.ConfigManager.read(cfg_path)
        slam_cfg = mgr.get_by_name("slam")
        pre_cfg = mgr.get_by_name("preprocessor")
    runner = ChunkedSlamRunner(
        slam_config=slam_cfg or presets.laser0_slam(),
        preprocessor_config=pre_cfg or presets.laser0_preprocessor(),
        chunk=chunk,
    )
    t0 = time.perf_counter()
    n = runner.run(JsonlFileSource("bench/data/corridor.jsonl"), max_frames)
    wall = time.perf_counter() - t0

    gt = tum.read_tum("bench/data/corridor_gt.tum")
    bench = suite_mod.BenchmarkSuite()
    bench.set_ground_truth(*gt)
    for t, p, d in runner.trajectory:
        bench.set_pose_estimate(p, t, d)
    stats = bench.compute()
    regression = bench.is_regression(suite_mod.CORRIDOR_THRESHOLDS, stats)
    summary = runner.timing_summary()
    slam = runner.slam
    return {
        "frames": n,
        "wall_s": round(wall, 3),
        "compute_s": round(summary["total_compute_time"], 3),
        "mean_frame_time_s": round(summary["mean_frame_time"], 6),
        "mean_frame_hz": round(summary["mean_frame_hz"], 2),
        "chunks": summary["chunks"],
        "graph_variables": slam.num_variables(),
        "graph_factors": slam.num_factors(),
        "closures": slam.num_closures,
        "relocalizations": slam.relocalizations,
        "ate_rmse_translation_m": round(float(stats["rmse_translation"]), 4),
        "ate_mean_rotation_rad": round(float(stats["mean_rotation"]), 4),
        "gate_verdict": "REGRESSION" if regression else "PASS",
    }, runner


def run_native_baseline() -> dict | None:
    """Build + run the single-core C++ e2e baseline on the same dataset in
    the same session (native/baseline_slam.cpp), ATE via the same suite."""
    import numpy as np

    from ..bench import suite as suite_mod
    from ..io import tum

    here = os.getcwd()
    src = os.path.join(here, "native", "baseline_slam.cpp")
    exe = os.path.join(here, "native", "baseline_slam")
    try:
        if (not os.path.exists(exe)
                or os.path.getmtime(exe) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", src, "-o", exe],
                check=True, capture_output=True, timeout=300,
            )
        out = subprocess.run(
            [exe, "bench/data/corridor.jsonl", "/tmp/baseline_slam.tum"],
            check=True, capture_output=True, timeout=600,
        )
        res = json.loads(out.stdout.decode().strip())
        gt = tum.read_tum("bench/data/corridor_gt.tum")
        est_t, est_p = tum.read_tum("/tmp/baseline_slam.tum")
        b = suite_mod.BenchmarkSuite()
        b.set_ground_truth(*gt)
        for t, p in zip(est_t, est_p):
            b.set_pose_estimate(p, t)
        stats = b.compute()
        res["ate_rmse_translation_m"] = round(float(stats["rmse_translation"]), 4)
        res["gate_verdict"] = (
            "REGRESSION"
            if b.is_regression(suite_mod.CORRIDOR_THRESHOLDS, stats) else "PASS"
        )
        res["note"] = (
            "single-core C++ full pipeline (track+split+detect+solve); "
            "no validator/merger/relocalizer — simplifications favor its "
            "wall clock (native/baseline_slam.cpp header)"
        )
        return res
    except Exception as e:
        return {"error": repr(e)[:300]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--config", default="configurations/corridor.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tum", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--single-pass", action="store_true",
                    help="cold pass only (CI smoke)")
    ap.add_argument("--lean-config",
                    default="configurations/corridor_lean.json",
                    help="feature-parity config for the C++ speed "
                         "comparison row ('' disables)")
    args = ap.parse_args()

    # persistent compile cache: the cold pass of LATER sessions skips XLA
    # compiles (remote program loads still paid once per process)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.abspath(".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    artifact = {
        "input": "bench/data/corridor.jsonl",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": args.config,
        "commit": commit,
        "mode": f"chunked[{args.chunk}]",
        "gate": "corridor",
    }
    if args.max_frames is None:
        artifact["cpp_e2e_baseline"] = run_native_baseline()
        print("cpp:", json.dumps(artifact["cpp_e2e_baseline"]), flush=True)
    cold, runner = run_pass(args.config, args.chunk, args.max_frames)
    artifact["cold"] = cold
    print("cold:", json.dumps(cold), flush=True)
    if not args.single_pass:
        warm, runner = run_pass(args.config, args.chunk, args.max_frames)
        artifact["warm"] = warm
        print("warm:", json.dumps(warm), flush=True)
    if args.lean_config and args.max_frames is None:
        # feature-parity row: the C++ baseline ships no validator / closure
        # merger / relocalizer, so the speed-for-speed comparison runs the
        # TPU pipeline with the same feature set (quality still gated)
        lean, _ = run_pass(args.lean_config, args.chunk, None)
        artifact["warm_lean_parity"] = lean
        print("lean:", json.dumps(lean), flush=True)
    head = artifact.get("warm", cold)
    closed = head["graph_factors"] > head["graph_variables"] - 1
    artifact["loop_closures_accepted"] = closed
    ok = head["gate_verdict"] == "PASS" and closed
    artifact["verdict"] = "PASS" if ok else "FAIL"

    if args.tum:
        from ..io import tum as tum_mod

        tum_mod.write_tum(
            args.tum,
            [t for t, _, _ in runner.trajectory],
            [p for _, p, _ in runner.trajectory],
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
