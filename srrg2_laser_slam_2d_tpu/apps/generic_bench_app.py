"""Headless dataset benchmark runner — port of apps/generic_bench_app.cpp:
per-message timing, TUM trajectory dump, timing file, mean frame time / FPS
reporting (:78-136), plus the ATE/RMSE + regression gate of
benchmarks/benchmark_carmen.cpp / benchmark_simul.cpp.

Usage:
  python -m srrg2_laser_slam_2d_tpu.apps.generic_bench_app \
      -i log.jsonl | --carmen log.clf [--gt gt.tum] \
      [-o traj.tum] [-t timings.txt] [--gate killian|simul]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..bench import suite as suite_mod
from ..io import carmen as carmen_io
from ..io import sources, tum
from ..models.runner import SlamRunner
from ..utils import presets


def main(argv=None) -> int:
    from ..utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input", default=None)
    ap.add_argument("--carmen", default=None)
    ap.add_argument("-c", "--config", default=None,
                    help="named-assembly config file (ConfigManager format; "
                         "the benchmark_carmen.cpp 'configs/killian.conf' "
                         "role — per-dataset gates live in config, not code)")
    ap.add_argument("--gt", default=None, help="ground-truth TUM file")
    ap.add_argument("-o", "--output", default=None, help="TUM trajectory output")
    ap.add_argument("-t", "--timing", default=None, help="timing output file")
    ap.add_argument(
        "--gate", choices=["killian", "simul", "corridor", "none"], default="none"
    )
    ap.add_argument("--json-out", default=None,
                    help="write a JSON artifact (ATE stats, gate verdict, "
                         "timing) to this path")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--chunked", type=int, default=0, metavar="N",
                    help="chunk-batched device-speed loop "
                         "(models/chunked_slam.py): process N frames per "
                         "device dispatch with in-kernel splitting and "
                         "chunk-boundary SLAM events. 0 = per-message loop")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint path: save every --checkpoint-every frames; "
                         "if the file exists, RESUME from it")
    ap.add_argument("--checkpoint-every", type=int, default=400)
    args = ap.parse_args(argv)

    slam_cfg, pre_cfg = None, None
    if args.config:
        from ..utils import config as config_mod

        mgr = config_mod.ConfigManager.read(args.config)
        slam_cfg = mgr.get_by_name("slam")
        pre_cfg = mgr.get_by_name("preprocessor")
    if args.chunked:
        from ..models.chunked_slam import ChunkedSlamRunner

        runner = ChunkedSlamRunner(
            slam_config=slam_cfg or presets.laser0_slam(),
            preprocessor_config=pre_cfg or presets.laser0_preprocessor(),
            chunk=args.chunked,
        )
    else:
        import jax as _jax_hint

        if _jax_hint.default_backend() == "tpu":
            print(
                "note: the per-message loop pays a host sync per frame; on "
                "TPU the chunk-batched loop (--chunked 256) runs the same "
                "pipeline at device speed (BENCH_NOTES.md r5)",
                file=sys.stderr,
            )
        runner = SlamRunner(
            slam_config=slam_cfg or presets.laser0_slam(),
            preprocessor_config=pre_cfg or presets.laser0_preprocessor(),
        )
    import os as _os

    resume_n = 0
    if args.checkpoint and args.chunked:
        print("ERROR: --checkpoint requires the per-message loop", file=sys.stderr)
        return -1
    if args.checkpoint:
        base = args.checkpoint[:-4] if args.checkpoint.endswith(".npz") else args.checkpoint
        if _os.path.exists(base + ".npz"):
            from ..utils import checkpoint as ckpt

            resume_n = len(ckpt.trajectory_from(args.checkpoint))
            runner.skip_frames = resume_n
            runner.resume_checkpoint = args.checkpoint
            print(f"resuming from {args.checkpoint} at frame {resume_n}")

    gt = None
    if args.carmen:
        packs, gt_arr = carmen_io.load_packs(args.carmen, args.max_frames)
        source = sources.ListSource(packs)
        runner.sensor_in_robot = np.zeros(3, np.float32)
        gt = (gt_arr[:, 0], gt_arr[:, 1:])
    elif args.input:
        source = sources.JsonlFileSource(args.input)
    else:
        print("ERROR: provide -i or --carmen", file=sys.stderr)
        return -1
    if args.gt:
        gt = tum.read_tum(args.gt)

    t_start = time.perf_counter()
    if args.checkpoint:
        from ..utils import checkpoint as ckpt

        n = 0
        for msg in source:
            if runner.put_message(msg):
                n += 1
                if n % args.checkpoint_every == 0:
                    ckpt.save(args.checkpoint, runner.slam, runner.trajectory)
                if args.max_frames is not None and n >= args.max_frames:
                    break
        if runner.slam is not None:
            ckpt.save(args.checkpoint, runner.slam, runner.trajectory)
    else:
        n = runner.run(source, args.max_frames)
    total_dataset_time = time.perf_counter() - t_start
    summary = runner.timing_summary()

    print(f"total_dataset_time [ {total_dataset_time:.3f} ] s")
    print(f"total_compute_time [ {summary.get('total_compute_time', 0):.3f} ] s")
    print(
        f"mean_frame_time [ {summary.get('mean_frame_time', 0):.4f} ] s -- "
        f"mean_fps [ {summary.get('mean_frame_hz', 0):.1f} ] Hz"
    )

    if args.output:
        tum.write_tum(
            args.output,
            [t for t, _, _ in runner.trajectory],
            [p for _, p, _ in runner.trajectory],
        )
    if args.timing:
        with open(args.timing, "w") as f:
            f.write(
                f"total_frames= {n} "
                f"total_compute_time= {summary.get('total_compute_time', 0):.4f} "
                f"mean_frame_time= {summary.get('mean_frame_time', 0):.6f} "
                f"mean_frame_hz= {summary.get('mean_frame_hz', 0):.2f}\n"
            )

    # provenance (VERDICT r4 weak #6: artifacts must record what produced them)
    import subprocess as _sp

    import jax as _jax

    try:
        commit = _sp.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    artifact = {
        "input": args.input or args.carmen,
        "backend": _jax.default_backend(),
        "device": str(_jax.devices()[0]),
        "config": args.config,
        "commit": commit,
        "mode": f"chunked[{args.chunked}]" if args.chunked else "per_message",
        "frames": n,
        "total_dataset_time_s": round(total_dataset_time, 3),
        "total_compute_time_s": round(summary.get("total_compute_time", 0), 3),
        "mean_frame_time_s": round(summary.get("mean_frame_time", 0), 6),
        "mean_frame_hz": round(summary.get("mean_frame_hz", 0), 2),
        "graph_variables": runner.slam.num_variables() if runner.slam else 0,
        "graph_factors": runner.slam.num_factors() if runner.slam else 0,
    }
    rc = 0
    if gt is not None:
        bench = suite_mod.BenchmarkSuite()
        bench.set_ground_truth(*gt)
        for t, p, d in runner.trajectory:
            bench.set_pose_estimate(p, t, d)
        stats = bench.compute()
        print(
            f"ATE rmse_translation [ {stats['rmse_translation']:.4f} ] m | "
            f"mean_rotation [ {stats['mean_rotation']:.4f} ] rad"
        )
        artifact["ate"] = {
            k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
            for k, v in stats.items()
        }
        if args.gate != "none":
            thr = {
                "killian": suite_mod.KILLIAN_THRESHOLDS,
                "simul": suite_mod.SIMUL_THRESHOLDS,
                "corridor": suite_mod.CORRIDOR_THRESHOLDS,
            }[args.gate]
            regression = bench.is_regression(thr, stats)
            artifact["gate"] = args.gate
            artifact["gate_verdict"] = "REGRESSION" if regression else "PASS"
            if regression:
                print("REGRESSION detected")
                rc = -1
            else:
                print("benchmark complete! (no regression)")
    if args.json_out:
        import json as _json

        with open(args.json_out, "w") as f:
            _json.dump(artifact, f, indent=1)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
