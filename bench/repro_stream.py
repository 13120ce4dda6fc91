"""Minimal repro for the K-stream kernel TPU compile failure (round-3
bench/results/stream_r03.json). Tries stream_step (single frame, no grid)
and track_streams_grid at small K for both gather backends, printing the
FULL exception text so the failing Mosaic op is visible.

Usage: python bench/repro_stream.py [--what step|grid|both] [--ks 2,8]
       [--gathers roll,onehot] [--iters 10] [--frames 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import traceback

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both")
    ap.add_argument("--ks", default="2,8")
    ap.add_argument("--gathers", default="roll,onehot")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from srrg2_laser_slam_2d_tpu.bench.stream_bench import build_inputs
    from srrg2_laser_slam_2d_tpu.ops import pallas_stream as ps

    spec0, state0, measC, odoms = build_inputs(args.frames + 1)
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    for gather in args.gathers.split(","):
        spec = dataclasses.replace(spec0, iterations=args.iters,
                                   stream_gather=gather)
        for k in [int(s) for s in args.ks.split(",")]:
            cacheB, poseB = ps.pack_stream_state(
                jnp.broadcast_to(state0.cacheT, (k,) + state0.cacheT.shape),
                jnp.broadcast_to(state0.pose, (k,) + state0.pose.shape),
            )
            measC_stack, odom_stack = ps.pack_stream_measurements(
                jnp.broadcast_to(measC, (k,) + measC.shape),
                jnp.broadcast_to(odoms, (k,) + odoms.shape),
            )
            if args.what in ("step", "both"):
                tag = f"stream_step gather={gather} k={k} it={args.iters}"
                try:
                    c, p, pay = ps.stream_step(
                        spec, measC_stack[0], odom_stack[0], cacheB, poseB)
                    p.block_until_ready()
                    print("OK  ", tag, flush=True)
                except Exception:
                    print("FAIL", tag, flush=True)
                    traceback.print_exc()
                    print("-" * 70, flush=True)
            if args.what in ("grid", "both"):
                tag = f"grid gather={gather} k={k} it={args.iters} T={args.frames}"
                try:
                    c, p, pay = ps.track_streams_grid(
                        spec, cacheB, poseB, measC_stack, odom_stack)
                    p.block_until_ready()
                    print("OK  ", tag, flush=True)
                except Exception:
                    print("FAIL", tag, flush=True)
                    traceback.print_exc()
                    print("-" * 70, flush=True)


if __name__ == "__main__":
    main()
