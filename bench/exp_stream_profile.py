"""Cost-model sweep of the K-stream fused frame kernel on the real chip:
times track_streams_grid under varying (K, gather backend, band/window,
iterations, merge_shift) to locate where the per-frame time goes and which
configuration maximizes aggregate scans/s.

Usage: PYTHONPATH=. python bench/exp_stream_profile.py --frames 64
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
import traceback

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from srrg2_laser_slam_2d_tpu.bench.stream_bench import build_inputs
    from srrg2_laser_slam_2d_tpu.ops import pallas_stream as ps

    spec0, state0, measC, odoms = build_inputs(args.frames + 1)
    T = measC.shape[0]

    def run_one(tag, **overrides):
        k = overrides.pop("k", 8)
        spec = dataclasses.replace(spec0, **overrides)
        cacheB, poseB = ps.pack_stream_state(
            jnp.broadcast_to(state0.cacheT, (k,) + state0.cacheT.shape),
            jnp.broadcast_to(state0.pose, (k,) + state0.pose.shape),
        )
        measC_stack, odom_stack = ps.pack_stream_measurements(
            jnp.broadcast_to(measC, (k,) + measC.shape),
            jnp.broadcast_to(odoms, (k,) + odoms.shape),
        )
        try:
            def go():
                c, p, pay = ps.track_streams_grid(
                    spec, cacheB, poseB, measC_stack, odom_stack)
                return p.block_until_ready()
            go()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                go()
                best = min(best, time.perf_counter() - t0)
            r = {"tag": tag, "k": k, **overrides, "seconds": best,
                 "us_per_step": best / T * 1e6,
                 "aggregate_scans_per_sec": k * T / best}
            print(json.dumps(r), flush=True)
            return r
        except Exception as e:
            msg = repr(e)
            print(f"FAIL {tag}: {msg[:200]}", flush=True)
            return {"tag": tag, "k": k, **overrides, "error": msg[:500]}

    results = []
    # baseline
    results.append(run_one("roll-S64-it10", k=8, stream_gather="roll"))
    # GN-loop share: 1 iteration
    results.append(run_one("roll-S64-it1", k=8, stream_gather="roll", iterations=1))
    # band width scaling
    results.append(run_one("roll-S16", k=8, stream_gather="roll", stream_band_shift=16))
    results.append(run_one("roll-S8", k=8, stream_gather="roll", stream_band_shift=8))
    # merge z-buffer share
    results.append(run_one("roll-S64-ms8", k=8, stream_gather="roll", merge_shift=8))
    results.append(run_one("roll-S16-ms8", k=8, stream_gather="roll",
                           stream_band_shift=16, merge_shift=8))
    # onehot backend
    results.append(run_one("onehot-w256", k=8, stream_gather="onehot"))
    results.append(run_one("onehot-w128", k=8, stream_gather="onehot", window=128))
    # K scaling, both backends
    for k in (1, 4, 16, 32):
        results.append(run_one(f"roll-S64-k{k}", k=k, stream_gather="roll"))
    for k in (16, 32):
        results.append(run_one(f"onehot-k{k}", k=k, stream_gather="onehot"))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
