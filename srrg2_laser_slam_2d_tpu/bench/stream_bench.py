"""Per-chip THROUGHPUT measurement: K independent tracking streams batched
through the fused frame kernel (ops/pallas_stream.py) vs the single-stream
fused kernel (ops/pallas_frame.py) vs the single-core C++ baseline.

This is the measurement the round-2 review asked for: single-stream latency
is near its floor (microseconds per frame, zero XLA ops per frame), so a
721-beam scan cannot fill the chip alone — aggregate scans/s/chip comes from
filling the VPU sublanes/MXU batch dimension with K streams. Semantics per
stream are identical to the single-stream kernel (tests/test_stream_batch.py).

Role mirrored from the reference: the per-message hot path of
`generic_bench_app` (srrg2_laser_slam_2d pkg/apps/generic_bench_app.cpp:78-136
emits mean frame time / FPS) with the correspondence loop of
correspondence_finder_projective_2d.cpp:54-76 as the kernel to beat.

Usage: python -m srrg2_laser_slam_2d_tpu.bench.stream_bench [--frames 256]
       [--ks 8,32,128] [--out bench/results/stream_r03.json]
Prints one JSON object; optionally writes it to --out.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_inputs(frames: int, num_beams: int = 721):
    import jax
    import jax.numpy as jnp

    from . import pipeline, synthetic
    from ..models import fast_tracker as ft
    from ..models.preprocessor import PreprocessorConfig
    from ..ops.pallas_frame import FrameSpec
    from ..ops.projector import PolarProjection

    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=frames - 1, num_beams=num_beams)
    )
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    match_proj = PolarProjection.make(
        cols=num_beams, angle_min=-np.pi, angle_max=np.pi,
        range_min=0.3, range_max=20.0,
    )
    spec = FrameSpec(
        scene_capacity=4096, projection=match_proj, iterations=10,
        odom_weight=1.0, meas_as_canvas=True,
        # r5 roofline ladder (BENCH_NOTES r5): window=128 halves the
        # VPU-bound hot-matrix band, corr_refresh=2 reuses each banded
        # gather for two GN updates (trajectory-equivalence:
        # tests/test_chunked_slam.py corr_refresh test). Kernel-only ladder
        # 254k -> 511k scans/s (refresh=5); the serving default stays at
        # the conservative refresh=2
        window=128, corr_refresh=2,
    )
    meas_stack = pipeline.preprocess_batch(ds.projection, pcfg,
                                           jnp.asarray(ds.ranges))
    odoms = jnp.asarray(ds.robot_poses)
    state0 = ft.seed(
        spec, jax.tree.map(lambda x: x[0], meas_stack),
        np.array(ds.config.sensor_in_robot, np.float32), odom=odoms[0],
    )
    # canvas stack WITHOUT the row-6 odom block (batched kernel takes odom
    # in its own [T, K, 8] input)
    measC = ft.pack_measurement_canvas_batch(
        spec, jax.tree.map(lambda x: x[1:], meas_stack)
    )
    return spec, state0, measC, odoms[1:]


def time_best(fn, reps: int = 5) -> float:
    fn()  # warmup / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# Chained-dispatch measurement: through the axon tunnel, the first host sync
# after any d2h transfer pays a ~24 ms completion-poll penalty PER SYNC
# (latency artifact, not device time — see the r4 note in
# ops/pallas_stream.track_streams_grid). Every pre-r4 recorded number
# blocked once per timed call and so measured mostly that artifact.
# Steady-state throughput = chain CHAIN calls (state fed back, dispatch
# stays async), block ONCE; the single sync amortizes over CHAIN * T frames
# — exactly how a production serving loop consumes the kernel.
CHAIN = 10


def measure_single(spec, state0, measC, odoms, chain: int = CHAIN) -> dict:
    """Single-stream fused grid kernel (the round-2 headline path)."""
    import jax.numpy as jnp

    from ..models import fast_tracker as ft

    T = measC.shape[0]
    measF = measC.at[:, 6, 0:3].set(odoms)
    measF = measF.at[:, 6, 3].set(1.0)

    def run():
        st = state0
        for _ in range(chain):
            st, stats = ft.track_sequence_fast(spec, st, measF)
        return st.pose.block_until_ready()

    best = time_best(run)
    return {"frames": T * chain, "chained_calls": chain, "seconds": best,
            "scans_per_sec": T * chain / best}


def measure_streams(spec, state0, measC, odoms, k: int,
                    chain: int = CHAIN) -> dict:
    """K-stream batched grid kernel, materialization of every stream's scene
    included (same work per stream as measure_single)."""
    import jax
    import jax.numpy as jnp

    from ..models import fast_tracker as ft
    from ..ops import pallas_stream as ps

    T = measC.shape[0]
    cacheB, poseB = ps.pack_stream_state(
        jnp.broadcast_to(state0.cacheT, (k,) + state0.cacheT.shape),
        jnp.broadcast_to(state0.pose, (k,) + state0.pose.shape),
    )
    measC_stack, odom_stack = ps.pack_stream_measurements(
        jnp.broadcast_to(measC, (k,) + measC.shape),
        jnp.broadcast_to(odoms, (k,) + odoms.shape),
    )
    # hoist the stream-major gather copy out of the chained loop (the real
    # data loader packs once per sequence chunk too)
    measCk_stack = jnp.transpose(measC_stack, (0, 2, 1, 3))
    sceneK = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (k,) + x.shape), state0.scene
    )

    @jax.jit
    def run_jit(cacheB, poseB, measC_stack, measCk_stack, odom_stack):
        cB, pB, payB = ps.track_streams_grid(
            spec, cacheB, poseB, measC_stack, odom_stack,
            measCk_stack=measCk_stack,
        )
        scenes = jax.vmap(
            lambda sc, pay, cnt: ft.materialize(spec, sc, pay, cnt)
        )(sceneK, jnp.moveaxis(payB, 2, 0), pB[:, 7])
        return cB, pB, scenes

    def run():
        cB, pB = cacheB, poseB
        for _ in range(chain):
            cB, pB, scenes = run_jit(cB, pB, measC_stack, measCk_stack,
                                     odom_stack)
        return pB.block_until_ready()

    best = time_best(run)
    return {
        "k": k, "frames_per_stream": T * chain, "chained_calls": chain,
        "seconds": best,
        "aggregate_scans_per_sec": k * T * chain / best,
        "per_stream_scans_per_sec": T * chain / best,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--ks", type=str, default="8,32,128")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    spec, state0, measC, odoms = build_inputs(args.frames)
    result = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "num_beams": int(spec.projection.cols),
        "gn_iterations": spec.iterations,
        "single_stream": measure_single(spec, state0, measC, odoms),
        "streams": [],
    }
    for k in [int(s) for s in args.ks.split(",") if s]:
        try:
            result["streams"].append(measure_streams(spec, state0, measC,
                                                     odoms, k))
        except Exception as e:  # VMEM limits at large K are a finding, not a crash
            result["streams"].append({"k": k, "error": repr(e)[:300]})
        print(json.dumps(result["streams"][-1]), flush=True)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
