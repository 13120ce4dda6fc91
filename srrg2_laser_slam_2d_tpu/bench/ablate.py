"""Per-component ablation of the tracking step on the live device.

Run: python -m srrg2_laser_slam_2d_tpu.bench.ablate [--frames 64] [--cap 4096]

Times (steady-state, in-jit via lax.scan over frames) for:
  - full step in each tracker configuration (XLA / fused / +canvas reuse /
    lean)
  - the fused aligner kernel alone
  - merge variants alone

All numbers are from ONE process/session (BENCH_NOTES.md: the tunnel's
effective rate varies between sessions; only within-session comparisons are
meaningful).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, reps=5):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    import jax

    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--cap", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..bench import pipeline, synthetic
    from ..models import tracker as tracker_mod
    from ..models.preprocessor import PreprocessorConfig
    from ..ops import icp
    from ..ops.projector import PolarProjection

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    num_beams = 721
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(steps=args.frames - 1, num_beams=num_beams)
    )
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    match_proj = PolarProjection.make(
        cols=num_beams, angle_min=-np.pi, angle_max=np.pi,
        range_min=0.3, range_max=20.0,
    )
    ranges = jnp.asarray(ds.ranges)
    meas_stack = pipeline.preprocess_batch(ds.projection, pcfg, ranges)
    odoms = jnp.asarray(ds.robot_poses)
    odom_valid = jnp.ones(len(ds.ranges), bool)
    n_frames = len(ds.ranges)

    def run_cfg(name, **kw):
        tcfg = tracker_mod.TrackerConfig(
            scene_capacity=args.cap,
            projection=match_proj,
            aligner=icp.AlignerConfig(
                max_iterations=10, point_distance=0.5, normal_cos=0.8
            ),
            **kw,
        )
        state0 = tracker_mod.init_state(
            tcfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
        )
        state0 = tracker_mod.populate(
            tcfg, state0, jax.tree.map(lambda x: x[0], meas_stack)
        )

        def go():
            final, traces = pipeline.track_sequence(
                tcfg, state0, meas_stack, odoms, odom_valid
            )
            return final.robot_in_local_map

        dt = _timeit(go, args.reps)
        ms = dt / n_frames * 1e3
        print(f"{name:42s} {ms:7.3f} ms/frame   {n_frames/dt:8.0f} scans/s")
        return ms

    on_tpu = jax.default_backend() != "cpu"
    run_cfg("xla full step", use_fused_aligner=False)
    if on_tpu:
        run_cfg("fused align", use_fused_aligner=True)
        run_cfg("banded align", use_fused_aligner=True, banded_aligner=True)
        run_cfg("fused align + canvas reuse (bench cfg)",
                use_fused_aligner=True, reuse_clip_canvas=True)
        run_cfg("banded align + canvas reuse",
                use_fused_aligner=True, banded_aligner=True,
                reuse_clip_canvas=True)
        run_cfg("banded align + lean scene ops",
                use_fused_aligner=True, banded_aligner=True,
                reuse_clip_canvas=True, lean_scene_ops=True)
        run_cfg("fused align + lean scene ops",
                use_fused_aligner=True, reuse_clip_canvas=True,
                lean_scene_ops=True)
        run_cfg("xla align + lean scene ops",
                use_fused_aligner=False, reuse_clip_canvas=True,
                lean_scene_ops=True)

    # component timings: aligner kernel alone, merge alone
    from ..ops import merge as merge_op
    from ..ops import pallas_projective_align as ppa
    from ..utils import geometry

    meas0 = jax.tree.map(lambda x: x[1], meas_stack)
    tcfg = tracker_mod.TrackerConfig(scene_capacity=args.cap, projection=match_proj)
    state0 = tracker_mod.init_state(
        tcfg, sensor_in_robot=np.array(ds.config.sensor_in_robot, np.float32)
    )
    state0 = tracker_mod.populate(
        tcfg, state0, jax.tree.map(lambda x: x[0], meas_stack)
    )
    scene = state0.scene
    T0 = jnp.zeros(3)

    if on_tpu:
        from ..ops import pallas_banded_align as pba

        def make_align_scan(fn):
            @jax.jit
            def align_scan(fixed, moving, t0):
                def body(T, _):
                    r = fn(
                        match_proj, fixed.xy, fixed.normal, fixed.valid,
                        moving.xy, moving.normal, moving.valid, T,
                        iterations=10, odom_weight=1.0,
                    )
                    return r.estimate, r.chi

                return jax.lax.scan(body, t0, None, length=32)

            return align_scan

        from ..ops import clip as clip_op

        clipped = clip_op.clip_projective(
            match_proj, scene, state0.robot_in_local_map, state0.sensor_in_robot, 0.0
        )
        fn = make_align_scan(ppa.fused_projective_align)
        dt = _timeit(lambda: fn(meas0, clipped, T0), args.reps)
        print(f"{'fused align kernel alone (10 it)':42s} {dt/32*1e3:7.3f} ms/call")
        fn = make_align_scan(pba.fused_projective_align_banded)
        dt = _timeit(lambda: fn(meas0, clipped, T0), args.reps)
        print(f"{'banded align kernel alone (10 it)':42s} {dt/32*1e3:7.3f} ms/call")

        # lean merge alone (beam-sized XLA ops)
        canvas_rows = jnp.arange(match_proj.cols, dtype=jnp.int32)
        cache = clipped  # beam-indexed cloud standing in for the canvas

        @jax.jit
        def lean_scan(scene0, cache0, rows0, meas):
            def body(carry, _):
                sc, cc, rr = carry
                sc2, cc2, rr2 = merge_op.merge_projective_lean(
                    match_proj, sc, cc, rr, meas,
                    old_sensor_in_new=jnp.asarray([0.01, 0.0, 0.001]),
                    measurement_in_scene=jnp.asarray([0.01, 0.0, 0.001]),
                )
                return (sc2, cc2, rr2), sc2.count()

            return jax.lax.scan(body, (scene0, cache0, rows0), None, length=32)

        dt = _timeit(lambda: lean_scan(scene, cache, canvas_rows, meas0), args.reps)
        print(f"{'lean merge alone (xla)':42s} {dt/32*1e3:7.3f} ms/call")

        # fused frame kernel (ops/pallas_frame.py): 1 kernel/frame, deferred scene
        from ..models import fast_tracker as ft
        from ..ops import pallas_frame
        from ..ops.pallas_frame import FrameSpec

        spec = FrameSpec(scene_capacity=args.cap, projection=match_proj,
                         iterations=10, odom_weight=1.0)
        fstate = ft.seed(
            spec, jax.tree.map(lambda x: x[0], meas_stack),
            np.array(ds.config.sensor_in_robot, np.float32),
            odom=odoms[0],
        )
        measF = ft.pack_measurement_batch(
            jax.tree.map(lambda x: x[1:], meas_stack), odoms[1:]
        )

        def go_fast():
            st, stats = ft.track_sequence_fast(spec, fstate, measF)
            return st.pose

        dt = _timeit(go_fast, args.reps)
        nf = measF.shape[0]
        print(f"{'fused frame kernel (full step)':42s} {dt/nf*1e3:7.3f} ms/frame   {nf/dt:8.0f} scans/s")

        dt = _timeit(
            lambda: pallas_frame.track_frames_grid(
                spec, fstate.cacheT, fstate.pose, measF
            )[1],
            args.reps,
        )
        print(f"{'fused frame kernel (grid, no scene)':42s} {dt/nf*1e3:7.3f} ms/frame   {nf/dt:8.0f} scans/s")

        # optimized spec: pre-z-buffered [8, B] measurement canvases packed
        # outside the loop + narrow banded window
        import dataclasses as _dc

        spec_c = _dc.replace(spec, meas_as_canvas=True, window=128)
        measC = ft.pack_measurement_canvas_batch(
            spec_c, jax.tree.map(lambda x: x[1:], meas_stack), odoms[1:]
        )
        fstate_c = ft.seed(
            spec_c, jax.tree.map(lambda x: x[0], meas_stack),
            np.array(ds.config.sensor_in_robot, np.float32), odom=odoms[0],
        )

        def go_canvas():
            st, stats = ft.track_sequence_fast(spec_c, fstate_c, measC)
            return st.pose

        dt = _timeit(go_canvas, args.reps)
        print(f"{'fused frame kernel (canvas+win128)':42s} {dt/nf*1e3:7.3f} ms/frame   {nf/dt:8.0f} scans/s")
        # same but including the packing step in the timing (end-to-end)
        def go_canvas_pack():
            mc = ft.pack_measurement_canvas_batch(
                spec_c, jax.tree.map(lambda x: x[1:], meas_stack), odoms[1:]
            )
            st, stats = ft.track_sequence_fast(spec_c, fstate_c, mc)
            return st.pose

        dt = _timeit(go_canvas_pack, args.reps)
        print(f"{'fused frame kernel (canvas+win128+pack)':42s} {dt/nf*1e3:7.3f} ms/frame   {nf/dt:8.0f} scans/s")

        # decompose the in-kernel cost: GN-iteration slope and merge-shift
        # slope of the grid program (intercept = canvas + merge + pipeline)

        for its in (1, 5, 10, 20):
            spec_i = _dc.replace(spec, iterations=its)
            dt = _timeit(
                lambda: pallas_frame.track_frames_grid(
                    spec_i, fstate.cacheT, fstate.pose, measF
                )[1],
                args.reps,
            )
            print(f"{f'grid kernel, {its:2d} GN iters':42s} {dt/nf*1e3:7.3f} ms/frame")
        for shift in (8, 16, 32, 64):
            spec_s = _dc.replace(spec, merge_shift=shift)
            dt = _timeit(
                lambda: pallas_frame.track_frames_grid(
                    spec_s, fstate.cacheT, fstate.pose, measF
                )[1],
                args.reps,
            )
            print(f"{f'grid kernel, merge_shift {shift:3d}':42s} {dt/nf*1e3:7.3f} ms/frame")

        # scan floor: trivial per-frame op on the same state pytree
        @jax.jit
        def noop_scan(scene0):
            def body(sc, _):
                sc2 = sc._replace(xy=sc.xy + 1e-9)
                return sc2, sc2.xy[0, 0]

            return jax.lax.scan(body, scene0, None, length=64)

        dt = _timeit(lambda: noop_scan(scene), args.reps)
        print(f"{'noop scan floor':42s} {dt/64*1e3:7.3f} ms/frame")

    @jax.jit
    def merge_scan(scene0, meas):
        def body(sc, _):
            sc2 = merge_op.merge_projective(
                match_proj, sc, meas,
                measurement_in_scene=jnp.asarray([0.01, 0.0, 0.001]),
            )
            return sc2, sc2.count()

        return jax.lax.scan(body, scene0, None, length=32)

    dt = _timeit(lambda: merge_scan(scene, meas0), args.reps)
    print(f"{'xla full merge alone':42s} {dt/32*1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
