"""Multi-cue (dual-rangefinder) tracking throughput — VERDICT r4 task #6.

Measures the MULTI assembly's per-chip tracking rate (one dual-laser
message pack per frame, the stage_segway_double_config_MULTI.json role) in
the chained steady-state methodology (dispatch a lax.scan over the whole
pre-staged sequence, chain CHAIN calls, sync once — BENCH_NOTES r4: per-call
syncs measure the ~24 ms tunnel artifact, not the device):

  - dual-cue, fused Pallas aligner (ops/pallas_multicue_align.py — the TPU
    MULTI default, utils/presets.multi_slam)
  - dual-cue, XLA aligner (icp.align_multi — the parity path)
  - single-cue XLA reference on the same driver (the cost of the second cue)

Writes bench/results/multicue_r05.json; one frame == one dual-scan message.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--out", default="bench/results/multicue_r05.json")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..bench import synthetic
    from ..models import tracker as tracker_mod
    from ..models.preprocessor import PreprocessorConfig
    from ..bench.pipeline import preprocess_batch
    from ..ops import icp
    from ..ops.projector import PolarProjection

    FRONT = (0.2, 0.0, 0.0)
    REAR = (-0.2, 0.0, float(np.pi))
    T = args.frames
    cfg_f = synthetic.SyntheticConfig(steps=T - 1, num_beams=721,
                                      sensor_in_robot=FRONT)
    cfg_r = synthetic.SyntheticConfig(steps=T - 1, num_beams=721,
                                      sensor_in_robot=REAR)
    ds_f, ds_r = synthetic.simulate(cfg_f), synthetic.simulate(cfg_r)
    pcfg = PreprocessorConfig(voxelize_resolution=0.02, normal_window=8)
    scan_proj = ds_f.projection
    proj = PolarProjection.make(cols=721, angle_min=-np.pi, angle_max=np.pi,
                                range_min=0.3, range_max=20.0)
    meas_f = preprocess_batch(scan_proj, pcfg, jnp.asarray(ds_f.ranges))
    meas_r = preprocess_batch(scan_proj, pcfg, jnp.asarray(ds_r.ranges))
    meas2 = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=1), meas_f, meas_r)
    odoms = jnp.asarray(ds_f.robot_poses)
    ov = jnp.ones(T, bool)
    extr = jnp.asarray(np.stack([FRONT, REAR]).astype(np.float32))

    def make_cfg(fused: bool):
        return tracker_mod.TrackerConfig(
            scene_capacity=8192, projection=proj,
            aligner=icp.AlignerConfig(max_iterations=10, point_distance=0.5,
                                      normal_cos=0.8),
            use_fused_aligner=fused,
        )

    def measure_multi(fused: bool, chain: int = 10):
        cfg = make_cfg(fused)
        state0 = tracker_mod.init_state(cfg)
        state0 = tracker_mod.populate_multi(
            cfg, state0, jax.tree.map(lambda x: x[0], meas2), extr
        )

        @jax.jit
        def seq(state):
            def step(st, inp):
                m, od, v = inp
                st2, stats = tracker_mod.track_step_multi_impl(
                    cfg, st, m, extr, od, v
                )
                return st2, stats.chi

            rest = (jax.tree.map(lambda x: x[1:], meas2), odoms[1:], ov[1:])
            return jax.lax.scan(step, state, rest)

        st, chis = seq(state0)
        jax.block_until_ready(st.robot_in_local_map)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            st = state0
            for _ in range(chain):
                st, chis = seq(st)
            jax.block_until_ready(st.robot_in_local_map)
            best = min(best, time.perf_counter() - t0)
        return (T - 1) * chain / best

    def measure_single(chain: int = 10):
        cfg = make_cfg(False)
        state0 = tracker_mod.init_state(
            cfg, sensor_in_robot=np.asarray(FRONT, np.float32)
        )
        state0 = tracker_mod.populate(
            cfg, state0, jax.tree.map(lambda x: x[0], meas_f)
        )

        @jax.jit
        def seq(state):
            def step(st, inp):
                m, od, v = inp
                st2, stats = tracker_mod.track_step_impl(cfg, st, m, od, v)
                return st2, stats.chi

            rest = (jax.tree.map(lambda x: x[1:], meas_f), odoms[1:], ov[1:])
            return jax.lax.scan(step, state, rest)

        st, chis = seq(state0)
        jax.block_until_ready(st.robot_in_local_map)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            st = state0
            for _ in range(chain):
                st, chis = seq(st)
            jax.block_until_ready(st.robot_in_local_map)
            best = min(best, time.perf_counter() - t0)
        return (T - 1) * chain / best

    results = {}
    for name, fn in [
        ("dual_cue_fused_scans_per_sec", lambda: measure_multi(True)),
        ("dual_cue_xla_scans_per_sec", lambda: measure_multi(False)),
        ("single_cue_xla_scans_per_sec", measure_single),
    ]:
        try:
            results[name] = round(fn(), 1)
        except Exception as e:
            results[name] = f"error: {repr(e)[:200]}"
        print(name, results[name], flush=True)

    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True,
                                timeout=10).stdout.strip() or None
    except Exception:
        commit = None
    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "commit": commit,
        "frames": T,
        "beams_per_cue": 721,
        "gn_iterations": 10,
        "methodology": "chained lax.scan sequences, 10 chained calls, one "
                       "sync (BENCH_NOTES r4)",
        **results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
