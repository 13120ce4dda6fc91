"""End-to-end app tests: synthetic generator -> slam_app -> bench gate —
the TPU analog of benchmark_simul (benchmarks/benchmark_simul.cpp: run the
simulated dataset through the full pipeline, gate on ATE)."""

import json
import os

import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.apps import generic_bench_app, slam_app, synthetic_scene_generator
from srrg2_laser_slam_2d_tpu.io import logfile, tum


@pytest.fixture(scope="module")
def log_and_gt(tmp_path_factory):
    d = tmp_path_factory.mktemp("simul")
    log = str(d / "log.jsonl")
    gt = str(d / "gt.tum")
    synthetic_scene_generator.main(
        ["-m", log, "--gt", gt, "--steps", "15", "--beams", "512"]
    )
    return log, gt


def test_generator_writes_messages(log_and_gt):
    log, gt = log_and_gt
    msgs = logfile.read_jsonl(log)
    # 1 scene cloud + 16 * (tf + laser + odom)
    assert len(msgs) == 1 + 16 * 3
    ts, poses = tum.read_tum(gt)
    assert len(ts) == 16


def test_slam_app_end_to_end(log_and_gt, tmp_path):
    log, gt = log_and_gt
    out = str(tmp_path / "traj.tum")
    png = str(tmp_path / "map.png")
    rc = slam_app.main(["-c", "/nonexistent.json", "-i", log, "-o", out, "--draw", png])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(png)
    ts_est, est = tum.read_tum(out)
    ts_gt, gtp = tum.read_tum(gt)
    assert len(ts_est) == len(ts_gt)
    # trajectory error small on the simulated dataset (simul-gate style)
    err = np.linalg.norm(est[:, :2] - gtp[:, :2], axis=1)
    assert err.max() < 0.1, err.max()


def test_bench_app_gate(log_and_gt, tmp_path):
    log, gt = log_and_gt
    timing = str(tmp_path / "timing.txt")
    art = str(tmp_path / "result.json")
    rc = generic_bench_app.main(
        ["-i", log, "--gt", gt, "-t", timing, "--gate", "simul",
         "--json-out", art]
    )
    assert rc == 0
    assert "mean_frame_hz" in open(timing).read()
    # the recorded artifact (corridor_r04.json-style) carries the verdict
    a = json.load(open(art))
    assert a["gate"] == "simul" and a["gate_verdict"] == "PASS"
    assert a["ate"]["rmse_translation"] < 0.1
    assert a["frames"] > 0 and a["graph_variables"] > 0


def test_config_generation(tmp_path):
    cfg = str(tmp_path / "default.json")
    rc = slam_app.main(["-j", "-c", cfg])
    assert rc == 0
    data = json.load(open(cfg))
    classes = {e["#class"] for e in data["objects"]}
    assert "GraphSLAMConfig" in classes
    assert "TrackerConfig" in classes
    assert "slam" in data["names"]


def test_bench_app_dataset_config(log_and_gt, tmp_path):
    """-c loads a per-dataset named assembly (benchmark_carmen.cpp reads
    configs/killian.conf the same way); gates come from the file, not code."""
    import dataclasses

    from srrg2_laser_slam_2d_tpu.utils import config as config_mod, presets

    log, gt = log_and_gt
    cfg = presets.laser0_slam(num_beams=512, scene_capacity=2048,
                              use_fast_tracker=False)
    cfg = dataclasses.replace(
        cfg, enable_loop_closure=False, enable_relocalizer=False
    )
    mgr = config_mod.ConfigManager()
    mgr.add(cfg, "slam")
    mgr.add(presets.laser0_preprocessor(), "preprocessor")
    path = str(tmp_path / "dataset.json")
    mgr.write(path)

    art = str(tmp_path / "result.json")
    rc = generic_bench_app.main(
        ["-i", log, "--gt", gt, "-c", path, "--json-out", art,
         "--max-frames", "8"]
    )
    assert rc == 0
    a = json.load(open(art))
    assert a["frames"] == 8
