"""Config system tests: registry docs, named objects, #id/#pointer round-trip."""

import numpy as np

from srrg2_laser_slam_2d_tpu.models import slam as slam_mod
from srrg2_laser_slam_2d_tpu.ops import icp
from srrg2_laser_slam_2d_tpu.utils import config as config_mod
from srrg2_laser_slam_2d_tpu.utils import presets


def test_registry_has_all_components():
    reg = config_mod.registry()
    for name in [
        "PreprocessorConfig",
        "AlignerConfig",
        "TrackerConfig",
        "LoopDetectorConfig",
        "ValidatorConfig",
        "RelocalizerConfig",
        "PGOConfig",
        "GraphSLAMConfig",
        "PolarProjection",
    ]:
        assert name in reg, name


def test_describe_has_docs_and_defaults():
    sheet = config_mod.describe("AlignerConfig")
    by_name = {p["name"]: p for p in sheet}
    assert by_name["max_iterations"]["default"] == 10
    assert "Cauchy" in by_name["chi_threshold"]["doc"]
    assert by_name["normal_cos"]["doc"] != ""


def test_roundtrip_full_assembly(tmp_path):
    mgr = presets.default_config_manager()
    path = str(tmp_path / "slam.json")
    mgr.write(path)

    mgr2 = config_mod.ConfigManager.read(path)
    slam_cfg = mgr2.get_by_name("slam")
    assert isinstance(slam_cfg, slam_mod.GraphSLAMConfig)
    # parameter fidelity through the round-trip
    assert slam_cfg.local_map_distance == 1.0
    assert slam_cfg.tracker.aligner.normal_cos == 0.9
    assert slam_cfg.tracker.aligner.chi_threshold == 0.01
    assert slam_cfg.detector.aligner.max_iterations == 30
    assert slam_cfg.detector.aligner.point_distance == 1.414
    assert slam_cfg.tracker.projection.cols == 721
    np.testing.assert_allclose(slam_cfg.tracker.projection.range_max, 20.0)
    # shared nested objects stay shared
    tracker = mgr2.get_by_name("tracker")
    assert tracker is slam_cfg.tracker
    aligner = mgr2.get_by_name("aligner")
    assert aligner is slam_cfg.tracker.aligner


def test_modified_config_roundtrip(tmp_path):
    mgr = config_mod.ConfigManager()
    acfg = icp.AlignerConfig(max_iterations=42, point_distance=2.5)
    mgr.add(acfg, "custom")
    path = str(tmp_path / "c.json")
    mgr.write(path)
    back = config_mod.ConfigManager.read(path).get_by_name("custom")
    assert back.max_iterations == 42
    assert back.point_distance == 2.5


def test_preset_is_usable_as_static_jit_arg():
    cfg = presets.laser0_slam(num_beams=128, scene_capacity=256)
    hash(cfg.tracker)  # frozen dataclasses with hashable leaves
    hash(cfg.tracker.aligner)
