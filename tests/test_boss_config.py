"""BOSS config reader: parse the reference's SHIPPED pipeline assemblies and
verify the translated native configs carry the exact parameter values
(configurations/stage_segway_double_config_LASER_0.json / _MULTI.json)."""

import os

import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.io import boss_config

LASER0 = "/root/reference/configurations/stage_segway_double_config_LASER_0.json"
MULTI = "/root/reference/configurations/stage_segway_double_config_MULTI.json"

needs_reference = pytest.mark.skipif(
    not os.path.exists(LASER0), reason="reference configs not mounted"
)


@needs_reference
def test_parse_block_structure():
    g = boss_config.load(LASER0)
    assert len(g.find("MultiGraphSLAM2D")) == 1
    assert len(g.find("MultiAligner2D")) == 2      # tracking + loop-detection
    assert len(g.find("CorrespondenceFinderProjective2f")) == 2
    slam = g.by_name["slam"]
    tracker = g.deref(slam["tracker"])
    assert tracker["#class"] == "MultiTracker2D"


@needs_reference
def test_translate_laser0():
    g = boss_config.load(LASER0)
    cfg = boss_config.to_slam_config(g)
    # values straight from the shipped file
    assert cfg.local_map_distance == 1.0
    a = cfg.tracker.aligner
    assert a.max_iterations == 10
    assert a.point_distance == 0.5
    assert a.normal_cos == 0.9
    assert a.chi_threshold == 0.01
    assert a.odom_weight == 1.0            # odom prior slice present
    assert cfg.tracker.merge_threshold == 0.2
    assert cfg.tracker.projection.cols == 721
    np.testing.assert_allclose(cfg.tracker.projection.range_max, 20.0)
    d = cfg.detector
    assert d.relocalize_min_inliers == 300
    assert d.relocalize_min_inliers_ratio == 0.8
    assert d.relocalize_max_chi_inliers == 0.1
    assert d.aligner.max_iterations == 30
    assert d.aligner.point_distance == 1.414
    assert d.aligner.chi_threshold == 0.05
    v = cfg.validator
    assert v.min_times_checked == 3 and v.inlier_accept_ratio == 0.5
    r = cfg.relocalizer
    assert r.relocalize_min_inliers == 500 and r.max_translation == 3.0
    gsolver = cfg.global_solver
    assert gsolver.max_iterations == 20
    assert gsolver.epsilon == 1e-5
    assert cfg.cue_extrinsics is None      # single laser


@needs_reference
def test_translate_preprocessor():
    g = boss_config.load(LASER0)
    p = boss_config.to_preprocessor_config(g)
    assert p.voxelize_resolution == 0.02
    assert p.normal_point_distance == 0.3
    assert p.normal_min_points == 5
    assert p.scan_topic == "/diago_0/scan_0_0"


@needs_reference
def test_translate_multi_has_two_cues():
    g = boss_config.load(MULTI)
    cfg = boss_config.to_slam_config(g)
    assert cfg.cue_extrinsics is not None
    assert len(cfg.cue_extrinsics) == 2
