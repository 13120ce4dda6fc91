"""Native C++ data loader: builds, parses, and agrees with the Python parser."""

import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.io import native_loader


@pytest.fixture
def carmen_file(tmp_path):
    path = str(tmp_path / "log.clf")
    lines = ["# comment line"]
    rng = np.random.default_rng(0)
    for k in range(5):
        ranges = rng.uniform(0.5, 10.0, 12)
        rs = " ".join(f"{r:.3f}" for r in ranges)
        lines.append(
            f"FLASER 12 {rs} {k*0.1:.3f} {k*0.2:.3f} 0.05 {k*0.1+0.01:.3f} {k*0.2:.3f} 0.06 {100.0+k:.2f} host {100.0+k:.2f}"
        )
        lines.append(f"ODOM {k*0.1:.3f} {k*0.2:.3f} 0.06 0 0 0 {100.0+k+0.05:.2f} host x")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def test_native_library_builds():
    assert native_loader.available(), "native dataloader failed to build"


def test_native_matches_python(carmen_file):
    nat = native_loader.load_carmen_arrays(carmen_file)
    # force python fallback by bypassing the lib
    import srrg2_laser_slam_2d_tpu.io.native_loader as nl

    lib_backup = nl._LIB
    nl._LIB = None
    try:
        py = native_loader.load_carmen_arrays(carmen_file)
    finally:
        nl._LIB = lib_backup
    assert nat["backend"] == "native"
    assert py["backend"] == "python"
    np.testing.assert_allclose(nat["ranges"], py["ranges"], atol=1e-5)
    np.testing.assert_allclose(nat["laser_pose"], py["laser_pose"], atol=1e-5)
    np.testing.assert_allclose(nat["odom_pose"], py["odom_pose"], atol=1e-5)
    np.testing.assert_allclose(nat["timestamp"], py["timestamp"], atol=1e-6)
    np.testing.assert_allclose(nat["meta"][:, 0], py["meta"][:, 0])


def test_shapes(carmen_file):
    out = native_loader.load_carmen_arrays(carmen_file)
    assert out["ranges"].shape == (5, 12)
    assert out["laser_pose"].shape == (5, 3)
    assert out["timestamp"].shape == (5,)
