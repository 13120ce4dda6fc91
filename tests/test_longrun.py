"""Long-run stability: an extended full-pipeline drive with loop closures,
relocalization, a mid-run checkpoint/restore, and validator voting enabled —
the sustained-operation behavior a serving deployment needs."""

import numpy as np

from srrg2_laser_slam_2d_tpu.bench import synthetic
from srrg2_laser_slam_2d_tpu.models import loop_closure as lc
from srrg2_laser_slam_2d_tpu.utils import checkpoint

from test_slam import make_pipeline


def test_two_loop_drive_with_validator_and_checkpoint(tmp_path):
    # two full circles: closures should fire on both passes and keep the
    # trajectory bounded; the validator votes with reference-style min checks
    n_steps = 80
    ds = synthetic.simulate(
        synthetic.SyntheticConfig(
            steps=n_steps,
            num_beams=512,
            max_variance=0.02,
            drift=(0.15, 0.0, 2 * np.pi / 40),
            seed=11,
        )
    )
    def configure(s):
        object.__setattr__(s.cfg, "enable_relocalizer", True)
        # gates scaled to the sparse synthetic scenes (see make_pipeline note)
        object.__setattr__(
            s.cfg,
            "relocalizer",
            lc.RelocalizerConfig(
                max_translation=1.0,
                relocalize_min_inliers=60,
                relocalize_min_inliers_ratio=0.5,
                relocalize_max_chi_inliers=0.1,
            ),
        )
        s.validator = lc.ClosureValidator(
            lc.ValidatorConfig(enabled=True, min_times_checked=2)
        )

    slam, pre = make_pipeline(
        ds, local_map_distance=0.5, enable_loops=True, var_cap=64, edge_cap=512
    )
    configure(slam)
    clouds = [pre.compute(r) for r in ds.ranges]

    half = n_steps // 2
    for k in range(half):
        slam.process(clouds[k], ds.robot_poses[k])

    # checkpoint at the halfway point, restore into a fresh pipeline
    path = str(tmp_path / "mid.npz")
    checkpoint.save(path, slam)
    slam2, _ = make_pipeline(ds, local_map_distance=0.5, enable_loops=True, var_cap=64, edge_cap=512)
    configure(slam2)
    checkpoint.load(path, slam2)

    for k in range(half, n_steps + 1):
        slam.process(clouds[k], ds.robot_poses[k])
        slam2.process(clouds[k], ds.robot_poses[k])

    for s in (slam, slam2):
        err = np.abs(s.robot_in_world() - ds.robot_poses[-1])
        err[2] = abs(np.arctan2(np.sin(err[2]), np.cos(err[2])))
        assert np.linalg.norm(err[:2]) < 0.3, (err, s.num_closures)
        assert s.num_closures >= 1
        # graph growth stays bounded: relocalization reuses maps on pass two
        assert s.num_variables() < 30, s.num_variables()
    # restored run ends where the uninterrupted one does (same inputs after
    # the checkpoint; loop-closure timing may differ by the pending validator
    # state, which the checkpoint deliberately does not carry)
    d = np.linalg.norm(slam.robot_in_world()[:2] - slam2.robot_in_world()[:2])
    assert d < 0.3, d
