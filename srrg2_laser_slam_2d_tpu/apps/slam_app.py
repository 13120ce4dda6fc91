"""Interactive-equivalent SLAM app — port of apps/slam_app.cpp: config-driven
pipeline assembly, message-log input, trajectory/map output (PNG instead of
the live QGL viewer), and default-config generation (-j).

Usage:
  python -m srrg2_laser_slam_2d_tpu.apps.slam_app -c slam.json -i log.jsonl \
      [-o traj.tum] [--draw map.png] [--carmen log.clf] [--max-frames N]
  python -m srrg2_laser_slam_2d_tpu.apps.slam_app -j -c slam.json   # gen config
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io import carmen as carmen_io
from ..io import sources, tum
from ..models.preprocessor import PreprocessorConfig
from ..models.runner import SlamRunner
from ..utils import config as config_mod
from ..utils import presets


def build_runner(args):
    chunked = getattr(args, "chunked", 0)

    def make(slam_cfg, pre_cfg, **kw):
        if chunked:
            # chunk-batched device-speed loop (models/chunked_slam.py);
            # single-cue configs only
            from ..models.chunked_slam import ChunkedSlamRunner

            return ChunkedSlamRunner(
                slam_config=slam_cfg, preprocessor_config=pre_cfg,
                chunk=chunked, scan_topic=kw.get("scan_topic"),
                odom_topic=kw.get("odom_topic", "/odom"),
            )
        return SlamRunner(slam_config=slam_cfg, preprocessor_config=pre_cfg,
                          **kw)

    if getattr(args, "boss_config", None):
        # ingest the reference's shipped BOSS assembly directly
        from ..io import boss_config

        g = boss_config.load(args.boss_config)
        return make(
            boss_config.to_slam_config(g),
            boss_config.to_preprocessor_config(g),
            scan_topic=args.scan_topic,
            odom_topic=args.odom_topic,
            sensor_frame=args.sensor_frame,
            base_frame=args.base_frame,
        )
    if args.config and not args.generate_config:
        try:
            mgr = config_mod.ConfigManager.read(args.config)
            slam_cfg = mgr.get_by_name("slam") or presets.laser0_slam()
            pre_cfg = mgr.get_by_name("preprocessor") or presets.laser0_preprocessor()
        except FileNotFoundError:
            print(f"config {args.config} not found, using LASER_0 preset", file=sys.stderr)
            slam_cfg = presets.laser0_slam()
            pre_cfg = presets.laser0_preprocessor()
    else:
        slam_cfg = presets.laser0_slam()
        pre_cfg = presets.laser0_preprocessor()
    return make(
        slam_cfg,
        pre_cfg,
        scan_topic=args.scan_topic,
        odom_topic=args.odom_topic,
        sensor_frame=args.sensor_frame,
        base_frame=args.base_frame,
    )


def main(argv=None) -> int:
    from ..utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", default="laser_slam2d.json",
                    help="config file to read/write")
    ap.add_argument("-j", "--generate-config", action="store_true",
                    help="generate a default configuration and exit")
    ap.add_argument("--boss-config", default=None,
                    help="read a reference-format BOSS pipeline config")
    ap.add_argument("-i", "--input", default=None, help="input JSONL message log")
    ap.add_argument("--carmen", default=None, help="input CARMEN log")
    ap.add_argument("-o", "--output", default=None, help="TUM trajectory output")
    ap.add_argument("--draw", default=None, help="render the map to PNG")
    ap.add_argument("--scan-topic", default=None)
    ap.add_argument("--odom-topic", default="/odom")
    ap.add_argument("--sensor-frame", default="scan")
    ap.add_argument("--base-frame", default="base_frame")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--chunked", type=int, default=0, metavar="N",
                    help="chunk-batched device-speed loop: N frames per "
                         "device dispatch (0 = per-message loop)")
    args = ap.parse_args(argv)

    if args.generate_config:
        presets.default_config_manager().write(args.config)
        print(f"configuration written in: {args.config}")
        return 0

    runner = build_runner(args)

    if args.carmen:
        packs, gt = carmen_io.load_packs(args.carmen, args.max_frames)
        source = sources.ListSource(packs)
        runner.sensor_in_robot = np.zeros(3, np.float32)
    elif args.input:
        source = sources.JsonlFileSource(args.input)
    else:
        print("ERROR: provide -i log.jsonl or --carmen log.clf", file=sys.stderr)
        return -1

    n = runner.run(source, args.max_frames)
    summary = runner.timing_summary()
    slam = runner.slam
    print(
        f"processed {n} frames | local maps {slam.num_variables()} | "
        f"factors {slam.num_factors()} | closures {slam.num_closures} | "
        f"mean_frame_hz {summary.get('mean_frame_hz', 0):.1f}"
    )

    if args.output:
        tum.write_tum(
            args.output,
            [t for t, _, _ in runner.trajectory],
            [p for _, p, _ in runner.trajectory],
        )
        print(f"trajectory written to {args.output}")
    if args.draw:
        from ..viz.canvas import Canvas

        canvas = Canvas("slam_map")
        runner.draw(canvas)
        print(f"map rendered to {canvas.flush(args.draw)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
