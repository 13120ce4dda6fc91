"""Parameter reference generator — the PARAM-docstring surface of the config
system rendered as markdown (the reference exposes per-parameter docs through
the PARAM macro + generated configs; here `utils.config.describe` is the
single source of truth).

Usage: python -m srrg2_laser_slam_2d_tpu.apps.param_reference [-o docs/PARAMETERS.md]
"""

from __future__ import annotations

import argparse
import dataclasses

from ..utils import config as config_mod
from ..utils import presets  # noqa: F401 — triggers registration


def render() -> str:
    lines = [
        "# Parameter reference",
        "",
        "Generated from the component registry (`utils/config.py`).",
        "",
    ]
    for name, cls in sorted(config_mod.registry().items()):
        if not dataclasses.is_dataclass(cls):
            continue
        lines.append(f"## {name}")
        lines.append("")
        lines.append("| parameter | type | default | doc |")
        lines.append("|---|---|---|---|")
        for p in config_mod.describe(name):
            default = p["default"]
            if dataclasses.is_dataclass(default) or hasattr(default, "_fields"):
                default = type(default).__name__ + "()"
            lines.append(
                f"| `{p['name']}` | {p['type']} | `{default}` | {p['doc']} |"
            )
        lines.append("")
    return "\n".join(lines)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", default="docs/PARAMETERS.md")
    args = ap.parse_args(argv)
    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        f.write(render())
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
