"""Honor an explicit JAX_PLATFORMS=cpu request in app entry points.

The environment's axon TPU plugin force-prepends itself to ``jax_platforms``
at plugin registration, which silently overrides the standard JAX_PLATFORMS
environment variable (tests/conftest.py works around the same issue). Apps
that do pure host-side work (dataset generation, report rendering) call this
so ``JAX_PLATFORMS=cpu python -m ...`` behaves as any JAX user expects and
does not touch the TPU tunnel (which serializes across processes).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    jax.config.update("jax_platforms", want)
