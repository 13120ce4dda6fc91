"""Device-parallel batched scan alignment.

Loop-closure candidate alignment (models/loop_closure.py) and multi-session
registration sweeps vmap the fused ICP kernel over a candidate batch; this
module shards that batch across the ``graph`` mesh axis so K candidates align
on N chips concurrently — per-candidate programs are independent (pure data
parallelism, no collectives), so scaling is embarrassingly linear over ICI-
connected chips. This is the capability called out in SURVEY.md §7.6 that the
sequential C++ reference cannot express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import icp
from ..ops.projector import PolarProjection
from ..utils.cloud import Cloud
from .mesh import GRAPH_AXIS

Array = jax.Array


def batch_align_sharded(
    acfg: icp.AlignerConfig,
    proj: PolarProjection,
    mesh: Mesh,
    fixed_batch: Cloud,   # [K, N, ...] K divisible by mesh size
    moving_batch: Cloud,  # [K, N, ...] (or broadcast the same moving K times)
    initials: Array,      # [K, 3]
) -> icp.AlignResult:
    k = initials.shape[0]
    n_dev = mesh.shape[GRAPH_AXIS]
    assert k % n_dev == 0, f"batch {k} not divisible by {n_dev} devices"

    def one(fixed, moving, init):
        return icp.align(acfg, proj, fixed, moving, init)

    vmapped = jax.vmap(one)

    sharded = functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS)),
        out_specs=P(GRAPH_AXIS),
        # while_loop carries start from unvarying constants; skip the
        # varying-manual-axes consistency check
        check_vma=False,
    )

    @jax.jit
    def run(fb, mb, it):
        return sharded(vmapped)(fb, mb, it)

    return run(fixed_batch, moving_batch, initials)
