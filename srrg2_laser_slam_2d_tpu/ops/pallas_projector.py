"""Pallas z-buffer polar projector — scatter-free beam canvas computation.

The XLA path (ops/projector.py) builds the per-beam z-buffer with two
scatter-min passes; on TPU, XLA lowers scatters with non-unique indices to a
serialized update loop, and the projector runs ~13x per tracking frame (clip
1x, merge 2x, aligner 10+1x) — profiling showed it dominating the batched
tracker. This kernel reformulates the z-buffer as a dense masked min/argmin
over a [point-chunk, beams] comparison tile on the VPU: O(N*C) lanes instead
of O(N) serial scatter steps.

Semantics match ops/projector.project_local exactly (floor beam assignment,
range gates, closest-depth wins, lowest index wins ties — chunk order + first
argmin preserve the tie-break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projector import Canvas, PolarProjection

Array = jax.Array

_BIG = 1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _atan2(y, x):
    """Polynomial atan2 — Mosaic has no atan2 primitive. Abramowitz & Stegun
    4.4.49 minimax on [0,1] (|err| <= 2e-8 rad: ~2e-6 beam units at 721 beams
    over 2π, far below the bin-edge float noise both implementations share)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    r = t * (
        0.9999993329
        + s * (
            -0.3332985605
            + s * (
                0.1994653599
                + s * (
                    -0.1390853351
                    + s * (
                        0.0964200441
                        + s * (-0.0559098861 + s * (0.0218612288 + s * -0.0040454090))
                    )
                )
            )
        )
    )
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    r = jnp.where(x < 0, 3.141592653589793 - r, r)
    return jnp.where(y < 0, -r, r)


def _make_kernel(n: int, chunk: int, cols_padded: int, proj: PolarProjection):
    n_chunks = n // chunk

    def kernel(geo_ref, depth_ref, idx_ref):
        # geo: [N, 4] = (x, y, valid, 0)
        beam_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols_padded), 1)

        def scan_chunk(kchunk, carry):
            best_d, best_i = carry
            tile = geo_ref[pl.ds(kchunk * chunk, chunk), :]  # [chunk, 4]
            x = tile[:, 0]
            y = tile[:, 1]
            v = tile[:, 2]
            d = jnp.sqrt(x * x + y * y)
            ang = _atan2(y, x)
            colf = jnp.floor(ang * proj.f + proj.c)
            col = colf.astype(jnp.int32)
            ok = (
                (v > 0)
                & (colf >= 0)
                & (colf < proj.cols)
                & (d >= proj.range_min)
                & (d <= proj.range_max)
            )
            # masked [chunk, cols] depth matrix
            hit = (col[:, None] == beam_ids) & ok[:, None]
            dm = jnp.where(hit, d[:, None], _BIG)
            cmin = jnp.min(dm, axis=0)                        # [cols]
            carg = jnp.argmin(dm, axis=0).astype(jnp.int32) + kchunk * chunk
            take = cmin < best_d
            return jnp.where(take, cmin, best_d), jnp.where(take, carg, best_i)

        best_d = jnp.full((cols_padded,), _BIG, jnp.float32)
        best_i = jnp.zeros((cols_padded,), jnp.int32)
        best_d, best_i = jax.lax.fori_loop(0, n_chunks, scan_chunk, (best_d, best_i))
        depth_ref[0, :] = best_d
        idx_ref[0, :] = jnp.where(best_d < _BIG, best_i, -1)

    return kernel


@functools.partial(jax.jit, static_argnames=("proj", "chunk", "interpret"))
def project_local_pallas(
    proj: PolarProjection,
    xy: Array,
    valid: Array,
    chunk: int = 1024,
    interpret: bool = False,
) -> Canvas:
    """Canvas of a sensor-frame cloud, computed scatter-free in one kernel."""
    n = xy.shape[0]
    n_pad = _round_up(n, chunk)
    cols_padded = _round_up(proj.cols, 128)
    geo = jnp.concatenate(
        [
            xy,
            valid.astype(jnp.float32)[:, None],
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=1,
    )
    if n_pad != n:
        geo = jnp.pad(geo, ((0, n_pad - n), (0, 0)))

    depth, idx = pl.pallas_call(
        _make_kernel(n_pad, min(chunk, n_pad), cols_padded, proj),
        out_shape=(
            jax.ShapeDtypeStruct((1, cols_padded), jnp.float32),
            jax.ShapeDtypeStruct((1, cols_padded), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(geo)
    depth = depth[0, : proj.cols]
    idx = idx[0, : proj.cols]
    v = idx >= 0
    return Canvas(depth=jnp.where(v, depth, jnp.float32(3.0e38)), idx=idx, valid=v)
