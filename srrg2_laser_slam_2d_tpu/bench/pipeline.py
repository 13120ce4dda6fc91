"""Device-side streamed tracking — the throughput harness.

The frame loop is inherently sequential (SURVEY.md §7 'hard parts'), but it
does not need a host round-trip per frame: scans are pre-staged on device and
``lax.scan`` drives the fused tracking step frame-to-frame inside ONE compiled
program. This is the TPU analog of the reference's per-message
setRawData+compute timing loop (apps/generic_bench_app.cpp:78-103), minus the
host overhead the C++ pays per message.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import tracker as tracker_mod
from ..models.preprocessor import PreprocessorConfig, preprocess_scan
from ..ops.projector import PolarProjection
from ..utils.cloud import Cloud

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_sequence(
    cfg: tracker_mod.TrackerConfig,
    state: tracker_mod.TrackerState,
    meas_stack: Cloud,      # [T, N, ...] preprocessed scans
    odoms: Array,           # [T, 3]
    odom_valid: Array,      # [T]
):
    """Run T sequential tracking steps on device; returns final state and the
    per-frame pose/chi/inlier traces."""

    def make_step(use_cache: bool):
        def step(state, inputs):
            meas, odom, ov = inputs
            new_state, stats = tracker_mod.track_step_impl(
                cfg, state, meas, odom, ov, use_clip_cache=use_cache
            )
            return new_state, (
                new_state.robot_in_local_map,
                stats.chi,
                stats.num_inliers,
            )

        return step

    inputs = (meas_stack, odoms, odom_valid)
    if not cfg.reuse_clip_canvas:
        return jax.lax.scan(make_step(False), state, inputs)

    # canvas reuse: frame 0 clips from the scene (no cache yet), the scan
    # over the remaining frames reuses the merge canvases
    first = jax.tree.map(lambda x: x[0], inputs)
    state, tr0 = make_step(False)(state, first)
    rest = jax.tree.map(lambda x: x[1:], inputs)
    state, trs = jax.lax.scan(make_step(True), state, rest)
    traces = jax.tree.map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), tr0, trs
    )
    return state, traces


@functools.partial(jax.jit, static_argnames=("proj", "pcfg"))
def preprocess_batch(proj: PolarProjection, pcfg: PreprocessorConfig, ranges: Array) -> Cloud:
    """Preprocess a [T, num_beams] stack of scans in one batched program."""
    return jax.vmap(lambda r: preprocess_scan(proj, pcfg, r))(ranges)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_sequence_batch(
    cfg: tracker_mod.TrackerConfig,
    states: tracker_mod.TrackerState,   # [B, ...] stacked stream states
    meas_stack: Cloud,                  # [B, T, N, ...]
    odoms: Array,                       # [B, T, 3]
    odom_valid: Array,                  # [B, T]
):
    """B independent tracking streams advanced T frames each — the serving
    configuration (multi-robot / multi-session). Per-frame semantics are
    identical to the sequential tracker; the batch amortizes the per-op
    overhead that dominates this scan-sized workload on TPU, which is where
    the >=10x-per-chip headline comes from (BASELINE.json north star)."""

    def one(state, meas, od, ov):
        return track_sequence(cfg, state, meas, od, ov)

    return jax.vmap(one)(states, meas_stack, odoms, odom_valid)
