"""Profiling/timing — equivalents of ``srrg2_core::Profiler`` +
``SystemUsageCounter::tic/toc`` (SURVEY.md §5: per-module timing logs, a
global enable switch flipped by benchmarks, wall-clock totals / mean-FPS),
extended with the TPU-side hooks the reference cannot have: ``jax.profiler``
trace capture and compiled-program cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

enable_logging = False  # Profiler::enable_logging equivalent

_records: dict[str, list[float]] = defaultdict(list)
_tic_stack: list[float] = []


def tic() -> None:
    """SystemUsageCounter::tic."""
    _tic_stack.append(time.perf_counter())


def toc() -> float:
    """SystemUsageCounter::toc — seconds since the matching tic."""
    return time.perf_counter() - _tic_stack.pop()


@contextlib.contextmanager
def timed(name: str):
    """Per-module scoped timer; records when enable_logging is on."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if enable_logging:
            _records[name].append(dt)


def report() -> dict[str, dict]:
    """Summary stats per timed module."""
    out = {}
    for name, xs in _records.items():
        a = np.asarray(xs)
        out[name] = {
            "count": len(a),
            "total_s": float(a.sum()),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p95_s": float(np.percentile(a, 95)),
        }
    return out


def reset() -> None:
    _records.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof format) around a block —
    the TPU-side observability the C++ Profiler has no analog for."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args, **kwargs) -> dict:
    """XLA cost analysis of a jitted function on example args (flops, bytes)."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}
    except Exception:
        return {}
