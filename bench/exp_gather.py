"""Probe: which lane-gather formulations does Mosaic accept/perform best on
this chip? Tests take_along_axis on [K, B] along lanes inside a pallas_call,
and times roll-loop vs take_along_axis vs batched-onehot for a banded gather.
"""
import argparse
import functools
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, B = 8, 768
S = 64


def run(kind, K=K, iters=10):
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.normal(size=(8, K, B)).astype(np.float32))
    # banded indices: col = lane + delta, delta in [-S, S]
    delta = rng.integers(-S, S + 1, size=(K, B)).astype(np.int32)
    lane = np.arange(B, dtype=np.int32)[None, :]
    idx = jnp.asarray(np.clip(lane + delta, 0, B - 1))

    def body_take(c_ref, i_ref, o_ref):
        acc = jnp.zeros((8, K, B), jnp.float32)
        def it(t, acc):
            g = jnp.take_along_axis(
                c_ref[:], jnp.broadcast_to(i_ref[:][None], (8, K, B)), axis=2)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, iters, it, acc)

    def body_take2d(c_ref, i_ref, o_ref):
        # per-field 2D take_along_axis on [K, B]
        def it(t, acc):
            gs = [jnp.take_along_axis(c_ref[f], i_ref[:], axis=1)
                  for f in range(8)]
            return acc + jnp.stack(gs, 0)
        o_ref[:] = jax.lax.fori_loop(0, iters, it, jnp.zeros((8, K, B), jnp.float32))

    def body_roll(c_ref, i_ref, o_ref):
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)
        def it(t, acc):
            d = i_ref[:] - lane_i
            def shift(s, g):
                sel = d == (s - S)
                rolled = pltpu.roll(c_ref[:], jnp.mod(B - (s - S), B), axis=2)
                return jnp.where(jnp.expand_dims(sel, 0), rolled, g)
            g = jax.lax.fori_loop(0, 2 * S + 1, shift,
                                  jnp.zeros((8, K, B), jnp.float32))
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, iters, it, jnp.zeros((8, K, B), jnp.float32))

    body = {"take": body_take, "take2d": body_take2d, "roll": body_roll}[kind]

    @jax.jit
    def go(canvas, idx):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((8, K, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(canvas, idx)

    out = go(canvas, idx)
    out.block_until_ready()
    # correctness vs numpy
    ref = np.stack([np.take_along_axis(np.asarray(canvas)[f],
                                       np.asarray(idx), axis=1)
                    for f in range(8)]) * iters
    err = float(np.abs(np.asarray(out) - ref).max())
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        go(canvas, idx).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{kind:8s} K={K:3d} iters={iters} err={err:.2e} best={best*1e6:.1f}us",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kinds", default="take,take2d,roll")
    ap.add_argument("--ks", default="8,32")
    args = ap.parse_args()
    for k in [int(x) for x in args.ks.split(",")]:
        for kind in args.kinds.split(","):
            try:
                run(kind, K=k)
            except Exception as e:
                print(f"{kind} K={k} FAILED:", flush=True)
                traceback.print_exc()
                print("-" * 60, flush=True)
