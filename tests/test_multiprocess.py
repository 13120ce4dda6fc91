"""True multi-process distribution (VERDICT r1 item 3): 2 jax.distributed
processes on CPU (gloo collectives = the DCN stand-in), host-sharded edge
storage, cross-process psum PGO matching the single-process solver, and the
host-sharded scene store fetching remote maps."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_pgo_matches_single_process(tmp_path, nproc):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiprocess_worker.py")
    port = _free_port()
    outs = [str(tmp_path / f"w{p}.npz") for p in range(nproc)]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), str(nproc), str(port), outs[p]],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for p in range(nproc)
    ]
    logs = [pr.communicate(timeout=540)[0].decode() for pr in procs]
    for p, pr in enumerate(procs):
        assert pr.returncode == 0, f"worker {p} failed:\n{logs[p][-3000:]}"

    ws = [np.load(o) for o in outs]
    w0 = ws[0]
    assert int(w0["process_count"]) == nproc
    assert int(w0["n_global_devices"]) == nproc * 4  # 4 local devices each

    # all processes converge to the same solution (replicated variables)
    for w in ws[1:]:
        np.testing.assert_allclose(w0["poses"], w["poses"], atol=1e-5)

    # matches the single-process solver on the identical graph
    from tests.multiprocess_worker import build_ring
    from srrg2_laser_slam_2d_tpu.solver import pgo
    import jax.numpy as jnp

    est, ei, ej, meas, gt = build_ring()
    v = len(est)
    g = pgo.empty_graph(32, 32)
    g = g._replace(
        poses=g.poses.at[:v].set(jnp.asarray(est)),
        var_valid=g.var_valid.at[:v].set(True),
        var_fixed=g.var_fixed.at[0].set(True),
        edge_i=g.edge_i.at[: len(ei)].set(jnp.asarray(ei)),
        edge_j=g.edge_j.at[: len(ej)].set(jnp.asarray(ej)),
        edge_meas=g.edge_meas.at[: len(meas)].set(jnp.asarray(meas)),
        edge_valid=g.edge_valid.at[: len(ei)].set(True),
    )
    ref, ref_chi, _ = pgo.optimize(pgo.PGOConfig(max_iterations=10), g)
    np.testing.assert_allclose(w0["poses"], np.asarray(ref.poses[:v]), atol=1e-3)

    # host-sharded scene store: every worker fetched the same map, which is
    # remote for all but its owner
    for w in ws:
        remote = int(w["remote_id"])
        np.testing.assert_allclose(w["fetched"], np.full((8, 2), float(remote)))


def test_device_prefetcher_streams_in_order():
    from srrg2_laser_slam_2d_tpu.io.prefetch import DevicePrefetcher

    items = [{"x": np.full((4,), k, np.float32)} for k in range(10)]
    out = list(DevicePrefetcher(iter(items), depth=3))
    assert len(out) == 10
    for k, item in enumerate(out):
        np.testing.assert_allclose(np.asarray(item["x"]), k)

    # errors in the source surface on the consumer side
    def bad():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    it = DevicePrefetcher(bad(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
