"""Worker for tests/test_multiprocess.py — one process of an N-process
jax.distributed run (CPU + gloo collectives standing in for hosts + DCN).

Usage: python multiprocess_worker.py <pid> <nproc> <port> <out.npz>
Builds a noisy ring pose graph, keeps only THIS process's edge shard
host-local, optimizes with the cross-process psum PGO, stores scenes in the
host-sharded store and fetches a remote one, then dumps results for the
pytest runner to check against the single-process solver.
"""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import numpy as np


def build_ring(v=16, noise=0.05, seed=0):
    from srrg2_laser_slam_2d_tpu.utils import geometry
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    step = np.array([1.0, 0.0, 2 * np.pi / v], np.float32)
    gt = [np.zeros(3, np.float32)]
    for _ in range(v - 1):
        gt.append(np.asarray(geometry.compose(jnp.asarray(gt[-1]), jnp.asarray(step))))
    gt = np.stack(gt)
    meas, est = [], [gt[0]]
    for k in range(1, v):
        z = np.asarray(geometry.relative(jnp.asarray(gt[k - 1]), jnp.asarray(gt[k])))
        z = z + rng.normal(scale=noise, size=3).astype(np.float32)
        meas.append(z)
        est.append(np.asarray(geometry.compose(jnp.asarray(est[-1]), jnp.asarray(z))))
    # exact loop closure
    meas.append(np.asarray(geometry.relative(jnp.asarray(gt[-1]), jnp.asarray(gt[0]))))
    ei = np.concatenate([np.arange(v - 1), [v - 1]]).astype(np.int32)
    ej = np.concatenate([np.arange(1, v), [0]]).astype(np.int32)
    return np.stack(est), ei, ej, np.stack(meas).astype(np.float32), gt


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    from srrg2_laser_slam_2d_tpu.parallel import multihost

    jax = multihost.init_multiprocess(
        pid, nproc, coordinator=f"localhost:{port}", local_devices=4
    )
    assert jax.process_count() == nproc
    mesh = multihost.global_mesh()
    n_global = len(jax.devices())

    from srrg2_laser_slam_2d_tpu.solver import pgo

    est, ei, ej, meas, gt = build_ring()
    v = len(est)
    ne = len(ei)
    # pad the edge set to a multiple of the global device count, then keep
    # ONLY this process's host-local shard
    ec = ((ne + n_global - 1) // n_global) * n_global
    pad = ec - ne
    ei_g = np.concatenate([ei, np.zeros(pad, np.int32)])
    ej_g = np.concatenate([ej, np.zeros(pad, np.int32)])
    em_g = np.concatenate([meas, np.zeros((pad, 3), np.float32)])
    info_g = np.tile(np.array([1.0, 1.0, 1.0], np.float32), (ec, 1))
    ev_g = np.concatenate([np.ones(ne, bool), np.zeros(pad, bool)])
    sh = ec // nproc
    sl = slice(pid * sh, (pid + 1) * sh)

    var_valid = np.ones(v, bool)
    var_fixed = np.zeros(v, bool)
    var_fixed[0] = True
    poses, chi, it = multihost.optimize_pgo_multihost(
        pgo.PGOConfig(max_iterations=10),
        est, var_valid, var_fixed,
        (ei_g[sl], ej_g[sl], em_g[sl], info_g[sl], ev_g[sl]),
        mesh,
    )

    # host-sharded scene store: this process owns every other map. ``get`` is
    # a COLLECTIVE (all processes participate), so every process fetches the
    # same map — for exactly one of them it is a remote fetch.
    store = multihost.HostShardedSceneStore(pid, nproc)
    for m in range(4):
        scene = (np.full((8, 2), float(m), np.float32), np.ones(8, bool))
        store.put(m, scene)
    assert store.local_ids() == [m for m in range(4) if m % nproc == pid]
    template = (np.zeros((8, 2), np.float32), np.zeros(8, bool))
    remote_id = 1  # owned by process 1: remote for process 0
    fetched = store.get(remote_id, template)

    np.savez(
        out_path,
        poses=poses[:v],
        chi=chi,
        iters=it,
        est=est,
        fetched=fetched[0],
        remote_id=remote_id,
        n_global_devices=n_global,
        process_count=jax.process_count(),
    )
    print(f"worker {pid}: OK chi={chi:.5f} devices={n_global}")


if __name__ == "__main__":
    main()
