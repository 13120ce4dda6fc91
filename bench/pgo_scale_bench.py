"""Million-node PGO measurement (BASELINE.json config #5; VERDICT r1-r3 ask).
Writes bench/results/pgo_1m_r04.json."""
import json, resource, sys, time
import jax
from srrg2_laser_slam_2d_tpu.bench import pgo_bench

results = []
for side in [256, 512, 1024]:
    t0 = time.perf_counter()
    try:
        r = pgo_bench.run(side=side, gn_iterations=3, cg_iterations=30, reps=1)
        results.append({
            "side": side, "nodes": r.nodes, "edges": r.edges,
            "chi0": r.chi0, "chi1": r.chi1,
            "seconds_per_gn_iteration": r.seconds_per_gn_iteration,
            "gn_iterations": r.iterations,
            "wall_s": time.perf_counter() - t0,
            "peak_host_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
        })
    except Exception as e:
        results.append({"side": side, "error": repr(e)[:500]})
    print(json.dumps(results[-1]), flush=True)

out = {
    "backend": jax.default_backend(),
    "device": str(jax.devices()[0]),
    "solver": "matrix-free PCG GN (solver/cg.py), EdgeOrder + jac_chunk at >100k nodes",
    "cg_iterations": 30,
    "results": results,
}
with open("bench/results/pgo_1m_r04.json", "w") as f:
    json.dump(out, f, indent=1)
