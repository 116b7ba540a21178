"""Headline benchmark: GN-iteration throughput on a sphere2500-class graph.

Matches the driver-defined target (BASELINE.md): >= 10x GN-iteration
throughput vs single-core g2o (CSparse) on a 2500-pose SE(3) graph. The
reference repo publishes no numbers; the baseline constant below is the
commonly reported ballpark for single-core g2o batch LM on sphere2500
(~0.5 s per linearize+solve iteration => 2 iter/s). We measure full GN
iterations (relinearize + assemble + damped solve + manifold retract) on
one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

# single-core g2o (CSparse) batch LM on sphere2500: ~2 GN iterations/sec
BASELINE_G2O_ITERS_PER_SEC = 2.0

N_POSES = 2500
EDGES_PER_POSE = 4.0
ITERS_PER_CALL = 10


def main():
    from graph_slam_tpu.datasets import make_sphere_graph
    from graph_slam_tpu.graph import gn_optimize, total_error

    graph, values, _ = make_sphere_graph(
        n_poses=N_POSES, edges_per_pose=EDGES_PER_POSE, seed=0,
        dtype=jnp.float32, bucket=256,
    )

    solver = "pcg"
    # warm up / compile
    res = gn_optimize(graph, values, iterations=ITERS_PER_CALL,
                      solver=solver, damping=1e-4, pcg_iters=100)
    jax.block_until_ready(res.error)

    # timed runs
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        res = gn_optimize(graph, values, iterations=ITERS_PER_CALL,
                          solver=solver, damping=1e-4, pcg_iters=100)
        jax.block_until_ready(res.error)
    dt = time.perf_counter() - t0

    iters_per_sec = n_calls * ITERS_PER_CALL / dt
    print(json.dumps({
        "metric": f"GN iterations/sec on sphere{N_POSES} SE(3) pose graph "
                  f"({solver} solver, {int(EDGES_PER_POSE * N_POSES)} edges)",
        "value": round(iters_per_sec, 3),
        "unit": "GN iters/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_G2O_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
