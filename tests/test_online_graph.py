"""Online arena engine: jitted row appenders + incremental optimizer.

The pose-graph grows row by row with NO recompilation (same padded shapes
throughout) — the ISAM2-equivalent execution model.
"""

import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.core import se3
from graph_slam_tpu.graph import empty_graph, total_error
from graph_slam_tpu.graph.online import IncrementalOptimizer, OnlineGraph
from graph_slam_tpu.graph.variables import empty_arena


def test_online_growth_and_incremental_updates():
    r = np.random.default_rng(0)
    n = 12
    values = empty_arena(pose_cap=16, dtype=jnp.float64)
    graph = empty_graph(prior_pose_cap=2, between_cap=32, dtype=jnp.float64)
    og = OnlineGraph(graph, values)
    inc = IncrementalOptimizer(iters_per_update=1, damping=1e-9)

    # ground-truth circle
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        gt.append((np_lie.so3_exp([0, 0, ang]),
                   np.array([np.cos(ang), np.sin(ang), 0.0])))

    og.set_pose(0, se3.Pose(jnp.asarray(gt[0][0]), jnp.asarray(gt[0][1])))
    og.add_prior_pose(0, se3.Pose(jnp.asarray(gt[0][0]),
                                  jnp.asarray(gt[0][1])),
                      np.diag(np.full(6, 1e7)))

    shapes_before = jnp.asarray(og.graph.between.i).shape
    for k in range(1, n):
        T = np_lie.between(gt[k - 1], gt[k])
        # noisy initial estimate, exact measurement
        est = np_lie.retract(gt[k], r.normal(size=6) * 0.05)
        og.set_pose(k, se3.Pose(jnp.asarray(est[0]), jnp.asarray(est[1])))
        S = np.linalg.cholesky(np.eye(6) * 100).T
        og.add_between(k - 1, k,
                       se3.Pose(jnp.asarray(T[0]), jnp.asarray(T[1])), S)
        res = inc.update(og)
    # loop closure then a full batch solve
    T = np_lie.between(gt[n - 1], gt[0])
    og.add_between(n - 1, 0, se3.Pose(jnp.asarray(T[0]), jnp.asarray(T[1])),
                   np.linalg.cholesky(np.eye(6) * 100).T)
    res = inc.full_batch(og)

    assert jnp.asarray(og.graph.between.i).shape == shapes_before  # no growth
    assert float(res.error) < 1e-12
    for k in range(n):
        np.testing.assert_allclose(np.asarray(og.values.pose_t[k]),
                                   gt[k][1], atol=1e-6)


def test_checkpoint_resume_bit_exact(tmp_path):
    """Mid-run save/load must resume to the identical final estimate."""
    r = np.random.default_rng(3)
    gt = []
    for k in range(10):
        ang = 2 * np.pi * k / 10
        gt.append((np_lie.so3_exp([0, 0, ang]),
                   np.array([np.cos(ang), np.sin(ang), 0.0])))

    def build_and_run(split):
        og = OnlineGraph(empty_graph(prior_pose_cap=2, between_cap=32),
                         empty_arena(pose_cap=16, dtype=jnp.float64))
        inc = IncrementalOptimizer(iters_per_update=1, damping=1e-9)
        og.set_pose(0, se3.Pose(jnp.asarray(gt[0][0]),
                                jnp.asarray(gt[0][1])))
        og.add_prior_pose(0, se3.Pose(jnp.asarray(gt[0][0]),
                                      jnp.asarray(gt[0][1])),
                          np.diag(np.full(6, 1e7)))
        for k in range(1, 10):
            if split is not None and k == split:
                p = str(tmp_path / "ckpt.npz")
                og.save_state(p)
                og = OnlineGraph.load_state(p)
            T = np_lie.between(gt[k - 1], gt[k])
            est = np_lie.retract(gt[k], r.normal(size=6) * 0.02)
            og.set_pose(k, se3.Pose(jnp.asarray(est[0]),
                                    jnp.asarray(est[1])))
            og.add_between(k - 1, k, se3.Pose(jnp.asarray(T[0]),
                                              jnp.asarray(T[1])),
                           np.linalg.cholesky(np.eye(6) * 100).T)
            inc.update(og)
        return og

    r = np.random.default_rng(3)
    og_a = build_and_run(None)
    r = np.random.default_rng(3)
    og_b = build_and_run(5)
    np.testing.assert_array_equal(np.asarray(og_a.values.pose_t),
                                  np.asarray(og_b.values.pose_t))
    assert og_a._n == og_b._n
    assert abs(og_a.error() - og_b.error()) == 0.0


def test_capacity_guard():
    values = empty_arena(pose_cap=4, dtype=jnp.float64)
    graph = empty_graph(prior_pose_cap=1, between_cap=2, dtype=jnp.float64)
    og = OnlineGraph(graph, values)
    og.set_pose(0, se3.identity())
    og.set_pose(1, se3.identity())
    S = np.eye(6)
    og.add_between(0, 1, se3.identity(), S)
    og.add_between(0, 1, se3.identity(), S)
    import pytest

    with pytest.raises(RuntimeError):
        og.add_between(0, 1, se3.identity(), S)
