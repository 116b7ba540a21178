"""Compact fixed-lag solve (graph.online.windowed_gn).

Two properties the fixed-lag claim rests on:

1. *Exactness*: solving the compact window system (frozen columns dropped
   via the trash-column remap) must equal the masked full-arena
   formulation ``gn_optimize(update_mask=_free_mask(...))`` — the same GN
   step expressed over the arena's full dimension.
2. *Bounded cost*: the compiled FLOP count of one windowed update must not
   scale with the arena capacity (the masked-dense formulation is
   O(capacity^3); the compact one is O(window^3) + O(capacity) vector
   remaps).
"""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.core import se3
from graph_slam_tpu.graph.factors import empty_graph
from graph_slam_tpu.graph.lm import gn_optimize
from graph_slam_tpu.graph.online import (
    IncrementalOptimizer,
    OnlineGraph,
    _free_mask,
    window_graph,
    windowed_gn,
)
from graph_slam_tpu.graph.variables import empty_arena

INFO_SQRT = np.linalg.cholesky(np.diag([100.0] * 3 + [25.0] * 3)).T


def _corridor_graph(n, pose_cap, between_cap, seed=0):
    r = np.random.default_rng(seed)
    og = OnlineGraph(empty_graph(prior_pose_cap=2, between_cap=between_cap),
                     empty_arena(pose_cap=pose_cap))
    gt = [(np.eye(3), np.zeros(3))]
    og.set_pose(0, se3.Pose(jnp.eye(3), jnp.zeros(3)))
    og.add_prior_pose(0, se3.Pose(jnp.eye(3), jnp.zeros(3)),
                      np.diag(np.full(6, 1e6)))
    for k in range(1, n):
        w = np.array([0.0, 0.0, 0.04 * np.sin(k / 11.0)])
        v = np.array([0.25, 0.01, 0.0])
        gt.append((gt[-1][0] @ np_lie.so3_exp(w), gt[-1][1] + gt[-1][0] @ v))
        T = np_lie.between(gt[k - 1], gt[k])
        Tn = (T[0] @ np_lie.so3_exp(r.normal(size=3) * 0.005),
              T[1] + r.normal(size=3) * 0.01)
        og.set_pose(k, se3.Pose(
            jnp.asarray(np_lie.retract(gt[k], r.normal(size=6) * 0.03)[0]),
            jnp.asarray(np_lie.retract(gt[k], r.normal(size=6) * 0.03)[1])))
        og.add_between(k - 1, k, se3.Pose(jnp.asarray(Tn[0]),
                                          jnp.asarray(Tn[1])), INFO_SQRT)
        if k % 7 == 0 and k >= 10:
            T = np_lie.between(gt[k - 10], gt[k])
            og.add_between(k - 10, k, se3.Pose(jnp.asarray(T[0]),
                                               jnp.asarray(T[1])), INFO_SQRT)
    return og


class TestWindowedGnExactness:
    def test_matches_masked_full_solve_mid_trajectory(self):
        """Frozen-boundary window step == masked full-arena GN step."""
        n, W = 60, 16
        og = _corridor_graph(n, pose_cap=128, between_cap=256, seed=1)
        inc = IncrementalOptimizer(iters_per_update=2, damping=1e-9,
                                   window=W)
        caps = inc._window_caps(og)
        import jax as _jax
        counts = [og._n.get(k, 0) for k in
                  ("prior_pose", "between", "prior_vel", "prior_bias",
                   "plane", "imu", "projection", "prior_point")]
        tables = ("prior_pose", "between", "prior_vel", "prior_bias",
                  "plane", "imu", "projection", "prior_point")
        starts = jnp.asarray(
            [max(0, c - min(s, _jax.tree.leaves(getattr(og.graph, nm))[0]
                            .shape[0]))
             for c, s, nm in zip(counts, caps, tables)], jnp.int32)
        win = window_graph(og.graph, starts, caps)
        free_from = jnp.asarray([n - W, 0, 0, 0, 0], jnp.int32)

        # masked full-arena formulation (the reference implementation)
        um = _free_mask(og.values, free_from)
        ref = gn_optimize(win, og.values, iterations=2, solver="dense",
                          damping=1e-9, update_mask=um)

        vals, err = windowed_gn(win, og.values, free_from, wcaps=(W, W, W),
                                damping=1e-9, iterations=2)
        np.testing.assert_allclose(np.asarray(vals.pose_t),
                                   np.asarray(ref.values.pose_t), atol=1e-9)
        np.testing.assert_allclose(float(err), float(ref.error), rtol=1e-9)
        # frozen prefix untouched
        np.testing.assert_array_equal(
            np.asarray(vals.pose_t[: n - W]),
            np.asarray(og.values.pose_t[: n - W]))

    def test_update_entrypoint_uses_compact_solve(self):
        n, W = 40, 12
        og = _corridor_graph(n, pose_cap=64, between_cap=128, seed=2)
        e0 = og.error()
        inc = IncrementalOptimizer(iters_per_update=2, damping=1e-9,
                                   window=W)
        res = inc.update(og)
        assert float(res.error) >= 0
        assert og.error() < e0


class TestWindowedGnBoundedCost:
    def test_flops_independent_of_arena_capacity(self):
        """Compiled FLOPs of one windowed update: growing the arena 8x must
        not grow the update cost materially (the dense-masked formulation
        grows it ~512x)."""
        W = 16
        flops = []
        for pose_cap, between_cap in ((128, 256), (1024, 2048)):
            og = _corridor_graph(100, pose_cap=pose_cap,
                                 between_cap=between_cap, seed=3)
            inc = IncrementalOptimizer(iters_per_update=1, damping=1e-9,
                                       window=W)
            caps = inc._window_caps(og)
            tables = ("prior_pose", "between", "prior_vel", "prior_bias",
                      "plane", "imu", "projection", "prior_point")
            counts = [og._n.get(k, 0) for k in tables]
            starts = jnp.asarray(
                [max(0, c - min(s, jax.tree.leaves(
                    getattr(og.graph, nm))[0].shape[0]))
                 for c, s, nm in zip(counts, caps, tables)], jnp.int32)
            win = window_graph(og.graph, starts, caps)
            free_from = jnp.asarray([100 - W, 0, 0, 0, 0], jnp.int32)
            lowered = windowed_gn.lower(win, og.values, free_from,
                                        wcaps=(W, W, W), damping=1e-9,
                                        iterations=1)
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", 0.0))
            if f <= 0:
                import pytest
                pytest.skip("XLA cost analysis unavailable on this backend")
            flops.append(f)
        # capacity x8, between rows x8 -> only the O(capacity) remap terms
        # may grow; the window solve must dominate
        assert flops[1] < 4.0 * flops[0], flops


class TestWindowedGnWithPoints:
    def test_matches_masked_full_solve_with_landmarks(self):
        """The compact window solve's POINT columns (always fully free,
        like planes) must reproduce the masked full-arena GN step on a
        graph with projection factors — the reference's incremental runs
        insert Q() landmarks into the same graph (gtsam_graph.cpp:370-448).
        """
        from graph_slam_tpu.config import SR4000
        from graph_slam_tpu.graph import GraphBuilder

        r = np.random.default_rng(9)
        n, W = 12, 5
        cal9 = (SR4000.fx, SR4000.fy, 0.0, SR4000.cx, SR4000.cy,
                0.0, 0.0, 0.0, 0.0)
        b = GraphBuilder(dtype=jnp.float64)
        gt = [(np.eye(3), np.zeros(3))]
        for k in range(1, n):
            gt.append((gt[-1][0],
                       gt[-1][1] + np.array([0.2, 0.0, 0.0])))
        for k in range(n):
            b.add_pose((gt[k][0],
                        gt[k][1] + r.normal(size=3) * 0.02))
        b.add_prior_pose(0, gt[0], sigmas=np.full(6, 1e-6))
        for k in range(1, n):
            T = np_lie.between(gt[k - 1], gt[k])
            b.add_between(k - 1, k, T, sigmas=np.full(6, 0.01))
        pts = np.stack([r.uniform(-1, 1, 20), r.uniform(-1, 1, 20),
                        r.uniform(3, 6, 20)], axis=1)
        for q in range(20):
            b.add_point(pts[q] + r.normal(size=3) * 0.05)
            b.add_prior_point(q, pts[q], sigma=0.3)
            for k in range(n - 4, n):     # observed by the window's poses
                R, t = gt[k]
                local = R.T @ (pts[q] - t)
                z = max(local[2], 1e-6)
                uv = (cal9[0] * local[0] / z + cal9[3],
                      cal9[1] * local[1] / z + cal9[4])
                b.add_projection_factor(k, q, np.asarray(uv), cal9,
                                        sigma=1.0)
        graph, values = b.build(bucket=4)
        free_from = jnp.asarray([n - W, 0, 0, 0, 0], jnp.int32)

        um = _free_mask(values, free_from)
        ref = gn_optimize(graph, values, iterations=2, solver="dense",
                          damping=1e-8, update_mask=um)
        vals, err = windowed_gn(graph, values, free_from, wcaps=(W, W, W),
                                damping=1e-8, iterations=2)
        np.testing.assert_allclose(np.asarray(vals.pose_t),
                                   np.asarray(ref.values.pose_t),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(vals.point),
                                   np.asarray(ref.values.point), atol=1e-8)
        np.testing.assert_allclose(float(err), float(ref.error), rtol=1e-8)
