"""Block-banded scatter-free CG solver (graph/banded.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.datasets import make_ba_graph, make_sphere_graph
from graph_slam_tpu.graph import gn_optimize
from graph_slam_tpu.graph.banded import (
    band_halfwidth,
    banded_direct_gn_optimize,
    banded_gn_optimize,
)


class TestBanded:
    def test_matches_dense_gn(self):
        graph, values, _ = make_sphere_graph(n_poses=60, edges_per_pose=3.0,
                                             seed=0, dtype=jnp.float64,
                                             bucket=4)
        W = band_halfwidth(graph)
        vals_b, err_b = banded_gn_optimize(graph, values, iterations=6,
                                           band_w=W, damping=1e-6,
                                           pcg_iters=150)
        res_d = gn_optimize(graph, values, iterations=6, solver="dense",
                            damping=1e-6)
        assert abs(float(err_b) - float(res_d.error)) \
            <= 1e-9 * max(float(res_d.error), 1e-9)
        np.testing.assert_allclose(np.asarray(vals_b.pose_t),
                                   np.asarray(res_d.values.pose_t),
                                   atol=1e-10)

    def test_direct_matches_dense_gn(self):
        """The superblock block-Thomas EXACT solve: same iterates as the
        dense GN solver (both exact, same damping) to solver precision."""
        graph, values, _ = make_sphere_graph(n_poses=60, edges_per_pose=3.0,
                                             seed=0, dtype=jnp.float64,
                                             bucket=4)
        W = band_halfwidth(graph)
        vals_b, err_b = banded_direct_gn_optimize(
            graph, values, iterations=6, band_w=W, damping=1e-6)
        res_d = gn_optimize(graph, values, iterations=6, solver="dense",
                            damping=1e-6)
        assert abs(float(err_b) - float(res_d.error)) \
            <= 1e-9 * max(float(res_d.error), 1e-9)
        np.testing.assert_allclose(np.asarray(vals_b.pose_t),
                                   np.asarray(res_d.values.pose_t),
                                   atol=1e-8)

    def test_direct_superblock_padding(self):
        """Pose count not a multiple of the superblock size: the padded
        trailing superblock must not perturb the solution."""
        graph, values, _ = make_sphere_graph(n_poses=37, edges_per_pose=2.5,
                                             seed=3, dtype=jnp.float64,
                                             bucket=4)
        W = band_halfwidth(graph)
        _, err_b = banded_direct_gn_optimize(
            graph, values, iterations=5, band_w=W, super_s=W + 3,
            damping=1e-6)
        res_d = gn_optimize(graph, values, iterations=5, solver="dense",
                            damping=1e-6)
        assert abs(float(err_b) - float(res_d.error)) \
            <= 1e-9 * max(float(res_d.error), 1e-9)

    def test_direct_rejects_small_superblock(self):
        graph, values, _ = make_sphere_graph(n_poses=30, edges_per_pose=2.0,
                                             seed=2, dtype=jnp.float64,
                                             bucket=4)
        with pytest.raises(ValueError, match="super_s"):
            banded_direct_gn_optimize(graph, values, iterations=1,
                                      band_w=12, super_s=4)

    def test_wider_band_is_harmless(self):
        graph, values, _ = make_sphere_graph(n_poses=40, edges_per_pose=2.5,
                                             seed=1, dtype=jnp.float64,
                                             bucket=4)
        W = band_halfwidth(graph)
        _, e1 = banded_gn_optimize(graph, values, iterations=4, band_w=W,
                                   damping=1e-6, pcg_iters=150)
        _, e2 = banded_gn_optimize(graph, values, iterations=4,
                                   band_w=W + 7, damping=1e-6,
                                   pcg_iters=150)
        assert abs(float(e1) - float(e2)) <= 1e-9 * float(e1)

    def test_halfwidth_reports_span(self):
        graph, values, _ = make_sphere_graph(n_poses=30, edges_per_pose=2.0,
                                             seed=2, dtype=jnp.float64,
                                             bucket=4)
        W = band_halfwidth(graph)
        i = np.asarray(graph.between.i)[np.asarray(graph.between.active)]
        j = np.asarray(graph.between.j)[np.asarray(graph.between.active)]
        assert W == int(np.abs(j - i).max())

    def test_rejects_non_pose_graphs(self):
        graph, values, _ = make_ba_graph(n_poses=4, n_points=30,
                                         obs_per_point=2, seed=3,
                                         dtype=jnp.float64, bucket=4)
        with pytest.raises(NotImplementedError):
            banded_gn_optimize(graph, values, iterations=1, band_w=4,
                               pcg_iters=5)
