"""Incidence-gather (scatter-free) PCG path correctness (VERDICT ask #6).

``build_incidence`` precomputes, per global tangent slot, the padded gather
list of per-factor contribution positions; the CG inner loop then runs with
no scatters at all. These tests pin the gather path to the dense solve on
mixed factor graphs; bench.py measures gather vs scatter on the real chip
(``--single gather_pcg``) so the default can follow the data.
"""

import jax.numpy as jnp
import numpy as np

from graph_slam_tpu.datasets import make_ba_graph, make_sphere_graph
from graph_slam_tpu.graph import gn_optimize, total_error
from graph_slam_tpu.graph.factors import linearize_blocks
from graph_slam_tpu.graph.sparsity import (
    build_incidence,
    diag_gather,
    gradient_gather,
    hvp_fn_gather,
)
from graph_slam_tpu.graph.variables import used_slot_mask


class TestGatherEqualsScatter:
    def test_gradient_hvp_diag_match_dense(self):
        graph, values, _ = make_sphere_graph(n_poses=24, edges_per_pose=3.0,
                                             seed=0, dtype=jnp.float64,
                                             bucket=8)
        inc = build_incidence(graph, values)
        blocks = linearize_blocks(graph, values)
        mask = used_slot_mask(values)
        D = mask.shape[0]

        g_sc = jnp.zeros(D, mask.dtype)
        H = jnp.diag(1.0 - mask)
        for r, J, cols in blocks:
            g_sc = g_sc.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
            Hf = jnp.einsum("fei,fej->fij", J, J)
            H = H.at[cols[:, :, None], cols[:, None, :]].add(Hf)

        g_ga = gradient_gather(blocks, inc, mask.dtype)
        np.testing.assert_allclose(np.asarray(g_ga), np.asarray(g_sc),
                                   atol=1e-12)

        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.normal(size=D))
        hvp = hvp_fn_gather(blocks, inc, mask, 0.3)
        np.testing.assert_allclose(
            np.asarray(hvp(v)),
            np.asarray(H @ v + 0.3 * v),
            atol=1e-10)

        d_ga = diag_gather(blocks, inc, mask, 0.3)
        np.testing.assert_allclose(np.asarray(d_ga),
                                   np.asarray(jnp.diag(H) + 0.3), atol=1e-12)

    def test_gather_pcg_gn_matches_dense_gn_pose_graph(self):
        graph, values, _ = make_sphere_graph(n_poses=40, edges_per_pose=3.0,
                                             seed=2, dtype=jnp.float64,
                                             bucket=8)
        inc = build_incidence(graph, values)
        res_g = gn_optimize(graph, values, iterations=5, solver="pcg",
                            pcg_iters=400, damping=1e-9, inc=inc)
        res_d = gn_optimize(graph, values, iterations=5, solver="dense",
                            damping=1e-9)
        assert abs(float(res_g.error) - float(res_d.error)) \
            <= 1e-6 * max(float(res_d.error), 1e-9)
        np.testing.assert_allclose(np.asarray(res_g.values.pose_t),
                                   np.asarray(res_d.values.pose_t),
                                   atol=1e-5)

    def test_gather_pcg_on_ba_graph(self):
        """Mixed pose+point graph (projection + point priors) exercises the
        multi-table incidence construction."""
        graph, values, _ = make_ba_graph(n_poses=6, n_points=80,
                                         obs_per_point=3, seed=3,
                                         dtype=jnp.float64, bucket=8)
        e0 = float(total_error(graph, values))
        inc = build_incidence(graph, values)
        res_g = gn_optimize(graph, values, iterations=6, solver="pcg",
                            pcg_iters=500, damping=1e-6, inc=inc)
        res_d = gn_optimize(graph, values, iterations=6, solver="dense",
                            damping=1e-6)
        assert float(res_g.error) < 0.05 * e0
        assert abs(float(res_g.error) - float(res_d.error)) \
            <= 1e-3 * float(res_d.error)
