"""Batched multi-graph solving (graph.batch): vmap fleet == per-graph
solves, host wrapper ergonomics, and the data-parallel sharded variant.

No reference counterpart (the reference runs one estimator per process);
this is the TPU-native serving/sweep tier.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import (
    gn_optimize,
    gn_optimize_many,
    sharded_gn_many,
    solve_many,
    stack_pytrees,
    total_error,
    unstack_pytree,
)

pytestmark = pytest.mark.fast

B = 4


def _fleet(n_poses=40, bucket=16):
    pairs = [make_sphere_graph(n_poses=n_poses, edges_per_pose=3.0, seed=s,
                               dtype=jnp.float32, bucket=bucket)[:2]
             for s in range(B)]
    return pairs


class TestBatchedGn:
    def test_matches_per_graph_solves(self):
        pairs = _fleet()
        graphs = stack_pytrees([g for g, _ in pairs])
        arenas = stack_pytrees([v for _, v in pairs])
        res = gn_optimize_many(graphs, arenas, iterations=8, solver="pcg",
                               damping=1e-3, pcg_iters=50)
        assert res.error.shape == (B,)
        for k, (g, v) in enumerate(pairs):
            single = gn_optimize(g, v, iterations=8, solver="pcg",
                                 damping=1e-3, pcg_iters=50)
            np.testing.assert_allclose(float(res.error[k]),
                                       float(single.error),
                                       rtol=1e-4)
            # distinct seeds must give distinct problems/optima
        errs = np.asarray(res.error)
        assert len(np.unique(np.round(errs, 6))) == B

    def test_solve_many_wrapper(self):
        pairs = _fleet()
        out = solve_many(pairs, iterations=6, solver="dense", damping=1e-6)
        assert len(out) == B
        for (g, v), res in zip(pairs, out):
            e0 = float(total_error(g, v))
            assert float(res.error) < 0.1 * e0
            # unstacked leaves are unbatched
            assert res.values.pose_t.ndim == 2

    def test_solve_many_rejects_mismatched_shapes(self):
        g1, v1, _ = make_sphere_graph(n_poses=20, edges_per_pose=3.0,
                                      seed=0, bucket=16)
        g2, v2, _ = make_sphere_graph(n_poses=44, edges_per_pose=3.0,
                                      seed=1, bucket=16)
        with pytest.raises(ValueError, match="identical bucket"):
            solve_many([(g1, v1), (g2, v2)])

    def test_stack_unstack_round_trip(self):
        pairs = _fleet()
        stacked = stack_pytrees([v for _, v in pairs])
        back = unstack_pytree(stacked, B)
        np.testing.assert_array_equal(np.asarray(back[2].pose_t),
                                      np.asarray(pairs[2][1].pose_t))


class TestShardedBatch:
    def test_sharded_matches_unsharded(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from graph_slam_tpu.parallel import make_mesh

        pairs = _fleet()
        graphs = stack_pytrees([g for g, _ in pairs])
        arenas = stack_pytrees([v for _, v in pairs])
        mesh = make_mesh(4)
        res_sh = sharded_gn_many(mesh, graphs, arenas, iterations=8,
                                 solver="pcg", damping=1e-3, pcg_iters=50)
        res = gn_optimize_many(graphs, arenas, iterations=8, solver="pcg",
                               damping=1e-3, pcg_iters=50)
        np.testing.assert_allclose(np.asarray(res_sh.error),
                                   np.asarray(res.error), rtol=1e-4)

    def test_indivisible_batch_rejected(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from graph_slam_tpu.parallel import make_mesh

        pairs = _fleet()   # B=4 not divisible by 8... actually it is not
        graphs = stack_pytrees([g for g, _ in pairs])
        arenas = stack_pytrees([v for _, v in pairs])
        with pytest.raises(ValueError, match="divisible"):
            sharded_gn_many(make_mesh(8), graphs, arenas)
