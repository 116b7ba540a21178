"""Pose marginalization + Chow-Liu sparsification (graph.sparsify).

Exact-case pin: marginalizing an interior chain pose composes its two
odometry edges (single-edge Chow-Liu tree is exact). Approximation case:
sparsifying a loopy graph must preserve the optimized trajectory of the
kept poses to within a small multiple of the measurement noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.core import se3
from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import (GraphBuilder, chow_liu_tree, gn_optimize,
                                  marginalize_poses, total_error)

pytestmark = pytest.mark.fast


def _chain(n=8, noise=0.0, seed=0, info_rot=400.0, info_t=100.0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder(dtype=np.float64)
    xs = 0.1 * np.arange(n)
    for k in range(n):
        b.add_pose((np.eye(3), np.array([xs[k], 0.0, 0.0])))
    b.add_prior_pose(0, (np.eye(3), np.zeros(3)), sigmas=np.full(6, 1e-6))
    info = np.diag([info_rot] * 3 + [info_t] * 3)
    for k in range(n - 1):
        t = np.array([0.1, 0.0, 0.0]) + noise * rng.standard_normal(3)
        b.add_between(k, k + 1, (np.eye(3), t), information=info)
    return b.build(bucket=16)


class TestChowLiuTree:
    def test_tree_shape(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(18, 18))
        cov = A @ A.T + 18 * np.eye(18)
        edges = chow_liu_tree(cov, 3)
        assert len(edges) == 2
        # spanning: every node reached from root 0
        reached = {0}
        for p, q in edges:
            assert p in reached
            reached.add(q)
        assert reached == {0, 1, 2}

    def test_small(self):
        assert chow_liu_tree(np.eye(6), 1) == []
        assert chow_liu_tree(np.zeros((0, 0)), 0) == []


class TestExactChain:
    def test_interior_pose_composes_exactly(self):
        # chain 0-1-2: dropping 1 must produce one 0->2 edge whose
        # information equals the brute-force Schur complement of the two
        # odometry edges — and re-optimizing the marginalized graph must
        # stay at the full solution. Marginalization happens AT the MAP
        # (the zero-residual between construction assumes it)
        graph, values = _chain(n=3, noise=0.01, seed=1)
        full = gn_optimize(graph, values, iterations=20)
        g2, v2, old2new = marginalize_poses(graph, full.values, [1],
                                            bucket=8)
        assert old2new == {0: 0, 2: 1}
        bt = g2.between
        act = np.flatnonzero(np.asarray(bt.active))
        assert len(act) == 1
        marg = gn_optimize(g2, v2, iterations=20)
        tf = np.asarray(full.values.pose_t)[[0, 2]]
        tm = np.asarray(marg.values.pose_t)[[0, 1]]
        np.testing.assert_allclose(tm, tf, atol=1e-9)

    def test_dropping_leaf_loses_nothing(self):
        graph, values = _chain(n=4, noise=0.01, seed=2)
        full = gn_optimize(graph, values, iterations=20)
        g2, v2, _ = marginalize_poses(graph, full.values, [3], bucket=8)
        bt = g2.between
        # the leaf's single edge vanishes; no replacement is created
        assert int(np.asarray(bt.active).sum()) == 2
        marg = gn_optimize(g2, v2, iterations=20)
        np.testing.assert_allclose(np.asarray(marg.values.pose_t)[:3],
                                   np.asarray(full.values.pose_t)[:3],
                                   atol=1e-9)


class TestSparsifyLoopy:
    def test_half_the_poses_removed_trajectory_preserved(self):
        graph, values, (Rs, ts) = make_sphere_graph(
            n_poses=60, edges_per_pose=3.0, meas_noise=0.01,
            init_noise=0.02, seed=0, dtype=jnp.float64, bucket=64)
        full = gn_optimize(graph, values, iterations=30)
        drop = np.arange(1, 60, 2)           # every other pose (keep 0)
        g2, v2, old2new = marginalize_poses(graph, full.values, drop,
                                            bucket=32)
        keep = np.array(sorted(old2new))
        marg = gn_optimize(g2, v2, iterations=30)
        tf = np.asarray(full.values.pose_t)[keep]
        tm = np.asarray(marg.values.pose_t)[:len(keep)]
        # the Chow-Liu approximation must hold the kept trajectory at the
        # full solution (both already optimized; the rebuild starts AT the
        # full estimate, so drift means the approximation pulled it away)
        err = np.sqrt(((tm - tf) ** 2).sum(1).mean())
        assert err < 0.01, err
        # and no factor references a dropped pose
        bt = g2.between
        act = np.asarray(bt.active)
        assert int(max(np.asarray(bt.i)[act].max(),
                       np.asarray(bt.j)[act].max())) < len(keep)

    def test_chi2_stays_consistent(self):
        graph, values, _ = make_sphere_graph(
            n_poses=40, edges_per_pose=3.0, meas_noise=0.01,
            init_noise=0.02, seed=1, dtype=jnp.float64, bucket=64)
        full = gn_optimize(graph, values, iterations=30)
        g2, v2, _ = marginalize_poses(graph, full.values,
                                      np.arange(1, 40, 3), bucket=32)
        # the rebuilt graph at the linearization point must already be
        # near its optimum (residuals of the CLT edges are 0 there)
        e_lin = float(total_error(g2, v2))
        res = gn_optimize(g2, v2, iterations=20)
        assert float(res.error) <= e_lin + 1e-9


class TestCli:
    def test_sparsify_driver(self, tmp_path):
        import os
        import subprocess
        import sys

        from graph_slam_tpu.io import (VROLog, read_g2o, read_trajectory,
                                       write_vro_log)

        rng = np.random.default_rng(7)
        n = 20
        id_to = list(range(1, n)) + [n - 1]
        id_from = list(range(0, n - 1)) + [0]
        xi = np.zeros((n, 6))
        xi[:n - 1, 3] = 0.1
        xi[:n - 1] += 0.003 * rng.standard_normal((n - 1, 6))
        xi[-1, 3] = 0.1 * (n - 1)
        info = np.tile(np.eye(6)[None] * 400.0, (n, 1, 1))
        vro = tmp_path / "v.log"
        write_vro_log(str(vro), VROLog(np.asarray(id_to),
                                       np.asarray(id_from), xi, info))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-m", "graph_slam_tpu", "sparsify",
             "--vro", str(vro), "--keep-every", "2",
             "--out-dir", str(tmp_path / "out")],
            env=env, capture_output=True, text=True, timeout=420)
        assert out.returncode == 0, (out.stdout[-500:], out.stderr[-800:])
        traj = read_trajectory(str(tmp_path / "out" / "trajectory.log"))
        assert len(traj.ids) == 10
        verts, edges = read_g2o(str(tmp_path / "out" / "sparsified.g2o"))
        assert len(verts) == 10 and len(edges) >= 9


class TestGuards:
    def test_dropping_anchored_pose_raises(self):
        graph, values = _chain(n=4)
        with pytest.raises(ValueError, match="prior"):
            marginalize_poses(graph, values, [0])

    def test_out_of_range_raises(self):
        graph, values = _chain(n=4)
        with pytest.raises(ValueError, match="range"):
            marginalize_poses(graph, values, [99])

    def test_vio_graph_rejected(self):
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, _ = make_ba_graph(n_poses=4, n_points=30,
                                         obs_per_point=2, seed=0,
                                         bucket=16)
        with pytest.raises(ValueError, match="pose graphs only"):
            marginalize_poses(graph, values, [2])
