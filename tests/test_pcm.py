"""PCM loop-closure gating: planted outliers are rejected jointly.

The reference's only per-edge defense is the motion gate
(gtsam_graph.cpp:1790-1812); ``graph.pcm`` (Mangelson et al., ICRA 2018)
must keep the mutually-consistent loop set and drop planted gross
outliers BEFORE optimization — and compose with GNC downstream.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import np_lie
from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import (gn_optimize, max_clique, pcm_mask,
                                  total_error)

pytestmark = pytest.mark.fast


def _corrupt(graph, n_bad, seed=7, scale=3.0):
    bt = graph.between
    idx = np.where(np.asarray(bt.active))[0]
    i, j = np.asarray(bt.i), np.asarray(bt.j)
    lc = idx[(j[idx] - i[idx]) > 1]
    rng = np.random.default_rng(seed)
    bad = rng.choice(lc, size=n_bad, replace=False)
    meas_R = np.array(bt.meas_R)
    meas_t = np.array(bt.meas_t)
    for e in bad:
        meas_R[e] = np_lie.so3_exp(rng.normal(size=3))
        meas_t[e] = rng.normal(size=3) * scale
    good = np.setdiff1d(lc, bad)
    return graph._replace(between=bt._replace(
        meas_R=jnp.asarray(meas_R), meas_t=jnp.asarray(meas_t))), bad, good


def _ate(values, ts):
    n = len(ts)
    d = np.asarray(values.pose_t[:n]) - ts
    return float(np.sqrt((d ** 2).sum(1).mean()))


@pytest.fixture(scope="module")
def corrupted():
    graph, values, (Rs, ts) = make_sphere_graph(
        n_poses=120, edges_per_pose=3.0, seed=0, dtype=jnp.float64,
        bucket=64)
    graph_bad, bad, good = _corrupt(graph, n_bad=8)
    return graph, graph_bad, values, ts, bad, good


class TestMaxClique:
    def test_exact_on_known_graph(self):
        # clique {0,1,2,3} + pendant structure
        n = 7
        adj = np.zeros((n, n), bool)
        for a in range(4):
            for b in range(4):
                adj[a, b] = True
        adj[4, 5] = adj[5, 4] = True
        adj[5, 6] = adj[6, 5] = True
        np.fill_diagonal(adj, True)
        assert max_clique(adj) == [0, 1, 2, 3]

    def test_empty_and_singleton(self):
        assert max_clique(np.zeros((0, 0), bool)) == []
        assert max_clique(np.ones((1, 1), bool)) == [0]


class TestPcm:
    def test_rejects_planted_outliers(self, corrupted):
        _, graph_bad, values, _, bad, good = corrupted
        res = pcm_mask(graph_bad, values)
        acc = res.accepted
        assert not acc[bad].any(), "an outlier loop survived PCM"
        # the great majority of true loops must survive (drifted odometry
        # can legitimately cost a borderline one)
        assert acc[good].mean() > 0.9
        # odometry rows are never gated
        bt = graph_bad.between
        odo = (np.asarray(bt.j) - np.asarray(bt.i) == 1) \
            & np.asarray(bt.active)
        assert acc[odo].all()

    def test_clean_graph_keeps_nearly_all_loops(self, corrupted):
        # a fraction of inlier pairs legitimately lands in the chi2 tail
        # (the test runs on all L^2 pairs, and this fixture's initial
        # values carry independent per-pose noise rather than true
        # odometry drift), so "all" is not achievable by construction —
        # but the clique must keep essentially everything
        graph, _, values, _, _, _ = corrupted
        res = pcm_mask(graph, values)
        assert res.accepted.mean() > 0.95

    def test_gated_solve_matches_outlier_free(self, corrupted):
        graph, graph_bad, values, ts, _, _ = corrupted
        res = pcm_mask(graph_bad, values)
        bt = graph_bad.between
        gated = graph_bad._replace(between=bt._replace(
            active=bt.active & jnp.asarray(res.accepted)))
        sol_gated = gn_optimize(gated, values, iterations=30)
        sol_clean = gn_optimize(graph, values, iterations=30)
        assert _ate(sol_gated.values, ts) < 2.0 * _ate(sol_clean.values, ts)
        # and the ungated solve really is corrupted (sanity of the fixture)
        sol_bad = gn_optimize(graph_bad, values, iterations=30)
        assert _ate(sol_bad.values, ts) > 5.0 * _ate(sol_clean.values, ts)

    def test_single_outlier_vs_single_inlier_tie(self):
        # pairwise consistency alone cannot decide between ONE good and
        # ONE wild loop (two size-1 cliques) — the unary odometry check
        # must break the tie toward the good one
        from graph_slam_tpu.graph import GraphBuilder

        rng = np.random.default_rng(5)
        b = GraphBuilder(dtype=jnp.float64)
        n = 20
        xs = 0.1 * np.arange(n)
        for k in range(n):
            b.add_pose((np.eye(3), np.array([xs[k], 0.0, 0.0])))
        b.add_prior_pose(0, (np.eye(3), np.zeros(3)),
                         sigmas=np.full(6, 1e-6))
        info = np.eye(6) * 400.0
        for k in range(n - 1):
            b.add_between(k, k + 1, (np.eye(3), np.array([0.1, 0, 0])),
                          information=info)
        # good loop 0 -> n-1, wild loop 1 -> n-2
        b.add_between(0, n - 1, (np.eye(3), np.array([0.1 * (n - 1), 0, 0])),
                      information=info)
        bad_R = np_lie.so3_exp(rng.normal(size=3))
        b.add_between(1, n - 2, (bad_R, rng.normal(size=3) * 2.0),
                      information=info)
        graph, values = b.build(bucket=32)
        res = pcm_mask(graph, values)
        bt = graph.between
        i, j = np.asarray(bt.i), np.asarray(bt.j)
        good_row = np.flatnonzero((i == 0) & (j == n - 1))[0]
        bad_row = np.flatnonzero((i == 1) & (j == n - 2))[0]
        assert res.accepted[good_row]
        assert not res.accepted[bad_row]

    def test_m2_symmetric_and_thresholded(self, corrupted):
        _, graph_bad, values, _, _, _ = corrupted
        res = pcm_mask(graph_bad, values)
        assert res.m2.shape[0] == res.m2.shape[1] == len(res.candidate_rows)
        assert np.allclose(res.m2, res.m2.T)
        assert res.threshold > 0


class TestPipeline:
    def test_run_pose_graph_loop_gate(self, tmp_path):
        # small chain with one gross outlier closure: the gated run must
        # land near the clean optimum, the ungated one must not
        from graph_slam_tpu.config import SlamParams
        from graph_slam_tpu.io import VROLog
        from graph_slam_tpu.pipelines import run_pose_graph

        rng = np.random.default_rng(3)
        n = 40
        id_to = list(range(1, n))
        id_from = list(range(0, n - 1))
        xi = np.zeros((n - 1, 6))
        xi[:, 3] = 0.1
        xi[:, :3] += 0.002 * rng.standard_normal((n - 1, 3))
        xi[:, 3:] += 0.002 * rng.standard_normal((n - 1, 3))
        # two consistent loop closures + one wild outlier
        loops = [(n - 1, 0, None), (n - 5, 2, None),
                 (n - 3, 1, rng.standard_normal(6) * 2.0)]
        for to, frm, fake in loops:
            id_to.append(to)
            id_from.append(frm)
            row = np.zeros(6)
            if fake is None:
                row[3] = 0.1 * (to - frm)
            else:
                row = fake
            xi = np.vstack([xi, row[None]])
        info = np.tile(np.eye(6)[None] * 400.0, (len(id_to), 1, 1))
        log = VROLog(np.asarray(id_to), np.asarray(id_from), xi, info)

        gated = run_pose_graph(log, SlamParams(), loop_gate="pcm")
        plain = run_pose_graph(log, SlamParams())
        assert gated.error < 0.05 * plain.error

    def test_unknown_gate_raises(self):
        from graph_slam_tpu.config import SlamParams
        from graph_slam_tpu.io import VROLog
        from graph_slam_tpu.pipelines import run_pose_graph

        log = VROLog(np.array([1]), np.array([0]),
                     np.zeros((1, 6)), np.eye(6)[None] * 100)
        with pytest.raises(ValueError):
            run_pose_graph(log, SlamParams(), loop_gate="nope")
