"""Graduated non-convexity: outlier loop closures are rejected jointly.

The reference survives bad loop closures only via per-edge gates
(gtsam_graph.cpp:1790-1812) — an outlier that passes the gate corrupts the
trajectory. ``gnc_optimize`` (graph/gnc.py, GTSAM GncOptimizer role) must
recover the outlier-free solution and report ~0 weights on the planted
outliers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import np_lie
from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import gn_optimize, gnc_optimize, total_error


def _corrupt(graph, n_bad, seed=7, scale=3.0):
    """Replace n_bad random loop-closure measurements with garbage."""
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
    good = np.setdiff1d(idx, bad)
    return graph._replace(between=bt._replace(
        meas_R=jnp.asarray(meas_R), meas_t=jnp.asarray(meas_t))), bad, good


def _ate(values, ts):
    n = len(ts)
    d = np.asarray(values.pose_t[:n]) - ts
    return float(np.sqrt((d ** 2).sum(1).mean()))


@pytest.fixture(scope="module")
def corrupted():
    graph, values, (Rs, ts) = make_sphere_graph(
        n_poses=150, edges_per_pose=3.0, seed=0, dtype=jnp.float64,
        bucket=64)
    graph_bad, bad, good = _corrupt(graph, n_bad=10)
    return graph, graph_bad, values, ts, bad, good


class TestGnc:
    def test_plain_gn_is_corrupted(self, corrupted):
        graph, graph_bad, values, ts, _, _ = corrupted
        plain = gn_optimize(graph_bad, values, iterations=30)
        clean = gn_optimize(graph, values, iterations=30)
        assert _ate(plain.values, ts) > 10 * _ate(clean.values, ts)

    def test_tls_recovers_and_rejects(self, corrupted):
        graph, graph_bad, values, ts, bad, good = corrupted
        res = gnc_optimize(graph_bad, values, kind="tls")
        clean = gn_optimize(graph, values, iterations=30)
        assert _ate(res.values, ts) < 1.1 * _ate(clean.values, ts)
        w = np.asarray(res.weights)
        assert w[bad].max() < 1e-3          # outliers hard-rejected
        assert w[good].min() > 0.99         # inliers untouched
        inl = np.asarray(res.inliers)
        assert not inl[bad].any()
        assert inl[good].all()

    def test_gm_recovers(self, corrupted):
        graph, graph_bad, values, ts, bad, good = corrupted
        res = gnc_optimize(graph_bad, values, kind="gm")
        clean = gn_optimize(graph, values, iterations=30)
        assert _ate(res.values, ts) < 1.1 * _ate(clean.values, ts)
        w = np.asarray(res.weights)
        assert w[bad].max() < 0.05
        assert w[good].min() > 0.9

    def test_all_inlier_matches_gn(self):
        """With no outliers GNC must converge to the plain GN solution."""
        graph, values, _ = make_sphere_graph(
            n_poses=100, edges_per_pose=3.0, seed=2, dtype=jnp.float64,
            bucket=64)
        res = gnc_optimize(graph, values, kind="tls")
        ref = gn_optimize(graph, values, iterations=30)
        assert float(res.error) <= 1.01 * float(ref.error)
        idx = np.where(np.asarray(graph.between.active))[0]
        assert np.asarray(res.weights)[idx].min() > 0.999

    def test_candidates_mask_protects_edges(self, corrupted):
        """Edges outside the candidate set keep weight 1 even when bad."""
        _, graph_bad, values, _, bad, _ = corrupted
        cand = np.ones(graph_bad.between.active.shape, bool)
        cand[bad[:2]] = False                 # protect two outliers
        res = gnc_optimize(graph_bad, values, candidates=jnp.asarray(cand),
                           kind="tls")
        w = np.asarray(res.weights)
        np.testing.assert_allclose(w[bad[:2]], 1.0)
        assert w[bad[2:]].max() < 1e-3        # the rest still rejected

    def test_f32_pcg_path(self):
        graph, values, (_, ts) = make_sphere_graph(
            n_poses=120, edges_per_pose=3.0, seed=3, dtype=jnp.float32,
            bucket=64)
        graph_bad, bad, good = _corrupt(graph, n_bad=6, seed=9)
        res = gnc_optimize(graph_bad, values, kind="tls", solver="pcg",
                           pcg_iters=40, damping=1e-3)
        w = np.asarray(res.weights)
        assert w[bad].max() < 1e-3
        assert w[good].min() > 0.99
        assert res.values.pose_t.dtype == jnp.float32

    def test_bad_kind_raises(self, corrupted):
        _, graph_bad, values, _, _, _ = corrupted
        with pytest.raises(ValueError):
            gnc_optimize(graph_bad, values, kind="cauchy")


def test_run_pose_graph_gnc():
    """Pipeline wiring: SlamParams(robust='gnc-tls') shrugs off an
    outlier loop closure that corrupts the plain LM solve."""
    import jax.numpy as jnp

    from graph_slam_tpu.config import SlamParams
    from graph_slam_tpu.core import se3
    from graph_slam_tpu.io.vro_log import VROLog
    from graph_slam_tpu.pipelines import run_pose_graph

    n = 24
    gt = [(np_lie.so3_exp([0, 0, 2 * np.pi * k / n]),
           np.array([np.cos(2 * np.pi * k / n),
                     np.sin(2 * np.pi * k / n), 0.0])) for k in range(n)]

    def rel(i, j):
        Ri, ti = gt[i]
        Rj, tj = gt[j]
        T = se3.Pose(jnp.asarray(Ri.T @ Rj), jnp.asarray(Ri.T @ (tj - ti)))
        return np.asarray(se3.logmap(T))

    info = np.eye(6) * 100
    rows = [(k, k - 1, rel(k - 1, k), info) for k in range(1, n)]
    rows.append((n - 1, 0, rel(0, n - 1), info))           # true loop
    rows.append((n // 2, 2, np.array([2.0, -1.0, 0.5,      # OUTLIER loop
                                      0.9, -0.7, 0.4]), info))
    log = VROLog(np.asarray([r[0] for r in rows]),
                 np.asarray([r[1] for r in rows]),
                 np.stack([r[2] for r in rows]),
                 np.stack([r[3] for r in rows]))

    plain = run_pose_graph(log, SlamParams(), bucket=32)
    robust = run_pose_graph(log, SlamParams(robust="gnc-tls"), bucket=32)
    # the pipeline anchors node 0 at identity (first-node prior), so
    # gauge-align the ground truth to start at the origin (R_gt[0] = I)
    ts = np.stack([t for _, t in gt])
    ts = ts - ts[0]

    def ate(res):
        d = np.asarray(res.values.pose_t[:n]) - ts
        return float(np.sqrt((d ** 2).sum(1).mean()))

    assert ate(robust) < 0.05
    assert ate(robust) < 0.2 * ate(plain)
