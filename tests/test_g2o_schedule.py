"""g2o LM-schedule fidelity (round-3 verdict ask #8).

The reference's g2o backend optimizes with 20 LM iterations executed as 10
``optimize(2)`` calls, each call re-initializing lambda
(``/root/reference/g2o/g2o_graph.cpp:241-252``); GTSAM's batch LM uses a
monotone fixed-factor lambda schedule. Both reach the same optimum on a
common graph; the chi2 TRAJECTORIES differ. These tests pin both — and pin
both backends' final chi2 on the golden VRO log, where the two backends
genuinely diverge (the failed-edge fake-odometry weighting differs:
gtsam I*1e4 vs g2o I*1e-3).
"""

import os

import numpy as np
import pytest

from graph_slam_tpu.config import SlamParams
from graph_slam_tpu.graph import LMParams, lm_optimize, lm_optimize_g2o
from graph_slam_tpu.io import VROLog, read_vro_log
from graph_slam_tpu.pipelines import run_pose_graph
from test_optimizer import make_circle_graph

pytestmark = pytest.mark.fast

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _perturbed_circle():
    b, _ = make_circle_graph(n=30, noise=0.05, init_noise=0.6, seed=3)
    return b.build(bucket=64)


class TestG2oSchedule:
    def test_same_optimum_different_trajectory(self):
        """Nielsen-per-chunk vs GTSAM fixed-factor: same minimum, visibly
        different route (measured: 0.88% chi2 difference after 2
        iterations, 6e-9 relative agreement at convergence)."""
        graph, values = _perturbed_circle()
        res_g2o = lm_optimize_g2o(graph, values)
        res_gt = lm_optimize(graph, values)
        e_g2o, e_gt = float(res_g2o.error), float(res_gt.error)
        assert abs(e_g2o - e_gt) <= 1e-6 * e_gt

        # per-chunk history: finite, non-increasing, length = chunks
        hist = np.asarray(res_g2o.history)
        assert hist.shape == (10,)
        assert np.isfinite(hist).all()
        assert (np.diff(hist) <= 1e-9 * hist[:-1] + 1e-12).all()

        # the schedules measurably diverge mid-run (the lambda re-init +
        # Nielsen adaptation vs the fixed factor-10 ladder)
        e2_g2o = float(lm_optimize_g2o(graph, values, total_iters=2,
                                       chunks=1).error)
        e2_gt = float(lm_optimize(
            graph, values,
            LMParams(max_iterations=2, relative_error_tol=0.0,
                     absolute_error_tol=0.0)).error)
        rel = abs(e2_g2o - e2_gt) / e2_gt
        assert 1e-4 < rel < 0.5, rel

    def test_backends_agree_on_clean_log(self):
        """Without failed edges the two backends share the graph, so the
        different schedules must land on the same optimum."""
        log = read_vro_log(os.path.join(HERE, "posegraph_vro.log"))
        ok = log.valid
        clean = VROLog(log.id_to[ok], log.id_from[ok], log.xi[ok],
                       log.info[ok])
        r_gt = run_pose_graph(clean, SlamParams(), bucket=64,
                              backend="gtsam")
        r_g2o = run_pose_graph(clean, SlamParams(), bucket=64,
                               backend="g2o")
        # noise-free fixture: both optima are ~0 (scale set by error0)
        scale = max(r_gt.error0, 1.0)
        assert r_gt.error <= 1e-12 * scale
        assert r_g2o.error <= 1e-12 * scale

    def test_backends_pinned_on_golden_log(self):
        """On the full golden log (1 failed edge) the backends differ by
        design — fake-odo info I*1e4 (gtsam_graph.cpp:697-722) vs I*1e-3
        (g2o_graph.cpp:151) — AND by schedule. Pin both final chi2."""
        log = read_vro_log(os.path.join(HERE, "posegraph_vro.log"))
        r_gt = run_pose_graph(log, SlamParams(), bucket=64,
                              backend="gtsam")
        r_g2o = run_pose_graph(log, SlamParams(), bucket=64, backend="g2o")
        # gtsam value is the long-standing golden (chi2.json vro_error)
        assert abs(r_gt.error - 5.613857156515794) < 1e-6
        # g2o value pinned 2026-08-19 (this round): chunked-Nielsen LM on
        # the g2o-weighted graph (the soft I*1e-3 fake-odo edge leaves a
        # much smaller residual at the optimum than gtsam's stiff I*1e4)
        assert abs(r_g2o.error - 0.1673486302270372) < 1e-4 * 0.167


class TestG2oAnchorPlacement:
    def test_anchor_not_on_first_pose(self):
        """lambda0 must exclude whichever pose carries the gauge prior —
        not a hard-coded pose 0 (round-4 review). With the anchor on pose
        5, lambda0 = tau * max_i H_ii over FREE slots stays ~O(edge info)
        and the Nielsen schedule converges to the GTSAM-LM optimum."""
        import np_lie
        from graph_slam_tpu.graph import GraphBuilder

        r = np.random.default_rng(7)
        n, anchor = 24, 5
        gt = []
        for k in range(n):
            ang = 2 * np.pi * k / n
            R = np_lie.so3_exp([0.0, 0.0, ang])
            t = np.array([np.cos(ang), np.sin(ang), 0.0])
            gt.append((R, t))
        b = GraphBuilder()
        for k, (R, t) in enumerate(gt):
            b.add_pose((R, t) if k == anchor
                       else np_lie.retract((R, t), r.normal(size=6) * 0.3))
        b.add_prior_pose(anchor, gt[anchor], sigmas=np.full(6, 1e-7))
        info = np.diag([100.0] * 3 + [25.0] * 3)
        for k in range(n - 1):
            b.add_between(k, k + 1, np_lie.between(gt[k], gt[k + 1]),
                          information=info)
        b.add_between(n - 1, 0, np_lie.between(gt[n - 1], gt[0]),
                      information=info)
        graph, values = b.build(bucket=32)

        res_g2o = lm_optimize_g2o(graph, values)
        res_gt = lm_optimize(graph, values)
        e_g2o, e_gt = float(res_g2o.error), float(res_gt.error)
        # the old [:6] assumption left lambda0 ~1e7: every step rejected,
        # chi2 barely moved. The derived mask must reach the optimum.
        assert e_g2o <= (1.0 + 1e-6) * e_gt + 1e-9, (e_g2o, e_gt)

    def test_run_pose_graph_honors_iteration_budget(self):
        """backend='g2o' must honor the caller's lm_params.max_iterations
        (round-4 review: it silently ignored lm_params entirely)."""
        log = read_vro_log(os.path.join(HERE, "posegraph_vro.log"))
        r4 = run_pose_graph(log, SlamParams(), bucket=64, backend="g2o",
                            lm_params=LMParams(max_iterations=4))
        assert r4.iterations == 4
        r20 = run_pose_graph(log, SlamParams(), bucket=64, backend="g2o")
        assert r20.iterations == 20
        # 4 Nielsen iterations land short of the 20-iteration optimum or
        # at it; either way the result must be a real descent
        assert r4.error < r4.error0
