"""End-to-end offline pose-graph pipeline test (test_gt_graph twin).

Simulates a circle trajectory, writes a VRO log in the reference format
(including a failed-edge sentinel and loop closures), replays it through
``run_pose_graph``, and asserts chi2 collapse + trajectory recovery.
"""

import numpy as np
import pytest

import np_lie
from graph_slam_tpu.config import SlamParams
from graph_slam_tpu.io import VROLog, read_vro_log, write_vro_log
from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL
from graph_slam_tpu.pipelines.posegraph import (
    build_pose_graph,
    run_pose_graph,
    trajectory_arrays,
)


def simulate_circle_log(n=16, noise=0.01, seed=0, with_failed=True):
    r = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        gt.append((np_lie.so3_exp([0, 0, ang]),
                   np.array([np.cos(ang), np.sin(ang), 0.0])))

    id_to, id_from, xis, infos = [], [], [], []
    info = np.diag([400.0, 400.0, 400.0, 100.0, 100.0, 100.0])

    def add_edge(i, j, failed=False):
        id_from.append(i)
        id_to.append(j)
        if failed:
            xis.append(np.zeros(6))
            infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
            return
        R, t = np_lie.between(gt[i], gt[j])
        xi = np_lie.se3_log(R, t) + r.normal(size=6) * noise
        xis.append(xi)
        infos.append(info)

    for k in range(n - 1):
        add_edge(k, k + 1, failed=(with_failed and k == n // 2))
    # loop closures
    add_edge(0, n - 1)
    add_edge(0, n // 2)
    add_edge(n // 4, 3 * n // 4)

    return VROLog(np.asarray(id_to), np.asarray(id_from), np.stack(xis),
                  np.stack(infos)), gt


class TestPoseGraphPipeline:
    def test_chi2_decreases_and_converges(self):
        log, gt = simulate_circle_log(noise=0.02, seed=1)
        res = run_pose_graph(log, SlamParams(), bucket=64)
        assert res.error < res.error0
        assert res.error < 20.0  # consistent with 0.02 noise vs sigma 0.05

    def test_recovers_trajectory_noise_free(self):
        log, gt = simulate_circle_log(noise=0.0, seed=2, with_failed=False)
        res = run_pose_graph(log, SlamParams(), bucket=64)
        assert res.error < 1e-12
        ids, t, q, seq = trajectory_arrays(res.values, res.seq_ids)
        # node 0 is anchored at identity (reference firstNode semantics), so
        # the estimate lives in the frame of gt[0]
        for k in range(len(gt)):
            _, t_exp = np_lie.between(gt[0], gt[k])
            np.testing.assert_allclose(t[k], t_exp, atol=1e-6)

    def test_failed_edge_becomes_identity_edge(self):
        """Sentinel info == 10000 doubles as the fake-odo information
        (gtsam_graph.cpp:697-722): in pure-VO replay the edge is kept with
        exactly that weight."""
        log, gt = simulate_circle_log(noise=0.0, seed=3, with_failed=True)
        graph, values, seq_ids = build_pose_graph(log, SlamParams(), bucket=64)
        # all sequential edges kept (incl. sentinel) + 3 loop closures
        n_active = int(np.asarray(graph.between.active).sum())
        assert n_active == len(log)

    def test_roundtrip_through_file(self, tmp_path):
        log, gt = simulate_circle_log(noise=0.01, seed=4)
        p = str(tmp_path / "vro_results.log")
        write_vro_log(p, log)
        res = run_pose_graph(read_vro_log(p), SlamParams(), bucket=64)
        res2 = run_pose_graph(log, SlamParams(), bucket=64)
        np.testing.assert_allclose(res.error, res2.error, rtol=1e-12)

    def test_seq_id_mapping_with_keyframe_gaps(self):
        """Sequence ids with gaps (keyframe decimation) map to dense graph
        ids — correctMatchingID semantics (gtsam_graph.cpp:1626-1649)."""
        log, gt = simulate_circle_log(noise=0.0, seed=5, with_failed=False)
        log = VROLog(log.id_to * 3 + 1, log.id_from * 3 + 1, log.xi, log.info)
        res = run_pose_graph(log, SlamParams(), bucket=64)
        assert res.error < 1e-12
        assert list(res.seq_ids[:4]) == [1, 4, 7, 10]
