"""Trajectory evaluation tier: ate_stats/rpe_stats math and the `evaluate`
CLI (the TUM benchmark's evaluate_ate/evaluate_rpe role)."""

import json

import numpy as np

from test_cli import run_cli
from graph_slam_tpu.io import write_trajectory
from graph_slam_tpu.utils.metrics import ate_stats, rpe_stats
import pytest

pytestmark = pytest.mark.fast


def _quat_identity(n):
    q = np.zeros((n, 4))
    q[:, 0] = 1.0
    return q


class TestStats:
    def test_ate_stats_aligns_away_rigid_offset(self):
        rng = np.random.default_rng(0)
        gt = rng.normal(size=(40, 3))
        # est = rotated + shifted gt plus tiny noise
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        est = (R @ gt.T).T + np.array([5.0, -2.0, 1.0]) \
            + 1e-3 * rng.normal(size=gt.shape)
        stats, aligned = ate_stats(est, gt)
        assert stats["rmse"] < 5e-3
        assert stats["n"] == 40 and stats["scale"] == 1.0
        assert stats["min"] <= stats["median"] <= stats["max"]
        np.testing.assert_allclose(aligned, gt, atol=0.01)

    def test_ate_stats_sim3_scale(self):
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(30, 3))
        est = 0.5 * gt
        stats, _ = ate_stats(est, gt, with_scale=True)
        assert abs(stats["scale"] - 2.0) < 1e-9
        assert stats["rmse"] < 1e-12

    def test_rpe_stats_drift(self):
        gt = np.zeros((10, 3))
        gt[:, 0] = np.arange(10)
        est = gt.copy()
        est[:, 0] += 0.01 * np.arange(10)       # 1 cm/frame drift
        rp = rpe_stats(est, gt, delta=1)
        assert abs(rp["rmse"] - 0.01) < 1e-9
        assert rp["delta"] == 1 and rp["n"] == 9
        rp2 = rpe_stats(est, gt, delta=2)
        assert abs(rp2["rmse"] - 0.02) < 1e-9


def test_evaluate_cli_framework_gt(tmp_path):
    n = 12
    gt_t = np.zeros((n, 3))
    gt_t[:, 0] = 0.1 * np.arange(n)
    est_t = gt_t + np.array([0.002, 0.0, 0.0])   # pure offset: aligns away
    q = _quat_identity(n)
    ids = np.arange(n)
    write_trajectory(str(tmp_path / "gt.log"), ids, gt_t, q, ids)
    write_trajectory(str(tmp_path / "est.log"), ids, est_t, q, ids)
    out = run_cli("evaluate", "--est", str(tmp_path / "est.log"),
                  "--gt", str(tmp_path / "gt.log"),
                  "--json", str(tmp_path / "m.json"),
                  "--aligned", str(tmp_path / "aligned.ply"))
    assert "ATE  rmse" in out and "RPE(1)" in out
    m = json.load(open(tmp_path / "m.json"))
    assert m["ate"]["rmse"] < 1e-9
    assert m["rpe"]["rmse"] < 1e-9
    assert (tmp_path / "aligned.ply").exists()


def test_evaluate_cli_tum_gt(tmp_path):
    """TUM-format gt: association through the sequence dir's timestamps."""
    # minimal TUM dir: only rgb.txt/depth.txt matter for timestamps
    seq = tmp_path / "seq"
    seq.mkdir()
    n = 6
    ts = 20.0 + 0.1 * np.arange(n)
    (seq / "rgb.txt").write_text(
        "\n".join(f"{t:.6f} rgb/{t:.6f}.png" for t in ts) + "\n")
    (seq / "depth.txt").write_text(
        "\n".join(f"{t + 0.003:.6f} depth/{t:.6f}.png" for t in ts) + "\n")
    gt_lines = [f"{t:.6f} {0.1 * k:.6f} 0.0 0.0 0.0 0.0 0.0 1.0"
                for k, t in enumerate(ts)]
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    est_t = np.zeros((n, 3))
    est_t[:, 1] = -0.1 * np.arange(n)     # same path, rotated 90 deg
    ids = np.arange(n)
    write_trajectory(str(tmp_path / "est.log"), ids, est_t,
                     _quat_identity(n), ids)
    out = run_cli("evaluate", "--est", str(tmp_path / "est.log"),
                  "--gt", str(tmp_path / "groundtruth.txt"),
                  "--frames", str(seq),
                  "--json", str(tmp_path / "m.json"))
    m = json.load(open(tmp_path / "m.json"))
    assert m["ate"]["rmse"] < 1e-9       # rotation aligned away
    assert m["ate"]["n"] == n
