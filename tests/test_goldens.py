"""Golden-fixture parity gates (VERDICT round-1 ask #4).

Committed fixtures (tests/goldens/, regenerable via generate.py) pin the
optimizer's conventions: noise whitening, the GTSAM LM lambda schedule,
SE(3) retraction, sentinel/failed-edge handling, trajectory output format.
Any convention drift moves the final chi2 or the trajectory and fails here
at the 1e-6 relative bar — the BASELINE.json north star as a test, not an
aspiration. Also smoke-tests the CLI end to end on the committed log.
"""

import json
import os
import subprocess
import sys

import numpy as np

from graph_slam_tpu.config import SlamParams
from graph_slam_tpu.graph import LMParams
from graph_slam_tpu.io import read_trajectory, read_vro_log
from graph_slam_tpu.pipelines import (
    run_g2o_file,
    run_pose_graph,
    trajectory_arrays,
)
import pytest

pytestmark = pytest.mark.fast

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
PINS = json.load(open(os.path.join(HERE, "chi2.json")))


class TestVroGolden:
    def test_chi2_and_trajectory_match_pinned(self):
        log = read_vro_log(os.path.join(HERE, "posegraph_vro.log"))
        res = run_pose_graph(log, SlamParams(), bucket=64)
        assert abs(res.error0 - PINS["vro_error0"]) \
            <= 1e-6 * PINS["vro_error0"]
        assert abs(res.error - PINS["vro_error"]) \
            <= 1e-6 * PINS["vro_error"]

        golden = read_trajectory(os.path.join(HERE, "posegraph_traj.log"))
        ids, t, q, seq = trajectory_arrays(res.values, res.seq_ids)
        np.testing.assert_allclose(t, golden.t, atol=1e-9)
        np.testing.assert_allclose(q, golden.quat, atol=1e-9)
        np.testing.assert_array_equal(seq, golden.seq)


class TestG2oKnownOptimum:
    def test_g2o_ingest_reaches_pinned_optimum(self):
        """Standard-format g2o pose graph -> LM -> the pinned optimal chi2.

        The same path ingests public known-optimum datasets (sphere2500's
        published optimum) when their files are available.
        """
        res = run_g2o_file(
            os.path.join(HERE, "sphere200_noisy.g2o"),
            LMParams(relative_error_tol=1e-12, absolute_error_tol=1e-12),
            bucket=64)
        assert abs(res.error0 - PINS["g2o_error0"]) \
            <= 1e-6 * PINS["g2o_error0"]
        assert abs(res.error - PINS["g2o_error"]) \
            <= 1e-6 * PINS["g2o_error"]


class TestCliSmoke:
    def test_cli_posegraph_on_golden_log(self, tmp_path):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = (os.path.dirname(HERE and os.path.dirname(HERE))
                             + os.pathsep + env.get("PYTHONPATH", ""))
        out = subprocess.run(
            [sys.executable, "-m", "graph_slam_tpu", "posegraph",
             "--vro", os.path.join(HERE, "posegraph_vro.log"),
             "--out-dir", str(tmp_path)],
            env=env, capture_output=True, text=True, timeout=420,
            cwd=os.path.dirname(os.path.dirname(HERE)))
        assert out.returncode == 0, out.stderr
        assert "chi2" in out.stdout
        traj = read_trajectory(str(tmp_path / "trajectory.log"))
        assert len(traj.ids) == 40
        # the CLI writes in the reference's world frame (T_w2o applied,
        # writeTrajectory gtsam_graph.cpp:1819-1840); map the golden there
        from graph_slam_tpu.core import extrinsics

        w2o = extrinsics.world_to_original(0.0)
        R = np.asarray(w2o.R)
        tw = np.asarray(w2o.t)
        golden = read_trajectory(os.path.join(HERE, "posegraph_traj.log"))
        np.testing.assert_allclose(traj.t, golden.t @ R.T + tw, atol=1e-9)


class TestBaGolden:
    def test_ba_fixture_reaches_pinned_optimum(self):
        """Committed BA fixture (Cal3DS2 projections, body_P_sensor, point
        priors): both the LM optimizer and the square-root Schur GN must
        land on the optimum pinned from the independent NumPy LM."""
        import jax.numpy as jnp

        from graph_slam_tpu.graph import (GraphBuilder, lm_optimize,
                                          total_error)
        from graph_slam_tpu.graph.ba_solve import ba_gn_optimize_sqrt

        fx = json.load(open(os.path.join(HERE, "ba_fixture.json")))
        b = GraphBuilder(dtype=jnp.float64)
        for R, t in fx["init_poses"]:
            b.add_pose((np.asarray(R), np.asarray(t)))
        pR, pt = fx["prior_pose"]
        b.add_prior_pose(0, (np.asarray(pR), np.asarray(pt)),
                         sigmas=np.full(6, 1e-6))
        sig = fx["point_prior_sigma"]
        for q, p in enumerate(fx["init_points"]):
            b.add_point(np.asarray(p))
            b.add_prior_point(q, np.asarray(p), sigma=sig)
        body = (np.asarray(fx["body_R"]), np.asarray(fx["body_t"]))
        for k, q, uv in fx["obs"]:
            b.add_projection_factor(k, q, np.asarray(uv), fx["cal"],
                                    body_pose=body, sigma=1.0)
        graph, values = b.build(bucket=8)
        assert abs(float(total_error(graph, values)) - PINS["ba_error0"]) \
            <= 1e-6 * PINS["ba_error0"]
        res = lm_optimize(graph, values,
                          LMParams(relative_error_tol=1e-14,
                                   absolute_error_tol=1e-14))
        assert abs(float(res.error) - PINS["ba_error"]) \
            <= 1e-6 * PINS["ba_error"]
        _, err_sqrt = ba_gn_optimize_sqrt(graph, values, iterations=25,
                                          damping=1e-6)
        assert abs(float(err_sqrt) - PINS["ba_error"]) \
            <= 1e-6 * PINS["ba_error"]
