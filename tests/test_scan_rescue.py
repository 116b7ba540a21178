"""Fused plane-rescue engine (VERDICT r2 "Next round" #1).

The flagship plane rescue now runs through the scan engine: segments
between host-known failures execute as chunked compiled scans, each
failure is one host step (fused VO/IMU kernel + batched plane stack).
These tests pin its semantics against the online engine's rescue path on
the same rendered-frame scenario, and against the plane-observation
provider path.
"""

import numpy as np
import jax.numpy as jnp

from graph_slam_tpu.imu import ImuStream
from graph_slam_tpu.pipelines.vio import VioConfig, run_vio


def _clone(stream):
    return ImuStream(t=stream.t, acc=stream.acc, gyr=stream.gyr,
                     dt=stream.dt)


class TestScanPlaneRescue:
    def test_scan_rescue_matches_online_frames(self):
        from test_plane_node import K, simulate_frames

        log, img_times, stream, params, X, frames = simulate_frames(
            n_frames=8, fail_frame=4)
        kw = dict(plane_mode="rescue", optimize_step=4, max_imu_window=64,
                  bucket=16, window=4, seed=0)
        res_on = run_vio(log, img_times, stream, params,
                         frames=frames.get, intrinsics=K,
                         cfg=VioConfig(engine="online", **kw))
        res_sc = run_vio(log, img_times, _clone(stream), params,
                         frames=frames.get, intrinsics=K,
                         cfg=VioConfig(engine="scan", **kw))
        # the rescue actually fired, with the same plane bookkeeping
        assert res_sc.n_plane_factors >= 2
        assert res_sc.n_plane_factors == res_on.n_plane_factors
        assert len(res_sc.plane_book.world) == len(res_on.plane_book.world)
        # same trajectory (both fixed-lag engines share the windowed GN)
        n = len(res_on.seq_ids)
        np.testing.assert_allclose(np.asarray(res_sc.values.pose_t[:n]),
                                   np.asarray(res_on.values.pose_t[:n]),
                                   atol=5e-3)
        assert abs(res_sc.error - res_on.error) \
            <= 1e-3 * max(res_on.error, 1e-9)
        # ground truth recovered through the failure
        for f in range(n):
            np.testing.assert_allclose(np.asarray(res_sc.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=8e-2)

    def test_scan_rescue_provider_mode(self):
        from test_vio import simulate

        log, img_times, stream, params, X, V, plane_obs = simulate()
        kw = dict(plane_mode="rescue", optimize_step=100,
                  max_imu_window=64, bucket=16)
        res_on = run_vio(log, img_times, stream, params,
                         plane_obs_provider=plane_obs,
                         cfg=VioConfig(engine="online", **kw))
        res_sc = run_vio(log, img_times, _clone(stream), params,
                         plane_obs_provider=plane_obs,
                         cfg=VioConfig(engine="scan", window=4, **kw))
        assert res_sc.n_plane_factors == res_on.n_plane_factors == 2
        assert res_sc.error < 1e-3
        n = len(res_sc.seq_ids)
        for f in range(n):
            np.testing.assert_allclose(np.asarray(res_sc.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=2e-2)

    def test_scan_rescue_adjacent_failures_consume_pending(self):
        """Back-to-back failed records: the second rescue's source is the
        first rescue's current node. Its pre-extracted pending detection
        must be CONSUMED either way (it used to leak frame-sized masks for
        the run's lifetime when the source was already a plane node)."""
        from test_plane_node import (FAILED_INFO_SENTINEL, K,
                                     simulate_frames)

        # n_frames matches the other tests in this class so the compiled
        # scan/rescue programs (keyed on the padded table shapes) are
        # reused across the module instead of recompiling per test
        log, img_times, stream, params, X, frames = simulate_frames(
            n_frames=8, fail_frame=4)
        # mark frame 5's record failed as well -> adjacent rescues
        k = int(np.flatnonzero(np.asarray(log.id_to) == 5)[0])
        log.xi[k] = 0.0
        log.info[k] = np.eye(6) * FAILED_INFO_SENTINEL

        kw = dict(plane_mode="rescue", optimize_step=4, max_imu_window=64,
                  bucket=16, window=4, seed=0)
        res_on = run_vio(log, img_times, stream, params,
                         frames=frames.get, intrinsics=K,
                         cfg=VioConfig(engine="online", **kw))
        res_sc = run_vio(log, img_times, _clone(stream), params,
                         frames=frames.get, intrinsics=K,
                         cfg=VioConfig(engine="scan", **kw))
        # both rescues fired with identical bookkeeping across engines
        assert res_sc.n_plane_factors >= 4
        assert res_sc.n_plane_factors == res_on.n_plane_factors
        assert len(res_sc.plane_book.world) == len(res_on.plane_book.world)
        # every precomputed detection was consumed: no leaked masks
        assert res_sc.plane_stack.pending == {}
        n = len(res_on.seq_ids)
        np.testing.assert_allclose(np.asarray(res_sc.values.pose_t[:n]),
                                   np.asarray(res_on.values.pose_t[:n]),
                                   atol=5e-3)

    def test_scan_rescue_in_scan_chi2_telemetry(self):
        from test_plane_node import K, simulate_frames

        log, img_times, stream, params, X, frames = simulate_frames(
            n_frames=8, fail_frame=4)
        res = run_vio(log, img_times, stream, params, frames=frames.get,
                      intrinsics=K,
                      cfg=VioConfig(engine="scan", plane_mode="rescue",
                                    optimize_step=2, max_imu_window=64,
                                    bucket=16, window=4))
        # per-optimize window chi2 records rode the scan outputs
        opt_rows = [r for r in res.chi2_log.rows[:-1]]
        assert len(opt_rows) >= 2
        assert all(np.isfinite(r[3]) for r in opt_rows)
