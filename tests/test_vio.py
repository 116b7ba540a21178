"""End-to-end VIO pipeline test (test_vro_imu_graph twin).

Simulates a trajectory by integrating synthetic IMU measurements, derives a
VRO log from ground-truth relative poses (with a failed edge and a loop
closure), feeds both plus synthetic plane observations through ``run_vio``,
and asserts chi2 collapse + trajectory recovery — including the plane
rescue path on the failed VO frame.
"""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.config import SlamParams
from graph_slam_tpu.core import se3
from graph_slam_tpu.imu import (
    ImuStream,
    init_preint,
    integrate_segment,
    predict_navstate,
    vn100_params,
)
from graph_slam_tpu.io import VROLog
from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL
from graph_slam_tpu.pipelines.vio import VioConfig, run_vio
from graph_slam_tpu.planes import oriented_plane, plane_to_world


def simulate(n_frames=8, imu_per_frame=20, seed=0, fail_frame=4):
    r = np.random.default_rng(seed)
    params = vn100_params()
    dt = 1.0 / 200.0

    # synthetic IMU stream (smooth motion + gravity reaction)
    n_meas = n_frames * imu_per_frame + 10
    t = np.arange(n_meas) * dt
    acc = (r.normal(size=(n_meas, 3)) * 0.2
           - np.asarray(params.gravity))          # specific force
    gyr = r.normal(size=(n_meas, 3)) * 0.2
    # smooth both so the trajectory is benign
    for k in range(1, n_meas):
        acc[k] = 0.9 * acc[k - 1] + 0.1 * acc[k]
        gyr[k] = 0.9 * gyr[k - 1] + 0.1 * gyr[k]
    stream = ImuStream(t=t, acc=acc, gyr=gyr, dt=dt)

    # ground-truth chain by preintegrating exactly the same windows
    X = [se3.identity()]
    V = [jnp.zeros(3)]
    for f in range(1, n_frames):
        lo, hi = (f - 1) * imu_per_frame, f * imu_per_frame
        st = integrate_segment(
            init_preint(jnp.zeros(6), params),
            jnp.asarray(acc[lo:hi]), jnp.asarray(gyr[lo:hi]),
            jnp.full(imu_per_frame, dt), params)
        Xj, vj = predict_navstate(st, X[-1], V[-1], jnp.zeros(6),
                                  params.gravity)
        X.append(Xj)
        V.append(vj)

    img_times = {f: f * imu_per_frame * dt for f in range(n_frames)}

    # VRO log from ground truth (identity extrinsic -> camera == body)
    info = np.diag([8e3] * 3 + [2500.0] * 3)
    id_to, id_from, xis, infos = [], [], [], []
    for f in range(1, n_frames):
        id_from.append(f - 1)
        id_to.append(f)
        if f == fail_frame:
            xis.append(np.zeros(6))
            infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
        else:
            T = se3.between(X[f - 1], X[f])
            xis.append(np.asarray(se3.logmap(T)))
            infos.append(info)
    # loop closure
    id_from.append(0)
    id_to.append(n_frames - 1)
    T = se3.between(X[0], X[n_frames - 1])
    xis.append(np.asarray(se3.logmap(T)))
    infos.append(info)

    log = VROLog(np.asarray(id_to), np.asarray(id_from), np.stack(xis),
                 np.stack(infos))

    # synthetic plane observations: two world planes seen from every frame
    planes_w = [np.array([0.0, 0.0, 1.0, -2.5]),
                np.array([0.0, 1.0, 0.0, -3.0])]

    def plane_obs(seq):
        obs = []
        for pw in planes_w:
            pb = oriented_plane.transform(jnp.asarray(pw), X[seq].R,
                                          X[seq].t)
            obs.append((np.asarray(pb), np.eye(3) * 1e-5))
        return obs

    return log, img_times, stream, params, X, V, plane_obs


class TestVio:
    def test_vio_with_plane_rescue(self):
        log, img_times, stream, params, X, V, plane_obs = simulate()
        res = run_vio(log, img_times, stream, params,
                      plane_obs_provider=plane_obs,
                      cfg=VioConfig(plane_mode="rescue", optimize_step=100,
                                    max_imu_window=64, bucket=16))
        assert res.n_imu_factors == 7
        assert res.n_vo_edges == 7            # 6 odometry + 1 loop closure
        assert res.n_plane_factors == 2      # rescue on the failed frame
        assert res.error < 1e-3
        # trajectory near ground truth
        for f in range(len(X)):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=2e-2)

    def test_vio_always_planes(self):
        log, img_times, stream, params, X, V, plane_obs = simulate(seed=1)
        res = run_vio(log, img_times, stream, params,
                      plane_obs_provider=plane_obs,
                      cfg=VioConfig(plane_mode="always", optimize_step=100,
                                    max_imu_window=64, bucket=16))
        # two planes per frame except frame 0 (no record creates it)
        assert res.n_plane_factors >= 10
        assert res.plane_book is not None
        # association must keep reusing the same two landmarks
        assert len(res.plane_book.world) == 2
        assert res.error < 1e-2

    def test_vio_without_planes_or_failures(self):
        log, img_times, stream, params, X, V, _ = simulate(seed=2,
                                                           fail_frame=-1)
        res = run_vio(log, img_times, stream, params,
                      cfg=VioConfig(plane_mode="off", optimize_step=100,
                                    max_imu_window=64, bucket=16))
        assert res.error < 1e-3
        for f in range(len(X)):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=1e-2)
            np.testing.assert_allclose(np.asarray(res.values.vel[f]),
                                       np.asarray(V[f]), atol=1e-2)

    def test_fixed_lag_window_engine(self):
        """Online engine with a fixed-lag window: bounded-cost updates must
        still track the trajectory (IMU + VO factor suffixes sliced)."""
        log, img_times, stream, params, X, V, _ = simulate(seed=4,
                                                           fail_frame=-1)
        res = run_vio(log, img_times, stream, params,
                      cfg=VioConfig(plane_mode="off", optimize_step=2,
                                    incremental_iters=1, max_imu_window=64,
                                    bucket=16, window=4))
        assert res.error < 1e-3
        for f in range(len(X)):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=2e-2)

    def test_feedback_incremental(self):
        log, img_times, stream, params, X, V, _ = simulate(seed=3)
        res = run_vio(log, img_times, stream, params,
                      cfg=VioConfig(plane_mode="off", optimize_step=3,
                                    incremental_iters=1, max_imu_window=64,
                                    bucket=16))
        assert res.error < 1e-2
