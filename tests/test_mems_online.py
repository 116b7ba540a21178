"""Online MEMS VIO variant end-to-end (test_gt_imu_MEMS.cpp role).

Composes the raw-integer MEMS log reader (LSB->SI conversion + frame-id
wraparound sync, imu_MEMS.cpp:9-13/:73-89), the heuristic frame-time sync
(``mems_frame_times``, test_gt_imu_MEMS.cpp:97-110), the MEMS noise preset
and the online VIO engine into one replay — the reference's online
VRO+MEMS loop, closing the last SURVEY §2.6 harness.
"""

import numpy as np
import jax.numpy as jnp

from graph_slam_tpu.core import se3
from graph_slam_tpu.imu import (
    init_preint,
    integrate_segment,
    mems_frame_times,
    mems_params,
    predict_navstate,
    read_mems_log,
)
from graph_slam_tpu.imu.presets import (
    mems_accel_lsb_to_ms2,
    mems_gyro_lsb_to_rad,
)
from graph_slam_tpu.io import VROLog
from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL
from graph_slam_tpu.pipelines.vio import VioConfig, run_vio


def _write_mems_log(path, n_pre=30, n_meas=400, seed=0):
    """Raw integer MEMS log with a frame-id wrap at row ``n_pre``."""
    r = np.random.default_rng(seed)
    params = mems_params()
    g_body = -np.asarray(params.gravity)        # level static specific force
    acc_true = g_body[None, :] + r.normal(size=(n_meas, 3)) * 0.05
    gyr_true = r.normal(size=(n_meas, 3)) * 0.02
    for k in range(1, n_meas):
        acc_true[k] = 0.9 * acc_true[k - 1] + 0.1 * acc_true[k]
        gyr_true[k] = 0.9 * gyr_true[k - 1] + 0.1 * gyr_true[k]
    # SI -> integer LSB (inverse of the reader's conversions)
    gyr_lsb = np.round(gyr_true * (180.0 / np.pi) * 1092.0 / 80.0)
    acc_lsb = np.round(acc_true / (0.002522 * 9.81))
    frame_id = np.concatenate([np.arange(970, 970 + n_pre),
                               np.arange(0, n_meas - n_pre)])
    rows = np.concatenate([frame_id[:, None], gyr_lsb, acc_lsb], axis=1)
    np.savetxt(path, rows, fmt="%d")


class TestMemsOnlineVio:
    def test_mems_stream_online_vio_end_to_end(self, tmp_path):
        path = str(tmp_path / "imu_mems.log")
        n_pre = 30
        _write_mems_log(path, n_pre=n_pre)
        stream = read_mems_log(path)
        assert stream.start == n_pre            # wrap-detected sync point
        params = mems_params()

        # reference heuristic frame-time sync: raw elapsed-ms records
        # incl. a too-small and a long-gap entry
        elapsed = [34, 34, 15, 34, 120, 34, 160, 34]
        times = mems_frame_times(elapsed, dt=stream.dt,
                                 start_index=stream.start)
        n_frames = len(times)

        # ground-truth chain by integrating the DECODED windows run_vio
        # will see (LSB rounding is part of the measurement, not error)
        idxs = [0] + [int(round(times[f] / stream.dt)) - stream.start
                      for f in range(n_frames)]
        X = [se3.identity()]
        V = [jnp.zeros(3)]
        for f in range(1, n_frames):
            acc, gyr = stream.window(idxs[f], idxs[f + 1])
            st = integrate_segment(
                init_preint(jnp.zeros(6), params),
                jnp.asarray(acc), jnp.asarray(gyr),
                jnp.full(len(acc), stream.dt), params)
            Xj, vj = predict_navstate(st, X[-1], V[-1], jnp.zeros(6),
                                      params.gravity)
            X.append(Xj)
            V.append(vj)

        info = np.diag([8e3] * 3 + [2500.0] * 3)
        id_to, id_from, xis, infos = [], [], [], []
        for f in range(1, n_frames):
            id_from.append(f - 1)
            id_to.append(f)
            if f == 5:                   # one VRO failure, IMU carries it
                xis.append(np.zeros(6))
                infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
            else:
                T = se3.between(X[f - 1], X[f])
                xis.append(np.asarray(se3.logmap(T)))
                infos.append(info)
        log = VROLog(np.asarray(id_to), np.asarray(id_from),
                     np.stack(xis), np.stack(infos))

        res = run_vio(log, times, stream, params,
                      cfg=VioConfig(plane_mode="off", optimize_step=4,
                                    max_imu_window=64, bucket=16))
        assert res.n_imu_factors == n_frames - 1
        assert res.error < 1e-2, res.error
        for f in range(n_frames):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=2e-2)
