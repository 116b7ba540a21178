"""Round-3 correctness fixes (VERDICT r2 Missing #1/#4, Weak #4/#5 + ADVICE).

- fake-odometry information is adjoint-conjugated through T_u2c like every
  other edge (fakeOdoNode routes through addToGTSAM, which conjugates
  unconditionally — gtsam_graph.cpp:672-692, 697-722);
- the g2o backend's fake-odo weighting is I*1e-3 (g2o_graph.cpp:151);
- startup gravity/bias initialization (initFromImu, gtsam_graph.cpp:281-318
  + static-window bias, imu_base.cpp:217-249) is wired into run_vio for
  both the online and scan engines;
- plane arenas grow mid-run instead of dying on the capacity guard;
- plane rescue propagates from the PREVIOUS FRAME's estimated pose
  (pre_node_id = m_id-1, pose from values — test_vro_imu_graph.cpp:213,
  239-240), correct even when the failed record references an older
  keyframe.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from graph_slam_tpu.core import extrinsics, se3
from graph_slam_tpu.imu import ImuStream, vn100_params
from graph_slam_tpu.io import VROLog, write_vro_log
from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL
from graph_slam_tpu.pipelines.posegraph import build_pose_graph
from graph_slam_tpu.pipelines.vio import VioConfig, run_vio


def _failed_log(n=4):
    info = np.diag([8e3] * 3 + [4e3] * 3)
    id_to, id_from, xis, infos = [], [], [], []
    for k in range(1, n):
        id_from.append(k - 1)
        id_to.append(k)
        if k == 2:
            xis.append(np.zeros(6))
            infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
        else:
            xis.append(np.array([0, 0, 0, 0.1, 0, 0.0]))
            infos.append(info)
    return VROLog(np.asarray(id_to), np.asarray(id_from), np.stack(xis),
                  np.stack(infos))


class TestFakeOdoWeighting:
    def _edge_info(self, graph, i, j):
        bt = graph.between
        for k in np.nonzero(np.asarray(bt.active))[0]:
            if int(bt.i[k]) == i and int(bt.j[k]) == j:
                S = np.asarray(bt.sqrt_info[k])
                return S.T @ S
        raise AssertionError(f"no active edge {i}->{j}")

    def test_fake_odo_conjugated_through_u2c(self):
        u2c = extrinsics.camera_to_imu(0.1)
        graph, values, _ = build_pose_graph(_failed_log(), u2c=u2c,
                                            bucket=8)
        Ad = np.asarray(se3.adjoint(u2c))
        want = Ad @ (np.eye(6) * FAILED_INFO_SENTINEL) @ Ad.T
        got = self._edge_info(graph, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-6)

    def test_fake_odo_gtsam_vs_g2o_weight(self):
        g_gt, _, _ = build_pose_graph(_failed_log(), bucket=8,
                                      backend="gtsam")
        g_g2o, _, _ = build_pose_graph(_failed_log(), bucket=8,
                                       backend="g2o")
        np.testing.assert_allclose(self._edge_info(g_gt, 1, 2),
                                   np.eye(6) * 1e4, rtol=1e-9)
        np.testing.assert_allclose(self._edge_info(g_g2o, 1, 2),
                                   np.eye(6) * 1e-3, rtol=1e-9)


def _static_tilted_scenario(n_frames=5, per=20, pre_sync=100,
                            tilt_deg=20.0, bg=(0.0, 0.015, -0.01)):
    """Static rig tilted about x: accel measures R_tilt^T (0,0,+g)."""
    params = vn100_params()
    dt = 1.0 / 200.0
    a = np.deg2rad(tilt_deg)
    R_tilt = np.array([[1, 0, 0],
                       [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
    g_body = R_tilt.T @ np.array([0.0, 0.0, 9.81])
    n_meas = pre_sync + n_frames * per + 10
    r = np.random.default_rng(3)
    acc = g_body[None, :] + r.normal(size=(n_meas, 3)) * 1e-4
    gyr = np.asarray(bg)[None, :] + r.normal(size=(n_meas, 3)) * 1e-5
    stream = ImuStream(t=np.arange(n_meas) * dt, acc=acc, gyr=gyr, dt=dt)
    times = {f: (pre_sync + f * per) * dt for f in range(n_frames)}

    info = np.diag([8e3] * 3 + [2500.0] * 3)
    id_to = np.arange(1, n_frames)
    id_from = np.arange(0, n_frames - 1)
    xis = np.zeros((n_frames - 1, 6))   # static: identity VO edges
    log = VROLog(id_to, id_from, xis,
                 np.tile(info, (n_frames - 1, 1, 1)))
    return log, times, stream, params, R_tilt, np.asarray(bg)


class TestGravityInit:
    def test_tilted_static_start_stays_put(self):
        log, times, stream, params, R_tilt, bg = _static_tilted_scenario()
        cfg = VioConfig(plane_mode="off", max_imu_window=64, bucket=16,
                        gravity_init=True)
        res = run_vio(log, times, stream, params, cfg=cfg)
        # first-node rotation maps the measured gravity direction to +z
        R0 = np.asarray(res.values.pose_R[0])
        g_dir = R_tilt.T @ np.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(R0 @ g_dir, [0, 0, 1], atol=1e-3)
        # static rig: every position matches the level-start ground truth
        # (the origin); without gravity init the uncompensated ~3.3 m/s^2
        # residual acceleration walks the IMU prediction away
        n = len(res.seq_ids)
        t_final = np.asarray(res.values.pose_t[:n])
        assert np.abs(t_final).max() < 2e-2, t_final
        # gyro prior bias recovered from the static window
        np.testing.assert_allclose(np.asarray(res.values.bias[0])[3:], bg,
                                   atol=1e-3)

    def test_without_init_gravity_inconsistent(self):
        """Identity-start on a tilted rig leaves ~3.3 m/s^2 uncompensated
        acceleration in every IMU factor: the graph cost is orders of
        magnitude above the gravity-initialized run's."""
        log, times, stream, params, _, _ = _static_tilted_scenario()
        kw = dict(plane_mode="off", max_imu_window=64, bucket=16)
        res_no = run_vio(log, times, stream, params,
                         cfg=VioConfig(gravity_init=False, **kw))
        stream2 = ImuStream(t=stream.t, acc=stream.acc, gyr=stream.gyr,
                            dt=stream.dt)
        res_yes = run_vio(log, times, stream2, params,
                          cfg=VioConfig(gravity_init=True, **kw))
        assert res_yes.error < 1e-2 * res_no.error, \
            (res_yes.error, res_no.error)

    def test_scan_engine_matches_online(self):
        log, times, stream, params, R_tilt, _ = _static_tilted_scenario()
        kw = dict(plane_mode="off", max_imu_window=64, bucket=16,
                  gravity_init=True, optimize_step=2)
        res_on = run_vio(log, times, stream, params,
                         cfg=VioConfig(engine="online", **kw))
        stream2 = ImuStream(t=stream.t, acc=stream.acc, gyr=stream.gyr,
                            dt=stream.dt)
        res_sc = run_vio(log, times, stream2, params,
                         cfg=VioConfig(engine="scan", window=4, **kw))
        np.testing.assert_allclose(np.asarray(res_sc.values.pose_R[0]),
                                   np.asarray(res_on.values.pose_R[0]),
                                   atol=1e-12)
        n = len(res_on.seq_ids)
        np.testing.assert_allclose(np.asarray(res_sc.values.pose_t[:n]),
                                   np.asarray(res_on.values.pose_t[:n]),
                                   atol=1e-3)


class TestPlaneArenaGrowth:
    def test_online_vio_grows_plane_arena(self):
        from test_vio import simulate

        log, img_times, stream, params, X, V, _ = simulate(n_frames=8,
                                                           fail_frame=99)
        # 6 distinct far-away world planes, all observed from every frame:
        # overflows plane_var_cap=2 and must grow, not RuntimeError
        from graph_slam_tpu.planes import oriented_plane

        planes_w = [np.array([1.0, 0.0, 0.0, -50.0 - 3 * k])
                    for k in range(3)]
        planes_w += [np.array([0.0, 1.0, 0.0, -50.0 - 3 * k])
                     for k in range(3)]

        def plane_obs(seq):
            return [(np.asarray(oriented_plane.transform(
                jnp.asarray(pw), X[seq].R, X[seq].t)), np.eye(3) * 1e-5)
                for pw in planes_w]

        cfg = VioConfig(plane_mode="always", optimize_step=100,
                        max_imu_window=64, bucket=16, plane_var_cap=2)
        res = run_vio(log, img_times, stream, params,
                      plane_obs_provider=plane_obs, cfg=cfg)
        assert int(res.values.num_planes) >= 6
        assert res.values.plane.shape[0] > 2
        # 6 planes observed from each of the 7 non-first frames (the
        # provider path adds observations on new frames only)
        assert res.n_plane_factors >= 6 * 7
        assert res.error < 1.0

    def test_online_graph_grows_plane_factor_table(self):
        from graph_slam_tpu.pipelines.vio import _OnlineVioGraph

        b = _OnlineVioGraph(n_frames=4, n_edges=4, bucket=8,
                            plane_var_cap=2, plane_factor_cap=2)
        b.add_pose((np.eye(3), np.zeros(3)))
        for k in range(5):
            b.add_plane(np.array([1.0, 0.0, 0.0, -2.0 - k]))
            b.add_plane_factor(0, k, np.array([1.0, 0.0, 0.0, -2.0 - k]),
                               sigma=0.1)
        assert b.og.values.plane.shape[0] >= 5
        assert b.og.graph.plane.pose_idx.shape[0] >= 5
        assert b.og._n["plane"] == 5


class TestRecoveryEdgeRescue:
    def test_plane_rescue_on_older_keyframe_failure(self):
        """VO fails against an OLDER keyframe (id_from=1 while the previous
        frame is 3): the rescue must propagate the previous frame's planes
        from its estimated pose, not the matched node's."""
        from test_plane_node import K, render, simulate_frames

        log, img_times, stream, params, X, frames = simulate_frames(
            n_frames=6, fail_frame=4, motion=0.1)
        # rewrite the failed record to reference keyframe 1
        k_fail = int(np.nonzero(log.id_to == 4)[0][0])
        log.id_from[k_fail] = 1

        cfg = VioConfig(plane_mode="rescue", optimize_step=100,
                        max_imu_window=64, bucket=16)
        res = run_vio(log, img_times, stream, params,
                      frames=lambda s: frames.get(s), intrinsics=K,
                      cfg=cfg)
        assert res.n_plane_factors >= 2    # firstPlaneNode + rescue
        n = len(res.seq_ids)
        for f in range(n):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=8e-2)


class TestCliVioPresetOverlap:
    def test_preset_vio_section_overrides_without_typeerror(self, tmp_path):
        """A preset whose 'vio' section sets optimize_step/robust (natural
        places for them) must override the explicit defaults instead of
        raising 'multiple values for keyword argument'."""
        from test_vio import simulate

        from graph_slam_tpu import cli

        log, img_times, stream, params, X, V, _ = simulate(n_frames=5,
                                                           fail_frame=99)
        vro = str(tmp_path / "vro.log")
        write_vro_log(vro, log)
        imu_path = str(tmp_path / "imu.log")
        rows = np.concatenate(
            [stream.t[:, None], stream.acc, stream.gyr,
             np.zeros((len(stream.t), 3))], axis=1)
        np.savetxt(imu_path, rows)
        times_path = str(tmp_path / "times.log")
        with open(times_path, "w") as f:
            for seq, t in img_times.items():
                f.write(f"{seq} {t}\n")
        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump({"optimize_step": 4,
                       "vio": {"optimize_step": 3, "robust": "huber",
                               "max_imu_window": 64, "bucket": 16}}, f)
        cli.main(["vio", "--vro", vro, "--imu", imu_path,
                  "--times", times_path, "--config", cfg_path,
                  "--extrinsic", "identity",
                  "--out-dir", str(tmp_path / "out")])
        assert os.path.exists(str(tmp_path / "out" / "trajectory.log"))
