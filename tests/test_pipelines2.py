"""Online SLAM (synthetic rendered frames) and BA+IMU pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.config import SR4000, SlamParams
from graph_slam_tpu.core import se3
from graph_slam_tpu.pipelines import (
    BaImuConfig,
    FrameStatus,
    OnlineSlam,
    run_ba_imu,
)
from graph_slam_tpu.vision.cal3ds2 import Cal3DS2, project_point


def render_wall_frame(K, cam_t, seed=0, z_wall=2.0):
    """Synthetic RGB-D frame of a textured wall at z = z_wall (world), seen
    by a camera at translation ``cam_t`` (identity rotation)."""
    h, w = K.height, K.width
    us = np.arange(w)
    vs = np.arange(h)
    uu, vv = np.meshgrid(us, vs)
    z = z_wall - cam_t[2]
    # pixel -> world (x, y) on the wall
    x = (uu - K.cx) * z / K.fx + cam_t[0]
    y = (vv - K.cy) * z / K.fy + cam_t[1]
    # texture: bilinear-sampled random grid (3 cm cells) — every patch is
    # locally unique, so descriptors are discriminative
    r = np.random.default_rng(seed)
    cell = 0.03
    grid = r.uniform(0, 255, size=(300, 300)).astype(np.float32)
    gx = (x + 4.0) / cell
    gy = (y + 4.0) / cell
    x0 = np.clip(gx.astype(int), 0, 298)
    y0 = np.clip(gy.astype(int), 0, 298)
    fx = (gx - x0).astype(np.float32)
    fy = (gy - y0).astype(np.float32)
    img = ((1 - fx) * (1 - fy) * grid[y0, x0]
           + fx * (1 - fy) * grid[y0, x0 + 1]
           + (1 - fx) * fy * grid[y0 + 1, x0]
           + fx * fy * grid[y0 + 1, x0 + 1]).astype(np.float32)
    depth = np.full((h, w), z, np.float32)
    return img, depth


class TestOnlineSlam:
    def test_translating_camera(self):
        K = SR4000
        slam = OnlineSlam(cam=K,
                          params=SlamParams(optimize_step=100),
                          n_hyp=512, min_inliers=10)
        statuses = []
        xs = [0.0, 0.12, 0.24, 0.245, 0.36]
        for x in xs:
            img, depth = render_wall_frame(K, np.array([x, 0.0, 0.0]))
            statuses.append(slam.process_frame(img, depth))
        assert statuses[0] == FrameStatus.FIRST
        assert statuses[1] == FrameStatus.KEYFRAME
        assert statuses[2] == FrameStatus.KEYFRAME
        assert statuses[3] == FrameStatus.SMALL_MOTION  # 5mm motion dropped
        assert statuses[4] == FrameStatus.KEYFRAME

        err = slam.optimize()
        assert err < 1.0
        ids, t, q, seq = slam.trajectory()
        expect = [0.0, 0.12, 0.24, 0.36]
        for k, ex in enumerate(expect):
            assert abs(t[k, 0] - ex) < 0.03, (k, t[k], ex)
            assert abs(t[k, 1]) < 0.02 and abs(t[k, 2]) < 0.02

        # the recorded VRO log replays: all edges valid
        log = slam.vro_log()
        assert len(log) >= 3
        assert log.valid.all()


class TestArenaGrowth:
    def test_bucket_crossing_growth_preserves_state(self):
        """Keyframes beyond the initial arena capacity trigger a re-homing
        grow; the optimized trajectory must be unaffected."""
        K = SR4000
        slam = OnlineSlam(cam=K, params=SlamParams(optimize_step=100),
                          n_hyp=256, min_inliers=10, initial_pose_cap=4)
        xs = [0.0, 0.10, 0.20, 0.30, 0.40, 0.50, 0.60]
        for x in xs:
            img, depth = render_wall_frame(K, np.array([x, 0.0, 0.0]))
            slam.process_frame(img, depth)
        assert slam.num_keyframes == len(xs)
        assert slam.og.values.pose_R.shape[0] >= len(xs)   # grew past 4
        err = slam.optimize()
        assert err < 1.0
        _, t, _, _ = slam.trajectory()
        for k, x in enumerate(xs):
            assert abs(t[k, 0] - x) < 0.04, (k, t[k, 0], x)


class TestG2oBackend:
    def test_fake_odo_weighting_and_flat_lm(self):
        """CGraphG2O semantics: fake-odometry info 1e-3*I (g2o_graph.cpp:151)
        vs gtsam's 1e4, and optimize() = flat 20 LM iterations with no
        convergence test (:241-252)."""
        K = SR4000
        slam = OnlineSlam(cam=K, params=SlamParams(optimize_step=100),
                          backend="g2o", n_hyp=256, min_inliers=10)
        img, depth = render_wall_frame(K, np.array([0.0, 0.0, 0.0]))
        slam.process_frame(img, depth)
        # garbage frame -> match failure -> fakeOdoNode
        r = np.random.default_rng(0)
        noise = r.uniform(0, 255, size=img.shape).astype(np.float32)
        st = slam.process_frame(noise, np.zeros_like(depth))
        assert st == FrameStatus.FAILED
        bt = slam.og.graph.between
        S = np.asarray(bt.sqrt_info[0])
        np.testing.assert_allclose(np.diag(S), np.sqrt(1e-3), rtol=1e-6)
        err = slam.optimize()
        assert np.isfinite(err)
        assert slam.chi2_log.rows[-1][3] == err


class TestBaImu:
    def test_ba_imu_recovers_trajectory(self):
        import sys
        sys.path.insert(0, "tests")
        from test_vio import simulate

        log, img_times, stream, params, X, V, _ = simulate(
            n_frames=6, seed=5, fail_frame=-1)

        # world landmarks + per-frame observations
        r = np.random.default_rng(6)
        W = np.stack([r.uniform(-2, 2, 25), r.uniform(-2, 2, 25),
                      r.uniform(2.5, 5, 25)], axis=1)
        frames = []
        for f in range(6):
            inv = se3.inverse(X[f])
            local = np.asarray(se3.transform_from(inv, jnp.asarray(W)))
            uv = np.asarray(project_point(
                Cal3DS2.make(SR4000.fx, SR4000.fy, SR4000.cx, SR4000.cy,
                             SR4000.k1, SR4000.k2), jnp.asarray(local)))
            frames.append({"uv": uv, "pts3": local})

        res = run_ba_imu(frames, lambda i, j: [(k, k) for k in range(25)],
                         img_times, stream, params, SR4000,
                         cfg=BaImuConfig(use_imu=True, solver="schur",
                                         schur_iters=8, bucket=16))
        assert res.n_landmarks == 25
        assert res.n_imu_factors == 5
        assert res.error < 1e-3
        for f in range(6):
            np.testing.assert_allclose(np.asarray(res.values.pose_t[f]),
                                       np.asarray(X[f].t), atol=2e-2)

    def test_ba_without_imu(self):
        import sys
        sys.path.insert(0, "tests")
        from test_vio import simulate

        log, img_times, stream, params, X, V, _ = simulate(
            n_frames=5, seed=7, fail_frame=-1)
        r = np.random.default_rng(8)
        W = np.stack([r.uniform(-2, 2, 20), r.uniform(-2, 2, 20),
                      r.uniform(2.5, 5, 20)], axis=1)
        frames = []
        for f in range(5):
            inv = se3.inverse(X[f])
            local = np.asarray(se3.transform_from(inv, jnp.asarray(W)))
            uv = np.asarray(project_point(
                Cal3DS2.make(SR4000.fx, SR4000.fy, SR4000.cx, SR4000.cy,
                             SR4000.k1, SR4000.k2), jnp.asarray(local)))
            frames.append({"uv": uv, "pts3": local})
        res = run_ba_imu(frames, lambda i, j: [(k, k) for k in range(20)],
                         img_times, None, None, SR4000,
                         cfg=BaImuConfig(use_imu=False, solver="lm",
                                         bucket=16))
        assert res.error < 1e-2
