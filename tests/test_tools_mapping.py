"""Tests for VRO-log tools, mapping tools, plane-check scoring, gyro euler."""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.config import SR4000
from graph_slam_tpu.core import se3
from graph_slam_tpu.imu.euler import integrate_euler, gyro_bias_from_static
from graph_slam_tpu.io import VROLog, Trajectory
from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL
from graph_slam_tpu.mapping import (
    accumulate_cloud,
    grid_triangulate,
    occupancy_denoise,
    passthrough,
    read_pcd,
    voxel_filter,
    write_pcd,
)
from graph_slam_tpu.pipelines.plane_check import (
    plane_pair_mahalanobis,
    plane_set_consistency,
)
from graph_slam_tpu.tools import (
    compute_trans_difference,
    convert_vo2ba,
    delete_vo_by_plane_check,
    merge_vro,
    propose_sparse_area_edges,
)


def _log(n=6, seed=0):
    r = np.random.default_rng(seed)
    info = np.tile(np.diag([100.0] * 6), (n, 1, 1))
    return VROLog(np.arange(1, n + 1), np.arange(n),
                  r.normal(size=(n, 6)) * 0.1, info)


class TestVroTools:
    def test_cut_voids_weak_edges(self):
        log = _log()
        counts = np.array([50, 3, 50, 2, 50, 50])
        out = convert_vo2ba(log, "cut", match_counts=counts,
                            min_match_num=10)
        assert not out.valid[1] and not out.valid[3]
        assert out.valid[[0, 2, 4, 5]].all()
        np.testing.assert_array_equal(out.xi[1], 0)
        assert out.info[1][0, 0] == FAILED_INFO_SENTINEL

    def test_ba_mode_with_refiner(self):
        log = _log()

        def ba_fn(i, j, xi, valid):
            if j % 2 == 0:
                return xi * 0.5, np.eye(6) * 400.0
            return None

        out = convert_vo2ba(log, "ba", ba_fn=ba_fn)
        # refined edges halved, unrefinable ones voided
        np.testing.assert_allclose(out.xi[1], log.xi[1] * 0.5)  # id_to=2
        assert not out.valid[0]                                  # id_to=1

    def test_hybrid_keeps_vro_on_ba_failure(self):
        log = _log()
        out = convert_vo2ba(log, "hybrid", ba_fn=lambda *a: None)
        np.testing.assert_allclose(out.xi, log.xi)

    def test_merge_by_match_count(self):
        ba, vro = _log(seed=1), _log(seed=2)
        out = merge_vro(ba, vro, match_counts=[30, 5, 30, 5, 30, 30])
        np.testing.assert_allclose(out.xi[1], vro.xi[1])
        np.testing.assert_allclose(out.xi[0], ba.xi[0])

    def test_trans_difference(self):
        log = _log(seed=3)
        dt, dr = compute_trans_difference(log, log)
        np.testing.assert_allclose(dt, 0, atol=1e-12)
        np.testing.assert_allclose(dr, 0, atol=1e-12)

    def test_delete_by_plane_check(self):
        log = _log(seed=4)
        out = delete_vo_by_plane_check(log, [0.1, 9.0, 0.1, 0.2, 11.0, 0.3],
                                       err_thresh=5.0)
        assert not out.valid[1] and not out.valid[4]

    def test_sparse_area_edges(self):
        counts = {k: (20 if k == 5 else 100) for k in range(10)}
        pairs = propose_sparse_area_edges(counts, window=3,
                                          sparse_thresh=60)
        assert (3, 5) in pairs and (5, 7) in pairs
        assert all(5 in p for p in pairs)


class TestPlaneCheck:
    def test_consistent_planes_score_low(self):
        T = np_lie.se3_exp(np.array([0.05, -0.02, 0.1, 0.3, 0.1, -0.2]))
        xi = np_lie.se3_log(*T)
        from graph_slam_tpu.planes import oriented_plane
        pw = jnp.array([0.0, 0.6, 0.8, 1.5])
        # plane in frame i and its exact image in frame j
        pi = np.asarray(pw)
        pj = np.asarray(oriented_plane.transform(
            pw, jnp.asarray(T[0]), jnp.asarray(T[1])))
        cov = np.eye(3) * 1e-5
        S = np.eye(6) * 1e-5
        m, raw = plane_pair_mahalanobis(pi, cov, pj, cov, xi, S)
        assert raw < 1e-12 and m < 1e-6
        n, err, err_raw = plane_set_consistency(
            [pi], [cov], [pj], [cov], xi, S)
        assert n == 1 and err < 1e-6

    def test_inconsistent_plane_scores_high(self):
        xi = np.zeros(6)
        pi = np.array([0.0, 0.0, 1.0, -2.0])
        pj = np.array([0.0, 0.05, 0.9987, -2.1])  # 0.1m off
        pj[:3] /= np.linalg.norm(pj[:3])
        cov = np.eye(3) * 1e-6
        m, raw = plane_pair_mahalanobis(pi, cov, pj, cov, xi,
                                        np.eye(6) * 1e-6)
        assert m > 100.0


class TestMapping:
    def _wall_frames(self):
        K = SR4000
        depth = np.full((K.height, K.width), 2.0, np.float32)
        inten = np.full((K.height, K.width), 120.0, np.float32)
        return lambda seq: (inten, depth)

    def test_accumulate_and_filter(self, tmp_path):
        K = SR4000
        n = 3
        traj = Trajectory(
            ids=np.arange(n),
            t=np.stack([np.arange(n) * 0.5, np.zeros(n), np.zeros(n)], 1),
            quat=np.tile([1.0, 0, 0, 0], (n, 1)),
            seq=np.arange(n),
        )
        pts, cols = accumulate_cloud(traj, self._wall_frames(), K, skip=8)
        assert len(pts) > 100
        # all points on the z=2 wall in each camera frame -> z == 2 world
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
        fp, fc = voxel_filter(pts, cols, voxel=0.1)
        assert len(fp) < len(pts)
        p = str(tmp_path / "map.pcd")
        write_pcd(p, fp, fc)
        back, back_c = read_pcd(p)
        assert len(back) == len(fp)
        np.testing.assert_allclose(back, fp, atol=1e-5)

    def test_passthrough_and_denoise(self):
        r = np.random.default_rng(0)
        dense = r.normal(size=(500, 3)) * 0.05 + [0, 0, 1]
        outliers = r.uniform(-10, 10, size=(20, 3))
        pts = np.concatenate([dense, outliers])
        kept = occupancy_denoise(pts, voxel=0.3, min_neighbors=5)
        assert len(kept) >= 450
        assert len(kept) < len(pts)
        z = passthrough(pts, axis=2, lo=0.5, hi=1.5)
        assert np.all((z[:, 2] >= 0.5) & (z[:, 2] <= 1.5))

    def test_mesh_triangulation(self):
        xs, ys = np.meshgrid(np.arange(10) * 0.05, np.arange(10) * 0.05)
        pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(100)], axis=1)
        verts, faces = grid_triangulate(pts, cell=0.05, max_edge=0.12)
        assert len(faces) > 100  # ~2 triangles per interior cell


class TestGyroEuler:
    def test_constant_yaw_rate(self):
        n, dt = 200, 0.01
        gyr = np.tile([0.0, 0.0, 0.3], (n, 1))
        rpy = integrate_euler(jnp.asarray(gyr), dt)
        np.testing.assert_allclose(np.asarray(rpy)[-1],
                                   [0.0, 0.0, 0.3 * n * dt], atol=1e-9)

    def test_bias_removal(self):
        r = np.random.default_rng(1)
        bias = np.array([0.01, -0.02, 0.005])
        static = np.tile(bias, (100, 1)) + r.normal(size=(100, 3)) * 1e-5
        est = gyro_bias_from_static(static, 100)
        np.testing.assert_allclose(est, bias, atol=1e-5)
        gyr = np.tile(bias, (50, 1))  # pure bias -> no motion after removal
        rpy = integrate_euler(jnp.asarray(gyr), 0.01, bias=jnp.asarray(est))
        assert float(jnp.abs(rpy[-1]).max()) < 1e-4


class TestMetrics:
    def test_ate_zero_for_aligned_copy(self):
        r = np.random.default_rng(9)
        from graph_slam_tpu.utils import ate_rmse, rpe
        gt = np.cumsum(r.normal(size=(50, 3)) * 0.1, axis=0)
        # rigidly transformed estimate: ATE after alignment ~ 0
        R = np_lie.so3_exp([0.2, -0.1, 0.5])
        est = (R @ gt.T).T + np.array([1.0, -2.0, 0.5])
        assert ate_rmse(est, gt) < 1e-12
        assert ate_rmse(est, gt, align=False) > 1.0

    def test_ate_scales_with_noise(self):
        r = np.random.default_rng(10)
        from graph_slam_tpu.utils import ate_rmse
        gt = np.cumsum(r.normal(size=(80, 3)) * 0.1, axis=0)
        e1 = ate_rmse(gt + r.normal(size=gt.shape) * 0.01, gt)
        e2 = ate_rmse(gt + r.normal(size=gt.shape) * 0.1, gt)
        assert 0 < e1 < e2
