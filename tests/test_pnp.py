"""Batched RANSAC-PnP harness (test_match_PnP role, SURVEY §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.vision.cal3ds2 import Cal3DS2, project_point
from graph_slam_tpu.vision.matching import pnp_ransac

CAL = Cal3DS2.make(250.0, 250.0, 90.0, 70.0)


def scene(n=200, noise_px=0.5, outliers=40, seed=0,
          xi=(0.02, -0.03, 0.05, 0.1, -0.05, 0.08)):
    r = np.random.default_rng(seed)
    pts = np.stack([r.uniform(-1, 1, n), r.uniform(-0.8, 0.8, n),
                    r.uniform(1.5, 3.5, n)], 1)
    T_ij = np_lie.se3_exp(np.asarray(xi))
    Rji, tji = np_lie.inverse(T_ij)
    pts_j = pts @ Rji.T + tji
    uv = np.array(project_point(CAL, jnp.asarray(pts_j)))
    uv += r.normal(size=(n, 2)) * noise_px
    if outliers:
        bad = r.choice(n, outliers, replace=False)
        uv[bad] += r.uniform(30, 100, size=(outliers, 2))
    return pts, uv, T_ij


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        pts, uv, T_gt = scene()
        R, t, inl, ok = pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(pts),
                                   jnp.asarray(uv),
                                   jnp.ones(len(pts), bool), CAL)
        assert bool(ok)
        assert int(inl.sum()) >= 150          # all 160 clean points
        np.testing.assert_allclose(np.asarray(t), T_gt[1], atol=5e-3)
        np.testing.assert_allclose(np.asarray(R), T_gt[0], atol=2e-3)

    def test_inliers_exclude_corrupted(self):
        pts, uv, T_gt = scene(seed=1)
        _, _, inl, ok = pnp_ransac(jax.random.PRNGKey(1), jnp.asarray(pts),
                                   jnp.asarray(uv),
                                   jnp.ones(len(pts), bool), CAL)
        # re-identify the corrupted indices: reprojection error under GT
        Rji, tji = np_lie.inverse(T_gt)
        uv_true = np.asarray(project_point(
            CAL, jnp.asarray(pts @ Rji.T + tji)))
        bad = np.linalg.norm(uv - uv_true, axis=1) > 10
        assert not np.asarray(inl)[bad].any()

    def test_fails_without_consensus(self):
        r = np.random.default_rng(2)
        pts = np.stack([r.uniform(-1, 1, 60), r.uniform(-0.8, 0.8, 60),
                        r.uniform(1.5, 3.5, 60)], 1)
        uv = r.uniform(0, 180, size=(60, 2))   # pure noise
        *_, ok = pnp_ransac(jax.random.PRNGKey(2), jnp.asarray(pts),
                            jnp.asarray(uv), jnp.ones(60, bool), CAL,
                            min_inliers=12)
        assert not bool(ok)
