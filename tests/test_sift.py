"""DoG/SIFT-class frontend: rotation/scale invariance the Harris+patch
frontend lacks (the reference's frontend IS SIFT — sibling repo
``visual_odometry``, SURVEY.md §3.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.config import CameraIntrinsics
from graph_slam_tpu.vision import (
    extract_features,
    get_extractor,
    sift_features,
)
from graph_slam_tpu.vision.sift import dog_keypoints

H = W = 160
K = CameraIntrinsics(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2)


@pytest.fixture(scope="module")
def textured():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    img = gaussian_filter(
        np.kron(rng.normal(size=(H // 8, W // 8)), np.ones((8, 8))), 2.0)
    img = (img - img.min()) / (np.ptp(img) + 1e-9)
    depth = np.full((H, W), 2.0, np.float32)
    return img, depth


def _match(f0, f1, ratio=0.92, min_sim=0.75):
    """Ratio-test descriptor matches; returns (query idx, train idx)."""
    v0, v1 = np.asarray(f0.valid), np.asarray(f1.valid)
    D = np.asarray(f0.desc) @ np.asarray(f1.desc).T
    D[~v0] = -1
    D[:, ~v1] = -1
    j = D.argmax(1)
    sim = D.max(1)
    D2 = D.copy()
    D2[np.arange(len(j)), j] = -1
    keep = v0 & (sim > min_sim) & (D2.max(1) < ratio * sim)
    return np.where(keep)[0], j[keep]


def _rot_predict(uv, deg):
    th = np.deg2rad(-deg)
    c, s = np.cos(th), np.sin(th)
    ctr = np.array([W / 2 - 0.5, H / 2 - 0.5])
    d = uv - ctr
    return np.stack([c * d[:, 0] - s * d[:, 1],
                     s * d[:, 0] + c * d[:, 1]], 1) + ctr


class TestSift:
    def test_static_shapes_and_masking(self, textured):
        img, depth = textured
        f = sift_features(K, jnp.asarray(img), jnp.asarray(depth),
                          max_features=96)
        assert f.uv.shape == (96, 2)
        assert f.desc.shape == (96, 128)
        assert f.pts3.shape == (96, 3)
        v = np.asarray(f.valid)
        assert v.sum() > 30
        norms = np.linalg.norm(np.asarray(f.desc), axis=1)
        np.testing.assert_allclose(norms[v], 1.0, atol=1e-5)
        # 3D lift consistency: z equals the constant depth
        np.testing.assert_allclose(np.asarray(f.pts3)[v, 2], 2.0, atol=1e-5)

    def test_multiscale_detection(self, textured):
        img, _ = textured
        kp = dog_keypoints(jnp.asarray(img), max_features=128)
        v = np.asarray(kp.valid)
        assert len(np.unique(np.asarray(kp.octave)[v])) >= 2
        assert np.asarray(kp.sigma)[v].min() > 1.0

    def test_rotation_invariance(self, textured):
        from scipy.ndimage import rotate

        img, depth = textured
        img_r = rotate(img, 30, reshape=False, order=1)
        f0 = sift_features(K, jnp.asarray(img), jnp.asarray(depth),
                           max_features=128)
        f1 = sift_features(K, jnp.asarray(img_r), jnp.asarray(depth),
                           max_features=128)
        qi, ti = _match(f0, f1)
        assert len(qi) >= 40
        pred = _rot_predict(np.asarray(f0.uv)[qi], 30)
        err = np.linalg.norm(pred - np.asarray(f1.uv)[ti], axis=1)
        assert np.median(err) < 2.0
        assert (err < 3.0).mean() > 0.85

    def test_beats_harris_under_rotation(self, textured):
        from scipy.ndimage import rotate

        img, depth = textured
        img_r = rotate(img, 30, reshape=False, order=1)
        s0 = sift_features(K, jnp.asarray(img), jnp.asarray(depth),
                           max_features=128)
        s1 = sift_features(K, jnp.asarray(img_r), jnp.asarray(depth),
                           max_features=128)
        h0 = extract_features(K, jnp.asarray(img), jnp.asarray(depth),
                              max_features=128)
        h1 = extract_features(K, jnp.asarray(img_r), jnp.asarray(depth),
                              max_features=128)

        def inliers(f0, f1):
            qi, ti = _match(f0, f1)
            if len(qi) == 0:
                return 0
            pred = _rot_predict(np.asarray(f0.uv)[qi], 30)
            err = np.linalg.norm(pred - np.asarray(f1.uv)[ti], axis=1)
            return int((err < 3.0).sum())

        assert inliers(s0, s1) > 4 * max(inliers(h0, h1), 1)

    def test_scale_invariance(self, textured):
        from scipy.ndimage import zoom

        img, depth = textured
        zf = 1.5
        big = zoom(img, zf, order=1)
        y0 = (big.shape[0] - H) // 2
        x0 = (big.shape[1] - W) // 2
        img_s = big[y0:y0 + H, x0:x0 + W]
        f0 = sift_features(K, jnp.asarray(img), jnp.asarray(depth),
                           max_features=128)
        fs = sift_features(K, jnp.asarray(img_s), jnp.asarray(depth),
                           max_features=128)
        qi, ti = _match(f0, fs)
        assert len(qi) >= 20
        pred = np.asarray(f0.uv)[qi] * zf - np.array([x0, y0])
        err = np.linalg.norm(pred - np.asarray(fs.uv)[ti], axis=1)
        assert (err < 3.0).mean() > 0.5

    def test_extractor_dispatch(self):
        assert get_extractor("sift") is sift_features
        assert get_extractor("harris") is extract_features
        with pytest.raises(ValueError):
            get_extractor("orb")

    def test_online_slam_with_sift(self):
        """End-to-end: the online pipeline runs on the SIFT frontend."""
        from test_pipelines2 import render_wall_frame

        from graph_slam_tpu.config import SR4000, SlamParams
        from graph_slam_tpu.pipelines import OnlineSlam

        slam = OnlineSlam(cam=SR4000, params=SlamParams(),
                          features="sift", max_features=128,
                          min_inliers=8, initial_pose_cap=16)
        for k, x in enumerate([0.0, 0.12, 0.24]):
            img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
            slam.process_frame(img, depth, seq_id=k)
        assert slam.num_keyframes >= 2
        tj = np.asarray(slam.og.pose(slam.num_keyframes - 1).t)
        assert abs(tj[0]) > 0.05        # forward translation recovered
