"""Plane stack tests: manifold conventions (pinned to the vendored GTSAM
test), factor convergence, extraction, propagation, PSD repair,
association."""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.core import se3, so3
from graph_slam_tpu.graph import GraphBuilder, lm_optimize, total_error
from graph_slam_tpu.planes import (
    PlaneLandmarkBook,
    extract_planes,
    inflate_if_uncertain,
    oriented_plane,
    plane_to_world,
    propagate_plane,
    repair_plane_cov,
    transform_plane_cov,
)
from graph_slam_tpu.config import SR4000


class TestOrientedPlane:
    def test_transform_matches_gtsam_vendored_case(self):
        """testOrientedPlane3.cpp transform case: plane (-1,0,0,5), pose
        Ypr(-pi/4, 0, 0) + t (2,3,4) -> (-sqrt2/2, -sqrt2/2, 0, 3)."""
        R = np_lie.so3_exp([0, 0, -np.pi / 4])
        t = np.array([2.0, 3.0, 4.0])
        out = oriented_plane.transform(jnp.array([-1.0, 0, 0, 5.0]),
                                       jnp.asarray(R), jnp.asarray(t))
        np.testing.assert_allclose(
            out, [-np.sqrt(2) / 2, -np.sqrt(2) / 2, 0.0, 3.0], atol=1e-12)

    def test_retract_local_roundtrip(self):
        r = np.random.default_rng(0)
        for _ in range(5):
            n = r.normal(size=3)
            n /= np.linalg.norm(n)
            p = jnp.asarray(np.concatenate([n, [r.uniform(0.5, 3)]]))
            xi = jnp.asarray(r.normal(size=3) * 0.3)
            q = oriented_plane.retract(p, xi)
            np.testing.assert_allclose(oriented_plane.local(p, q), xi,
                                       atol=1e-9)

    def test_world_body_inverse(self):
        r = np.random.default_rng(1)
        Rt = np_lie.se3_exp(r.normal(size=6))
        X = se3.Pose(jnp.asarray(Rt[0]), jnp.asarray(Rt[1]))
        pb = jnp.array([0.0, 0.6, 0.8, 1.5])
        pw = plane_to_world(pb, X)
        back = oriented_plane.transform(pw, X.R, X.t)
        np.testing.assert_allclose(back, pb, atol=1e-12)


class TestPlaneFactor:
    def test_plane_graph_converges(self):
        """Poses + plane landmarks: noise-free observations recover both."""
        r = np.random.default_rng(2)
        planes_w = [np.array([0.0, 0.0, 1.0, -1.0]),
                    np.array([1.0, 0.0, 0.0, -2.0]) / 1.0]
        gt = []
        for k in range(5):
            xi = np.concatenate([r.normal(size=3) * 0.2,
                                 r.normal(size=3) * 0.5])
            gt.append(np_lie.se3_exp(xi))

        b = GraphBuilder()
        for k, (R, t) in enumerate(gt):
            if k == 0:
                b.add_pose((R, t))
            else:
                b.add_pose(np_lie.retract((R, t), r.normal(size=6) * 0.05))
        b.add_prior_pose(0, gt[0], sigmas=np.full(6, 1e-7))
        for k in range(4):
            b.add_between(k, k + 1, np_lie.between(gt[k], gt[k + 1]),
                          information=np.eye(6) * 100)
        for pw in planes_w:
            # perturbed landmark initial value
            lid = b.add_plane(pw + np.concatenate([r.normal(size=3) * 0.02,
                                                   [r.normal() * 0.02]]))
            for k, (R, t) in enumerate(gt):
                meas = oriented_plane.transform(
                    jnp.asarray(pw / np.linalg.norm(pw[:3])),
                    jnp.asarray(R), jnp.asarray(t))
                b.add_plane_factor(k, lid, np.asarray(meas),
                                   sigmas=np.array([0.01, 0.01, 0.02]))
        graph, values = b.build()
        res = lm_optimize(graph, values)
        assert float(res.error) < 1e-10
        for li, pw in enumerate(planes_w):
            est = np.asarray(res.values.plane[li])
            expect = pw / np.linalg.norm(pw[:3])
            np.testing.assert_allclose(est, expect, atol=1e-5)


class TestExtraction:
    def test_two_plane_scene(self):
        r = np.random.default_rng(3)
        n1 = 600
        # z = 2 plane -> n=(0,0,1), d=-2 ; x = 1 plane -> n=(1,0,0), d=-1
        p1 = np.stack([r.uniform(-2, 2, n1), r.uniform(-2, 2, n1),
                       np.full(n1, 2.0) + r.normal(size=n1) * 0.004], axis=1)
        p2 = np.stack([np.full(n1, 1.0) + r.normal(size=n1) * 0.004,
                       r.uniform(-2, 2, n1), r.uniform(0, 4, n1)], axis=1)
        noise = r.uniform(-3, 3, size=(200, 3))
        pts = np.concatenate([p1, p2, noise])
        valid = np.ones(len(pts), bool)
        det = extract_planes(jax.random.PRNGKey(0), jnp.asarray(pts),
                             jnp.asarray(valid), max_planes=3,
                             min_support=300)
        assert int(det.valid.sum()) >= 2
        found = np.asarray(det.params[det.valid])
        # each gt plane matched by some detection (up to sign)
        for gt_plane in ([0, 0, 1, -2], [1, 0, 0, -1]):
            gt_n = np.asarray(gt_plane[:3], float)
            oks = []
            for f in found:
                c = abs(np.dot(f[:3], gt_n))
                oks.append(c > 0.999 and
                           abs(abs(f[3]) - abs(gt_plane[3])) < 0.02)
            assert any(oks), (found, gt_plane)

    def test_cov_scales_with_support(self):
        r = np.random.default_rng(4)
        pts = np.stack([r.uniform(-1, 1, 2000), r.uniform(-1, 1, 2000),
                        np.full(2000, 1.0)], axis=1)
        det_small = extract_planes(jax.random.PRNGKey(0),
                                   jnp.asarray(pts[:400]),
                                   jnp.ones(400, bool), max_planes=1,
                                   min_support=100)
        det_big = extract_planes(jax.random.PRNGKey(0), jnp.asarray(pts),
                                 jnp.ones(2000, bool), max_planes=1,
                                 min_support=100)
        tr_small = float(jnp.trace(det_small.cov[0]))
        tr_big = float(jnp.trace(det_big.cov[0]))
        assert tr_big < tr_small


class TestPropagation:
    def test_static_plane_carries_over(self):
        """Flat wall at z=2 seen by two identical frames: propagation must
        keep (almost) the full support and refit the same plane."""
        K = SR4000
        h, w = K.height, K.width
        depth = np.full((h, w), 2.0, np.float32)
        inten = np.full((h, w), 128.0, np.float32)
        prev_mask = np.zeros((h, w), bool)
        prev_mask[20:120, 30:150] = True
        T = se3.identity()
        S_t = jnp.eye(3) * 1e-6
        res = propagate_plane(
            K, jnp.array([0.0, 0.0, 1.0, -2.0]), jnp.eye(3) * 1e-6,
            jnp.asarray(1e-6), jnp.asarray(prev_mask),
            jnp.asarray(prev_mask.sum()), T, S_t,
            jnp.asarray(inten), jnp.asarray(depth))
        assert bool(res.ok)
        n = np.asarray(res.plane[:3])
        assert abs(abs(n[2]) - 1.0) < 1e-3
        assert abs(abs(float(res.plane[3])) - 2.0) < 5e-3
        assert int(res.count) >= prev_mask.sum()

    def test_translated_frame(self):
        """Camera moves 0.3m toward the wall: propagated plane distance
        shrinks accordingly."""
        K = SR4000
        h, w = K.height, K.width
        depth = np.full((h, w), 1.7, np.float32)   # wall now at 1.7m
        inten = np.full((h, w), 100.0, np.float32)
        prev_mask = np.zeros((h, w), bool)
        prev_mask[30:110, 40:140] = True
        # current frame pose expressed in previous frame: moved +0.3 in z
        T = se3.Pose(jnp.eye(3), jnp.array([0.0, 0.0, 0.3]))
        res = propagate_plane(
            K, jnp.array([0.0, 0.0, 1.0, -2.0]), jnp.eye(3) * 1e-6,
            jnp.asarray(1e-6), jnp.asarray(prev_mask),
            jnp.asarray(prev_mask.sum()), T, jnp.eye(3) * 1e-6,
            jnp.asarray(inten), jnp.asarray(depth))
        assert bool(res.ok)
        assert abs(abs(float(res.plane[3])) - 1.7) < 5e-3


class TestPsdAndAssociation:
    def test_repair_outputs_diagonal_floored(self):
        S = np.array([[1e-12, 5e-5, 0], [5e-5, 4e-6, 0], [0, 0, -1e-7]])
        R = repair_plane_cov(S)
        assert np.all(np.diag(R) >= 1e-8)
        assert np.allclose(R, np.diag(np.diag(R)))
        ev = np.linalg.eigvalsh(R)
        assert ev.min() > 0

    def test_inflate_and_reject(self):
        S = np.eye(3) * 1e-4
        S2, ok = inflate_if_uncertain(S, trace_snv=2.0, is_new_landmark=True)
        assert ok and np.allclose(S2, np.eye(3) * 1e-4)
        S3, ok = inflate_if_uncertain(S, trace_snv=2.0,
                                      is_new_landmark=False)
        assert not ok

    def test_association_window(self):
        book = PlaneLandmarkBook(lookback=7)
        X0 = se3.identity()
        pb = np.array([0.0, 0.0, 1.0, -1.5])
        lid, new = book.associate(0, pb, X0)
        assert new and lid == 0
        # same plane from a nearby pose -> same landmark
        X1 = se3.Pose(jnp.asarray(np_lie.so3_exp([0, 0, 0.05])),
                      jnp.array([0.05, 0.0, 0.0]))
        pb1 = oriented_plane.transform(
            jnp.asarray(plane_to_world(jnp.asarray(pb), X0)), X1.R, X1.t)
        lid1, new1 = book.associate(1, np.asarray(pb1), X1)
        assert lid1 == 0 and not new1
        # very different plane -> new landmark
        lid2, new2 = book.associate(1, np.array([1.0, 0, 0, -4.0]), X1)
        assert new2 and lid2 == 1
        # outside the window -> new landmark even if geometrically same
        lid3, new3 = book.associate(20, pb, X0)
        assert new3

    def test_transform_jacobian_matches_autodiff(self):
        """Analytic chart-to-chart Jacobian == jacfwd through retract/local
        (checked in f64 where the sphere logmap derivative is benign)."""
        from graph_slam_tpu.planes.association import _transform_jacobian

        r = np.random.default_rng(11)
        for _ in range(5):
            n = r.normal(size=3)
            n /= np.linalg.norm(n)
            plane = jnp.asarray(np.concatenate([n, [r.uniform(0.5, 3)]]))
            Rt = np_lie.se3_exp(r.normal(size=6) * 0.5)
            R, t = jnp.asarray(Rt[0]), jnp.asarray(Rt[1])

            def f(xi):
                p = oriented_plane.retract(plane, xi)
                out = oriented_plane.transform(p, R, t)
                return oriented_plane.local(
                    oriented_plane.transform(plane, R, t), out)

            J_ad = jax.jacfwd(f)(jnp.zeros(3, plane.dtype))
            J_an = _transform_jacobian(plane, R, t)
            np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                                       atol=1e-7)

    def test_transform_cov_jacobian_consistency(self):
        r = np.random.default_rng(5)
        plane = jnp.array([0.0, 0.6, 0.8, 1.2])
        Rt = np_lie.se3_exp(r.normal(size=6) * 0.4)
        pose = se3.Pose(jnp.asarray(Rt[0]), jnp.asarray(Rt[1]))
        cov = jnp.eye(3) * 1e-4
        out, cov_out = transform_plane_cov(plane, cov, pose)
        cov_out = np.asarray(cov_out)
        assert np.allclose(cov_out, cov_out.T, atol=1e-12)
        assert np.linalg.eigvalsh(cov_out).min() > 0
