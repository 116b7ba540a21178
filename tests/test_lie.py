"""Lie-core unit tests: exp/log round trips, Jacobians vs numeric derivatives.

Mirrors the reference's (disabled) numeric-vs-analytic test pattern in
``/root/reference/gtsam/test/testOrientedPlane3.cpp:73-82``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.core import se3, so3

pytestmark = pytest.mark.fast


def rng(seed=0):
    return np.random.default_rng(seed)


def random_w(r, n=64, scale=2.0):
    return jnp.asarray(r.normal(size=(n, 3)) * scale)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = random_w(rng(1))
        R = so3.expmap(w)
        w2 = so3.logmap(R)
        # angles > pi wrap; compare rotations instead
        np.testing.assert_allclose(so3.expmap(w2), R, atol=1e-9)

    def test_log_exp_roundtrip_small_and_large(self):
        r = rng(2)
        for scale in [1e-8, 1e-4, 0.5, 2.0, 3.1]:
            w = jnp.asarray(r.normal(size=(32, 3)))
            w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * scale
            R = so3.expmap(w)
            np.testing.assert_allclose(so3.logmap(R), w, atol=1e-7)

    def test_log_near_pi(self):
        r = rng(3)
        axis = r.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        for ang in [np.pi - 1e-3, np.pi - 1e-6, np.pi]:
            w = jnp.asarray(axis * ang)
            R = so3.expmap(w)
            w2 = so3.logmap(R)
            np.testing.assert_allclose(so3.expmap(w2), R, atol=1e-6)

    def test_orthonormal(self):
        R = so3.expmap(random_w(rng(4)))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_left_jacobian_vs_numeric(self):
        # J_l(w) = d Expmap(w+dw) at dw=0 pulled back: Exp(w+dw) ~ Exp(J_l dw) Exp(w)
        w0 = jnp.array([0.3, -0.2, 0.7])

        def f(dw):
            return so3.logmap(so3.expmap(w0 + dw) @ so3.expmap(w0).T)

        Jnum = jax.jacfwd(f)(jnp.zeros(3))
        np.testing.assert_allclose(Jnum, so3.left_jacobian(w0), atol=1e-8)

    def test_left_jacobian_inverse(self):
        w = random_w(rng(5), 16, 1.5)
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inverse(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-10)

    def test_quat_roundtrip(self):
        R = so3.expmap(random_w(rng(6)))
        q = so3.matrix_to_quat(R)
        np.testing.assert_allclose(so3.quat_to_matrix(q), R, atol=1e-12)
        assert bool(jnp.all(q[..., 0] >= 0))

    def test_rzryrx_rpy_roundtrip(self):
        r = rng(7)
        roll = jnp.asarray(r.uniform(-1.2, 1.2, 16))
        pitch = jnp.asarray(r.uniform(-1.2, 1.2, 16))
        yaw = jnp.asarray(r.uniform(-3.0, 3.0, 16))
        R = so3.rzryrx(roll, pitch, yaw)
        out = so3.rpy(R)
        np.testing.assert_allclose(out[..., 0], roll, atol=1e-10)
        np.testing.assert_allclose(out[..., 1], pitch, atol=1e-10)
        np.testing.assert_allclose(out[..., 2], yaw, atol=1e-10)


def random_pose(r, n=32, tscale=3.0, wscale=2.0):
    w = jnp.asarray(r.normal(size=(n, 3)) * wscale)
    t = jnp.asarray(r.normal(size=(n, 3)) * tscale)
    return se3.Pose(so3.expmap(w), t)


class TestSE3:
    def test_exp_log_roundtrip(self):
        # log inverts exp only inside the injectivity radius |omega| < pi
        r = rng(10)
        xi = jnp.asarray(r.normal(size=(64, 6)))
        wn = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
        xi = xi.at[:, :3].multiply(jnp.minimum(1.0, 3.0 / wn))
        p = se3.expmap(xi)
        np.testing.assert_allclose(se3.logmap(p), xi, atol=1e-9)

    def test_compose_inverse(self):
        r = rng(11)
        a, b = random_pose(r), random_pose(r)
        ab = se3.compose(a, b)
        b2 = se3.compose(se3.inverse(a), ab)
        np.testing.assert_allclose(b2.R, b.R, atol=1e-10)
        np.testing.assert_allclose(b2.t, b.t, atol=1e-9)

    def test_matrix_roundtrip(self):
        p = random_pose(rng(12))
        T = se3.to_matrix(p)
        p2 = se3.from_matrix(T)
        np.testing.assert_allclose(p2.R, p.R)
        np.testing.assert_allclose(p2.t, p.t)

    def test_transform_points(self):
        r = rng(13)
        p = random_pose(r, 8)
        pt = jnp.asarray(r.normal(size=(8, 3)))
        w = se3.transform_from(p, pt)
        back = se3.transform_to(p, w)
        np.testing.assert_allclose(back, pt, atol=1e-10)

    def test_adjoint_identity(self):
        """Ad_T xi == Log(T Exp(xi) T^-1) — the defining property used when the
        reference conjugates information matrices (gtsam_graph.cpp:675-676)."""
        r = rng(14)
        T = random_pose(r, 1)
        T = se3.Pose(T.R[0], T.t[0])
        xi = jnp.asarray(r.normal(size=6) * 0.3)
        lhs = se3.adjoint(T) @ xi
        rhs = se3.logmap(se3.compose(se3.compose(T, se3.expmap(xi)), se3.inverse(T)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_retract_local(self):
        r = rng(15)
        p = random_pose(r, 16)
        xi = jnp.asarray(r.normal(size=(16, 6)) * 0.5)
        q = se3.retract(p, xi)
        np.testing.assert_allclose(se3.local(p, q), xi, atol=1e-9)

    def test_expmap_translation_jleft(self):
        """Pose3::Expmap couples translation through the SO(3) left Jacobian."""
        xi = jnp.array([0.4, -0.1, 0.9, 1.0, 2.0, -0.5])
        p = se3.expmap(xi)
        expected_t = so3.left_jacobian(xi[:3]) @ xi[3:]
        np.testing.assert_allclose(p.t, expected_t, atol=1e-12)

    def test_jit_vmap(self):
        f = jax.jit(jax.vmap(lambda xi: se3.logmap(se3.expmap(xi))))
        xi = jnp.asarray(rng(16).normal(size=(128, 6)))
        wn = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
        xi = xi.at[:, :3].multiply(jnp.minimum(1.0, 3.0 / wn))
        np.testing.assert_allclose(f(xi), xi, atol=1e-9)
