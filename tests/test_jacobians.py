"""Analytic-vs-autodiff Jacobian cross-checks.

The industrialized version of the reference's vendored
numeric-vs-analytic tests (testOrientedPlane3.cpp:73-82): every closed-form
Jacobian in the library must match ``jax.jacfwd`` of the same residual.
"""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.core import se3, so3
from graph_slam_tpu.graph import factors as F
from graph_slam_tpu.graph import GraphBuilder
import pytest

pytestmark = pytest.mark.fast


def test_se3_right_jacobian_inverse_vs_numeric():
    xi = jnp.array([0.3, -0.2, 0.5, 1.0, -2.0, 0.7])

    # d/d eps Log(Exp(xi) Exp(eps)) at eps=0 == Jr^-1(xi)
    def f(eps):
        return se3.logmap(se3.compose(se3.expmap(xi), se3.expmap(eps)))

    Jnum = jax.jacfwd(f)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jnum),
                               np.asarray(se3.right_jacobian_inverse(xi)),
                               atol=1e-9)


def test_se3_left_jacobian_inverse_vs_numeric():
    xi = jnp.array([-0.4, 0.1, 0.2, 0.5, 0.3, -1.1])

    def f(eps):
        return se3.logmap(se3.compose(se3.expmap(eps), se3.expmap(xi)))

    Jnum = jax.jacfwd(f)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jnum),
                               np.asarray(se3.left_jacobian_inverse(xi)),
                               atol=1e-9)


def _small_graph():
    r = np.random.default_rng(7)
    b = GraphBuilder()
    for k in range(4):
        xi = r.normal(size=6) * 0.6
        b.add_pose(np_lie.se3_exp(xi))
    b.add_prior_pose(0, np_lie.se3_exp(r.normal(size=6) * 0.1),
                     sigmas=np.abs(r.normal(size=6)) + 0.1)
    info = np.diag(np.abs(r.normal(size=6)) + 1.0)
    for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 3)]:
        b.add_between(i, j, np_lie.se3_exp(r.normal(size=6) * 0.5),
                      information=info)
    # one robust edge exercises the reweighting path
    b.add_between(1, 3, np_lie.se3_exp(r.normal(size=6) * 0.5),
                  information=info, robust=1.345)
    return b.build(bucket=8)


def test_between_analytic_matches_autodiff():
    graph, values = _small_graph()
    auto = jax.jit(F._type_linearize(F._between_res, 12))(values, graph.between)
    ana = jax.jit(F._between_lin)(values, graph.between)
    np.testing.assert_allclose(np.asarray(auto[0]), np.asarray(ana[0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(auto[1]), np.asarray(ana[1]),
                               atol=1e-9)


def test_prior_pose_analytic_matches_autodiff():
    graph, values = _small_graph()
    auto = jax.jit(F._type_linearize(F._prior_pose_res, 6))(
        values, graph.prior_pose)
    ana = jax.jit(F._prior_pose_lin)(values, graph.prior_pose)
    np.testing.assert_allclose(np.asarray(auto[0]), np.asarray(ana[0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(auto[1]), np.asarray(ana[1]),
                               atol=1e-9)


def test_core_matches_numpy_reference():
    """Cross-implementation check: JAX Lie core vs the independent numpy one."""
    r = np.random.default_rng(11)
    for _ in range(5):
        xi = r.normal(size=6)
        xi[:3] *= 0.8
        R, t = np_lie.se3_exp(xi)
        P = se3.expmap(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(P.R), R, atol=1e-12)
        np.testing.assert_allclose(np.asarray(P.t), t, atol=1e-12)
        np.testing.assert_allclose(np.asarray(se3.logmap(P)),
                                   np_lie.se3_log(R, t), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(se3.adjoint(se3.Pose(jnp.asarray(R), jnp.asarray(t)))),
            np_lie.adjoint(R, t), atol=1e-12)
