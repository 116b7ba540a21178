"""SE(3) Lie-group operations matching GTSAM 4.0 ``Pose3`` semantics.

Tangent ordering is GTSAM's: ``xi = (omega, v)`` — rotation first, translation
last. The reference serializes relative poses with
``Pose3::ChartAtOrigin::Local`` (``/root/reference/gtsam/gtsam_graph.cpp:56-62``)
and reconstructs them with ``Pose3::ChartAtOrigin::Retract``
(``gtsam_graph.cpp:1531``); GTSAM 4.0 builds with ``GTSAM_POSE3_EXPMAP=ON`` so
both are the full SE(3) exp/log implemented here.

Poses are stored struct-of-arrays as ``(R, t)`` with ``R: (..., 3, 3)`` and
``t: (..., 3)`` — a pytree, so `Pose` batches flow through vmap/scan/jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3

__all__ = ["Pose", "identity", "compose", "inverse", "expmap", "logmap",
           "adjoint", "transform_from", "transform_to", "between", "retract",
           "local", "from_matrix", "to_matrix",
           "left_jacobian_inverse", "right_jacobian_inverse"]


class Pose(NamedTuple):
    """SE(3) element(s): rotation matrix block and translation block."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    def __matmul__(self, other: "Pose") -> "Pose":
        return compose(self, other)

    def inv(self) -> "Pose":
        return inverse(self)

    @property
    def batch_shape(self):
        return self.t.shape[:-1]


def identity(batch_shape=(), dtype=jnp.float64) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(R, t)


def from_matrix(T) -> Pose:
    T = jnp.asarray(T)
    return Pose(T[..., :3, :3], T[..., :3, 3])


def to_matrix(p: Pose):
    bottom = jnp.zeros((*p.t.shape[:-1], 1, 4), dtype=p.t.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([p.R, p.t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def compose(a: Pose, b: Pose) -> Pose:
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Pose(R, t)


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t))


def between(a: Pose, b: Pose) -> Pose:
    """GTSAM ``a.between(b) = a^-1 * b``."""
    return compose(inverse(a), b)


def transform_from(p: Pose, pt):
    """Body -> world point transform (GTSAM ``transform_from``)."""
    return jnp.einsum("...ij,...j->...i", p.R, jnp.asarray(pt)) + p.t


def transform_to(p: Pose, pt):
    """World -> body point transform (GTSAM ``transform_to``)."""
    d = jnp.asarray(pt) - p.t
    return jnp.einsum("...ji,...j->...i", p.R, d)


def expmap(xi) -> Pose:
    """SE(3) exponential: ``xi = (omega, v)`` -> Pose. Matches Pose3::Expmap."""
    xi = jnp.asarray(xi)
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3.expmap(w)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(w), v)
    return Pose(R, t)


def logmap(p: Pose):
    """SE(3) logarithm: Pose -> ``(omega, v)``. Matches Pose3::Logmap."""
    w = so3.logmap(p.R)
    v = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inverse(w), p.t)
    return jnp.concatenate([w, v], axis=-1)


def retract(p: Pose, xi) -> Pose:
    """Manifold retraction ``p * Expmap(xi)`` (GTSAM Pose3 retract, EXPMAP mode)."""
    return compose(p, expmap(xi))


def local(p: Pose, q: Pose):
    """Chart inverse: ``Logmap(p^-1 q)`` (GTSAM Pose3 localCoordinates)."""
    return logmap(between(p, q))


def _q_left(xi):
    """Barfoot's Q matrix of the SE(3) left Jacobian (State Estimation for
    Robotics, eq. 7.86): translation-rotation coupling block.
    """
    xi = jnp.asarray(xi)
    w = xi[..., :3]
    v = xi[..., 3:]
    W = so3.hat(w)
    V = so3.hat(v)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 > 1e-12, theta2, 1.0))
    from . import trig

    s, c = trig.sincos(theta)
    small = theta2 <= 1e-12
    t3 = theta2 * theta
    t4 = theta2 * theta2
    t5 = t4 * theta
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - s) / jnp.where(small, 1.0, t3))
    c2 = jnp.where(small, 1.0 / 24.0 - theta2 / 720.0,
                   (theta2 + 2.0 * c - 2.0) / jnp.where(small, 1.0, 2.0 * t4))
    c3 = jnp.where(small, 1.0 / 120.0,
                   (2.0 * theta - 3.0 * s + theta * c)
                   / jnp.where(small, 1.0, 2.0 * t5))
    WV = W @ V
    VW = V @ W
    WVW = WV @ W
    W2 = W @ W
    c1 = c1[..., None, None]
    c2 = c2[..., None, None]
    c3 = c3[..., None, None]
    return (0.5 * V + c1 * (WV + VW + W @ VW)
            + c2 * (W2 @ V + V @ W2 - 3.0 * WVW)
            + c3 * (WVW @ W + W @ WVW))


def left_jacobian_inverse(xi):
    """Inverse SE(3) left Jacobian (6x6), tangent ordering (omega, v)."""
    xi = jnp.asarray(xi)
    w = xi[..., :3]
    Jli = so3.left_jacobian_inverse(w)
    Q = _q_left(xi)
    top = jnp.concatenate([Jli, jnp.zeros_like(Jli)], axis=-1)
    bot = jnp.concatenate([-Jli @ Q @ Jli, Jli], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def right_jacobian_inverse(xi):
    """Inverse SE(3) right Jacobian: Jr^-1(xi) = Jl^-1(-xi).

    Appears in the closed-form factor Jacobians:
    d/d eps Log(Exp(e) Exp(eps)) |_0 = Jr^-1(e).
    """
    return left_jacobian_inverse(-jnp.asarray(xi))


def adjoint(p: Pose):
    """GTSAM ``Pose3::AdjointMap`` for tangent ordering (omega, v):

    ``Ad = [[R, 0], [hat(t) R, R]]``. The reference conjugates VO information
    matrices with this (``gtsam_graph.cpp:675-676``).
    """
    Z = jnp.zeros_like(p.R)
    tR = so3.hat(p.t) @ p.R
    top = jnp.concatenate([p.R, Z], axis=-1)
    bot = jnp.concatenate([tR, p.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
