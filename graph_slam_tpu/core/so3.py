"""SO(3) Lie-group operations, batched and jit-friendly.

Conventions match GTSAM 4.0 ``Rot3`` (rotation matrices, ``Expmap``/``Logmap``
with angle-axis tangent). The reference backend manipulates rotations
exclusively through GTSAM (e.g. ``/root/reference/gtsam/gtsam_graph.cpp:630-695``);
here the same operations are pure JAX functions usable under ``jit``, ``vmap``
and ``grad``. All functions broadcast over leading batch dimensions.

Numerical policy: every small-angle branch uses a Taylor guard selected by
``jnp.where`` on a squared-angle threshold so derivatives stay finite under
autodiff (no NaN from 0/0 in untaken branches).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import trig

__all__ = [
    "hat",
    "vee",
    "expmap",
    "logmap",
    "left_jacobian",
    "left_jacobian_inverse",
    "quat_to_matrix",
    "matrix_to_quat",
    "rzryrx",
    "rpy",
]

_SMALL = 1e-10  # theta^2 threshold below which Taylor expansions are used


def hat(w):
    """3-vector -> skew-symmetric matrix, so3 hat operator."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Skew-symmetric matrix -> 3-vector (inverse of :func:`hat`)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2):
    """Return (sin(t)/t, (1-cos(t))/t^2) with Taylor guards."""
    theta = jnp.sqrt(jnp.where(theta2 > _SMALL, theta2, 1.0))
    a = jnp.where(theta2 > _SMALL, trig.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _SMALL, trig.one_minus_cos(theta) / theta2, 0.5 - theta2 / 24.0
    )
    return a, b


def expmap(w):
    """SO(3) exponential map (Rodrigues): angle-axis 3-vector -> rotation matrix."""
    w = jnp.asarray(w)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def logmap(R):
    """SO(3) logarithm: rotation matrix -> angle-axis 3-vector.

    Robust across the full angle range including theta near 0 and pi,
    following the standard trace/antisymmetric-part formulation GTSAM uses.
    """
    R = jnp.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # antisymmetric part: (R - R^T)/2 -> vee gives sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # ||v||^2 = 4 sin^2(theta): a smooth small-angle proxy for theta^2 that
    # keeps autodiff finite (arccos has an infinite derivative at +-1, so the
    # Taylor branch must not touch it, even through an untaken jnp.where).
    sin2_theta = 0.25 * jnp.sum(v * v, axis=-1)
    use_taylor = cos_theta > 1.0 - 1e-6
    near_pi = cos_theta < -1.0 + 1e-7
    cos_safe = jnp.where(use_taylor | near_pi, 0.0, cos_theta)
    theta_g = jnp.arccos(cos_safe)
    scale_g = theta_g / (2.0 * trig.sin(theta_g))
    # theta/(2 sin theta) = 1/2 + s^2/12 + O(s^4) with s = sin(theta)
    scale_t = 0.5 + sin2_theta / 12.0 + sin2_theta * sin2_theta * (7.0 / 720.0)
    scale = jnp.where(use_taylor, scale_t, scale_g)
    w_generic = scale[..., None] * v
    theta = jnp.arccos(cos_theta)  # value-only use below (near-pi branch)

    # Near pi: axis from diagonal of (R + I)/2 = I + sin? Use
    # R = I + sin(t) K + (1-cos t) K^2 ; at t=pi, R+I = 2(I + K^2) = 2 aa^T
    # so a_i = sqrt(max((R_ii + 1)/2, 0)), signs fixed from off-diagonals.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # pick the largest component as the sign anchor
    k = jnp.argmax(axis_abs, axis=-1)
    # off-diagonal sums: s_ij = (R_ij + R_ji)/2 = a_i a_j (1 - cos t) ~ 2 a_i a_j
    s01 = (R[..., 0, 1] + R[..., 1, 0]) * 0.5
    s02 = (R[..., 0, 2] + R[..., 2, 0]) * 0.5
    s12 = (R[..., 1, 2] + R[..., 2, 1]) * 0.5
    ax = axis_abs[..., 0]
    ay = axis_abs[..., 1]
    az = axis_abs[..., 2]
    # anchor x: signs of y,z from s01, s02
    cand_x = jnp.stack([ax, jnp.sign(s01) * ay, jnp.sign(s02) * az], axis=-1)
    cand_y = jnp.stack([jnp.sign(s01) * ax, ay, jnp.sign(s12) * az], axis=-1)
    cand_z = jnp.stack([jnp.sign(s02) * ax, jnp.sign(s12) * ay, az], axis=-1)
    cand = jnp.stack([cand_x, cand_y, cand_z], axis=-2)
    axis = jnp.take_along_axis(cand, k[..., None, None], axis=-2)[..., 0, :]
    # Fix overall sign using v (sin-part) where it is not exactly zero.
    sgn = jnp.where(jnp.sum(axis * v, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sgn[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def left_jacobian(w):
    """SO(3) left Jacobian J_l(w): d/dw of Expmap, also maps v in Pose3 Expmap."""
    w = jnp.asarray(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 > _SMALL, theta2, 1.0))
    W = hat(w)
    W2 = W @ W
    b = jnp.where(
        theta2 > _SMALL, trig.one_minus_cos(theta) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _SMALL,
        (theta - trig.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def left_jacobian_inverse(w):
    """Inverse of the SO(3) left Jacobian (closed form)."""
    w = jnp.asarray(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 > _SMALL, theta2, 1.0))
    W = hat(w)
    W2 = W @ W
    half_theta = 0.5 * theta
    sin_half, cos_half = trig.sincos(half_theta)
    cot_term = jnp.where(
        theta2 > _SMALL,
        (1.0 - 0.5 * theta * cos_half / sin_half) / theta2,
        1.0 / 12.0 + theta2 / 720.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def quat_to_matrix(q):
    """Quaternion (w, x, y, z) -> rotation matrix.

    GTSAM ``Rot3`` quaternion order is (w, x, y, z); the reference relies on
    this (ordering note at ``/root/reference/mapping/mapping_PCD.cpp:115-117``).
    """
    q = jnp.asarray(q)
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.where(n > 0, n, 1.0)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd method (all four candidates computed, the best
    selected with ``where``) so it is safe under ``vmap``/``jit``.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate 4*q*|q_k| vectors
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    k = jnp.argmax(scores, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)
    q = jnp.take_along_axis(cand, k[..., None, None], axis=-2)[..., 0, :]
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.where(n > 0, n, 1.0)
    return jnp.where(q[..., :1] < 0, -q, q)


def rzryrx(roll, pitch, yaw):
    """GTSAM ``Rot3::RzRyRx(roll, pitch, yaw)`` = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    Used by the reference for extrinsics (``gtsam_graph.cpp:196-254``).
    """
    roll = jnp.asarray(roll)
    sr, cr = trig.sincos(roll)
    sp, cp = trig.sincos(pitch)
    sy, cy = trig.sincos(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rpy(R):
    """Rotation matrix -> (roll, pitch, yaw), inverse of :func:`rzryrx`."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)
