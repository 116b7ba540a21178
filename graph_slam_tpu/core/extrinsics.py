"""Fixed extrinsic transforms: world<->origin and IMU<->camera.

Reference: ``CGraphGT::setWorld2Original`` (axis permutation from camera
optical frame to a z-up world, ``/root/reference/gtsam/gtsam_graph.cpp:178-209``),
``setCamera2IMU`` (body/IMU frame from camera optical frame with an extra
pitch, ``:219-254``), and the translation-only RS435 variant
(``setCamera2IMUTranslation``, ``:211-216``).

Both rotations are composed as ``RzRyRx(a, 0, c) * RzRyRx(pitch, 0, 0)``
with the reference's specific angle choices; the pitch parameter compensates
the camera's mounting tilt.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from . import se3, so3

__all__ = ["world_to_original", "camera_to_imu", "camera_to_imu_translation"]

_HALF_PI = math.pi / 2.0


def world_to_original(pitch_rad: float = 0.0, dtype=jnp.float64) -> se3.Pose:
    """T_w2o: camera-optical frame (z forward, y down) -> z-up world frame."""
    R_g2b = so3.rzryrx(
        jnp.asarray(-_HALF_PI, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(-_HALF_PI, dtype),
    )
    R_b2o = so3.rzryrx(
        jnp.asarray(pitch_rad, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    return se3.Pose(R_g2b @ R_b2o, jnp.zeros(3, dtype))


def camera_to_imu(pitch_rad: float = 0.0, dtype=jnp.float64) -> se3.Pose:
    """T_u2c: camera optical frame -> IMU body frame (x fwd, y right, z down)."""
    R_g2b = so3.rzryrx(
        jnp.asarray(_HALF_PI, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(_HALF_PI, dtype),
    )
    R_b2o = so3.rzryrx(
        jnp.asarray(pitch_rad, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    return se3.Pose(R_g2b @ R_b2o, jnp.zeros(3, dtype))


def camera_to_imu_translation(px, py, pz, dtype=jnp.float64) -> se3.Pose:
    """Translation-only camera->IMU extrinsic (RS435 driver variant)."""
    return se3.Pose(jnp.eye(3, dtype=dtype), jnp.asarray([px, py, pz], dtype))
