"""IMU noise presets: VN-100 @200Hz and raw MEMS @100Hz.

Datasheet-derived values match the reference wrappers:
- VN-100 (``/root/reference/gtsam/imu_vn100.cpp:24-67``): gyro noise density
  0.0035 deg/s/sqrt(Hz), accel 0.14 mg/sqrt(Hz), gyro bias stability
  10 deg/hr * sqrt(fps), accel bias 0.04 mg * sqrt(fps), integration error
  1e-4, initial bias uncertainty 1e-3.
- MEMS (``/root/reference/gtsam/imu_MEMS.cpp:19-33``): 3.6 deg ARW -> sigma
  D2R(3.6)/60, accel 0.1/60, integration 1e-4, bias RW 1e-8, init 1e-5; raw
  integer LSB conversions gyro ``i*80/1092`` deg/s and accel
  ``i*0.002522*9.81`` m/s^2 (``imu_MEMS.cpp:9-13``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .preintegration import ImuParams

__all__ = ["vn100_params", "mems_params", "VN100_DT", "MEMS_DT",
           "mems_gyro_lsb_to_rad", "mems_accel_lsb_to_ms2"]

_G = 9.81
VN100_DT = 1.0 / 200.0
MEMS_DT = 1.0 / 100.0


def _d2r(d):
    return d * math.pi / 180.0


def _iso(v, dtype):
    return jnp.eye(3, dtype=dtype) * v


def vn100_params(fps: float = 200.0, gravity=(0.0, 0.0, -_G),
                 dtype=jnp.float64) -> ImuParams:
    accel_noise_sigma = 0.14e-3 * _G
    gyro_noise_sigma = _d2r(0.0035)
    accel_bias_rw_sigma = (0.04e-3 * _G) * math.sqrt(fps)
    gyro_bias_rw_sigma = (_d2r(10.0) / 3600.0) * math.sqrt(fps)
    return ImuParams(
        accel_cov=_iso(accel_noise_sigma**2, dtype),
        gyro_cov=_iso(gyro_noise_sigma**2, dtype),
        integration_cov=_iso(1e-4, dtype),
        bias_acc_cov=_iso(accel_bias_rw_sigma**2, dtype),
        bias_omega_cov=_iso(gyro_bias_rw_sigma**2, dtype),
        bias_acc_omega_init=jnp.eye(6, dtype=dtype) * 1e-3,
        gravity=jnp.asarray(gravity, dtype),
    )


def mems_params(gravity=(0.0, 0.0, -_G), dtype=jnp.float64) -> ImuParams:
    gyro_sigma = _d2r(3.6) / 60.0   # angular random walk
    accel_sigma = 0.1 / 60.0        # spec approximation
    return ImuParams(
        accel_cov=_iso(accel_sigma**2, dtype),
        gyro_cov=_iso(gyro_sigma**2, dtype),
        integration_cov=_iso(1e-4, dtype),
        bias_acc_cov=_iso(1e-8, dtype),
        bias_omega_cov=_iso(1e-8, dtype),
        bias_acc_omega_init=jnp.eye(6, dtype=dtype) * 1e-5,
        gravity=jnp.asarray(gravity, dtype),
    )


def mems_gyro_lsb_to_rad(i):
    """Raw integer gyro LSB -> rad/s (imu_MEMS.cpp:10)."""
    return (i * 80.0 / 1092.0) * math.pi / 180.0


def mems_accel_lsb_to_ms2(i):
    """Raw integer accel LSB -> m/s^2 (imu_MEMS.cpp:13)."""
    return i * 0.002522 * _G
