"""Gyro -> Euler-angle dead reckoning (CGyroEuler twin).

Reference (``/root/reference/gtsam/gyro_euler.{h,cpp}``): integer gyro
readings are bias-corrected with a static pre-sync window
(``gyro_euler.cpp:51-66``) and integrated through the body-rate ->
Euler-rate transform (``:85-114``). Here the whole stream integrates in one
``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import trig

__all__ = ["gyro_bias_from_static", "body_rates_to_euler_rates",
           "integrate_euler"]


def gyro_bias_from_static(gyr, n_static: int):
    """Bias = mean body rate over the static pre-sync samples."""
    return np.asarray(gyr)[:n_static].mean(axis=0)


def body_rates_to_euler_rates(rpy, w):
    """Body angular velocity -> (roll, pitch, yaw) rates.

    [dphi, dtheta, dpsi] = E(roll, pitch) @ w with the standard ZYX kinematic
    matrix (gyro_euler.cpp:85-114).
    """
    r, p = rpy[..., 0], rpy[..., 1]
    sr, cr = trig.sincos(r)
    sp, cp = trig.sincos(p)
    tp = sp / cp
    E = jnp.stack([
        jnp.stack([jnp.ones_like(r), sr * tp, cr * tp], axis=-1),
        jnp.stack([jnp.zeros_like(r), cr, -sr], axis=-1),
        jnp.stack([jnp.zeros_like(r), sr / cp, cr / cp], axis=-1),
    ], axis=-2)
    return jnp.einsum("...ij,...j->...i", E, w)


@jax.jit
def integrate_euler(gyr, dt, bias=None, rpy0=None):
    """Dead-reckon (roll, pitch, yaw) over a gyro stream in one scan.

    gyr: (N, 3) rad/s; dt: scalar or (N,). Returns (N, 3) Euler angles.
    """
    gyr = jnp.asarray(gyr)
    n = gyr.shape[0]
    dt = jnp.broadcast_to(jnp.asarray(dt, gyr.dtype), (n,))
    if bias is not None:
        gyr = gyr - jnp.asarray(bias, gyr.dtype)
    rpy0 = jnp.zeros(3, gyr.dtype) if rpy0 is None else jnp.asarray(rpy0)

    def step(rpy, xs):
        w, h = xs
        rates = body_rates_to_euler_rates(rpy, w)
        nxt = rpy + rates * h
        return nxt, nxt

    _, out = jax.lax.scan(step, rpy0, (gyr, dt))
    return out
