"""Cal3DS2 camera model: pinhole + radial-tangential distortion.

GTSAM ``Cal3DS2`` semantics — the reference builds projection factors with
``Cal3DS2(fx, fy, 0, cx, cy, k1, k2)``
(``/root/reference/gtsam/gtsam_graph.cpp:373,512``). Batched, jit/vmap/grad
friendly; used by the projection factor and the two-frame BA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Cal3DS2", "uncalibrate", "project_point"]


class Cal3DS2(NamedTuple):
    """Intrinsics pytree: (fx, fy, s, u0, v0, k1, k2, p1, p2) arrays."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    s: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, s=0.0,
             dtype=jnp.float64):
        a = lambda v: jnp.asarray(v, dtype)
        return cls(a(fx), a(fy), a(s), a(cx), a(cy), a(k1), a(k2), a(p1),
                   a(p2))


def uncalibrate(K: Cal3DS2, p):
    """Normalized image point (x, y) -> distorted pixel (u, v).

    GTSAM Cal3DS2::uncalibrate: radial (1 + k1 r^2 + k2 r^4) + tangential.
    """
    p = jnp.asarray(p)
    x, y = p[..., 0], p[..., 1]
    xy = x * y
    xx = x * x
    yy = y * y
    r2 = xx + yy
    g = 1.0 + K.k1 * r2 + K.k2 * r2 * r2
    dx = 2.0 * K.p1 * xy + K.p2 * (r2 + 2.0 * xx)
    dy = 2.0 * K.p2 * xy + K.p1 * (r2 + 2.0 * yy)
    px = g * x + dx
    py = g * y + dy
    u = K.fx * px + K.s * py + K.u0
    v = K.fy * py + K.v0
    return jnp.stack([u, v], axis=-1)


def project_point(K: Cal3DS2, p_cam):
    """Camera-frame 3D point -> pixel. Guards the z<=0 singularity with a
    clamp so autodiff stays finite (the factor masks cheirality failures).

    The normalized radius is additionally clamped to 100 (any physical
    FOV is < ~10): with only the z clamp, a point driven behind a camera
    by one bad GN step projects to ~1e6-scale normalized coords whose
    r^4 radial term overflows f32 — inf enters the Jacobians, the reduced
    system Cholesky turns NaN, and the whole solve is poisoned
    unrecoverably. Bounded-but-huge residuals instead let the next damped
    iteration pull the point back (observed on the 100k-landmark
    sqrt-Schur config, 2026-08-20)."""
    p_cam = jnp.asarray(p_cam)
    z = p_cam[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    n = p_cam[..., :2] / z_safe[..., None]
    rad = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n * jnp.minimum(1.0, 100.0 / jnp.maximum(rad, 1e-30))
    return uncalibrate(K, n)
