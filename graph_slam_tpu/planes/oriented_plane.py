"""OrientedPlane3 manifold: unit normal + signed distance, GTSAM-compatible.

The reference's plane landmarks are ``gtsam::OrientedPlane3`` values created
from (n, d) plane coefficients (``/root/reference/gtsam/gtsam_graph.cpp:1118-1298``)
and verified by its vendored tests
(``/root/reference/gtsam/test/testOrientedPlane3.cpp``). Representation here:
a 4-vector ``(nx, ny, nz, d)`` with unit ``n``; plane equation ``n.x + d = 0``.

Manifold structure (3 dof): the normal lives on S^2 with a 2-dof tangent in
an orthonormal basis B(n) (GTSAM ``Unit3::basis``), the distance is additive.
``retract``/``local`` implement the sphere exponential/log in that basis,
matching GTSAM 4.0 ``Unit3::retract`` (EXPMAP mode).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import trig

__all__ = [
    "normalize",
    "basis",
    "retract",
    "local",
    "transform",
    "error_vector",
]


def normalize(plane):
    """Normalize the (n, d) 4-vector so ||n|| = 1 (d scales with it)."""
    plane = jnp.asarray(plane)
    n = plane[..., :3]
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    safe = jnp.where(norm > 0, norm, 1.0)
    return plane / safe


def basis(n):
    """Orthonormal tangent basis B(n): (..., 3, 2) with columns b1, b2.

    Follows GTSAM ``Unit3::basis``: pick the world axis most orthogonal to n
    (z unless |n_z| is the largest component, then x), b1 = normalize(n x axis),
    b2 = n x b1. Axis selection is data-dependent, so it is expressed with
    ``where`` to stay vmappable.
    """
    n = jnp.asarray(n)
    ax = jnp.abs(n[..., 0])
    ay = jnp.abs(n[..., 1])
    az = jnp.abs(n[..., 2])
    use_x = (az >= ax) & (az >= ay)  # z is dominant -> cross with x-axis
    # GTSAM picks axis = (1,0,0) if |nz| is largest else (0,0,1)
    axis = jnp.where(
        use_x[..., None],
        jnp.stack([jnp.ones_like(ax), jnp.zeros_like(ax), jnp.zeros_like(ax)], -1),
        jnp.stack([jnp.zeros_like(ax), jnp.zeros_like(ax), jnp.ones_like(ax)], -1),
    )
    b1 = jnp.cross(n, axis)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=-1)


def retract(plane, xi):
    """Manifold retraction: sphere expmap on n along B(n) xi[:2]; d += xi[2]."""
    plane = jnp.asarray(plane)
    xi = jnp.asarray(xi)
    n = plane[..., :3]
    d = plane[..., 3]
    v = xi[..., :2]
    B = basis(n)
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 > 1e-16, theta2, 1.0))
    s, c = trig.sincos(theta)
    sinc = jnp.where(theta2 > 1e-16, s / theta, 1.0 - theta2 / 6.0)
    cosv = jnp.where(theta2 > 1e-16, c, 1.0 - theta2 / 2.0)
    Bv = jnp.einsum("...ij,...j->...i", B, v)
    n_new = cosv[..., None] * n + sinc[..., None] * Bv
    n_new = n_new / jnp.linalg.norm(n_new, axis=-1, keepdims=True)
    return jnp.concatenate([n_new, (d + xi[..., 2])[..., None]], axis=-1)


def local(plane_a, plane_b):
    """Tangent of plane_b in the chart at plane_a (inverse of retract).

    Sphere logmap of n_b around n_a expressed in B(n_a), plus delta d.
    """
    a = jnp.asarray(plane_a)
    b = jnp.asarray(plane_b)
    na, nb = a[..., :3], b[..., :3]
    B = basis(na)
    cos_t = jnp.clip(jnp.sum(na * nb, axis=-1), -1.0, 1.0)
    # component of nb orthogonal to na; the squared-norm double-where keeps
    # the derivative of ||perp|| finite at perp = 0 (coincident normals
    # round to cos_t == 1 exactly in f32, where sqrt'(0) would NaN)
    perp = nb - cos_t[..., None] * na
    pn2 = jnp.sum(perp * perp, axis=-1)
    tiny = jnp.finfo(cos_t.dtype).tiny ** 0.5
    pn = jnp.sqrt(jnp.where(pn2 > tiny, pn2, 1.0))
    pn_safe = jnp.where(pn2 > tiny, pn, 0.0)
    # angle via atan2(||perp||, cos), NOT arccos(cos): arccos' blows up at
    # |cos| == 1 and jacfwd evaluates it there for every re-observed
    # landmark with coincident normals (in f32 a constant clamp margin
    # like 1 - 1e-12 rounds to exactly 1.0, NaNing the whole plane-factor
    # Jacobian); atan2 is exact at coincidence with finite partials
    theta = jnp.arctan2(pn_safe, cos_t)
    scale = jnp.where(pn2 > tiny, theta / pn, 1.0)
    w = scale[..., None] * perp
    v = jnp.einsum("...ij,...i->...j", B, w)
    return jnp.concatenate([v, (b[..., 3] - a[..., 3])[..., None]], axis=-1)


def transform(plane, pose_R, pose_t):
    """Express a world plane in a local frame given world-from-local pose.

    GTSAM ``OrientedPlane3::transform(xr)``: plane in world coords, pose
    ``xr`` = world pose of the frame; the result is the plane seen from that
    frame: ``n' = R^T n``, ``d' = d + n . t`` for plane form ``n.x + d = 0``.
    """
    plane = jnp.asarray(plane)
    n = plane[..., :3]
    d = plane[..., 3]
    n_local = jnp.einsum("...ji,...j->...i", pose_R, n)
    d_local = d + jnp.sum(n * pose_t, axis=-1)
    return jnp.concatenate([n_local, d_local[..., None]], axis=-1)


def error_vector(measured, predicted):
    """GTSAM ``OrientedPlane3Factor`` error: local(measured -> predicted)."""
    return local(measured, predicted)
