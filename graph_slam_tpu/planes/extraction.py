"""Plane segmentation from depth images: batched-RANSAC + LS refinement.

Role of the external plane library's ``CPlaneNode::extractPlanes`` (used by
``predictPlaneNode`` fallbacks, ``/root/reference/gtsam/gtsam_graph.cpp:1056,1074``)
and of ``CPlane::computeCOVSparse`` (plane parameter covariance): all
RANSAC hypotheses are evaluated as ONE batched computation; planes are
peeled greedily with a static trip count; the plane covariance is the
Gauss-Newton covariance in the OrientedPlane3 tangent (2-dof normal chart +
distance), which is exactly the ``S_upi`` block ``addPlaneFactor`` consumes
(gtsam_graph.cpp:1150-1160).

Plane convention: ``(n, d)`` with ``n . p + d = 0`` (matches
``oriented_plane.transform`` and the vendored GTSAM tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import oriented_plane

__all__ = ["PlaneDetection", "fit_plane_lsq", "plane_tangent_cov",
           "extract_planes"]


class PlaneDetection(NamedTuple):
    """Fixed-capacity plane set for one frame (CPlaneNode equivalent)."""

    params: jnp.ndarray   # (P, 4) — (n, d), unit normal
    cov: jnp.ndarray      # (P, 3, 3) — tangent covariance [basis(2), d]
    inlier: jnp.ndarray   # (P, N) bool — membership per input point
    count: jnp.ndarray    # (P,) inlier counts
    valid: jnp.ndarray    # (P,) bool


def _plane_from_3pts(p0, p1, p2):
    """Plane through 3 points + degeneracy flag (near-collinear samples)."""
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = norm[..., 0] < 1e-6
    n = n / jnp.where(norm > 1e-12, norm, 1.0)
    d = -jnp.sum(n * p0, axis=-1)
    return jnp.concatenate([n, d[..., None]], axis=-1), degenerate


def point_plane_dist(plane, pts):
    """|n . p + d| for (..., 4) plane(s) against (N, 3) points."""
    return jnp.abs(
        jnp.einsum("...i,ni->...n", plane[..., :3], pts) + plane[..., 3:4]
    )


def fit_plane_lsq(pts, w):
    """Weighted least-squares plane: centroid + smallest-eigvec normal."""
    w = w.astype(pts.dtype)
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    mu = jnp.sum(pts * w[:, None], axis=0) / ws
    dp = (pts - mu) * w[:, None]
    C = dp.T @ (pts - mu)
    evals, evecs = jnp.linalg.eigh(C)
    n = evecs[:, 0]
    # orient toward the camera (plane normals face the sensor at origin):
    # n . 0 + d = d should be negative distance along n; flip so d > 0 when
    # the origin is on the positive side — keep the reference's convention
    # of consistent orientation by making n point toward the origin.
    d = -jnp.dot(n, mu)
    flip = jnp.where(d < 0, -1.0, 1.0)
    return jnp.concatenate([n * flip, jnp.array([d * flip], pts.dtype)])


def plane_tangent_cov(plane, pts, w, sigma_z: float = 0.014):
    """GN covariance of (n, d) in the OrientedPlane3 tangent chart.

    Residual r_k = n . p_k + d with noise sigma_z; tangent = [B(n)^T dn, dd]:
    J_k = [p_k^T B(n), 1]; cov = sigma_z^2 (sum w_k J_k^T J_k)^-1.
    ``0.014`` is the SR4000 depth sigma the reference hardcodes
    (gtsam_graph.cpp:890).
    """
    n = plane[:3]
    B = oriented_plane.basis(n)           # (3, 2)
    Jn = pts @ B                           # (N, 2)
    ones = jnp.ones((pts.shape[0], 1), pts.dtype)
    J = jnp.concatenate([Jn, ones], axis=1)  # (N, 3)
    H = jnp.einsum("ni,nj,n->ij", J, J, w.astype(pts.dtype))
    H = H + jnp.eye(3, dtype=pts.dtype) * 1e-9
    return sigma_z * sigma_z * jnp.linalg.inv(H)


@partial(jax.jit, static_argnames=("max_planes", "n_hyp"))
def extract_planes(key, pts, valid, max_planes: int = 4, n_hyp: int = 512,
                   dist_thresh: float = 0.02, min_support: int = 300,
                   sigma_z: float = 0.014) -> PlaneDetection:
    """Greedy multi-plane RANSAC over a (padded) point set.

    All ``n_hyp`` hypotheses per plane evaluate in one batch; after each
    accepted plane its inliers are removed and the next plane is sought
    (static ``max_planes`` trips).
    """
    n = pts.shape[0]
    remaining = valid

    params_out = jnp.zeros((max_planes, 4), pts.dtype).at[:, 2].set(1.0)
    cov_out = jnp.zeros((max_planes, 3, 3), pts.dtype)
    inlier_out = jnp.zeros((max_planes, n), bool)
    count_out = jnp.zeros((max_planes,), jnp.int32)
    valid_out = jnp.zeros((max_planes,), bool)

    for p in range(max_planes):
        key, sub = jax.random.split(key)
        probs = remaining.astype(jnp.float32)
        probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
        samp = jax.random.categorical(
            sub, jnp.log(probs + 1e-30), shape=(n_hyp, 3))
        cand, degen = _plane_from_3pts(pts[samp[:, 0]], pts[samp[:, 1]],
                                       pts[samp[:, 2]])
        dist = point_plane_dist(cand, pts)                  # (n_hyp, N)
        inl = (dist < dist_thresh) & remaining[None, :]
        scores = jnp.where(degen, -1, jnp.sum(inl, axis=1))
        best = jnp.argmax(scores)

        # two LS refinement rounds on the inlier set
        m = inl[best]
        plane = fit_plane_lsq(pts, m)
        m = (point_plane_dist(plane, pts) < dist_thresh) & remaining
        plane = fit_plane_lsq(pts, m)
        m = (point_plane_dist(plane, pts) < dist_thresh) & remaining
        cnt = jnp.sum(m).astype(jnp.int32)
        ok = cnt >= min_support
        cov = plane_tangent_cov(plane, pts, m, sigma_z)

        params_out = params_out.at[p].set(jnp.where(ok, plane,
                                                    params_out[p]))
        cov_out = cov_out.at[p].set(jnp.where(ok, cov, cov_out[p]))
        inlier_out = inlier_out.at[p].set(m & ok)
        count_out = count_out.at[p].set(jnp.where(ok, cnt, 0))
        valid_out = valid_out.at[p].set(ok)
        remaining = remaining & ~(m & ok)

    return PlaneDetection(params=params_out, cov=cov_out, inlier=inlier_out,
                          count=count_out, valid=valid_out)
