"""IMU-predicted plane propagation across frames — the tracking-loss rescue.

TPU re-design of ``CGraphGT::predictPlaneNode``
(``/root/reference/gtsam/gtsam_graph.cpp:877-1099``): when VRO fails, the
previous frame's planes are carried into the new frame using the
IMU-predicted relative pose. The reference loops over pixels with a BFS
region grow; here every step is a dense batched image operation:

1. ``propagated_distance_variance`` ports ``computeSdj``
   (gtsam_graph.cpp:725-748) exactly: the membership gate combines the
   plane's distance variance, the normal covariance pulled through the
   translation, and the predicted-pose translation covariance.
2. membership is computed for *all* current pixels at once
   (``inThisPlane``'s ``dis^2 <= max(S_dj, 0.014^2)`` test, ``:750-764``);
3. the seed region comes from inverse-warping the previous plane mask
   (gather-based: each current pixel looks up where it lands in the
   previous frame) — the 3x3 subpixel seeding loop collapses into bilinear
   sampling;
4. the 4-neighbour intensity-gated region grow (``regionGrow``,
   ``:779-859``) becomes a fixed number of masked dilation steps — a
   convolutional flood fill;
5. the grown plane is refit (LS) and its tangent covariance recomputed,
   accepted when it keeps >= ``keep_ratio`` (0.7) of the previous support
   (``:1025-1040``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from ..core import se3
from . import oriented_plane
from .extraction import fit_plane_lsq, plane_tangent_cov


def _backproject(K, u, v, z):
    # local copy to avoid a planes <-> vision circular import
    x = (jnp.asarray(u) - K.cx) * z / K.fx
    y = (jnp.asarray(v) - K.cy) * z / K.fy
    return jnp.stack([x, y, jnp.asarray(z)], axis=-1)

__all__ = ["propagated_distance_variance", "propagate_plane",
           "propagate_planes", "PropagationResult"]


class PropagationResult(NamedTuple):
    plane: jnp.ndarray    # (4,) refit plane in the new camera frame
    cov: jnp.ndarray      # (3, 3) tangent covariance
    mask: jnp.ndarray     # (H, W) membership after region grow
    count: jnp.ndarray    # scalar inlier count
    ok: jnp.ndarray       # scalar bool — propagation accepted


def propagated_distance_variance(plane_i, S_ni, S_di, T_ij: se3.Pose,
                                 S_tij):
    """Variance of the plane distance in the predicted frame (computeSdj).

    S_dj = S_di + n_i^T S_t n_i + ((I - n n^T) t)^T S_ni ((I - n n^T) t)
    """
    n = plane_i[:3]
    t = T_ij.t
    D_dj_D_ni = (jnp.eye(3, dtype=n.dtype) - jnp.outer(n, n)) @ t
    return (S_di + n @ S_tij @ n + D_dj_D_ni @ S_ni @ D_dj_D_ni)


def _dilate4(mask):
    m = mask.astype(jnp.float32)
    k = jnp.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], jnp.float32)
    out = jax.lax.conv_general_dilated(
        m[None, None], k[None, None], (1, 1), "SAME")[0, 0]
    return out > 0


def _bilinear(img, u, v):
    """Bilinear sample of (H, W) float image at float coords; OOB -> 0."""
    h, w = img.shape
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0

    def at(vv, uu):
        ok = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        return jnp.where(ok, img[jnp.clip(vv, 0, h - 1),
                                 jnp.clip(uu, 0, w - 1)], 0.0)

    return ((1 - du) * (1 - dv) * at(v0, u0) + du * (1 - dv) * at(v0, u0 + 1)
            + (1 - du) * dv * at(v0 + 1, u0) + du * dv * at(v0 + 1, u0 + 1))


@partial(jax.jit, static_argnames=("K", "grow_steps"))
def propagate_plane(K: CameraIntrinsics, plane_i, S_ni, S_di, prev_mask,
                    prev_count, T_ij: se3.Pose, S_tij, intensity, depth,
                    grow_steps: int = 64, z_min: float = 0.1,
                    z_max: float = 5.0, keep_ratio: float = 0.7,
                    intensity_tol: float = 5.0,
                    sigma_z: float = 0.014) -> PropagationResult:
    """Carry one plane from the previous frame into the current one.

    Args:
      plane_i: (4,) plane in the previous camera frame.
      S_ni / S_di: normal covariance (3,3) and distance variance.
      prev_mask: (H, W) bool — the plane's pixels in the previous frame.
      T_ij: predicted relative pose in the camera frame — the pose of the
        current frame expressed in the previous frame, so
        ``p_prev = T_ij * p_cur`` (matches the reference's
        ``pose->transform_to(pi)`` usage, gtsam_graph.cpp:957).
      S_tij: (3,3) translation covariance of the prediction.
      intensity/depth: current frame (H, W); depth in meters.
    """
    dtype = depth.dtype
    h, w = depth.shape

    # predicted plane in the current frame + its distance variance
    plane_j = oriented_plane.transform(plane_i, T_ij.R, T_ij.t)
    S_dj = propagated_distance_variance(plane_i, S_ni, S_di, T_ij, S_tij)
    gate = jnp.maximum(S_dj, 0.014 * 0.014)

    # dense membership: every current pixel's 3D point against plane_j
    vs = jnp.arange(h, dtype=dtype)
    us = jnp.arange(w, dtype=dtype)
    uu, vv = jnp.meshgrid(us, vs)
    pts = _backproject(K, uu, vv, depth)           # (H, W, 3)
    z_ok = (depth > z_min) & (depth < z_max)
    dis = jnp.einsum("hwi,i->hw", pts, plane_j[:3]) + plane_j[3]
    member = (dis * dis <= gate) & z_ok

    # seed: inverse-warp the previous plane mask (gather)
    p_prev = se3.transform_from(T_ij, pts.reshape(-1, 3)).reshape(h, w, 3)
    zp = jnp.where(p_prev[..., 2] > 1e-6, p_prev[..., 2], 1e-6)
    up = K.fx * p_prev[..., 0] / zp + K.cx
    vp = K.fy * p_prev[..., 1] / zp + K.cy
    seed = (_bilinear(prev_mask.astype(jnp.float32), up, vp) > 0.25) & member

    # intensity-smoothness gate between 4-neighbours (intensityTol)
    img = jnp.asarray(intensity, dtype)

    def smooth(shifted):
        return jnp.abs(img - shifted) <= intensity_tol

    sm_l = smooth(jnp.roll(img, 1, axis=1))
    sm_r = smooth(jnp.roll(img, -1, axis=1))
    sm_u = smooth(jnp.roll(img, 1, axis=0))
    sm_d = smooth(jnp.roll(img, -1, axis=0))

    # region grow: one Pallas kernel (every iteration in VMEM) on TPU,
    # XLA scan elsewhere — identical semantics, tested against each other
    from .pallas_grow import region_grow_pallas, region_grow_xla

    if jax.default_backend() == "tpu":
        mask = region_grow_pallas(seed, member, sm_l, sm_r, sm_u, sm_d,
                                  steps=grow_steps)
    else:
        mask = region_grow_xla(seed, member, sm_l, sm_r, sm_u, sm_d,
                               steps=grow_steps)

    count = jnp.sum(mask)
    ok = count >= keep_ratio * prev_count

    # refit on the grown support
    flat_pts = pts.reshape(-1, 3)
    flat_m = mask.reshape(-1)
    plane_fit = fit_plane_lsq(flat_pts, flat_m)
    cov = plane_tangent_cov(plane_fit, flat_pts, flat_m, sigma_z)
    plane_out = jnp.where(ok, plane_fit, plane_j)
    return PropagationResult(plane=plane_out, cov=cov, mask=mask,
                             count=count, ok=ok)


def _region_grow_batch(seed, member, sm_l, sm_r, sm_u, sm_d,
                       steps: int):
    """Batched flood fill over (P, H, W) masks; smoothness gates (H, W)
    broadcast across planes. Same math as ``region_grow_xla``."""
    from .pallas_grow import _bshift

    def grow(mask, _):
        grown = (
            (_bshift(mask, 1, 2) & sm_l)
            | (_bshift(mask, -1, 2) & sm_r)
            | (_bshift(mask, 1, 1) & sm_u)
            | (_bshift(mask, -1, 1) & sm_d)
        )
        return (mask | grown) & member, None

    mask, _ = jax.lax.scan(grow, seed & member, None, length=steps)
    return mask


@partial(jax.jit, static_argnames=("K", "grow_steps"))
def propagate_planes(K: CameraIntrinsics, planes_i, S_ni, S_di, prev_masks,
                     prev_counts, T_ij: se3.Pose, S_tij, intensity, depth,
                     grow_steps: int = 64, z_min: float = 0.1,
                     z_max: float = 5.0, keep_ratio: float = 0.7,
                     intensity_tol: float = 5.0,
                     sigma_z: float = 0.014) -> PropagationResult:
    """ALL planes of a frame in ONE device program (batched
    ``propagate_plane``; the fused rescue path's hot dispatch).

    The frame-shared work — backprojection, inverse-warp coordinates,
    smoothness gates — is computed once; membership, seeding, the flood
    fill, and the refit run batched over the plane axis. Args are the
    stacked per-plane arrays: ``planes_i (P,4)``, ``S_ni (P,3,3)``,
    ``S_di (P,)``, ``prev_masks (P,H,W)``, ``prev_counts (P,)``. Returns a
    ``PropagationResult`` with a leading plane axis. Semantics match the
    single-plane kernel row for row (pinned by tests).
    """
    dtype = depth.dtype
    h, w = depth.shape

    plane_j = oriented_plane.transform(planes_i, T_ij.R, T_ij.t)   # (P, 4)
    S_dj = jax.vmap(propagated_distance_variance,
                    in_axes=(0, 0, 0, None, None))(
        planes_i, S_ni, S_di, T_ij, S_tij)
    gate = jnp.maximum(S_dj, 0.014 * 0.014)                        # (P,)

    vs = jnp.arange(h, dtype=dtype)
    us = jnp.arange(w, dtype=dtype)
    uu, vv = jnp.meshgrid(us, vs)
    pts = _backproject(K, uu, vv, depth)                           # (H, W, 3)
    z_ok = (depth > z_min) & (depth < z_max)
    dis = (jnp.einsum("hwi,pi->phw", pts, plane_j[:, :3])
           + plane_j[:, 3, None, None])
    member = (dis * dis <= gate[:, None, None]) & z_ok[None]

    p_prev = se3.transform_from(T_ij, pts.reshape(-1, 3)).reshape(h, w, 3)
    zp = jnp.where(p_prev[..., 2] > 1e-6, p_prev[..., 2], 1e-6)
    up = K.fx * p_prev[..., 0] / zp + K.cx
    vp = K.fy * p_prev[..., 1] / zp + K.cy
    seed_val = jax.vmap(
        lambda m: _bilinear(m.astype(jnp.float32), up, vp))(prev_masks)
    seed = (seed_val > 0.25) & member

    img = jnp.asarray(intensity, dtype)

    def smooth(shifted):
        return jnp.abs(img - shifted) <= intensity_tol

    sm_l = smooth(jnp.roll(img, 1, axis=1))
    sm_r = smooth(jnp.roll(img, -1, axis=1))
    sm_u = smooth(jnp.roll(img, 1, axis=0))
    sm_d = smooth(jnp.roll(img, -1, axis=0))

    mask = _region_grow_batch(seed, member, sm_l, sm_r, sm_u, sm_d,
                              steps=grow_steps)
    count = jnp.sum(mask, axis=(1, 2))
    ok = count >= keep_ratio * prev_counts

    flat_pts = pts.reshape(-1, 3)
    plane_fit = jax.vmap(
        lambda m: fit_plane_lsq(flat_pts, m.reshape(-1)))(mask)
    cov = jax.vmap(
        lambda pf, m: plane_tangent_cov(pf, flat_pts, m.reshape(-1),
                                        sigma_z))(plane_fit, mask)
    plane_out = jnp.where(ok[:, None], plane_fit, plane_j)
    return PropagationResult(plane=plane_out, cov=cov, mask=mask,
                             count=count, ok=ok)
