"""Camera model utilities: depth backprojection and point-cloud generation.

Plays the role of the external ``cam_model.h`` / ``pc_from_image.h`` the
reference links against (``/root/reference/CMakeLists.txt:22-23``) and of
``CSparseFeatureVO::generatePointCloud`` as the mapping tools drive it
(``mapping/mapping_PCD.cpp:108-144``): intensity+depth images -> 3D points
(+ gray color), fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics

__all__ = ["backproject", "depth_to_cloud", "cloud_from_images"]


def backproject(K: CameraIntrinsics, u, v, z):
    """Pixel (u, v) + depth z -> camera-frame 3D point (pinhole)."""
    x = (jnp.asarray(u) - K.cx) * z / K.fx
    y = (jnp.asarray(v) - K.cy) * z / K.fy
    return jnp.stack([x, y, jnp.asarray(z)], axis=-1)


def depth_to_cloud(K: CameraIntrinsics, depth, skip: int = 1,
                   z_min: float = 0.05, z_max: float = 10.0):
    """Dense depth image -> (N, 3) points + validity mask (static shape).

    ``depth`` is (H, W) in meters (apply ``K.depth_scale`` upstream for raw
    integer images). ``skip`` subsamples the grid like the reference's
    mapping tools.
    """
    depth = jnp.asarray(depth)
    d = depth[::skip, ::skip]
    h, w = d.shape
    vs = jnp.arange(0, h, dtype=d.dtype) * skip
    us = jnp.arange(0, w, dtype=d.dtype) * skip
    uu, vv = jnp.meshgrid(us, vs)
    pts = backproject(K, uu.reshape(-1), vv.reshape(-1), d.reshape(-1))
    valid = (d.reshape(-1) > z_min) & (d.reshape(-1) < z_max)
    return pts, valid


def cloud_from_images(K: CameraIntrinsics, intensity, depth, skip: int = 1,
                      z_min: float = 0.05, z_max: float = 10.0):
    """(points, colors, mask) from an intensity + depth image pair."""
    pts, valid = depth_to_cloud(K, depth, skip, z_min, z_max)
    inten = jnp.asarray(intensity)[::skip, ::skip].reshape(-1)
    colors = jnp.stack([inten, inten, inten], axis=-1)
    return pts, colors, valid
