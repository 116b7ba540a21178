"""Sparse feature frontend: Harris corners + normalized-patch descriptors.

In-repo stand-in for the external SIFT frontend
(``CSparseFeatureVO::featureExtraction`` — SURVEY.md §3.1 hot loop, sibling
repo ``visual_odometry``). SIFT's scalar pyramid code is hostile to the
TPU; a Harris detector is three convolutions + elementwise math (all
VPU/MXU-friendly), and normalized image patches matched with one matmul
give the same role in the pipeline: keypoints + descriptors + 3D lift.

Everything returns *static shapes*: exactly ``max_features`` keypoints per
frame, invalid slots masked, so downstream matching/RANSAC never recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from .camera import backproject

__all__ = ["FeatureFrame", "harris_corners", "extract_features"]


class FeatureFrame(NamedTuple):
    """CCameraNode equivalent: keypoints + descriptors + 3D lift + mask."""

    uv: jnp.ndarray     # (M, 2) pixel coordinates
    desc: jnp.ndarray   # (M, D) L2-normalized descriptors
    pts3: jnp.ndarray   # (M, 3) camera-frame 3D points
    valid: jnp.ndarray  # (M,) bool


def _conv2(img, kernel):
    return jax.lax.conv_general_dilated(
        img[None, None], kernel[None, None].astype(img.dtype),
        window_strides=(1, 1), padding="SAME",
    )[0, 0]


def _box(img, size=5):
    k = jnp.ones((size, size), img.dtype) / (size * size)
    return _conv2(img, k)


@partial(jax.jit, static_argnames=("max_features", "nms_size"))
def harris_corners(img, max_features: int = 256, k: float = 0.04,
                   nms_size: int = 5):
    """Harris response + local-max NMS + top-k. Returns (uv (M,2), score)."""
    img = jnp.asarray(img, jnp.float32)
    sx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    gx = _conv2(img, sx)
    gy = _conv2(img, sx.T)
    Ixx = _box(gx * gx)
    Iyy = _box(gy * gy)
    Ixy = _box(gx * gy)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    resp = det - k * tr * tr
    # non-maximum suppression: keep pixels equal to their local max
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (nms_size, nms_size), (1, 1), "SAME"
    )
    resp = jnp.where(resp >= local_max, resp, -jnp.inf)
    # suppress borders (patch extraction window)
    h, w = resp.shape
    bi = jnp.arange(h)[:, None]
    bj = jnp.arange(w)[None, :]
    border = 12
    inside = (bi >= border) & (bi < h - border) & (bj >= border) & (bj < w - border)
    resp = jnp.where(inside, resp, -jnp.inf)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_features)
    vv = idx // w
    uu = idx % w
    uv = jnp.stack([uu, vv], axis=-1).astype(jnp.float32)
    return uv, score


@partial(jax.jit, static_argnames=("K", "max_features", "patch"))
def extract_features(K: CameraIntrinsics, intensity, depth,
                     max_features: int = 256, patch: int = 16,
                     min_response: float = 1e-6,
                     z_min: float = 0.05, z_max: float = 10.0) -> FeatureFrame:
    """featureExtraction equivalent: corners + patch descriptors + 3D lift.

    ``depth`` in meters. Keypoints with invalid depth or weak response are
    masked out (static shapes preserved).
    """
    img = jnp.asarray(intensity, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    uv, score = harris_corners(img, max_features=max_features)

    half = patch // 2

    def grab(uvk):
        u = jnp.asarray(uvk[0], jnp.int32) - half
        v = jnp.asarray(uvk[1], jnp.int32) - half
        p = jax.lax.dynamic_slice(img, (v, u), (patch, patch))
        p = p - jnp.mean(p)
        n = jnp.sqrt(jnp.sum(p * p))
        return (p / jnp.where(n > 1e-8, n, 1.0)).reshape(-1)

    desc = jax.vmap(grab)(uv)

    ui = uv[:, 0].astype(jnp.int32)
    vi = uv[:, 1].astype(jnp.int32)
    z = depth[vi, ui]
    pts3 = backproject(K, uv[:, 0], uv[:, 1], z)
    valid = (z > z_min) & (z < z_max) & (score > min_response)
    return FeatureFrame(uv=uv, desc=desc, pts3=pts3, valid=valid)
