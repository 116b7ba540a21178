"""DoG/SIFT-class scale- and rotation-invariant features, TPU-shaped.

The reference's frontend is SIFT (``CSparseFeatureVO::featureExtraction``,
sibling repo ``visual_odometry`` — SURVEY.md §3.1 hot loop). Classic SIFT
is a scalar-pyramid algorithm; this is the same math restructured for the
TPU's execution model:

- the Gaussian scale-space pyramid is separable convolutions (VPU-dense),
  octaves by factor-2 subsampling — all shapes static per input size;
- DoG extrema detection is one ``reduce_window`` 26-neighbor max/min test
  per scale, edge rejection via the 2x2 Hessian ratio test, and ONE global
  ``top_k`` over every octave/scale (exactly ``max_features`` keypoints,
  invalid slots masked — downstream matching never recompiles);
- orientation assignment and the 4x4x8 gradient-histogram descriptor
  sample a rotated, scale-normalized grid by bilinear interpolation from
  the per-octave gradient stacks (``vmap`` over keypoints, ``lax.switch``
  over the static octave count), with trilinear soft-binning and the
  standard L2-clip-renormalize;
- the result is a ``FeatureFrame`` — a drop-in for the Harris+patch
  frontend everywhere (matching, RANSAC, VRO, BA).

Rotation/scale invariance is what the Harris+patch frontend lacks; the
tests warp a frame by 30 degrees / 1.5x and require matching to recover
the transform.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from .camera import backproject
from .features import FeatureFrame

__all__ = ["SiftKeypoints", "dog_keypoints", "sift_features"]

_N_SPATIAL = 4          # descriptor spatial cells per axis
_N_ORI = 8              # descriptor orientation bins
_DESC_DIM = _N_SPATIAL * _N_SPATIAL * _N_ORI   # 128
_GRID = 16              # sampling grid per axis (one sample per histogram
#                         sub-cell, SIFT's standard 16x16)
_ORI_BINS = 36


class SiftKeypoints(NamedTuple):
    uv: jnp.ndarray       # (M, 2) pixel coords in the ORIGINAL image
    sigma: jnp.ndarray    # (M,) absolute scale (pixels in original image)
    octave: jnp.ndarray   # (M,) int32
    scale_idx: jnp.ndarray  # (M,) int32 in-octave DoG scale index
    score: jnp.ndarray    # (M,) |DoG| response
    valid: jnp.ndarray    # (M,) bool


def _gauss_kernel(sigma: float, dtype):
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img, sigma: float):
    """Separable Gaussian blur (two 1-D convolutions)."""
    if sigma <= 0:
        return img
    k = _gauss_kernel(sigma, img.dtype)
    r = (k.shape[0] - 1) // 2
    pad = [(r, r), (0, 0)]
    v = jax.lax.conv_general_dilated(
        img[None, None], k[None, None, :, None], (1, 1), pad)[0, 0]
    return jax.lax.conv_general_dilated(
        v[None, None], k[None, None, None, :], (1, 1),
        [(0, 0), (r, r)])[0, 0]


def _pyramid(img, n_octaves: int, s: int, sigma0: float):
    """Per octave: gaussian stack (s+3, H, W) and its DoG (s+2, H, W)."""
    k = 2.0 ** (1.0 / s)
    octaves = []
    base = _blur(img, math.sqrt(max(sigma0 ** 2 - 0.25, 0.01)))
    for _ in range(n_octaves):
        gs = [base]
        sig_prev = sigma0
        for i in range(1, s + 3):
            sig_total = sigma0 * k ** i
            sig_extra = math.sqrt(max(sig_total ** 2 - sig_prev ** 2, 1e-6))
            gs.append(_blur(gs[-1], sig_extra))
            sig_prev = sig_total
        g = jnp.stack(gs)                       # (s+3, H, W)
        octaves.append((g, g[1:] - g[:-1]))     # DoG (s+2, H, W)
        base = gs[s][::2, ::2]                  # next octave seed (2*sigma0)
    return octaves


def _extrema_response(dog, contrast_thresh: float, edge_thresh: float):
    """(s, H, W) candidate response: |DoG| where a 26-neighbor extremum,
    contrast- and edge-gated; -inf elsewhere. ``dog`` is (s+2, H, W)."""
    neg_inf = jnp.asarray(-jnp.inf, dog.dtype)
    # 3x3x3 max/min over (scale, y, x)
    mx = jax.lax.reduce_window(dog, neg_inf, jax.lax.max,
                               (3, 3, 3), (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(dog, jnp.asarray(jnp.inf, dog.dtype),
                               jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME")
    is_ext = (dog >= mx) | (dog <= mn)
    # edge rejection: ratio of principal curvatures of the DoG map
    dxx = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    dyy = jnp.roll(dog, -1, 1) + jnp.roll(dog, 1, 1) - 2 * dog
    dxy = (jnp.roll(jnp.roll(dog, -1, 1), -1, 2)
           + jnp.roll(jnp.roll(dog, 1, 1), 1, 2)
           - jnp.roll(jnp.roll(dog, -1, 1), 1, 2)
           - jnp.roll(jnp.roll(dog, 1, 1), -1, 2)) * 0.25
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    resp = jnp.abs(dog)
    ok = is_ext & edge_ok & (resp > contrast_thresh)
    resp = jnp.where(ok, resp, neg_inf)
    # interior scales only (need neighbors above and below)
    resp = resp[1:-1]
    # border suppression (descriptor window support)
    h, w = dog.shape[1:]
    bi = jnp.arange(h)[None, :, None]
    bj = jnp.arange(w)[None, None, :]
    b = 8
    inside = (bi >= b) & (bi < h - b) & (bj >= b) & (bj < w - b)
    return jnp.where(inside, resp, neg_inf)


@partial(jax.jit, static_argnames=("max_features", "n_octaves", "s",
                                   "sigma0", "contrast_thresh",
                                   "edge_thresh"))
def dog_keypoints(img, max_features: int = 256, n_octaves: int = 4,
                  s: int = 3, sigma0: float = 1.6,
                  contrast_thresh: float = 0.015,
                  edge_thresh: float = 10.0) -> SiftKeypoints:
    """Scale-space keypoints: one global top-k over all octaves/scales."""
    img = jnp.asarray(img, jnp.float32)
    img = img / jnp.maximum(jnp.max(img), 1e-6)
    octs = _pyramid(img, n_octaves, s, sigma0)

    scores, us, vs, sigmas, octis, sidxs = [], [], [], [], [], []
    k = 2.0 ** (1.0 / s)
    for o, (_, dog) in enumerate(octs):
        resp = _extrema_response(dog, contrast_thresh, edge_thresh)
        S, H, W = resp.shape
        flat = resp.reshape(-1)
        scores.append(flat)
        lin = jnp.arange(S * H * W)
        si = lin // (H * W)
        yy = (lin % (H * W)) // W
        xx = lin % W
        step = float(2 ** o)
        us.append(xx.astype(jnp.float32) * step)
        vs.append(yy.astype(jnp.float32) * step)
        # absolute scale of DoG level si+1 (interior offset)
        sigmas.append(sigma0 * step * k ** (si.astype(jnp.float32) + 1.0))
        octis.append(jnp.full((S * H * W,), o, jnp.int32))
        sidxs.append((si + 1).astype(jnp.int32))

    score_all = jnp.concatenate(scores)
    top, idx = jax.lax.top_k(score_all, max_features)
    u = jnp.concatenate(us)[idx]
    v = jnp.concatenate(vs)[idx]
    sig = jnp.concatenate(sigmas)[idx]
    oct_i = jnp.concatenate(octis)[idx]
    s_i = jnp.concatenate(sidxs)[idx]
    valid = jnp.isfinite(top)
    return SiftKeypoints(uv=jnp.stack([u, v], -1), sigma=sig, octave=oct_i,
                         scale_idx=s_i, score=top, valid=valid)


def _bilinear(m, x, y):
    """Sample 2-D map ``m`` at float coords (x, y), clamped."""
    h, w = m.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = m[y0, x0]
    v01 = m[y0, x0 + 1]
    v10 = m[y0 + 1, x0]
    v11 = m[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _grad_stacks(octs):
    """Per octave: (gx, gy) stacks over the gaussian images, (s+3, H, W)."""
    out = []
    for g, _ in octs:
        gx = (jnp.roll(g, -1, 2) - jnp.roll(g, 1, 2)) * 0.5
        gy = (jnp.roll(g, -1, 1) - jnp.roll(g, 1, 1)) * 0.5
        out.append((gx, gy))
    return out


def _sample_grads(grads, kp_octave, kp_scale_idx, x_full, y_full, pts):
    """Gradient (gx, gy) at ``pts`` (G, 2; offsets in octave pixels around
    the keypoint) — ``lax.switch`` over the static octave list."""

    def branch(o):
        gx, gy = grads[o]

        def f(si, xo, yo, pts):
            gxm = jax.lax.dynamic_index_in_dim(gx, si, 0, keepdims=False)
            gym = jax.lax.dynamic_index_in_dim(gy, si, 0, keepdims=False)
            xs = xo + pts[:, 0]
            ys = yo + pts[:, 1]
            return (jax.vmap(lambda a, b: _bilinear(gxm, a, b))(xs, ys),
                    jax.vmap(lambda a, b: _bilinear(gym, a, b))(xs, ys))

        return f

    step = 2.0 ** kp_octave.astype(jnp.float32)
    xo = x_full / step
    yo = y_full / step
    return jax.lax.switch(kp_octave, [branch(o) for o in range(len(grads))],
                          kp_scale_idx, xo, yo, pts)


def _orientation(grads, kp, window: float = 4.5):
    """Dominant gradient orientation from a 36-bin weighted histogram."""
    g = jnp.linspace(-1.0, 1.0, _GRID)
    gy, gxx = jnp.meshgrid(g, g, indexing="ij")
    unit = jnp.stack([gxx.reshape(-1), gy.reshape(-1)], -1)   # (G, 2)

    def one(uv, sigma, octave, scale_idx):
        step = 2.0 ** octave.astype(jnp.float32)
        sig_o = sigma / step                     # in-octave scale
        pts = unit * (window * sig_o)
        gx, gy_ = _sample_grads(grads, octave, scale_idx,
                                uv[0], uv[1], pts)
        mag = jnp.sqrt(gx * gx + gy_ * gy_)
        wgt = mag * jnp.exp(-0.5 * jnp.sum(unit * unit, -1) / (0.5 ** 2))
        ang = jnp.arctan2(gy_, gx)               # [-pi, pi]
        bin_f = (ang + jnp.pi) / (2 * jnp.pi) * _ORI_BINS
        b0 = jnp.floor(bin_f).astype(jnp.int32) % _ORI_BINS
        fb = bin_f - jnp.floor(bin_f)
        hist = (jnp.zeros(_ORI_BINS, mag.dtype)
                .at[b0].add(wgt * (1 - fb))
                .at[(b0 + 1) % _ORI_BINS].add(wgt * fb))
        # smooth the histogram once (circular)
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        return (peak.astype(jnp.float32) + 0.5) / _ORI_BINS * 2 * jnp.pi - jnp.pi

    return jax.vmap(one)(kp.uv, kp.sigma, kp.octave, kp.scale_idx)


def _descriptors(grads, kp, theta, window: float = 6.0):
    """4x4x8 gradient histograms on a rotated, scale-normalized grid."""
    g = (jnp.arange(_GRID, dtype=jnp.float32) + 0.5) / _GRID * 2 - 1  # (-1,1)
    gy, gxx = jnp.meshgrid(g, g, indexing="ij")
    unit = jnp.stack([gxx.reshape(-1), gy.reshape(-1)], -1)   # (G,2)
    # spatial cell coordinates in [0, 4)
    cell_f = (unit + 1.0) * 0.5 * _N_SPATIAL                  # (G,2)

    def one(uv, sigma, octave, scale_idx, th):
        step = 2.0 ** octave.astype(jnp.float32)
        sig_o = sigma / step
        c, s_ = jnp.cos(th), jnp.sin(th)
        R = jnp.array([[c, -s_], [s_, c]])
        pts = (unit * (window * sig_o)) @ R.T
        gx, gy_ = _sample_grads(grads, octave, scale_idx, uv[0], uv[1], pts)
        mag = jnp.sqrt(gx * gx + gy_ * gy_)
        wgt = mag * jnp.exp(-0.5 * jnp.sum(unit * unit, -1) / (0.6 ** 2))
        ang = jnp.arctan2(gy_, gx) - th
        obin_f = (ang + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * _N_ORI
        ob0 = jnp.floor(obin_f).astype(jnp.int32) % _N_ORI
        fo = obin_f - jnp.floor(obin_f)

        # trilinear soft-binning: bilinear over the 4x4 spatial cells,
        # linear over orientation
        cf = cell_f - 0.5
        c0 = jnp.floor(cf).astype(jnp.int32)
        fc = cf - c0
        hist = jnp.zeros((_N_SPATIAL, _N_SPATIAL, _N_ORI), mag.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                cy = jnp.clip(c0[:, 1] + dy, 0, _N_SPATIAL - 1)
                cx = jnp.clip(c0[:, 0] + dx, 0, _N_SPATIAL - 1)
                wsp = (jnp.abs(1 - dy - fc[:, 1])
                       * jnp.abs(1 - dx - fc[:, 0]) * wgt)
                hist = hist.at[cy, cx, ob0].add(wsp * (1 - fo))
                hist = hist.at[cy, cx, (ob0 + 1) % _N_ORI].add(wsp * fo)
        d = hist.reshape(-1)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-8)
        d = jnp.minimum(d, 0.2)                 # SIFT illumination clip
        return d / jnp.maximum(jnp.linalg.norm(d), 1e-8)

    return jax.vmap(one)(kp.uv, kp.sigma, kp.octave, kp.scale_idx, theta)


@partial(jax.jit, static_argnames=("K", "max_features", "n_octaves", "s",
                                   "sigma0", "contrast_thresh",
                                   "edge_thresh"))
def sift_features(K: CameraIntrinsics, intensity, depth,
                  max_features: int = 256, n_octaves: int = 4, s: int = 3,
                  sigma0: float = 1.6, contrast_thresh: float = 0.015,
                  edge_thresh: float = 10.0,
                  z_min: float = 0.05, z_max: float = 10.0) -> FeatureFrame:
    """SIFT-class drop-in for ``extract_features``: DoG keypoints +
    rotation/scale-invariant 128-d descriptors + 3D lift, static shapes."""
    img = jnp.asarray(intensity, jnp.float32)
    img = img / jnp.maximum(jnp.max(img), 1e-6)
    depth = jnp.asarray(depth, jnp.float32)
    kp = dog_keypoints(img, max_features=max_features, n_octaves=n_octaves,
                       s=s, sigma0=sigma0, contrast_thresh=contrast_thresh,
                       edge_thresh=edge_thresh)
    octs = _pyramid(img, n_octaves, s, sigma0)
    grads = _grad_stacks(octs)
    theta = _orientation(grads, kp)
    desc = _descriptors(grads, kp, theta)

    u = jnp.clip(kp.uv[:, 0].astype(jnp.int32), 0, depth.shape[1] - 1)
    v = jnp.clip(kp.uv[:, 1].astype(jnp.int32), 0, depth.shape[0] - 1)
    z = depth[v, u]
    pts3 = backproject(K, kp.uv[:, 0], kp.uv[:, 1], z)
    valid = kp.valid & (z > z_min) & (z < z_max)
    uv = jnp.where(kp.valid[:, None], kp.uv, 0.0)
    return FeatureFrame(uv=uv, desc=jnp.where(kp.valid[:, None], desc, 0.0),
                        pts3=jnp.where(valid[:, None], pts3, 0.0),
                        valid=valid)
