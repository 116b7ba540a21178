"""Headless viewer equivalents of the reference's VTK/Qt visualizers.

The reference ships interactive inspection executables
(``gtsam/test/view_registration_results.cpp`` / ``_list`` / ``_range``:
overlay two registered frame clouds in a VTK window;
``display_many_imgs.cpp``: a Qt image montage). This repo is headless, so
the same inspection artifacts are written to disk instead:

- ``write_registration_ply``: backproject a frame pair, transform frame j
  through the edge ``T_ij``, and write one two-color PLY — a correct
  registration shows the clouds coinciding;
- ``write_image_grid``: a PNG montage of intensity frames (PIL).
"""

from __future__ import annotations

import numpy as np

from ..config import CameraIntrinsics
from ..core import se3
from ..io.trajectory import write_ply_points
from ..vision.camera import cloud_from_images

__all__ = ["write_registration_ply", "write_image_grid"]


def write_registration_ply(path: str, K: CameraIntrinsics, frame_i,
                           frame_j, T_ij: se3.Pose, skip: int = 3,
                           color_i=(230, 60, 60), color_j=(60, 200, 60)):
    """Overlay frame i (red) and frame j transformed by ``T_ij`` (green).

    ``T_ij`` is the frontend edge convention — the pose of frame j in
    frame i (``p_i = T_ij p_j``). Returns the number of points written.
    """
    import jax.numpy as jnp

    pi, ci, vi = cloud_from_images(K, frame_i[0], frame_i[1], skip=skip)
    pj, cj, vj = cloud_from_images(K, frame_j[0], frame_j[1], skip=skip)
    pj_in_i = se3.transform_from(T_ij, pj)
    pts = np.concatenate([np.asarray(pi)[np.asarray(vi)],
                          np.asarray(pj_in_i)[np.asarray(vj)]])
    cols = np.concatenate([
        np.tile(np.asarray(color_i, np.uint8),
                (int(np.asarray(vi).sum()), 1)),
        np.tile(np.asarray(color_j, np.uint8),
                (int(np.asarray(vj).sum()), 1)),
    ])
    write_ply_points(path, pts, cols)
    return len(pts)


def write_image_grid(path: str, images, cols: int = 4, pad: int = 2):
    """PNG montage of 2-D intensity arrays (display_many_imgs role)."""
    from PIL import Image

    imgs = [np.asarray(im) for im in images]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    n = len(imgs)
    rows = (n + cols - 1) // cols
    canvas = np.zeros((rows * (h + pad), cols * (w + pad)), np.uint8)
    for k, im in enumerate(imgs):
        r, c = divmod(k, cols)
        lo = im.min()
        hi = im.max()
        scaled = np.zeros_like(im, np.uint8) if hi <= lo else \
            ((im - lo) * (255.0 / (hi - lo))).astype(np.uint8)
        y = r * (h + pad)
        x = c * (w + pad)
        canvas[y:y + im.shape[0], x:x + im.shape[1]] = scaled
    Image.fromarray(canvas).save(path)
    return canvas.shape
