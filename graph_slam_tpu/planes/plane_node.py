"""Node-level plane orchestration: the CPlaneNode container and the
predictPlaneNode driver.

TPU re-design of the reference's per-frame plane state machine
(``/root/reference/gtsam/gtsam_graph.cpp:877-1099``): a frame owns a small
set of planes (parameters + tangent covariance + pixel support masks +
landmark ids). ``predict_plane_node`` carries every plane of the previous
frame into the new frame through the IMU-predicted relative pose
(``propagate_plane`` per plane — dense batched membership + flood fill),
counts the covered pixels, and when less than half the frame is covered
runs fresh RANSAC extraction on the *remaining* cloud
(``gtsam_graph.cpp:1044-1075``), merging detections that overlap a
propagated plane (``mergeOverlappedPlanes``) and carrying landmark ids
across frames (``:1030-1035``).

All heavy steps are jitted primitives with static shapes
(``propagate_plane``, ``extract_planes``, ``_backproject_frame``); the
orchestration itself is a host-side loop over the small, data-dependent
plane count — exactly the split the reference makes between per-pixel work
(its hot loops) and per-plane bookkeeping.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraIntrinsics
from ..core import se3
from . import oriented_plane
from .extraction import extract_planes
from .propagation import propagate_planes

__all__ = ["PlaneNodeDetection", "extract_plane_node",
           "extract_plane_nodes_batch", "predict_plane_node"]


@dataclasses.dataclass
class PlaneNodeDetection:
    """Per-frame plane set (CPlaneNode equivalent), camera frame.

    ``landmark_ids[k] == -1`` marks a plane not yet associated to a
    landmark (the reference's ``mv_landmark_id`` initialised to -1).
    """

    params: np.ndarray        # (P, 4) — (n, d) unit-normal planes
    cov: np.ndarray           # (P, 3, 3) tangent covariance [basis(2), d]
    masks: np.ndarray         # (P, H, W) bool pixel support
    counts: np.ndarray        # (P,) inlier counts
    landmark_ids: np.ndarray  # (P,) int64, -1 = unassociated

    def __len__(self) -> int:
        return int(self.params.shape[0])


@partial(jax.jit, static_argnames=("K",))
def _backproject_frame(K: CameraIntrinsics, depth, z_min=0.1, z_max=5.0):
    """Dense inverse projection of a depth image -> (H*W, 3) points + valid."""
    h, w = depth.shape
    vs = jnp.arange(h, dtype=depth.dtype)
    us = jnp.arange(w, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(us, vs)
    x = (uu - K.cx) * depth / K.fx
    y = (vv - K.cy) * depth / K.fy
    pts = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    valid = ((depth > z_min) & (depth < z_max)).reshape(-1)
    return pts, valid


def extract_plane_node(key, K: CameraIntrinsics, intensity, depth,
                       restrict_mask: Optional[np.ndarray] = None,
                       max_planes: int = 4, min_support: int = 300,
                       dist_thresh: float = 0.02, sigma_z: float = 0.014,
                       z_min: float = 0.1, z_max: float = 5.0,
                       ) -> Optional[PlaneNodeDetection]:
    """Fresh plane segmentation of one frame (CPlaneNode::extractPlanes).

    ``restrict_mask`` limits the search to a pixel subset — the REST-cloud
    fallback of ``predictPlaneNode`` (gtsam_graph.cpp:1060-1073).
    Returns None when no plane reaches ``min_support`` (the reference's
    ``ret == 0`` -> delete-node path, test_vro_imu_graph.cpp:139-142).
    """
    depth = jnp.asarray(depth)
    h, w = depth.shape
    pts, valid = _backproject_frame(K, depth, z_min, z_max)
    if restrict_mask is not None:
        valid = valid & jnp.asarray(restrict_mask).reshape(-1)
    det = extract_planes(key, pts, valid, max_planes=max_planes,
                         n_hyp=512, dist_thresh=dist_thresh,
                         min_support=min_support, sigma_z=sigma_z)
    ok = np.asarray(det.valid)
    if not ok.any():
        return None
    sel = np.nonzero(ok)[0]
    return PlaneNodeDetection(
        params=np.asarray(det.params)[sel],
        cov=np.asarray(det.cov)[sel],
        masks=np.asarray(det.inlier)[sel].reshape(len(sel), h, w),
        counts=np.asarray(det.count)[sel],
        landmark_ids=np.full(len(sel), -1, np.int64),
    )


@partial(jax.jit, static_argnames=("K", "max_planes", "n_hyp"))
def _extract_frames_batch(K: CameraIntrinsics, keys, depths,
                          max_planes: int, n_hyp: int, dist_thresh,
                          min_support, sigma_z, z_min, z_max):
    def one(key, depth):
        pts, valid = _backproject_frame(K, depth, z_min, z_max)
        return extract_planes(key, pts, valid, max_planes=max_planes,
                              n_hyp=n_hyp, dist_thresh=dist_thresh,
                              min_support=min_support, sigma_z=sigma_z)

    return jax.vmap(one)(keys, depths)


def extract_plane_nodes_batch(keys, K: CameraIntrinsics, depths,
                              max_planes: int = 4, min_support: int = 300,
                              dist_thresh: float = 0.02,
                              sigma_z: float = 0.014, z_min: float = 0.1,
                              z_max: float = 5.0):
    """Fresh plane segmentation of MANY frames in ONE device program.

    The scan engine's rescue sources are host-known upfront, so their
    extractions batch into a single vmapped dispatch instead of one per
    rescue step. Returns a list of ``PlaneNodeDetection | None`` matching
    ``extract_plane_node``'s per-frame filtering.
    """
    depths_j = jnp.asarray(np.stack([np.asarray(d) for d in depths]))
    h, w = depths_j.shape[1:]
    det = _extract_frames_batch(K, jnp.stack(keys), depths_j, max_planes,
                                512, dist_thresh, min_support, sigma_z,
                                z_min, z_max)
    params = np.asarray(det.params)
    cov = np.asarray(det.cov)
    inlier = np.asarray(det.inlier)
    count = np.asarray(det.count)
    valid = np.asarray(det.valid)
    out = []
    for f in range(depths_j.shape[0]):
        sel = np.nonzero(valid[f])[0]
        if not len(sel):
            out.append(None)
            continue
        out.append(PlaneNodeDetection(
            params=params[f][sel], cov=cov[f][sel],
            masks=inlier[f][sel].reshape(len(sel), h, w),
            counts=count[f][sel],
            landmark_ids=np.full(len(sel), -1, np.int64)))
    return out


def _tangent_to_nv_cov(plane, cov3):
    """Split a (2+1) tangent covariance into (S_n 3x3, S_d scalar).

    The reference stores the normal covariance and distance variance
    separately on CPlane (``getNVCov`` / ``m_E_Sdi``, gtsam_graph.cpp:905-911);
    the tangent chart version maps back through the Unit3 basis. Pure
    NumPy (GTSAM Unit3::basis axis selection, matching
    ``oriented_plane.basis``): runs per plane in the rescue host step,
    where eager device dispatches dominate on remote-attached backends.
    """
    n = np.asarray(plane[:3], np.float64)
    ax, ay, az = abs(n[0]), abs(n[1]), abs(n[2])
    axis = np.array([1.0, 0.0, 0.0]) if (az >= ax and az >= ay) \
        else np.array([0.0, 0.0, 1.0])
    b1 = np.cross(n, axis)
    b1 = b1 / np.linalg.norm(b1)
    B = np.stack([b1, np.cross(n, b1)], axis=-1)
    S_n = B @ np.asarray(cov3)[:2, :2] @ B.T
    S_d = float(cov3[2, 2])
    return S_n, S_d


def _planes_overlap(new_plane, new_mask, new_count, kept: PlaneNodeDetection,
                    cos_thresh: float = np.cos(10.0 * np.pi / 180.0),
                    d_thresh: float = 0.2,
                    overlap_ratio: float = 0.3) -> bool:
    """mergeOverlappedPlanes test: a freshly extracted plane duplicates a
    propagated one when their pixel supports overlap or their parameters
    agree (normal angle < 10 deg and |delta d| <= 0.2, with sign flip)."""
    for k in range(len(kept)):
        inter = int(np.logical_and(new_mask, kept.masks[k]).sum())
        if new_count > 0 and inter / max(int(new_count), 1) > overlap_ratio:
            return True
        c = float(np.dot(new_plane[:3], kept.params[k][:3]))
        sign = -1.0 if c < 0 else 1.0
        if (c * sign >= cos_thresh
                and abs(sign * new_plane[3] - kept.params[k][3]) <= d_thresh):
            return True
    return False


def predict_plane_node(key, K: CameraIntrinsics,
                       prev: Optional[PlaneNodeDetection],
                       T_body: se3.Pose, S_pose, intensity, depth,
                       u2c: Optional[se3.Pose] = None,
                       keep_ratio: float = 0.7,
                       coverage_thresh: float = 0.5,
                       max_new_planes: int = 4, min_support: int = 300,
                       grow_steps: int = 64, z_min: float = 0.1,
                       z_max: float = 5.0, sigma_z: float = 0.014,
                       ) -> Optional[PlaneNodeDetection]:
    """Carry the previous frame's planes into the current frame.

    The node-level orchestration of ``CGraphGT::predictPlaneNode``
    (gtsam_graph.cpp:877-1099):

    1. the body-frame predicted relative pose ``T_body`` (current expressed
       in previous, ``pre_p.transform_pose_to(cur_p)``) and its 6x6
       covariance are conjugated into the camera frame via the ``u2c``
       extrinsic (``:879-883``); the translation covariance block feeds the
       membership gate;
    2. every previous plane is propagated (seed from inverse-warped support,
       dense membership, intensity-gated flood fill, LS refit) and accepted
       when it keeps >= ``keep_ratio`` of its support (``:1021-1040``),
       carrying its landmark id;
    3. covered pixels are counted; below ``coverage_thresh`` of the frame,
       fresh planes are extracted from the uncovered cloud (``:1044-1075``;
       the full frame when nothing propagated);
    4. fresh planes that overlap a propagated one are merged away
       (``mergeOverlappedPlanes``, ``:1081``); survivors join with
       landmark id -1 for later association.
    """
    depth = jnp.asarray(depth)
    intensity = jnp.asarray(intensity)
    h, w = depth.shape

    # body -> camera frame conjugation of the predicted pose + covariance
    if u2c is not None:
        u2c_inv = se3.inverse(u2c)
        T_cam = se3.compose(se3.compose(u2c_inv, T_body), u2c)
        Adj = np.asarray(se3.adjoint(u2c_inv))
        S_p = Adj @ np.asarray(S_pose) @ Adj.T
    else:
        T_cam = T_body
        S_p = np.asarray(S_pose)
    S_tij = jnp.asarray(S_p[3:6, 3:6])   # translation block, (omega, v) order

    kept_params, kept_cov, kept_masks, kept_counts, kept_lids = \
        [], [], [], [], []
    covered = np.zeros((h, w), bool)
    num_added = 0

    if prev is not None and len(prev):
        # ALL previous planes in one batched dispatch (propagate_planes);
        # acceptance/bookkeeping stays host-side per plane
        nv = [_tangent_to_nv_cov(prev.params[l], prev.cov[l])
              for l in range(len(prev))]
        res = propagate_planes(
            K, jnp.asarray(prev.params),
            jnp.asarray(np.stack([s for s, _ in nv])),
            jnp.asarray(np.asarray([d for _, d in nv])),
            jnp.asarray(prev.masks),
            jnp.asarray(prev.counts.astype(np.float64)), T_cam, S_tij,
            intensity, depth, grow_steps=grow_steps, z_min=z_min,
            z_max=z_max, keep_ratio=keep_ratio, sigma_z=sigma_z)
        ok_np = np.asarray(res.ok)
        masks_np = np.asarray(res.mask)
        params_np = np.asarray(res.plane)
        cov_np = np.asarray(res.cov)
        counts_np = np.asarray(res.count)
        for l in np.nonzero(ok_np)[0]:
            kept_params.append(params_np[l])
            kept_cov.append(cov_np[l])
            kept_masks.append(masks_np[l])
            kept_counts.append(int(counts_np[l]))
            kept_lids.append(int(prev.landmark_ids[l]))
            covered |= masks_np[l]
            num_added += int(counts_np[l])

    kept = PlaneNodeDetection(
        params=np.asarray(kept_params).reshape(-1, 4),
        cov=np.asarray(kept_cov).reshape(-1, 3, 3),
        masks=np.asarray(kept_masks, bool).reshape(-1, h, w),
        counts=np.asarray(kept_counts, np.int64),
        landmark_ids=np.asarray(kept_lids, np.int64),
    )

    # fresh extraction on the uncovered cloud when coverage is low
    if num_added <= coverage_thresh * h * w:
        restrict = None if num_added == 0 else ~covered
        fresh = extract_plane_node(
            key, K, intensity, depth, restrict_mask=restrict,
            max_planes=max_new_planes, min_support=min_support,
            z_min=z_min, z_max=z_max, sigma_z=sigma_z)
        if fresh is not None:
            for f in range(len(fresh)):
                if _planes_overlap(fresh.params[f], fresh.masks[f],
                                   fresh.counts[f], kept):
                    continue
                kept.params = np.concatenate(
                    [kept.params, fresh.params[f:f + 1]])
                kept.cov = np.concatenate([kept.cov, fresh.cov[f:f + 1]])
                kept.masks = np.concatenate(
                    [kept.masks, fresh.masks[f:f + 1]])
                kept.counts = np.concatenate(
                    [kept.counts, fresh.counts[f:f + 1]])
                kept.landmark_ids = np.concatenate(
                    [kept.landmark_ids, np.asarray([-1], np.int64)])

    return kept if len(kept) else None
