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
from .association import transform_plane_cov
from .extraction import PlaneDetection, extract_planes
from .propagation import propagate_planes

__all__ = ["PlaneNodeDetection", "extract_plane_node",
           "extract_plane_nodes_batch", "predict_plane_node",
           "predict_plane_node_start", "predict_plane_node_finish"]


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


def _propagate_extract_core(K: CameraIntrinsics, key, planes_i, S_ni, S_di,
                            prev_masks, prev_counts, T_cam: se3.Pose, S_tij,
                            intensity, depth, grow_steps: int,
                            keep_ratio, coverage_thresh,
                            max_new_planes: int, min_support, dist_thresh,
                            sigma_z, z_min, z_max):
    """Propagation + conditional REST-cloud extraction as ONE traced unit.

    Fuses the two hot dispatches of ``predict_plane_node`` (the batched
    ``propagate_planes`` and the coverage-gated fresh ``extract_planes``
    of gtsam_graph.cpp:1044-1075): the covered-pixel mask and the
    coverage decision are computed on device and the extraction runs
    under ``lax.cond`` — per rescue the plane stack costs one dispatch
    instead of two, and nothing crosses the host boundary in between.
    """
    res = propagate_planes(K, planes_i, S_ni, S_di, prev_masks,
                           prev_counts, T_cam, S_tij,
                           intensity, depth, grow_steps=grow_steps,
                           z_min=z_min, z_max=z_max, keep_ratio=keep_ratio,
                           sigma_z=sigma_z)
    h, w = depth.shape
    covered = jnp.any(res.mask & res.ok[:, None, None], axis=0)
    num_added = jnp.sum(jnp.where(res.ok, res.count, 0))
    # restrict == None (full frame) when nothing propagated is the same
    # mask as ~covered: covered is all-False then
    pts, valid = _backproject_frame(K, depth, z_min, z_max)
    valid = valid & ~covered.reshape(-1)

    def extract(_):
        return extract_planes(key, pts, valid, max_planes=max_new_planes,
                              n_hyp=512, dist_thresh=dist_thresh,
                              min_support=min_support, sigma_z=sigma_z)

    def skip(_):
        return PlaneDetection(
            params=jnp.zeros((max_new_planes, 4),
                             pts.dtype).at[:, 2].set(1.0),
            cov=jnp.zeros((max_new_planes, 3, 3), pts.dtype),
            inlier=jnp.zeros((max_new_planes, h * w), bool),
            count=jnp.zeros((max_new_planes,), jnp.int32),
            valid=jnp.zeros((max_new_planes,), bool))

    fresh = jax.lax.cond(num_added <= coverage_thresh * h * w,
                         extract, skip, None)
    return res, fresh


@partial(jax.jit, static_argnames=("K", "max_new_planes", "grow_steps"))
def _propagate_and_extract(K: CameraIntrinsics, key, planes_i, S_ni, S_di,
                           prev_masks, prev_counts, T_R, T_t, S_tij,
                           intensity, depth, grow_steps: int,
                           keep_ratio, coverage_thresh,
                           max_new_planes: int, min_support, dist_thresh,
                           sigma_z, z_min, z_max):
    return _propagate_extract_core(
        K, key, planes_i, S_ni, S_di, prev_masks, prev_counts,
        se3.Pose(T_R, T_t), S_tij, intensity, depth, grow_steps,
        keep_ratio, coverage_thresh, max_new_planes, min_support,
        dist_thresh, sigma_z, z_min, z_max)


@partial(jax.jit, static_argnames=("K", "max_new_planes", "grow_steps",
                                   "conjugate"))
def _rescue_predict_program(K: CameraIntrinsics, key, planes_i, S_ni, S_di,
                            prev_masks, prev_counts, pre_R, pre_t,
                            est_R, est_t, S66, u2c_R, u2c_t,
                            conjugate: bool, intensity, depth,
                            grow_steps: int, keep_ratio, coverage_thresh,
                            max_new_planes: int, min_support, dist_thresh,
                            sigma_z, z_min, z_max):
    """The whole rescue-side plane prediction as ONE enqueueable program.

    Takes the VIO kernel's outputs (estimated pose, 6x6 pose covariance)
    as DEVICE references, so the host can enqueue it right after the
    kernel without blocking on any result read — the between-pose, the
    u2c conjugation (gtsam_graph.cpp:879-883), the batched propagation
    and the coverage-gated fresh extraction all pipeline behind the
    kernel on device.
    """
    T_body = se3.between(se3.Pose(pre_R, pre_t), se3.Pose(est_R, est_t))
    u2c = se3.Pose(u2c_R, u2c_t)
    u2c_inv = se3.inverse(u2c)          # identity when conjugate is False
    if conjugate:
        T_cam = se3.compose(se3.compose(u2c_inv, T_body), u2c)
        Adj = se3.adjoint(u2c_inv)
        S_p = Adj @ S66 @ Adj.T
    else:
        T_cam = T_body
        S_p = S66
    res, fresh = _propagate_extract_core(
        K, key, planes_i, S_ni, S_di, prev_masks, prev_counts, T_cam,
        S_p[3:6, 3:6], intensity, depth, grow_steps, keep_ratio,
        coverage_thresh, max_new_planes, min_support, dist_thresh,
        sigma_z, z_min, z_max)
    # camera->body projections of every candidate row (propagated AND
    # fresh) ride the same program, so the insertion host step never has
    # to dispatch its own transform (same jitted math the host path uses)
    tf = jax.vmap(lambda p, c: transform_plane_cov(p, c, u2c_inv))
    pb_p, cb_p = tf(res.plane, res.cov)
    pb_f, cb_f = tf(fresh.params, fresh.cov)
    return res, fresh, (pb_p, cb_p, pb_f, cb_f)


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

    # body -> camera frame conjugation of the predicted pose + covariance.
    # Pure NumPy: per-rescue 3x3 algebra is host-side by design — eager
    # device ops cost a relay round trip each on remote-attached backends
    if u2c is not None:
        Ru, tu = np.asarray(u2c.R), np.asarray(u2c.t)
        Ri, ti = Ru.T, -Ru.T @ tu                       # u2c^-1
        Rb, tb = np.asarray(T_body.R), np.asarray(T_body.t)
        R1, t1 = Ri @ Rb, Ri @ tb + ti                  # u2c^-1 * T_body
        T_cam = se3.Pose(R1 @ Ru, R1 @ tu + t1)         # ... * u2c
        hat_ti = np.array([[0.0, -ti[2], ti[1]],
                           [ti[2], 0.0, -ti[0]],
                           [-ti[1], ti[0], 0.0]])
        Adj = np.block([[Ri, np.zeros((3, 3))],        # Pose3::AdjointMap
                        [hat_ti @ Ri, Ri]])             # of u2c^-1
        S_p = Adj @ np.asarray(S_pose) @ Adj.T
    else:
        T_cam = se3.Pose(np.asarray(T_body.R), np.asarray(T_body.t))
        S_p = np.asarray(S_pose)
    S_tij = jnp.asarray(S_p[3:6, 3:6])   # translation block, (omega, v) order

    if prev is not None and len(prev):
        # ALL previous planes AND the coverage-gated fresh extraction in
        # one fused dispatch; acceptance/bookkeeping stays host-side
        nv = [_tangent_to_nv_cov(prev.params[l], prev.cov[l])
              for l in range(len(prev))]
        res, fresh_raw = _propagate_and_extract(
            K, key, jnp.asarray(prev.params),
            jnp.asarray(np.stack([s for s, _ in nv])),
            jnp.asarray(np.asarray([d for _, d in nv])),
            jnp.asarray(prev.masks),
            jnp.asarray(prev.counts.astype(np.float64)), T_cam.R, T_cam.t,
            S_tij, intensity, depth, grow_steps, keep_ratio,
            coverage_thresh, max_new_planes, min_support, 0.02, sigma_z,
            z_min, z_max)
        return _collect_prediction(prev, res, fresh_raw, h, w,
                                   coverage_thresh)

    # no previous planes: plain fresh extraction of the whole frame
    return extract_plane_node(
        key, K, intensity, depth, restrict_mask=None,
        max_planes=max_new_planes, min_support=min_support,
        z_min=z_min, z_max=z_max, sigma_z=sigma_z)


def _collect_prediction(prev: PlaneNodeDetection, res, fresh_raw,
                        h: int, w: int, coverage_thresh: float,
                        return_src: bool = False):
    """Host bookkeeping of a propagation+extraction result: acceptance,
    landmark-id carry, coverage gate, overlap merge (the only part of
    ``predictPlaneNode`` that reads device results). Shared by
    ``predict_plane_node`` and the async start/finish pair.

    ``return_src`` additionally returns, per final detection row, the
    source row it came from — ``(0, l)`` for propagation row ``l``,
    ``(1, f)`` for raw fresh-extraction row ``f`` — so the caller can
    gather precomputed per-row device results (the fused program's
    body-frame projections) into detection order."""
    kept_params, kept_cov, kept_masks, kept_counts, kept_lids = \
        [], [], [], [], []
    src: list = []
    num_added = 0
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
        src.append((0, int(l)))
        num_added += int(counts_np[l])

    kept = PlaneNodeDetection(
        params=np.asarray(kept_params).reshape(-1, 4),
        cov=np.asarray(kept_cov).reshape(-1, 3, 3),
        masks=np.asarray(kept_masks, bool).reshape(-1, h, w),
        counts=np.asarray(kept_counts, np.int64),
        landmark_ids=np.asarray(kept_lids, np.int64),
    )

    # fresh planes from the uncovered cloud (the fused program already
    # ran — or skipped — the extraction; valid is all-False when skipped)
    if num_added <= coverage_thresh * h * w:
        ok = np.asarray(fresh_raw.valid)
        sel = np.nonzero(ok)[0]
        fresh = None if not len(sel) else PlaneNodeDetection(
            params=np.asarray(fresh_raw.params)[sel],
            cov=np.asarray(fresh_raw.cov)[sel],
            masks=np.asarray(fresh_raw.inlier)[sel].reshape(
                len(sel), h, w),
            counts=np.asarray(fresh_raw.count)[sel],
            landmark_ids=np.full(len(sel), -1, np.int64))
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
                src.append((1, int(sel[f])))

    out = kept if len(kept) else None
    return (out, src) if return_src else out


def predict_plane_node_start(key, K: CameraIntrinsics,
                             prev: PlaneNodeDetection, pre_R, pre_t,
                             est_R, est_t, S66, intensity, depth,
                             u2c: Optional[se3.Pose] = None,
                             keep_ratio: float = 0.7,
                             coverage_thresh: float = 0.5,
                             max_new_planes: int = 4,
                             min_support: int = 300, grow_steps: int = 64,
                             z_min: float = 0.1, z_max: float = 5.0,
                             sigma_z: float = 0.014):
    """Enqueue the rescue-side plane prediction WITHOUT blocking.

    ``pre_R/pre_t/est_R/est_t/S66`` may be device references straight out
    of the VIO kernel — the between-pose and covariance conjugation run
    on device, so the caller can enqueue this right after the kernel and
    overlap the host's association work with the device's propagation.
    ``prev`` must be non-empty, and is captured BY REFERENCE: its
    ``landmark_ids`` are read only at finish time, so a caller may
    resolve them between start and finish (the rescue host step inserts
    the pre-node detection — which writes its associated ids in place —
    while the device computes, and the propagated rows then carry the
    resolved ids). Finish with :func:`predict_plane_node_finish`.
    """
    depth = jnp.asarray(depth)
    intensity = jnp.asarray(intensity)
    h, w = depth.shape
    nv = [_tangent_to_nv_cov(prev.params[l], prev.cov[l])
          for l in range(len(prev))]
    conjugate = u2c is not None
    uR = jnp.asarray(u2c.R) if conjugate else jnp.eye(3, dtype=jnp.float64)
    ut = jnp.asarray(u2c.t) if conjugate else jnp.zeros(3, jnp.float64)
    res, fresh, tbody = _rescue_predict_program(
        K, key, jnp.asarray(prev.params),
        jnp.asarray(np.stack([s for s, _ in nv])),
        jnp.asarray(np.asarray([d for _, d in nv])),
        jnp.asarray(prev.masks),
        jnp.asarray(prev.counts.astype(np.float64)),
        jnp.asarray(pre_R), jnp.asarray(pre_t),
        jnp.asarray(est_R), jnp.asarray(est_t), jnp.asarray(S66),
        uR, ut, conjugate, intensity, depth, grow_steps, keep_ratio,
        coverage_thresh, max_new_planes, min_support, 0.02, sigma_z,
        z_min, z_max)
    return (prev, res, fresh, tbody, h, w, coverage_thresh)


def predict_plane_node_finish(handle):
    """Block on a :func:`predict_plane_node_start` handle and run the
    host bookkeeping.

    Returns ``(detection, transformed)`` where ``transformed`` is the
    ``(planes_body, covs_body)`` pair aligned to the detection's rows
    (the fused program's camera->body projections, gathered through the
    acceptance/merge bookkeeping) — the caller inserts the detection's
    factors without dispatching any transform of its own. Both are None
    when nothing was predicted."""
    prev, res, fresh, tbody, h, w, coverage_thresh = handle
    det, src = _collect_prediction(prev, res, fresh, h, w,
                                   coverage_thresh, return_src=True)
    if det is None:
        return None, None
    pb_p, cb_p, pb_f, cb_f = (np.asarray(x) for x in tbody)
    pbs = np.stack([(pb_p if k == 0 else pb_f)[i] for k, i in src])
    cbs = np.stack([(cb_p if k == 0 else cb_f)[i] for k, i in src])
    return det, (pbs, cbs)
