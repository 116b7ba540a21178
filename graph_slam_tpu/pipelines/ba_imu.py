"""Offline BA + IMU pipeline — ``test_ba_imu_graph`` twin.

Reference (``/root/reference/gtsam/test_ba_imu_graph.cpp:79-468``): same
replay skeleton as the VIO pipeline but frames carry feature observations;
matched features become shared Point3 landmarks with a point prior at
their first triangulation and Cal3DS2 projection factors on every
observing pose (global-BA insertion ``addToGTSAM(CCameraNodeBA*,...)``
gtsam_graph.cpp:370-448), IMU factors optional (``g_use_imu``), final
batch optimization.

Landmark bookkeeping uses ``vision.TrackBook`` (the ``mv_feature_qid``
logic); the Schur solver handles the landmark-heavy normal equations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..config import CameraIntrinsics
from ..core import se3
from ..graph import GraphBuilder, LMParams, lm_optimize, total_error
from ..graph.ba_solve import ba_gn_optimize, ba_gn_optimize_sqrt
from ..imu import ImuParams, ImuStream, init_preint, integrate_segment, \
    predict_navstate, find_index_at
from ..vision.ba import TrackBook
from .vio import _pad_window

__all__ = ["BaImuConfig", "BaImuResult", "run_ba_imu"]


# longest feature track the sqrt-Schur QR stack accepts before run_ba_imu
# falls back to generic LM (every landmark's block pads to the max track)
_SQRT_MAX_TRACK = 64


@dataclasses.dataclass
class BaImuConfig:
    use_imu: bool = True
    point_sigma: float = 0.014      # Point3 prior (gtsam_graph.cpp:485)
    pixel_sigma: float = 1.0        # projection noise (:486)
    max_imu_window: int = 512
    solver: str = "schur"            # "schur" | "lm"
    schur_iters: int = 10
    bucket: int = 64
    sharded: int = 0                 # >0: landmark-sharded solve over an
    #                                  N-device mesh (sharded_ba_sqrt)


@dataclasses.dataclass
class BaImuResult:
    values: object
    graph: object
    error0: float
    error: float
    n_landmarks: int
    n_projection_factors: int
    n_imu_factors: int


def features_from_store(frames_provider, seq_ids, K,
                        max_features: int = 256, ratio: float = 0.8,
                        features: str = "harris"):
    """Build ``run_ba_imu``'s (frames, matches) inputs from raw RGB-D frames.

    Extracts features per frame (the driver's featureExtraction role,
    test_ba_imu_graph.cpp:79-120) and returns a consecutive-pair matcher
    backed by the batched descriptor matmul.
    """
    import jax.numpy as _jnp

    from ..vision.frontend import get_extractor
    from ..vision.matching import match_descriptors

    extract_features = get_extractor(features)

    ffs = []
    frames_out = []
    for s in seq_ids:
        fr = frames_provider(int(s))
        if fr is None:
            raise FileNotFoundError(f"missing frame for seq {s}")
        f = extract_features(K, _jnp.asarray(fr[0]), _jnp.asarray(fr[1]),
                             max_features=max_features)
        ffs.append(f)
        frames_out.append({"uv": np.asarray(f.uv),
                           "pts3": np.asarray(f.pts3)})

    def matches(i, j):
        idx, ok = match_descriptors(ffs[j].desc, ffs[i].desc, ratio=ratio)
        ok = np.asarray(ok & ffs[j].valid & ffs[i].valid[idx])
        idx = np.asarray(idx)
        return [(int(idx[k]), int(k)) for k in np.nonzero(ok)[0]]

    return frames_out, matches


def run_ba_imu(frames, matches: Callable, img_times,
               imu: Optional[ImuStream], imu_params: Optional[ImuParams],
               cal: CameraIntrinsics, u2c: Optional[se3.Pose] = None,
               cfg: BaImuConfig = BaImuConfig(),
               lm_params: LMParams = LMParams()) -> BaImuResult:
    """Run BA(+IMU) over a frame sequence.

    Args:
      frames: list of per-frame feature data: dict with ``uv`` (M, 2) pixel
        observations and ``pts3`` (M, 3) camera-frame 3D lifts.
      matches: ``(i, j) -> [(feat_i, feat_j), ...]`` feature matches between
        frames i and j (consecutive pairs are queried).
      img_times: seq -> timestamp (needed when use_imu).
    """
    u2c_j = u2c if u2c is not None else se3.identity()
    b = GraphBuilder()
    book = TrackBook()
    n_proj = n_imu = 0

    prev_pose = se3.identity()
    prev_vel = jnp.zeros(3)
    prev_bias = jnp.zeros(6)
    cur_imu_idx = 0
    use_imu = cfg.use_imu and imu is not None

    poses: list[se3.Pose] = []
    t_of = img_times.__getitem__ if hasattr(img_times, "__getitem__") \
        else img_times

    def add_projection(frame_idx, feat_idx, qid):
        nonlocal n_proj
        uv = frames[frame_idx]["uv"][feat_idx]
        b.add_projection_factor(frame_idx, qid, np.asarray(uv), cal,
                                body_pose=(np.asarray(u2c_j.R),
                                           np.asarray(u2c_j.t)),
                                sigma=cfg.pixel_sigma)
        n_proj += 1

    for j in range(len(frames)):
        if j == 0:
            b.add_pose((np.eye(3), np.zeros(3)))
            b.add_prior_pose(0, (np.eye(3), np.zeros(3)),
                             sigmas=np.full(6, 1e-7))
            if use_imu:
                b.add_vel(np.zeros(3))
                b.add_bias(np.zeros(6))
                b.add_prior_vel(0, np.zeros(3), sigma=1e-3)
                b.add_prior_bias(0, np.zeros(6), sigma=1e-3)
                imu.set_start_time(float(t_of(0)))
            poses.append(se3.identity())
            continue

        # IMU preintegration + prediction for the initial estimate
        if use_imu:
            nxt = find_index_at(imu.t, float(t_of(j)), imu.start)
            if nxt < 0:
                nxt = len(imu.t) - imu.start - 1
            acc, gyr = imu.window(cur_imu_idx, nxt)
            st = init_preint(prev_bias, imu_params)
            a, g, dts = _pad_window(acc, gyr, nxt - cur_imu_idx, imu.dt,
                                    cfg.max_imu_window)
            st = integrate_segment(st, a, g, dts, imu_params)
            cur_imu_idx = nxt
            pred_pose, pred_vel = predict_navstate(
                st, prev_pose, prev_vel, prev_bias, imu_params.gravity)
        else:
            pred_pose, pred_vel = prev_pose, prev_vel

        b.add_pose((np.asarray(pred_pose.R), np.asarray(pred_pose.t)))
        poses.append(pred_pose)
        if use_imu:
            b.add_vel(np.asarray(pred_vel))
            b.add_bias(np.asarray(prev_bias))
            b.add_imu_factor(j - 1, j, st, np.asarray(imu_params.gravity))
            n_imu += 1
            prev_pose, prev_vel = pred_pose, pred_vel

        # feature tracks -> landmarks + projection factors
        pair_matches = matches(j - 1, j)
        events = book.merge(j - 1, j, pair_matches)
        for (ev, qid), (fi, fj) in zip(events, pair_matches):
            if ev == "new":
                # triangulate in frame j-1: world = X_{j-1} * u2c * p_cam
                p_cam = np.asarray(frames[j - 1]["pts3"][fi])
                pw = se3.transform_from(
                    se3.compose(poses[j - 1], u2c_j), jnp.asarray(p_cam))
                q = b.add_point(np.asarray(pw))
                assert q == qid
                b.add_prior_point(qid, np.asarray(pw),
                                  sigma=cfg.point_sigma)
                add_projection(j - 1, fi, qid)
                add_projection(j, fj, qid)
            elif ev == "extend_i":
                add_projection(j - 1, fi, qid)
            elif ev == "extend_j":
                add_projection(j, fj, qid)
            # "seen": both observations already in the graph

    graph, values = b.build(bucket=cfg.bucket)
    e0 = float(total_error(graph, values))
    if cfg.solver == "schur":
        # normal-equations Schur needs f64 (cancellation); on f32-only
        # runs route to the square-root (QR) elimination instead
        import warnings

        import jax as _jax

        # the QR stack pads every landmark to the LONGEST track (K): a
        # single feature tracked across hundreds of frames would make the
        # per-landmark blocks O(K^2) — route such graphs away from the
        # sqrt elimination (threshold must stay in sync with
        # build_point_obs's K-padding cost model)
        act = np.asarray(graph.projection.active)
        pidx = np.asarray(graph.projection.point_idx)[act]
        max_track = int(np.bincount(pidx).max()) if pidx.size else 0
        track_ok = max_track <= _SQRT_MAX_TRACK
        if not track_ok and (cfg.sharded > 0
                             or not _jax.config.read("jax_enable_x64")):
            warnings.warn(
                f"ba-imu: longest feature track ({max_track} observations)"
                f" exceeds {_SQRT_MAX_TRACK}; the sqrt-Schur elimination "
                "would pad every landmark to it — falling back to the "
                "generic LM solver"
                + (" (the --sharded mesh will sit idle)" if cfg.sharded
                   else ""))

        if cfg.sharded > 0 and track_ok:
            from ..parallel import make_mesh, sharded_ba_sqrt
            vals, err = sharded_ba_sqrt(make_mesh(cfg.sharded), graph,
                                        values,
                                        iterations=cfg.schur_iters)
        elif track_ok and not _jax.config.read("jax_enable_x64"):
            vals, err = ba_gn_optimize_sqrt(graph, values,
                                            iterations=cfg.schur_iters)
        elif _jax.config.read("jax_enable_x64"):
            vals, err = ba_gn_optimize(graph, values,
                                       iterations=cfg.schur_iters)
        else:
            res = lm_optimize(graph, values, lm_params)
            vals, err = res.values, res.error
        err = float(err)
    else:
        res = lm_optimize(graph, values, lm_params)
        vals, err = res.values, float(res.error)
    return BaImuResult(values=vals, graph=graph, error0=e0, error=err,
                       n_landmarks=book.next_qid,
                       n_projection_factors=n_proj, n_imu_factors=n_imu)
