"""Two-frame bundle adjustment and shared-landmark track bookkeeping.

``two_frame_ba`` is the TPU equivalent of ``CGraphGT::bundleAdjust``
(``/root/reference/gtsam/gtsam_graph.cpp:500-610``): build a mini factor
graph with a near-exact prior on frame 0 (sigma 1e-7), a Point3 prior per
match (sigma 0.014), and two Cal3DS2 projection factors per match (pixel
sigma 1); LM-optimize; return the optimized relative pose and the edge
information = inverse marginal covariance of pose 1 — exactly the quantity
the reference writes into the VRO edge.

``TrackBook`` reproduces the shared-landmark bookkeeping of the global BA
insertion (``mv_feature_qid`` logic, gtsam_graph.cpp:370-448): feature
observations across frames are merged into point-landmark tracks; new
tracks get a Point3 prior at their first triangulated position.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


from ..graph import GraphBuilder, LMParams, lm_optimize
from ..graph.marginals import pose_marginal

__all__ = ["two_frame_ba", "TrackBook"]


def two_frame_ba(pts_i, uv_i, uv_j, cal, T_ij_init, body_pose=None,
                 point_sigma: float = 0.014, pixel_sigma: float = 1.0,
                 pose_prior_sigma: float = 1e-7,
                 lm_params: LMParams = LMParams(), bucket: int = 64):
    """Refine a two-frame relative pose from matched 3D points + pixels.

    Args:
      pts_i: (N, 3) 3D points in frame i's camera frame.
      uv_i, uv_j: (N, 2) pixel observations in frames i and j.
      cal: CameraIntrinsics / Cal3DS2-like intrinsics.
      T_ij_init: initial relative pose (R, t) of frame j in frame i.

    Returns:
      (T_ij (R, t) numpy, info (6, 6) numpy, final_chi2)
    """
    pts_i = np.asarray(pts_i, np.float64)
    n = len(pts_i)
    b = GraphBuilder()
    b.add_pose((np.eye(3), np.zeros(3)))          # s0 anchored
    b.add_pose(T_ij_init)                          # s1 = initial T_ij
    b.add_prior_pose(0, (np.eye(3), np.zeros(3)),
                     sigmas=np.full(6, pose_prior_sigma))
    for k in range(n):
        q = b.add_point(pts_i[k])
        b.add_prior_point(q, pts_i[k], sigma=point_sigma)
        b.add_projection_factor(0, q, np.asarray(uv_i[k]), cal,
                                body_pose=body_pose, sigma=pixel_sigma)
        b.add_projection_factor(1, q, np.asarray(uv_j[k]), cal,
                                body_pose=body_pose, sigma=pixel_sigma)
    graph, values = b.build(bucket=bucket)
    res = lm_optimize(graph, values, lm_params)
    cov = np.asarray(pose_marginal(graph, res.values, 1))
    info = np.linalg.inv(cov)
    R = np.asarray(res.values.pose_R[1])
    t = np.asarray(res.values.pose_t[1])
    return (R, t), info, float(res.error)


@dataclasses.dataclass
class TrackBook:
    """Feature-track -> point-landmark id bookkeeping across frames.

    ``feature_qid[frame]`` maps local feature index -> landmark id (or -1),
    the reference's ``mv_feature_qid``. ``merge`` processes a set of
    (feat_i, feat_j) matches between two frames, assigning/propagating
    landmark ids and reporting which observations are new.
    """

    next_qid: int = 0

    def __post_init__(self):
        self.feature_qid: dict[int, dict[int, int]] = {}

    def _get(self, frame: int) -> dict[int, int]:
        return self.feature_qid.setdefault(frame, {})

    def merge(self, frame_i: int, frame_j: int, matches):
        """Returns a list of events, one per match:
        ("new", qid) | ("extend_i", qid) | ("extend_j", qid) |
        ("seen", qid) — mirroring the four branches of
        gtsam_graph.cpp:481-560 (new landmark / add factor on one side /
        already-consistent observation).
        """
        fi = self._get(frame_i)
        fj = self._get(frame_j)
        events = []
        for (a, c) in matches:
            qa = fi.get(a, -1)
            qc = fj.get(c, -1)
            if qa < 0 and qc < 0:
                qid = self.next_qid
                self.next_qid += 1
                fi[a] = fj[c] = qid
                events.append(("new", qid))
            elif qa < 0:
                fi[a] = qc
                events.append(("extend_i", qc))
            elif qc < 0:
                fj[c] = qa
                events.append(("extend_j", qa))
            else:
                events.append(("seen", qa))
        return events
