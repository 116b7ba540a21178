"""VRO frontend: pairwise frame matching and batched loop-closure search.

``match_node_pair`` is the role of the external frontend's
``CCameraNode::matchNodePair`` (SURVEY.md §3.1 hot path): descriptor
matching -> parallel RANSAC -> rigid transform + information. The
reference fans loop-closure candidates over a Qt thread pool
(``gtsam_graph.cpp:1730-1731``); here ``match_one_to_many`` vmaps the whole
candidate window into one batched device computation.

Transform convention: the returned (R, t) is the pose of the *new* frame j
expressed in the reference frame i (``X_j = X_i * T_ij``), matching how
``addToGTSAM`` composes initial estimates (gtsam_graph.cpp:655-668).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .features import FeatureFrame
from .matching import (
    MatchingResult,
    match_descriptors,
    ransac_rigid,
    vo_information,
)

__all__ = ["match_node_pair", "match_one_to_many", "match_frames_device"]


@partial(jax.jit, static_argnames=("n_hyp", "ratio"))
def match_frames_device(key, frame_i: FeatureFrame, frame_j: FeatureFrame,
                        n_hyp: int = 2048, inlier_thresh: float = 0.05,
                        ratio: float = 0.8, min_inliers: int = 12,
                        point_sigma: float = 0.01):
    """Device core: (R, t, info, n_inliers, ok) for a frame pair."""
    idx, m_ok = match_descriptors(frame_j.desc, frame_i.desc, ratio=ratio)
    # matched pairs: src = j's 3D points, dst = i's 3D points
    src = frame_j.pts3
    dst = frame_i.pts3[idx]
    valid = m_ok & frame_j.valid & frame_i.valid[idx]
    R, t, inl, ok = ransac_rigid(key, src, dst, valid, n_hyp=n_hyp,
                                 inlier_thresh=inlier_thresh,
                                 min_inliers=min_inliers)
    info = vo_information(R, t, inl, src, sigma=point_sigma)
    return R, t, info, jnp.sum(inl), ok


def match_node_pair(key, frame_i: FeatureFrame, frame_j: FeatureFrame,
                    id_i: int, id_j: int, **kw) -> MatchingResult:
    """Host wrapper producing the MatchingResult record."""
    R, t, info, n_inl, ok = match_frames_device(key, frame_i, frame_j, **kw)
    return MatchingResult(
        id_from=id_i, id_to=id_j,
        T=(np.asarray(R), np.asarray(t)),
        information=np.asarray(info),
        num_inliers=int(n_inl),
        succeed=bool(ok),
    )


@partial(jax.jit, static_argnames=("n_hyp", "ratio"))
def match_one_to_many(key, new_frame: FeatureFrame,
                      candidates: FeatureFrame, n_hyp: int = 2048,
                      inlier_thresh: float = 0.05, ratio: float = 0.8,
                      min_inliers: int = 12, point_sigma: float = 0.01):
    """Batched loop-closure matching: new frame vs a stacked candidate
    window (leading axis = candidate). One vmapped computation replaces the
    reference's thread-pool ``QtConcurrent::blockingMapped``."""
    n_cand = candidates.uv.shape[0]
    keys = jax.random.split(key, n_cand)

    def one(k, cand):
        return match_frames_device(
            k, cand, new_frame, n_hyp=n_hyp, inlier_thresh=inlier_thresh,
            ratio=ratio, min_inliers=min_inliers, point_sigma=point_sigma)

    return jax.vmap(one)(keys, candidates)
