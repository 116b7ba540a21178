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

__all__ = ["match_node_pair", "match_one_to_many", "match_frames_device",
           "match_under_prior", "refine_edge_ba", "make_ba_fn"]


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
def match_under_prior(key, frame_i: FeatureFrame, frame_j: FeatureFrame,
                      T_init, radius: float = 0.15, n_hyp: int = 512,
                      inlier_thresh: float = 0.04, ratio: float = 0.95,
                      min_inliers: int = 6, point_sigma: float = 0.01):
    """Guided re-matching under a predicted transform — ``vroAdjust``.

    The reference re-matches a frame pair with the search restricted by the
    predicted transform and re-estimates (``CGraphGT::vroAdjust``,
    gtsam_graph.cpp:450-498, via the frontend's ``matchNodePairBA``). Here
    the guidance is a dense geometric gate: each feature of frame j is
    pushed through ``T_init`` into frame i (``p_i = T_ij p_j``) and may only
    match i-features whose 3D point lies within ``radius`` meters of the
    prediction — one masked (Nj, Ni) distance matrix fused with the
    descriptor similarity matmul. The relaxed Lowe ratio reflects the
    geometric prior carrying most of the disambiguation.

    Returns ``(R, t, info, inliers, nn, ok)``: the rigid estimate, its
    information, the (Nj,) boolean inlier mask, the (Nj,) index of each
    j-feature's matched i-feature, and the success flag.
    """
    R0, t0 = T_init
    pred_i = frame_j.pts3 @ jnp.asarray(R0).T + jnp.asarray(t0)

    sim = frame_j.desc @ frame_i.desc.T
    d2 = 2.0 - 2.0 * sim
    dist2 = jnp.sum(
        (pred_i[:, None, :] - frame_i.pts3[None, :, :]) ** 2, axis=-1)
    gate = (dist2 <= radius * radius) & frame_i.valid[None, :]
    d2 = jnp.where(gate, d2, jnp.inf)
    nn = jnp.argmin(d2, axis=1)
    best = jnp.min(d2, axis=1)
    d2_masked = d2.at[jnp.arange(d2.shape[0]), nn].set(jnp.inf)
    second = jnp.min(d2_masked, axis=1)
    m_ok = jnp.isfinite(best) & frame_j.valid
    m_ok &= (best < (ratio * ratio) * second) | ~jnp.isfinite(second)

    src = frame_j.pts3
    dst = frame_i.pts3[nn]
    R, t, inl, ok = ransac_rigid(key, src, dst, m_ok, n_hyp=n_hyp,
                                 inlier_thresh=inlier_thresh,
                                 min_inliers=min_inliers)
    info = vo_information(R, t, inl, src, sigma=point_sigma)
    return R, t, info, inl, nn, ok


def refine_edge_ba(key, frame_i: FeatureFrame, frame_j: FeatureFrame,
                   T_init, cal, radius: float = 0.15,
                   min_inliers: int = 6, **ba_kw):
    """Guided re-match + two-frame BA: the full ``matchNodePairBA`` ->
    ``bundleAdjust`` chain (gtsam_graph.cpp:500-610).

    Returns ((R, t), info6x6, chi2) or None when the guided match fails
    (the reference aborts below 4 matches, ``:519``).
    """
    from .ba import two_frame_ba

    R, t, info, inl, nn, ok = match_under_prior(key, frame_i, frame_j,
                                                T_init, radius=radius,
                                                min_inliers=min_inliers)
    if not bool(ok):
        return None
    sel = np.nonzero(np.asarray(inl))[0]
    nn = np.asarray(nn)[sel]            # j-feature sel[k] <-> i-feature nn[k]
    pts_i = np.asarray(frame_i.pts3)[nn]
    uv_i = np.asarray(frame_i.uv)[nn]
    uv_j = np.asarray(frame_j.uv)[sel]
    T, info6, chi2 = two_frame_ba(pts_i, uv_i, uv_j, cal,
                                  (np.asarray(R), np.asarray(t)), **ba_kw)
    return T, info6, chi2


def get_extractor(features: str = "harris"):
    """Feature-extractor dispatch: ``harris`` (patch descriptors) or
    ``sift`` (DoG keypoints + rotation/scale-invariant descriptors).
    Both return a ``FeatureFrame`` with identical static-shape semantics."""
    if features == "harris":
        from .features import extract_features
        return extract_features
    if features == "sift":
        from .sift import sift_features
        return sift_features
    raise ValueError(f"unknown feature extractor {features!r} (harris|sift)")


def make_feature_cache(frames, K, max_features: int = 256,
                       features: str = "harris"):
    """``seq_id -> FeatureFrame | None`` with per-sequence memoization.

    The shared lazy extraction closure behind every frame-source-driven
    tool (``make_ba_fn``, ``tools.make_frame_matcher``): ``frames`` maps a
    sequence id to ``(intensity, depth) | None``.
    """
    extract = get_extractor(features)
    cache: dict = {}

    def feat(seq):
        if seq not in cache:
            fr = frames(seq)
            cache[seq] = None if fr is None else extract(
                K, jnp.asarray(fr[0]), jnp.asarray(fr[1]),
                max_features=max_features)
        return cache[seq]

    return feat


def make_ba_fn(frames, K, seed: int = 0, max_features: int = 256,
               radius: float = 0.15):
    """Build the ``convert_vo2ba`` refinement closure from a frame source.

    ``frames``: ``seq_id -> (intensity, depth) | None`` (e.g. a FrameStore).
    Features are extracted lazily and cached per sequence id; each edge is
    refined by guided re-matching under its logged transform followed by
    two-frame BA — making ``convert_vo2ba(mode="ba"/"hybrid")``
    self-contained (the round-1 gap: callers had to supply the closure).
    """
    from ..core import se3

    feat = make_feature_cache(frames, K, max_features=max_features)
    key_holder = [jax.random.PRNGKey(seed)]

    def ba_fn(id_from, id_to, xi_init, valid):
        fi, fj = feat(id_from), feat(id_to)
        if fi is None or fj is None:
            return None
        T0 = se3.expmap(jnp.asarray(xi_init)) if valid else se3.identity()
        key_holder[0], k = jax.random.split(key_holder[0])
        out = refine_edge_ba(k, fi, fj, (T0.R, T0.t), K, radius=radius)
        if out is None:
            return None
        (R, t), info, _ = out
        xi = np.asarray(se3.logmap(se3.Pose(jnp.asarray(R),
                                            jnp.asarray(t))))
        return xi, info

    return ba_fn


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
