"""Visual relative odometry core: descriptor matching, rigid 3D-3D
estimation, massively-parallel RANSAC, and the VO covariance.

TPU-native replacement for the external VRO frontend the reference links
against (``sparse_feature_vo.h`` / ``matching_result.h`` — SURVEY.md §0):
- descriptor matching is one MXU matmul + ratio/mutual tests,
- the reference's sequential 2000-5000-iteration RANSAC
  (``launch/graph_slam/gtsam_go.launch:16``) becomes a single *vmapped*
  hypothesis batch: all hypotheses sample, solve (closed-form Umeyama),
  and score in parallel,
- the edge covariance follows the reference's Hessian-of-residuals
  construction (``CGraphGT::computeCovVRO`` gtsam_graph.cpp:256-277 with the
  ``cov_Helper`` Pose3 chart): cov = sigma^2 (sum_k J_k^T J_k)^-1 with
  J_k = R [-hat(p_k) | I] in the (omega, v) tangent.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3, so3

__all__ = ["MatchingResult", "match_descriptors", "umeyama", "ransac_rigid",
           "pnp_ransac", "vo_information"]


@dataclasses.dataclass
class MatchingResult:
    """The reference's ``MatchingResult`` record (edge between two frames)."""

    id_from: int
    id_to: int
    T: tuple                  # (R (3,3), t (3,)) numpy — frame_from <- to? see below
    information: np.ndarray   # (6, 6)
    num_inliers: int
    succeed: bool

    @property
    def valid(self) -> bool:
        return self.succeed


@partial(jax.jit, static_argnames=("ratio", "mutual"))
def match_descriptors(desc_i, desc_j, ratio: float = 0.8,
                      mutual: bool = True):
    """Nearest-neighbor matching with Lowe ratio + mutual-consistency tests.

    desc_*: (N, D) L2-normalized descriptors (padded rows allowed — mask by
    passing zero rows, they never win). Returns (idx_j (N,), valid (N,)):
    for each feature in i, its match in j.

    One (N, D) @ (D, M) matmul does all the work — the MXU version of the
    frontend's FLANN search.
    """
    sim = desc_i @ desc_j.T                      # cosine similarity
    d2 = 2.0 - 2.0 * sim                          # squared L2 for unit norm
    nn1 = jnp.argmin(d2, axis=1)
    best = jnp.min(d2, axis=1)
    d2_masked = d2.at[jnp.arange(d2.shape[0]), nn1].set(jnp.inf)
    second = jnp.min(d2_masked, axis=1)
    ok = best < (ratio * ratio) * second
    if mutual:
        nn_back = jnp.argmin(d2, axis=0)          # best i for each j
        ok &= nn_back[nn1] == jnp.arange(d2.shape[0])
    return nn1, ok


def umeyama(p_src, p_dst, w):
    """Weighted closed-form rigid transform: R, t minimizing
    sum w_k ||R p_src_k + t - p_dst_k||^2 (Umeyama / Horn, SVD)."""
    w = w[..., None]
    ws = jnp.sum(w, axis=-2, keepdims=True)
    ws = jnp.where(ws > 0, ws, 1.0)
    mu_s = jnp.sum(p_src * w, axis=-2, keepdims=True) / ws
    mu_d = jnp.sum(p_dst * w, axis=-2, keepdims=True) / ws
    S = jnp.einsum("...ki,...kj->...ij", (p_dst - mu_d) * w, p_src - mu_s)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    R = (U * D[..., None, :]) @ Vt
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_s[..., 0, :])
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_rigid(key, pts_src, pts_dst, valid, n_hyp: int = 2048,
                 inlier_thresh: float = 0.05, min_inliers: int = 12):
    """All-hypotheses-at-once RANSAC for the 3D-3D rigid transform.

    pts_*: (N, 3) matched point pairs with ``valid`` mask. Samples 3
    correspondences per hypothesis, solves Umeyama for all ``n_hyp``
    hypotheses in one batch, scores inliers with one (n_hyp, N) distance
    matrix, refits on the best inlier set (twice, like the frontend's
    refinement), and reports (R, t, inlier_mask, ok).
    """
    n = pts_src.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    samp = jax.random.categorical(
        key, jnp.log(probs + 1e-30), shape=(n_hyp, 3))
    src3 = pts_src[samp]                       # (n_hyp, 3, 3)
    dst3 = pts_dst[samp]
    w3 = jnp.ones((n_hyp, 3), pts_src.dtype)
    R, t = umeyama(src3, dst3, w3)             # batched over hypotheses

    pred = jnp.einsum("hij,nj->hni", R, pts_src) + t[:, None, :]
    err = jnp.linalg.norm(pred - pts_dst[None], axis=-1)
    inl = (err < inlier_thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # refit on inliers of the best hypothesis, twice
    def refit(mask):
        Rb, tb = umeyama(pts_src, pts_dst, mask.astype(pts_src.dtype))
        pe = jnp.einsum("ij,nj->ni", Rb, pts_src) + tb
        e = jnp.linalg.norm(pe - pts_dst, axis=-1)
        return Rb, tb, (e < inlier_thresh) & valid

    Rb, tb, m1 = refit(inl[best])
    Rb, tb, m2 = refit(m1)
    ok = jnp.sum(m2) >= min_inliers
    return Rb, tb, m2, ok


@partial(jax.jit, static_argnames=("n_hyp", "gn_iters"))
def pnp_ransac(key, pts_i, uv_j, valid, cal, n_hyp: int = 512,
               inlier_px: float = 3.0, min_inliers: int = 12,
               gn_iters: int = 10):
    """Batched RANSAC-PnP: 3D points in frame i vs pixels in frame j.

    The role of the frontend's PnP match path (``camera_node_pnp.h`` /
    ``test_match_PnP.cpp``, SURVEY §2.6) for matches without depth in the
    new frame. TPU formulation: instead of a closed-form minimal P3P,
    every 4-point hypothesis runs a fixed-trip Gauss-Newton on the se(3)
    chart of T_ji (``p_j = T_ji p_i``) from identity — all hypotheses in
    one vmap; XLA batches the 6x6 solves. Valid for the VO regime (small
    inter-frame motion); scoring is one (n_hyp, N) reprojection pass.

    Returns (R_ij, t_ij, inlier_mask, ok) — the pose of frame j in frame i,
    the frontend convention.
    """
    from .cal3ds2 import project_point

    n = pts_i.shape[0]
    dtype = pts_i.dtype
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    samp = jax.random.categorical(
        key, jnp.log(probs + 1e-30), shape=(n_hyp, 4))
    p4 = pts_i[samp]                       # (n_hyp, 4, 3)
    u4 = uv_j[samp]                        # (n_hyp, 4, 2)

    def gn(pts, uv, w, iters, x0=None):
        """Fixed-trip damped GN for xi (se3 chart of T_ji), weighted."""

        def res_fn(x):
            T = se3.expmap(x)
            pc = se3.transform_from(T, pts)
            return ((project_point(cal, pc) - uv)
                    * w[:, None]).reshape(-1)

        def step(x, _):
            r = res_fn(x)
            J = jax.jacfwd(res_fn)(x)
            H = J.T @ J + 1e-4 * jnp.eye(6, dtype=dtype)
            x = x - jnp.linalg.solve(H, J.T @ r)
            return x, None

        x0 = jnp.zeros(6, dtype) if x0 is None else x0
        x, _ = jax.lax.scan(step, x0, None, length=iters)
        return x

    xi_h = jax.vmap(
        lambda p, u: gn(p, u, jnp.ones(4, dtype), gn_iters))(p4, u4)

    # score every hypothesis: one (n_hyp, N, 2) reprojection
    T_h = se3.expmap(xi_h)                 # batched Pose
    pc = jnp.einsum("hij,nj->hni", T_h.R, pts_i) + T_h.t[:, None, :]
    uv_pred = project_point(cal, pc.reshape(-1, 3)).reshape(n_hyp, n, 2)
    err = jnp.linalg.norm(uv_pred - uv_j[None], axis=-1)
    behind = pc[..., 2] < 1e-3
    inl = (err < inlier_px) & valid[None, :] & ~behind
    best = jnp.argmax(jnp.sum(inl, axis=1))

    # refit on the best inlier set, twice (warm-started)
    def refit(xi0, mask):
        xi = gn(pts_i, uv_j, mask.astype(dtype), gn_iters, x0=xi0)
        T = se3.expmap(xi)
        pcn = se3.transform_from(T, pts_i)
        e = jnp.linalg.norm(project_point(cal, pcn) - uv_j, axis=-1)
        return xi, (e < inlier_px) & valid & (pcn[..., 2] > 1e-3)

    xi, m1 = refit(xi_h[best], inl[best])
    xi, m2 = refit(xi, m1)
    ok = jnp.sum(m2) >= min_inliers
    T_ij = se3.inverse(se3.expmap(xi))
    return T_ij.R, T_ij.t, m2, ok


@jax.jit
def vo_information(R, t, inlier_mask, pts_src, sigma: float = 0.01):
    """6x6 information of the VO edge from inlier geometry.

    Gauss-Newton covariance of the rigid estimate in the (omega, v) chart:
    per-inlier Jacobian J_k = R [-hat(p_k) | I]; information =
    (1/sigma^2) * sum_k J_k^T J_k (computeCovVRO role, inverted).
    """
    m = inlier_mask.astype(pts_src.dtype)
    P = so3.hat(pts_src)                      # (N, 3, 3)
    Jw = -jnp.einsum("ij,njk->nik", R, P)      # (N, 3, 3)
    Jv = jnp.broadcast_to(R, Jw.shape)
    J = jnp.concatenate([Jw, Jv], axis=-1)     # (N, 3, 6)
    H = jnp.einsum("nei,nej,n->ij", J, J, m)
    return H / (sigma * sigma)
