"""Plane-consistency evaluation of VO edges — ``test_plane_check_vo`` twin.

Reference (``/root/reference/gtsam/test_plane_check_vo.cpp``): for each VO
edge, extract planes in both frames, match by normal angle (< 10 deg) and
distance offset (<= 0.2) after transforming through the VO estimate, and
score the worst matched pair by the Mahalanobis distance of the plane
error under the propagated covariances (``computePlaneDis`` ``:383-445``,
``computePlaneNodeDis`` ``:328-379``). Output lines:
``id_to id_from num_matches err err_raw``.

The tangent Jacobians of the plane transform and of the error chart are
computed with autodiff instead of GTSAM's hand-coded ones.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..io.vro_log import VROLog
from ..planes import oriented_plane

__all__ = ["plane_pair_mahalanobis", "plane_set_consistency",
           "check_vo_edges"]

_COS10 = math.cos(10.0 * math.pi / 180.0)


@jax.jit
def _transform_jacobians(plane, xi):
    """Jacobians of transform(plane, Exp(xi)) wrt (plane tangent, xi)."""
    T = se3.expmap(xi)
    base = oriented_plane.transform(plane, T.R, T.t)

    def f_plane(dp):
        p = oriented_plane.retract(plane, dp)
        out = oriented_plane.transform(p, T.R, T.t)
        return oriented_plane.local(base, out)

    def f_pose(dxi):
        T2 = se3.compose(T, se3.expmap(dxi))
        out = oriented_plane.transform(plane, T2.R, T2.t)
        return oriented_plane.local(base, out)

    Jp = jax.jacfwd(f_plane)(jnp.zeros(3, plane.dtype))
    Jt = jax.jacfwd(f_pose)(jnp.zeros(6, plane.dtype))
    return base, Jp, Jt


@jax.jit
def _error_jacobians(pa, pb):
    """e = local(pa, pb) and its Jacobians wrt both planes' tangents."""
    e = oriented_plane.local(pa, pb)

    def fa(d):
        return oriented_plane.local(oriented_plane.retract(pa, d), pb)

    def fb(d):
        return oriented_plane.local(pa, oriented_plane.retract(pb, d))

    return e, jax.jacfwd(fa)(jnp.zeros(3)), jax.jacfwd(fb)(jnp.zeros(3))


def plane_pair_mahalanobis(plane_i, cov_i, plane_j, cov_j, xi_ij, S_ij):
    """computePlaneDis: Mahalanobis distance of (transform(p_i, T_ij), p_j).

    ``cov_*`` are (3,3) tangent covariances; ``S_ij`` the 6x6 VO pose
    covariance. Returns (mahalanobis, raw_sq_error).
    """
    plane_i = jnp.asarray(plane_i)
    plane_j = jnp.asarray(plane_j)
    pred, Jp, Jt = _transform_jacobians(plane_i, jnp.asarray(xi_ij))
    S_pred = Jt @ jnp.asarray(S_ij) @ Jt.T + Jp @ jnp.asarray(cov_i) @ Jp.T
    e, Ja, Jb = _error_jacobians(pred, plane_j)
    S_e = Ja @ S_pred @ Ja.T + Jb @ jnp.asarray(cov_j) @ Jb.T
    m = e @ jnp.linalg.solve(S_e, e)
    return float(m), float(e @ e)


def plane_set_consistency(planes_i, covs_i, planes_j, covs_j, xi_ij, S_ij,
                          cos_thresh: float = _COS10,
                          d_thresh: float = 0.2):
    """computePlaneNodeDis: match planes through the VO transform, return
    (num_matches, max_mahalanobis, raw_err_of_max)."""
    T = se3.expmap(jnp.asarray(xi_ij))
    n_match = 0
    err = 0.0
    err_raw = 0.0
    for i, pi in enumerate(planes_i):
        pred = np.asarray(oriented_plane.transform(jnp.asarray(pi), T.R, T.t))
        for j, pj in enumerate(planes_j):
            cosa = float(np.dot(pred[:3], np.asarray(pj)[:3]))
            if abs(cosa) < cos_thresh:
                continue
            sign = -1.0 if cosa < 0 else 1.0
            if abs(sign * pred[3] - pj[3]) > d_thresh:
                continue
            n_match += 1
            m, raw = plane_pair_mahalanobis(pi, covs_i[i], pj, covs_j[j],
                                            xi_ij, S_ij)
            if m > err:
                err, err_raw = m, raw
            break
    return n_match, err, err_raw


def check_vo_edges(log: VROLog, plane_provider, out_path: str | None = None):
    """Score every valid VO edge by plane consistency.

    ``plane_provider(seq_id) -> (planes (P,4) list, covs (P,3,3) list)``.
    Returns rows of (id_to, id_from, num, err, err_raw); optionally writes
    the reference's log format.
    """
    rows = []
    valid = log.valid
    for k in range(len(log)):
        if not valid[k]:
            continue
        pi, ci = plane_provider(int(log.id_from[k]))
        pj, cj = plane_provider(int(log.id_to[k]))
        S_ij = np.linalg.inv(log.info[k])
        n, err, err_raw = plane_set_consistency(pi, ci, pj, cj, log.xi[k],
                                                S_ij)
        rows.append((int(log.id_to[k]), int(log.id_from[k]), n, err,
                     err_raw))
    if out_path:
        with open(out_path, "w") as f:
            for r in rows:
                f.write(f"{r[0]} {r[1]} {r[2]} {r[3]!r} {r[4]!r}\n")
    return rows
