"""Plane landmark association and covariance plumbing for plane factors.

Mirrors the reference's association/insertion pipeline:
- candidate window = landmarks seen in the last 7 nodes
  (``potentialPlaneNodes``, gtsam_graph.cpp:1300-1344);
- match test: transform the world landmark into the observation frame,
  normal-alignment cos(angle) >= cos(10 deg) AND |delta d| <= 0.2
  (``planeNodeAssociation`` gtsam_graph.cpp:1398-1415, incl. the sign flip
  when the normals face opposite ways);
- unmatched observations allocate a new landmark whose world value is the
  body-frame plane pushed through the inverse pose (addPlaneFactor
  landmark creation, gtsam_graph.cpp:1196-1210);
- covariance projection camera->IMU with the transform's tangent Jacobian
  and the PSD repair chain (``psd.repair_plane_cov``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from . import oriented_plane
from .psd import repair_plane_cov

__all__ = ["PlaneLandmarkBook", "transform_plane_cov", "match_plane",
           "plane_to_world"]


@jax.jit
def _transform_jacobian(plane, R, t):
    """3x3 tangent Jacobian of ``oriented_plane.transform`` wrt the plane.

    Analytic form (cross-checked against autodiff in
    ``tests/test_planes.py``): with B = basis(n), B' = basis(R^T n),
    a tangent perturbation (xi_n, xi_d) maps to

        xi'_n = B'^T R^T B xi_n        (normal chart-to-chart rotation)
        xi'_d = t^T B xi_n + xi_d      (d' = d + n . t)

    Autodiff through the sphere logmap NaNs at the zero tangent in f32
    (coincident normals), so the closed form is also the robust one.
    """
    n = plane[..., :3]
    B = oriented_plane.basis(n)
    n_out = jnp.einsum("...ji,...j->...i", R, n)
    B_out = oriented_plane.basis(n_out)
    Jn = jnp.einsum("...ia,...ji,...jb->...ab", B_out, R, B)   # (2, 2)
    Jd = jnp.einsum("...i,...ib->...b", t, B)                   # (2,)
    dtype = plane.dtype
    top = jnp.concatenate([Jn, jnp.zeros(Jn.shape[:-1] + (1,), dtype)], -1)
    bot = jnp.concatenate([Jd, jnp.ones(Jd.shape[:-1] + (1,), dtype)],
                          -1)[..., None, :]
    return jnp.concatenate([top, bot], axis=-2)


@jax.jit
def transform_plane_cov(plane, cov3, pose: se3.Pose):
    """Push a plane + its (2+1) tangent covariance through a pose.

    The addPlaneFactor projection ``S_upj = J S_upi J^T``
    (gtsam_graph.cpp:1162) with J computed by autodiff on the chart.
    Jitted whole: the rescue host step calls it per observation, and the
    eager form costs ~8 dispatches per plane on remote-attached backends.
    """
    J = _transform_jacobian(plane, pose.R, pose.t)
    out = oriented_plane.transform(plane, pose.R, pose.t)
    return out, J @ cov3 @ J.T


def plane_to_world(plane_body, pose_world: se3.Pose):
    """Body-frame plane -> world landmark: transform by the inverse pose."""
    inv = se3.inverse(pose_world)
    return oriented_plane.transform(plane_body, inv.R, inv.t)


def match_plane(plane_obs, landmark_world_list, pose_world: se3.Pose,
                cos_thresh: float = np.cos(10.0 * np.pi / 180.0),
                d_thresh: float = 0.2):
    """Return the index of the matching landmark or -1.

    ``plane_obs`` is in the observation (body) frame; each candidate world
    landmark is transformed into that frame and compared by normal angle
    and distance offset, with the reference's sign-flip handling.
    """
    if len(landmark_world_list) == 0:
        return -1
    cands = jnp.stack(landmark_world_list)
    pred = oriented_plane.transform(
        cands, jnp.broadcast_to(pose_world.R, (len(landmark_world_list), 3, 3)),
        jnp.broadcast_to(pose_world.t, (len(landmark_world_list), 3)))
    ni = jnp.asarray(plane_obs)
    cosa = pred[:, :3] @ ni[:3]
    sign = jnp.where(cosa < 0, -1.0, 1.0)
    cosa = cosa * sign
    dd = jnp.abs(sign * ni[3] - pred[:, 3])
    ok = (cosa >= cos_thresh) & (dd <= d_thresh)
    score = jnp.where(ok, cosa, -jnp.inf)
    best = int(jnp.argmax(score))
    return best if bool(ok[best]) else -1


@dataclasses.dataclass
class PlaneLandmarkBook:
    """Host-side landmark registry: ids, last-seen node, counts, window."""

    lookback: int = 7

    def __post_init__(self):
        self.world: list[np.ndarray] = []      # initial world plane values
        self.last_seen: list[int] = []
        self.seen_count: list[int] = []
        self.node_landmarks: dict[int, list[int]] = {}

    def candidates(self, node_id: int) -> list[int]:
        """Landmark ids observed in the last ``lookback`` nodes."""
        out: list[int] = []
        for nid in range(max(0, node_id - self.lookback), node_id + 1):
            for lid in self.node_landmarks.get(nid, []):
                if lid not in out:
                    out.append(lid)
        return out

    def observe(self, node_id: int, lid: int) -> None:
        """Record a re-observation of a known landmark (propagation-carried
        ids skip the geometric match, gtsam_graph.cpp:1030-1035)."""
        self.last_seen[lid] = node_id
        self.seen_count[lid] += 1
        self.node_landmarks.setdefault(node_id, []).append(lid)

    def associate(self, node_id: int, plane_body, pose_world: se3.Pose,
                  cos_thresh: float = np.cos(10.0 * np.pi / 180.0),
                  d_thresh: float = 0.2) -> tuple[int, bool]:
        """Return (landmark_id, is_new) for a body-frame observation.

        Pure NumPy on host: the candidate set is tiny (<= the 7-node
        window's landmarks) and the match math is a handful of dot
        products — dispatching it to a device per candidate would
        dominate the rescue host step on remote-attached backends. Same
        semantics as the jitted ``match_plane`` (pinned by tests).
        """
        cand_ids = self.candidates(node_id)
        R = np.asarray(pose_world.R)
        t = np.asarray(pose_world.t)
        ni = np.asarray(plane_body, np.float64)
        best, best_cos = -1, -np.inf
        for lid_ in cand_ids:
            w = self.world[lid_]
            # oriented_plane.transform(w, R, t): n' = R^T n, d' = d + n.t
            n_pred = R.T @ w[:3]
            d_pred = w[3] + w[:3] @ t
            c = float(n_pred @ ni[:3])
            sign = -1.0 if c < 0 else 1.0
            c *= sign
            if (c >= cos_thresh and abs(sign * ni[3] - d_pred) <= d_thresh
                    and c > best_cos):
                best, best_cos = lid_, c
        if best >= 0:
            self.last_seen[best] = node_id
            self.seen_count[best] += 1
            self.node_landmarks.setdefault(node_id, []).append(best)
            return best, False
        lid = len(self.world)
        # plane_to_world in NumPy: transform by the inverse pose
        # (Ri, ti) = (R^T, -R^T t) -> n_w = R n, d_w = d - n . (R^T t)
        w = np.concatenate([R @ ni[:3],
                            [ni[3] - ni[:3] @ (R.T @ t)]])
        self.world.append(w)
        self.last_seen.append(node_id)
        self.seen_count.append(1)
        self.node_landmarks.setdefault(node_id, []).append(lid)
        return lid, True
