"""TSDF fusion: dense volumetric mapping, one fused grid update per frame.

The reference's mapping tier accumulates raw point clouds and meshes them
with greedy projection triangulation (mapping_PCD.cpp, pcd2mesh.cpp) —
noisy, unbounded memory, no surface averaging. This is the volumetric
upgrade: a truncated signed distance field over a fixed voxel grid,
integrated by projective association (KinectFusion-style).

The integration is exactly the TPU's kind of work: every frame update is
ONE jitted elementwise pass over the full (N, N, N) grid — transform all
voxel centers into the camera, project, gather depth, clamp, running
average — with the grid buffers donated, so fusing a frame never
allocates. No scatter, no sparsity bookkeeping.

Surface extraction is marching tetrahedra (6-tet cube decomposition,
16-case table built at import) in NumPy — an offline writer, like every
reference mapping tool.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraIntrinsics
from ..core import se3

__all__ = ["TsdfVolume", "make_volume", "integrate", "extract_mesh",
           "fuse_trajectory"]


class TsdfVolume(NamedTuple):
    tsdf: jnp.ndarray     # (N, N, N) f32 in [-1, 1] (1 = free / far)
    weight: jnp.ndarray   # (N, N, N) f32
    origin: jnp.ndarray   # (3,) world position of voxel (0,0,0) corner
    voxel: jnp.ndarray    # () voxel edge length in meters


def make_volume(origin, size_m: float, n: int = 128,
                dtype=jnp.float32) -> TsdfVolume:
    """Cubic volume with corner at ``origin`` spanning ``size_m`` meters."""
    return TsdfVolume(
        tsdf=jnp.ones((n, n, n), dtype),
        weight=jnp.zeros((n, n, n), dtype),
        origin=jnp.asarray(origin, dtype),
        voxel=jnp.asarray(size_m / n, dtype),
    )


@functools.partial(jax.jit, static_argnames=("K", "trunc_vox", "w_max"),
                   donate_argnums=(0,))
def integrate(vol: TsdfVolume, K: CameraIntrinsics, depth, pose_R, pose_t,
              trunc_vox: float = 4.0, w_max: float = 64.0,
              z_min: float = 0.05, z_max: float = 10.0) -> TsdfVolume:
    """Fuse one depth frame taken from camera-to-world pose (R, t).

    Projective TSDF: for every voxel, sdf = observed depth along the
    voxel's pixel ray minus the voxel's camera depth, truncated at
    ``trunc_vox`` voxels and averaged into the grid (weight capped at
    ``w_max`` so the map can still adapt). Pinhole projection without
    distortion — fine at mapping resolution.
    """
    n = vol.tsdf.shape[0]
    dt = vol.tsdf.dtype
    depth = jnp.asarray(depth, dt)
    h, w = depth.shape
    trunc = trunc_vox * vol.voxel

    idx = (jnp.arange(n, dtype=dt) + 0.5) * vol.voxel
    px = vol.origin[0] + idx[:, None, None]
    py = vol.origin[1] + idx[None, :, None]
    pz = vol.origin[2] + idx[None, None, :]
    # world -> camera: p_c = R^T (p_w - t)
    dx, dy, dz = px - pose_t[0], py - pose_t[1], pz - pose_t[2]
    cx_ = pose_R[0, 0] * dx + pose_R[1, 0] * dy + pose_R[2, 0] * dz
    cy_ = pose_R[0, 1] * dx + pose_R[1, 1] * dy + pose_R[2, 1] * dz
    cz_ = pose_R[0, 2] * dx + pose_R[1, 2] * dy + pose_R[2, 2] * dz

    safe_z = jnp.where(cz_ > 1e-6, cz_, 1.0)
    u = K.fx * cx_ / safe_z + K.cx
    v = K.fy * cy_ / safe_z + K.cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
    d = depth[vi, ui]

    in_view = ((cz_ > z_min) & (u >= 0) & (u <= w - 1)
               & (v >= 0) & (v <= h - 1) & (d > z_min) & (d < z_max))
    sdf = d - cz_
    upd = in_view & (sdf > -trunc)
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)

    w_old = vol.weight
    w_new = jnp.where(upd, jnp.minimum(w_old + 1.0, w_max), w_old)
    t_new = jnp.where(
        upd, (vol.tsdf * w_old + tsdf_obs) / jnp.maximum(w_old + 1.0, 1.0),
        vol.tsdf)
    return vol._replace(tsdf=t_new, weight=w_new)


# ---------------------------------------------------------------------------
# Marching tetrahedra (host-side extraction)

# 6-tet decomposition of a cube around the 0-7 diagonal (each tet is a
# bit-monotone path 0 -> a -> b -> 7); cube corner k = (k>>2, k>>1, k) & 1
_TETS = np.array([(0, 5, 1, 7), (0, 1, 3, 7), (0, 3, 2, 7),
                  (0, 2, 6, 7), (0, 6, 4, 7), (0, 4, 5, 7)], dtype=np.int64)

# tet edge list: local corner pairs
_TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
                      dtype=np.int64)


def _build_mt_table():
    """16-case marching-tetrahedra table: up to 2 triangles per case, each
    triangle = 3 edge ids into ``_TET_EDGES``; -1 pads."""
    table = -np.ones((16, 6), np.int64)
    edge_id = {(a, b): k for k, (a, b) in enumerate(map(tuple, _TET_EDGES))}
    edge_id.update({(b, a): k for (a, b), k in list(edge_id.items())})

    def edges_from(c, others):
        return [edge_id[(c, o)] for o in others]

    for case in range(1, 15):
        inside = [c for c in range(4) if case >> c & 1]
        if len(inside) == 1:
            c = inside[0]
            others = [o for o in range(4) if o != c]
            table[case, :3] = edges_from(c, others)
        elif len(inside) == 3:
            c = [o for o in range(4) if o not in inside][0]
            others = [o for o in range(4) if o != c]
            table[case, :3] = edges_from(c, others)
        else:  # 2-2 split: quad ring -> two triangles
            a, b = inside
            o1, o2 = [o for o in range(4) if o not in inside]
            ring = [edge_id[(a, o1)], edge_id[(b, o1)],
                    edge_id[(b, o2)], edge_id[(a, o2)]]
            table[case, :3] = [ring[0], ring[1], ring[2]]
            table[case, 3:] = [ring[0], ring[2], ring[3]]
    return table


_MT_TABLE = _build_mt_table()


def extract_mesh(vol: TsdfVolume, min_weight: float = 1.0):
    """Zero-isosurface of the fused TSDF as (vertices (V,3), faces (F,3)).

    Marching tetrahedra over every cube whose 8 corners are all observed
    (weight >= min_weight) and whose values straddle zero. NumPy, offline.
    """
    tsdf = np.asarray(vol.tsdf, np.float64)
    wgt = np.asarray(vol.weight)
    origin = np.asarray(vol.origin, np.float64)
    voxel = float(vol.voxel)
    n = tsdf.shape[0]

    corner = np.array([(k >> 2 & 1, k >> 1 & 1, k & 1) for k in range(8)],
                      np.int64)                        # (8, 3)
    # candidate cubes: fully observed + sign change among corners
    vals8 = np.stack([tsdf[c[0]:n - 1 + c[0] or None,
                           c[1]:n - 1 + c[1] or None,
                           c[2]:n - 1 + c[2] or None] for c in corner])
    wt8 = np.stack([wgt[c[0]:n - 1 + c[0] or None,
                        c[1]:n - 1 + c[1] or None,
                        c[2]:n - 1 + c[2] or None] for c in corner])
    observed = (wt8 >= min_weight).all(0)
    neg = (vals8 < 0).any(0)
    pos = (vals8 >= 0).any(0)
    cand = observed & neg & pos                        # (n-1, n-1, n-1)
    cz = np.argwhere(cand)                             # (M, 3)
    if len(cz) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    # per-cube corner positions + values
    cpos = (cz[:, None, :] + corner[None]) * voxel \
        + origin + 0.5 * voxel                         # (M, 8, 3) centers
    cval = vals8[:, cand.nonzero()[0], cand.nonzero()[1],
                 cand.nonzero()[2]].T                  # (M, 8)

    tris = []
    for tet in _TETS:
        tv = cval[:, tet]                              # (M, 4)
        tp = cpos[:, tet]                              # (M, 4, 3)
        case = ((tv < 0) << np.arange(4)).sum(1)       # (M,)
        rows = _MT_TABLE[case]                         # (M, 6)
        # interpolated vertex on each of the 6 tet edges
        a = _TET_EDGES[:, 0]
        b = _TET_EDGES[:, 1]
        va, vb = tv[:, a], tv[:, b]                    # (M, 6)
        tfrac = va / np.where(np.abs(va - vb) < 1e-12, 1e-12, va - vb)
        tfrac = np.clip(tfrac, 0.0, 1.0)
        everts = tp[:, a] + tfrac[..., None] * (tp[:, b] - tp[:, a])
        for t0 in (0, 3):
            sel = rows[:, t0] >= 0
            if not sel.any():
                continue
            e = rows[sel, t0:t0 + 3]                   # (S, 3)
            vv = everts[sel]                           # (S, 6, 3)
            tris.append(np.stack([vv[np.arange(len(e)), e[:, k]]
                                  for k in range(3)], axis=1))
    if not tris:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    soup = np.concatenate(tris)                        # (T, 3, 3)
    # weld vertices on a 1e-6 grid
    flat = soup.reshape(-1, 3)
    keys = np.round(flat / (1e-6 * voxel)).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3))
    verts[inv] = flat
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]


def fuse_trajectory(traj, frames, K: CameraIntrinsics, origin,
                    size_m: float, n: int = 128, stride: int = 1,
                    u2c: se3.Pose | None = None, trunc_vox: float = 4.0):
    """Fuse every ``stride``-th trajectory frame into a fresh volume.

    ``traj``: io.Trajectory (camera/IMU-to-world poses, w-x-y-z quats);
    ``frames``: seq_id -> (intensity, depth_m) | None.
    """
    from ..core import so3

    vol = make_volume(origin, size_m, n)
    for k in range(0, len(traj.ids), stride):
        got = frames(int(traj.seq[k]))
        if got is None:
            continue
        _, depth = got
        R = so3.quat_to_matrix(jnp.asarray(traj.quat[k]))
        t = jnp.asarray(traj.t[k])
        pose = se3.Pose(R, t)
        if u2c is not None:
            pose = se3.compose(pose, u2c)
        vol = integrate(vol, K, depth, pose.R, pose.t, trunc_vox=trunc_vox)
    return vol
