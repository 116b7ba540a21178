"""Chordal initialization for SE(3) pose graphs.

The reference initializes every new pose by composing the previous estimate
with the incoming relative measurement (gtsam_graph.cpp:630-695 composes the
initial estimate from the predecessor), so a batch solve starts from pure
odometry — far from the basin on long loopy graphs. GTSAM ships
``InitializePose3`` (chordal relaxation) for exactly this; the reference
never calls it and pays in LM iterations.

This is the TPU-native equivalent. Both stages are one dense linear solve
assembled by scatter-add of 3x3 blocks — MXU-dense Cholesky, no Bayes tree:

1. **Rotation stage** (chordal relaxation, Martinec & Pajdla CVPR'07 /
   Carlone et al. ICRA'15): relax ``R_j = R_i R_ij`` to a linear system in
   the rotation *rows*. With ``y_p^c`` = c-th row of ``R_p``, each edge
   gives ``y_j^c = R_ij^T y_i^c`` — the three rows decouple and share one
   (3P, 3P) graph-Laplacian normal matrix with three right-hand sides.
   The linear solution is projected back to SO(3) per pose by SVD.
2. **Translation stage**: with rotations fixed, ``t_j - t_i = R_i t_ij``
   is linear in all translations — same Laplacian sparsity, one RHS.

Anchoring comes from the graph's own prior-pose rows (the reference's
first-node prior, gtsam_graph.cpp:332-345). Unused arena slots keep their
original values.

On the sphere2500 class this lands within a hair of the optimum before the
first nonlinear iteration, cutting GN/LM work by an order of magnitude
(see ``bench.py --single chordal``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .variables import VariableArena

__all__ = ["chordal_initialize", "project_so3"]


def project_so3(A):
    """Nearest rotation(s) to ``A`` (..., 3, 3) in Frobenius norm, via SVD."""
    U, _, Vt = jnp.linalg.svd(A)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(A.shape[:-2] + (2,), A.dtype), det[..., None]], axis=-1)
    return (U * D[..., None, :]) @ Vt


def _scatter_block(M, bi, bj, blocks):
    """Add (F, 3, 3) blocks into the flat (3P, 3P) matrix at block
    coordinates (bi, bj) — duplicate indices accumulate.

    NOTE: a (P, P, 3, 3) block layout would be the natural expression, but
    TPU tile padding expands trailing (3, 3) dims to (8, 128) tiles — a
    measured 56.9x memory blowup (12.3 GB at P=2560). Scattering straight
    into the flat matrix keeps the trailing dims tile-sized.
    """
    r3 = jnp.arange(3)
    rows = 3 * bi[:, None, None] + r3[None, :, None]
    cols = 3 * bj[:, None, None] + r3[None, None, :]
    return M.at[rows, cols].add(blocks)


def _solve_spd(Mfull, rhs):
    """Cholesky solve; rhs (3P, k) -> (P, 3, k)."""
    P3 = Mfull.shape[0]
    L = jnp.linalg.cholesky(Mfull)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    sol = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return sol.reshape(P3 // 3, 3, rhs.shape[-1])


@jax.jit
def chordal_initialize(graph, values: VariableArena,
                       anchor_weight: float = 1e4) -> VariableArena:
    """Replace the arena's poses with a chordal-relaxation initialization.

    Uses the graph's active ``between`` rows as relative-rotation /
    relative-translation constraints and its active ``prior_pose`` rows as
    anchors. Everything else in the arena (velocities, biases, landmarks,
    unused pose slots) is untouched.
    """
    bt = graph.between
    pp = graph.prior_pose
    dt = values.pose_t.dtype
    P = values.pose_R.shape[0]

    w_e = bt.active.astype(dt)                       # (F,)
    i, j = bt.i, bt.j
    Q = bt.meas_R.transpose(0, 2, 1).astype(dt)      # R_ij^T per edge
    I3 = jnp.eye(3, dtype=dt)
    eyeF = w_e[:, None, None] * I3

    w_a = pp.active.astype(dt) * jnp.asarray(anchor_weight, dt)
    a = pp.idx

    # slots with no constraint at all: pin to identity so Cholesky holds
    diag_mass = jnp.zeros((P,), dt).at[i].add(w_e).at[j].add(w_e).at[a].add(w_a)
    loose = (diag_mass == 0).astype(dt)
    diag_fix = jnp.repeat(loose, 3) + jnp.asarray(1e-8, dt)
    didx = jnp.arange(3 * P)

    # --- rotation stage -------------------------------------------------
    M = jnp.zeros((3 * P, 3 * P), dt)
    M = _scatter_block(M, i, i, eyeF)                # Q^T Q = I
    M = _scatter_block(M, j, j, eyeF)
    M = _scatter_block(M, i, j, -w_e[:, None, None] * Q.transpose(0, 2, 1))
    M = _scatter_block(M, j, i, -w_e[:, None, None] * Q)
    M = _scatter_block(M, a, a, w_a[:, None, None] * I3)
    M = M.at[didx, didx].add(diag_fix)
    rhs = jnp.zeros((P, 3, 3), dt)
    rhs = rhs.at[a].add(
        w_a[:, None, None] * pp.mean_R.transpose(0, 2, 1).astype(dt))

    Yb = _solve_spd(M, rhs.reshape(3 * P, 3))        # (P,3,3) = R^T
    R_est = project_so3(Yb.transpose(0, 2, 1))

    # --- translation stage ----------------------------------------------
    L = jnp.zeros((3 * P, 3 * P), dt)
    L = _scatter_block(L, i, i, eyeF)
    L = _scatter_block(L, j, j, eyeF)
    L = _scatter_block(L, i, j, -eyeF)
    L = _scatter_block(L, j, i, -eyeF)
    L = _scatter_block(L, a, a, w_a[:, None, None] * I3)
    L = L.at[didx, didx].add(diag_fix)
    b_e = w_e[:, None] * jnp.einsum(
        "fab,fb->fa", R_est[i], bt.meas_t.astype(dt))
    g = jnp.zeros((P, 3), dt)
    g = g.at[j].add(b_e).at[i].add(-b_e)
    g = g.at[a].add(w_a[:, None] * pp.mean_t.astype(dt))

    t_est = _solve_spd(L, g.reshape(3 * P, 1))[:, :, 0]

    # keep original values on slots the system knows nothing about
    keep = loose.astype(bool)
    pose_R = jnp.where(keep[:, None, None], values.pose_R, R_est)
    pose_t = jnp.where(keep[:, None], values.pose_t, t_est)
    return values._replace(pose_R=pose_R, pose_t=pose_t)
