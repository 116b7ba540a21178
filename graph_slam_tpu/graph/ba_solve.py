"""Schur-complement landmark elimination for bundle adjustment.

The classic BA trick the reference gets from GTSAM's elimination ordering:
eliminate the (many) Point3 landmarks first, solve the reduced camera
system, back-substitute. TPU formulation: the pose-landmark coupling ``U``
is kept as a dense (Dp, 3*Nq) matrix so the reduced Hessian

    S = A - U L^-1 U^T

is two large matmuls (MXU) plus a batched 3x3 block inverse — exactly the
shape accelerators like. Point blocks ``L`` are segment-sums of per-factor
3x3 outer products. Used by the BA+IMU pipeline and the 10k-landmark
stress benchmark.

Precision note: the reduction cancels catastrophically in pure f32, so it
runs in f64 when x64 is enabled (CPU/offline parity runs). On f32-only
accelerator runs prefer the matrix-free PCG path (``gn_optimize(solver=
"pcg")``) — its Hessian-vector products never form the cancelling
difference and stay f32-stable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import factors as F
from .factors import FactorGraph, total_error
from .variables import VariableArena, layout_of, retract_all, used_slot_mask

__all__ = ["schur_gn_step", "ba_gn_optimize"]


def _nonpoint_blocks(graph: FactorGraph, values: VariableArena, lay):
    """(r, J, cols) for every table that touches no point landmark."""
    blocks = []
    if graph.prior_pose.idx.shape[0]:
        r, J = F._prior_pose_lin(values, graph.prior_pose)
        blocks.append((r, J, lay.pose_cols(graph.prior_pose.idx)))
    if graph.between.i.shape[0]:
        r, J = F._between_lin(values, graph.between)
        cols = jnp.concatenate(
            [lay.pose_cols(graph.between.i), lay.pose_cols(graph.between.j)],
            axis=-1)
        blocks.append((r, J, cols))
    if graph.prior_vel.idx.shape[0]:
        r, J = F._prior_vec3_lin(values, graph.prior_vel)
        blocks.append((r, J, lay.vel_cols(graph.prior_vel.idx)))
    if graph.prior_bias.idx.shape[0]:
        r, J = F._prior_vec6_lin(values, graph.prior_bias)
        blocks.append((r, J, lay.bias_cols(graph.prior_bias.idx)))
    if graph.plane.pose_idx.shape[0]:
        r, J = F._plane_lin(values, graph.plane)
        cols = jnp.concatenate(
            [lay.pose_cols(graph.plane.pose_idx),
             lay.plane_cols(graph.plane.plane_idx)], axis=-1)
        blocks.append((r, J, cols))
    if graph.imu.i.shape[0]:
        r, J = F._imu_lin(values, graph.imu)
        cols = jnp.concatenate(
            [lay.pose_cols(graph.imu.i), lay.vel_cols(graph.imu.i),
             lay.bias_cols(graph.imu.i),
             lay.pose_cols(graph.imu.j), lay.vel_cols(graph.imu.j),
             lay.bias_cols(graph.imu.j)], axis=-1)
        blocks.append((r, J, cols))
    return blocks


def schur_gn_step(graph: FactorGraph, values: VariableArena, damping):
    """One GN step with point landmarks eliminated by Schur complement."""
    lay = layout_of(values)
    Dp = lay.point_off               # non-point tangent dims
    Pq = lay.point_cap
    dtype = values.pose_t.dtype
    mask = used_slot_mask(values)
    mask_p = mask[:Dp]

    A = jnp.diag(1.0 - mask_p) + damping * jnp.eye(Dp, dtype=dtype)
    g_p = jnp.zeros(Dp, dtype)
    g_q = jnp.zeros((Pq, 3), dtype)
    U = jnp.zeros((Dp, Pq, 3), dtype)
    live_q = (jnp.arange(Pq) < values.num_points).astype(dtype)
    Lblk = (damping * live_q + (1.0 - live_q))[:, None, None] \
        * jnp.eye(3, dtype=dtype)

    for r, J, cols in _nonpoint_blocks(graph, values, lay):
        A = A.at[cols[:, :, None], cols[:, None, :]].add(
            jnp.einsum("fei,fej->fij", J, J))
        g_p = g_p.at[cols].add(jnp.einsum("fei,fe->fi", J, r))

    if graph.projection.pose_idx.shape[0]:
        r, J = F._projection_lin(values, graph.projection)
        Jp, Jq = J[:, :, :6], J[:, :, 6:]
        cp = lay.pose_cols(graph.projection.pose_idx)
        qidx = graph.projection.point_idx
        A = A.at[cp[:, :, None], cp[:, None, :]].add(
            jnp.einsum("fei,fej->fij", Jp, Jp))
        g_p = g_p.at[cp].add(jnp.einsum("fei,fe->fi", Jp, r))
        g_q = g_q.at[qidx].add(jnp.einsum("fei,fe->fi", Jq, r))
        U = U.at[cp, qidx[:, None]].add(
            jnp.einsum("fei,fej->fij", Jp, Jq))
        Lblk = Lblk.at[qidx].add(jnp.einsum("fei,fej->fij", Jq, Jq))

    if graph.prior_point.idx.shape[0]:
        r, J = F._prior_point_lin(values, graph.prior_point)
        qidx = graph.prior_point.idx
        g_q = g_q.at[qidx].add(jnp.einsum("fei,fe->fi", J, r))
        Lblk = Lblk.at[qidx].add(jnp.einsum("fei,fej->fij", J, J))

    # The Schur reduction S = A - U L^-1 U^T cancels catastrophically in
    # f32 (both terms are ~1e10-1e13 for pixel-whitened BA while S itself
    # is orders smaller), so the reduction and the reduced solve run in
    # f64 regardless of the arena dtype. The heavy per-factor work above
    # stays in the arena dtype; only (Dp, 3Pq)-sized operands upcast.
    rd = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    U64 = U.astype(rd)
    A64 = A.astype(rd)
    gq64 = g_q.astype(rd)
    gp64 = g_p.astype(rd)

    # batched 3x3 inverse of the point blocks
    Linv = jnp.linalg.inv(Lblk.astype(rd))

    # S = A - U L^-1 U^T via (Dp, Pq, 3) einsums -> MXU matmuls
    WL = jnp.einsum("dqi,qij->dqj", U64, Linv)
    S = A64 - jnp.einsum("dqj,eqj->de", WL, U64)

    Lg = jnp.einsum("qij,qj->qi", Linv, gq64)
    rhs = -(gp64 - jnp.einsum("dqj,qj->d", U64, Lg))
    Lc = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(Lc, rhs, lower=True)
    dp = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)

    # back-substitute the landmarks
    Ut_dp = jnp.einsum("dqj,d->qj", U64, dp)
    dq = -jnp.einsum("qij,qj->qi", Linv, gq64 + Ut_dp).reshape(-1)

    delta = jnp.concatenate([dp, dq]).astype(dtype)
    return retract_all(values, delta)


@functools.partial(jax.jit, static_argnames=("iterations",))
def ba_gn_optimize(graph: FactorGraph, values: VariableArena,
                   iterations: int = 8, damping: float = 1e-6):
    """GN with Schur elimination, fixed trip count."""

    def body(vals, _):
        return schur_gn_step(graph, vals,
                             jnp.asarray(damping, vals.pose_t.dtype)), None

    values, _ = jax.lax.scan(body, values, None, length=iterations)
    return values, total_error(graph, values)
