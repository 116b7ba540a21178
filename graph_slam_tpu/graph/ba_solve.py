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
accelerators use ``ba_gn_optimize_sqrt`` — the square-root (QR) form of
the same elimination, which assembles the reduced system from
orthogonally-projected rows and never forms the cancelling difference —
or the matrix-free PCG path (``gn_optimize(solver="pcg")``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import factors as F
from .factors import FactorGraph, total_error
from .variables import VariableArena, layout_of, retract_all, used_slot_mask

__all__ = ["schur_gn_step", "ba_gn_optimize",
           "build_point_obs", "sqrt_schur_gn_step", "ba_gn_optimize_sqrt"]


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


# ---------------------------------------------------------------------------
# Square-root (QR) Schur elimination — the f32-stable, MXU-dense variant.
#
# The normal-equations reduction above forms S = A - U L^-1 U^T, whose two
# terms are ~1e10-1e13 for pixel-whitened BA while S itself is orders
# smaller — catastrophic cancellation in f32. The square-root form never
# forms that difference: each landmark's observation rows are stacked as
#
#     M_q = [ J_q (2K x 3) | J_p blockdiag (2K x 6K) | r (2K x 1) ]
#           [ L^T          | 0                       | L^-1 g     ]
#
# where the prior rows and damping-guard rows are pre-merged into ONE
# 3-row block [L^T | 0 | L^-1 g] (L = closed-form 3x3 Cholesky of
# sum_p J_p^T J_p + lambda I) — exact in the normal equations, and it
# keeps the per-landmark stack at 2K+3 rows so only observation rows
# survive into the reduced assembly. ONE thin QR per landmark (vmapped;
# multifrontal elimination, cf. GTSAM's sequential elimination on Q()
# landmarks, /root/reference/gtsam/gtsam_graph.cpp:370-448) splits it
# into the landmark rows R[:3] (kept for back-substitution) and
# ORTHOGONALLY REDUCED pose rows R[3:, 3:]. The reduced camera Hessian
# is assembled as
# sums of PSD outer products of those already-projected rows — every term
# of modest magnitude, so the whole step is f32-stable — and the
# accumulation is one big (C*nred, Dp)^T (C*nred, Dp) matmul per landmark
# chunk: exactly the dense MXU shape the reduction above only approximates.
# Algebraically identical to the damped Schur complement, so the x64 path
# pins it against `schur_gn_step` in tests.
# ---------------------------------------------------------------------------


def build_point_obs(graph: FactorGraph, point_cap: int):
    """Host-side landmark->observation index tables (static sparsity).

    Returns ``(obs_idx (Pq, K) int32, obs_valid (Pq, K) bool,
    prior_row (Pq, P) int32, prior_valid (Pq, P) bool)`` where ``obs_idx``
    rows list this landmark's ACTIVE projection-table rows (K = max
    observation count, zero-padded) and ``prior_row`` its prior_point-table
    rows (P = max priors per landmark; several priors on one landmark all
    ride the QR stack, matching the accumulating solvers).
    """
    import numpy as np

    pj = graph.projection
    pidx = np.asarray(pj.point_idx)
    act = np.asarray(pj.active)
    per = [[] for _ in range(point_cap)]
    for f in np.flatnonzero(act):
        per[int(pidx[f])].append(int(f))
    K = max(1, max((len(p) for p in per), default=1))
    obs_idx = np.zeros((point_cap, K), np.int32)
    obs_valid = np.zeros((point_cap, K), bool)
    for q, rows in enumerate(per):
        obs_idx[q, :len(rows)] = rows
        obs_valid[q, :len(rows)] = True

    per_pr = [[] for _ in range(point_cap)]
    pp = graph.prior_point
    if pp.idx.shape[0]:
        qi = np.asarray(pp.idx)
        for f in np.flatnonzero(np.asarray(pp.active)):
            per_pr[int(qi[f])].append(int(f))
    # P = 0 when no landmark has a prior (prior terms merge into the kept
    # 3-row block of the QR stack, so P only sizes the per-landmark
    # H = sum J^T J gather — zero-width is free)
    P = max((len(p) for p in per_pr), default=0)
    prior_row = np.zeros((point_cap, P), np.int32)
    prior_valid = np.zeros((point_cap, P), bool)
    for q, rows in enumerate(per_pr):
        prior_row[q, :len(rows)] = rows
        prior_valid[q, :len(rows)] = True
    return obs_idx, obs_valid, prior_row, prior_valid


def _eliminate3(M):
    """Orthogonally zero the first 3 columns with 3 batched Householder
    reflections (the first 3 steps of QR).

    Rows ``0:3`` come out as ``[R3 | E | c1]`` with ``R3`` upper
    triangular; rows ``3:`` are the orthogonally reduced factor. Written
    as explicit reflections — batched einsums on (Pq, m, n) operands —
    because XLA's generic ``jnp.linalg.qr`` lowers to a blocked
    Householder while-loop that runs poorly for many tiny matrices on
    TPU, and only 3 of the ~29 columns ever need eliminating.
    """
    dt = M.dtype
    for c in range(3):
        x = M[:, c:, c]                                   # (Pq, m-c)
        nx = jnp.sqrt(jnp.sum(x * x, axis=1))
        sgn = jnp.where(x[:, 0] >= 0, 1.0, -1.0).astype(dt)
        alpha = -sgn * nx
        v = x.at[:, 0].add(-alpha)                        # x - alpha*e1
        vn = jnp.sqrt(jnp.sum(v * v, axis=1))
        inv = jnp.where(vn > 1e-30, 1.0 / jnp.where(vn > 1e-30, vn, 1.0),
                        0.0)
        v = v * inv[:, None]
        w = jnp.einsum("pi,pij->pj", v, M[:, c:, :])
        M = M.at[:, c:, :].add(-2.0 * v[:, :, None] * w[:, None, :])
    return M


def _landmark_qr_reduce(graph: FactorGraph, values: VariableArena, lay,
                        obs_idx, obs_valid, prior_row, prior_valid,
                        q_ids, damping, chunk: int,
                        assembly_precision=None):
    """Per-landmark QR elimination + chunked dense reduction.

    ``q_ids`` are the GLOBAL landmark indices of these table rows (just
    ``arange(Pq)`` single-device; a shard's slice under ``shard_map``).
    Returns the landmark-partial ``(S, g)`` (no damping/priors/non-point
    terms — callers psum then add those once) plus the back-substitution
    pieces ``(R3, E, c1, cp_flat, live)``.

    ``assembly_precision`` overrides the matmul precision of the reduced-
    system accumulation ONLY (the ``S = d2^T d2`` outer products and the
    one-hot column relocation feeding them). The summands are orthogonally
    reduced rows — a PSD accumulation with no cancellation — so bf16x3
    (``"high"``) keeps the GN optimum while roughly doubling MXU
    throughput vs the package-default multi-pass f32 (``"highest"``);
    ``None`` inherits the global default. Per-landmark QR, residuals and
    the reduced Cholesky always stay at the default precision.
    """
    Dp = lay.point_off
    dt = values.pose_t.dtype
    Pq, K = obs_idx.shape

    # --- per-landmark stacked blocks --------------------------------------
    r_all, J_all = F._projection_lin(values, graph.projection)
    Jp_all, Jq_all = J_all[:, :, :6], J_all[:, :, 6:]
    cp_all = lay.pose_cols(graph.projection.pose_idx)     # (F, 6)

    v = obs_valid.astype(dt)                              # (Pq, K)
    Jq_g = Jq_all[obs_idx] * v[:, :, None, None]          # (Pq, K, 2, 3)
    Jp_g = Jp_all[obs_idx] * v[:, :, None, None]          # (Pq, K, 2, 6)
    r_g = r_all[obs_idx] * v[:, :, None]                  # (Pq, K, 2)
    cp_g = cp_all[obs_idx]                                # (Pq, K, 6)

    nloc = 6 * K
    Mq = Jq_g.reshape(Pq, 2 * K, 3)
    Mp = jnp.zeros((Pq, 2 * K, nloc), dt)
    for k in range(K):                                    # static K, tiny
        Mp = Mp.at[:, 2 * k:2 * k + 2, 6 * k:6 * k + 6].set(Jp_g[:, k])
    Mr = r_g.reshape(Pq, 2 * K, 1)

    live = (q_ids < values.num_points).astype(dt)
    Ppr = prior_row.shape[1]
    # Landmark priors and the damping/dead-landmark guard share the same
    # row sparsity [A3 | 0 | c], so they MERGE EXACTLY into one 3-row
    # block: H = sum_p Jp^T Jp + lambda*I (PD), rows [L^T | 0 | L^-1 g]
    # with L its closed-form 3x3 Cholesky reproduce H and g = sum Jp^T rp
    # in the normal equations. Separate prior + damp rows cost 3*Ppr + 3
    # reduced rows of 2K+3*Ppr+3 in EVERY downstream assembly matmul —
    # 27% of the dominant S-assembly on the every-landmark-priored 100k
    # stress config (nred 11 -> 8).
    if graph.prior_point.idx.shape[0] and Ppr:
        rp_all, Jp3_all = F._prior_point_lin(values, graph.prior_point)
        pv = prior_valid.astype(dt)
        Jpr = Jp3_all[prior_row] * pv[:, :, None, None]   # (Pq, Ppr, 3, 3)
        rpr = rp_all[prior_row] * pv[:, :, None]          # (Pq, Ppr, 3)
        Hp = jnp.einsum("qpij,qpik->qjk", Jpr, Jpr)
        gp = jnp.einsum("qpij,qpi->qj", Jpr, rpr)
    else:
        Hp = jnp.zeros((Pq, 3, 3), dt)
        gp = jnp.zeros((Pq, 3), dt)
    lam = damping * live + (1.0 - live)   # dead landmark -> identity guard
    Hp = Hp + lam[:, None, None] * jnp.eye(3, dtype=dt)
    # closed-form batched 3x3 Cholesky + forward solve (six fused
    # elementwise ops; H is PD by construction for damping > 0)
    tiny = jnp.asarray(1e-30, dt)
    l11 = jnp.sqrt(jnp.maximum(Hp[:, 0, 0], tiny))
    l21 = Hp[:, 1, 0] / l11
    l31 = Hp[:, 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(Hp[:, 1, 1] - l21 * l21, tiny))
    l32 = (Hp[:, 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(Hp[:, 2, 2] - l31 * l31 - l32 * l32, tiny))
    c1p = gp[:, 0] / l11
    c2p = (gp[:, 1] - l21 * c1p) / l22
    c3p = (gp[:, 2] - l31 * c1p - l32 * c2p) / l33
    z = jnp.zeros_like(l11)
    Lt = jnp.stack([jnp.stack([l11, l21, l31], -1),
                    jnp.stack([z, l22, l32], -1),
                    jnp.stack([z, z, l33], -1)], axis=1)  # (Pq, 3, 3) = L^T
    cpr = jnp.stack([c1p, c2p, c3p], -1)
    merged_block = jnp.concatenate(
        [Lt, jnp.zeros((Pq, 3, nloc), dt), cpr[:, :, None]], axis=-1)

    M = jnp.concatenate(
        [jnp.concatenate([Mq, Mp, Mr], axis=-1), merged_block],
        axis=1)                                           # (Pq, m, 3+nloc+1)

    Rq = _eliminate3(M)
    nred = Rq.shape[1] - 3
    R3 = Rq[:, :3, :3]
    E = Rq[:, :3, 3:3 + nloc]
    c1 = Rq[:, :3, -1]
    red_pose = Rq[:, 3:, 3:3 + nloc]                      # (Pq, nred, 6K)
    red_rhs = Rq[:, 3:, -1]                               # (Pq, nred)
    cp_flat = cp_g.reshape(Pq, nloc)

    # --- reduced camera system: chunked dense MXU accumulation ------------
    C = min(chunk, Pq)
    n_chunks = -(-Pq // C)
    pad = n_chunks * C - Pq
    pidx_g = graph.projection.pose_idx[obs_idx]           # (Pq, K)
    if pad:
        red_pose_c = jnp.pad(red_pose, ((0, pad), (0, 0), (0, 0)))
        red_rhs_c = jnp.pad(red_rhs, ((0, pad), (0, 0)))
        pidx_c = jnp.pad(pidx_g, ((0, pad), (0, 0)))
    else:
        red_pose_c, red_rhs_c, pidx_c = red_pose, red_rhs, pidx_g

    prec = assembly_precision
    Pcap = lay.pose_cap

    def chunk_S(pp, rr, pidx):
        # local->global column relocation as a one-hot MATMUL, not a
        # scatter (TPU scatters serialize; this is an MXU op). Duplicate
        # pose columns within one landmark still SUM through the one-hot;
        # invalid observation slots carry all-zero columns through the
        # QR, so their relocation target (row 0's pose) contributes
        # nothing. Projection rows only ever touch pose columns, so the
        # accumulation runs on the (C*nred, 6*pose_cap) pose section
        # only. A "block" variant contracting over the K pose slots
        # ((C, K, pose_cap) one-hot, 36x smaller) was raced same-process
        # and LOST 2x (266 vs 539 ms/iter on the 100k config, 2026-08-20):
        # its K=4 contraction pads the MXU 32-fold, while this (nloc=6K)-
        # contraction batched matmul lowers cleanly.
        cols = (pidx[:, :, None] * 6
                + jnp.arange(6)[None, None, :]).reshape(C, nloc)
        onehot = (cols[:, :, None]
                  == jnp.arange(6 * Pcap)[None, None, :]).astype(dt)
        dense = jnp.einsum("crk,ckd->crd", pp, onehot, precision=prec)
        d2 = dense.reshape(C * nred, 6 * Pcap)
        return (jnp.matmul(d2.T, d2, precision=prec),
                jnp.matmul(d2.T, rr.reshape(-1), precision=prec))

    pose_ch = red_pose_c.reshape(n_chunks, C, nred, nloc)
    rhs_ch = red_rhs_c.reshape(n_chunks, C, nred)
    pidx_ch = pidx_c.reshape(n_chunks, C, K)
    # the scan carry is SEEDED with chunk 0 (not zeros): under shard_map
    # a replicated zeros init would not be varying over the mesh axis
    # while the accumulated shard data is, and lax.scan rejects the
    # carry-type mismatch
    S, g = chunk_S(pose_ch[0], rhs_ch[0], pidx_ch[0])
    if n_chunks > 1:
        def chunk_body(carry, inp):
            Sc, gc = carry
            dS, dg = chunk_S(*inp)
            return (Sc + dS, gc + dg), None

        (S, g), _ = jax.lax.scan(
            chunk_body, (S, g),
            (pose_ch[1:], rhs_ch[1:], pidx_ch[1:]))
    if 6 * Pcap != Dp:
        # BA+IMU/plane graphs: embed the pose-section partial into the
        # full non-point tangent (vel/bias/plane columns are untouched by
        # projection factors)
        S = jnp.zeros((Dp, Dp), S.dtype).at[:6 * Pcap, :6 * Pcap].set(S)
        g = jnp.zeros((Dp,), g.dtype).at[:6 * Pcap].set(g)
    return (S, g), (R3, E, c1, cp_flat, live)


def _add_nonpoint_and_base(graph, values, lay, S, g, damping):
    """Non-landmark factor blocks + pose damping + unused-slot identity."""
    Dp = lay.point_off
    mask_p = used_slot_mask(values)[:Dp]
    S = S + jnp.diag(damping * jnp.ones(Dp, S.dtype) + (1.0 - mask_p))
    for r, J, cols in _nonpoint_blocks(graph, values, lay):
        S = S.at[cols[:, :, None], cols[:, None, :]].add(
            jnp.einsum("fei,fej->fij", J, J))
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
    return S, g


def _solve_reduced(S, g):
    Lc = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(Lc, -g, lower=True)
    return jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)


def _backsub_points(R3, E, c1, cp_flat, live, dp):
    """Landmark updates from the kept QR rows: (Pq, 3).

    The 3x3 upper-triangular solves are written out explicitly — one
    batched TriangularSolve over 10k tiny operands lowers poorly on TPU,
    while these are six fused elementwise ops.
    """
    dp_sel = dp[cp_flat]                                  # (Pq, 6K)
    b = -(c1 + jnp.einsum("qij,qj->qi", E, dp_sel))
    x2 = b[:, 2] / R3[:, 2, 2]
    x1 = (b[:, 1] - R3[:, 1, 2] * x2) / R3[:, 1, 1]
    x0 = (b[:, 0] - R3[:, 0, 1] * x1 - R3[:, 0, 2] * x2) / R3[:, 0, 0]
    dq = jnp.stack([x0, x1, x2], axis=-1)
    return dq * live[:, None]


def _clip_rows(d, dim, max_norm):
    """Per-variable trust region: scale (N*dim,) tangent rows whose norm
    exceeds ``max_norm`` down to it."""
    rows = d.reshape(-1, dim)
    n = jnp.linalg.norm(rows, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-30))
    return (rows * scale).reshape(-1)


def _clip_nonpoint(dp, lay, max_norm):
    """Per-variable trust region over the whole non-point tangent.

    Clips each variable by its OWN tangent width from the layout (poses 6,
    velocities 3, biases 6, planes 3) — a flat (-1, 6) reshape would
    misgroup the 3-wide slots into cross-variable rows on BA+IMU/plane
    graphs and scale one variable's update by another's magnitude.
    """
    segs = [
        _clip_rows(dp[off:off + width * cap], width, max_norm)
        for off, width, cap in (
            (lay.pose_off, 6, lay.pose_cap),
            (lay.vel_off, 3, lay.vel_cap),
            (lay.bias_off, 6, lay.bias_cap),
            (lay.plane_off, 3, lay.plane_cap),
        ) if cap
    ]
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs)


def sqrt_schur_gn_step(graph: FactorGraph, values: VariableArena,
                       obs_idx, obs_valid, prior_row, prior_valid,
                       damping, chunk: int = 2048, step_clip=None,
                       assembly_precision=None):
    """One damped GN step via per-landmark QR elimination (f32-stable).

    ``step_clip`` (meters/radians) is a per-variable trust region on the
    tangent update: weakly-constrained landmarks (one grazing observation
    + a loose prior) can solve to enormous finite steps whose squared
    residuals then overflow f32 (measured: chi2 inf after one undamped
    step on the 100k-landmark stress config while every intermediate —
    S, g, Cholesky, dp, dq — stayed finite). GN has no globalization of
    its own; the clamp is the fixed-trip-friendly substitute.
    """
    lay = layout_of(values)
    Pq = obs_idx.shape[0]
    (S, g), back = _landmark_qr_reduce(
        graph, values, lay, obs_idx, obs_valid, prior_row, prior_valid,
        jnp.arange(Pq), damping, chunk,
        assembly_precision=assembly_precision)
    S, g = _add_nonpoint_and_base(graph, values, lay, S, g, damping)
    if assembly_precision is not None:
        # reduced-precision assembly carries a ~5e-7-relative error floor;
        # on a cond~1e13 reduced system that floor exceeds the smallest
        # eigenvalues and the Cholesky goes indefinite -> NaN (measured on
        # the 100k-landmark config, 2026-08-20). A Marquardt-style jitter
        # at 5e-5 of EACH diagonal entry dominates the floor in the scaled
        # system D^-1/2 S D^-1/2 (error entries are <= eps by
        # Cauchy-Schwarz) while perturbing every row only at 5e-5
        # relative. Scaling by max-diag instead is wrong here: anchor
        # priors put ~1e12 on their rows and the uniform jitter that
        # implies crushes the data rows (~1e4) outright.
        S = S + 5e-5 * jnp.diag(jnp.diagonal(S))
    dp = _solve_reduced(S, g)
    dq = _backsub_points(*back, dp).reshape(-1)
    if step_clip is not None:
        dp = _clip_nonpoint(dp, lay, step_clip)
        dq = _clip_rows(dq, 3, step_clip)
    return retract_all(values, jnp.concatenate([dp, dq]))


def ba_gn_optimize_sqrt(graph: FactorGraph, values: VariableArena,
                        iterations: int = 8, damping: float = 1e-6,
                        chunk: int = 2048, step_clip=None,
                        assembly_precision=None):
    """GN with square-root (QR) Schur elimination, fixed trip count.

    The f32-stable TPU path: builds the host-side observation tables once
    (static sparsity), then runs the jitted fixed-trip scan.
    """
    lay = layout_of(values)
    obs_idx, obs_valid, prior_row, prior_valid = build_point_obs(
        graph, lay.point_cap)
    return _ba_sqrt_jit(graph, values,
                        jnp.asarray(obs_idx), jnp.asarray(obs_valid),
                        jnp.asarray(prior_row), jnp.asarray(prior_valid),
                        iterations=iterations, damping=float(damping),
                        chunk=int(chunk),
                        step_clip=None if step_clip is None
                        else float(step_clip),
                        assembly_precision=assembly_precision)


@functools.partial(jax.jit,
                   static_argnames=("iterations", "damping", "chunk",
                                    "step_clip", "assembly_precision"))
def _ba_sqrt_jit(graph, values, obs_idx, obs_valid, prior_row, prior_valid,
                 iterations, damping, chunk, step_clip=None,
                 assembly_precision=None):
    def body(vals, _):
        return sqrt_schur_gn_step(
            graph, vals, obs_idx, obs_valid, prior_row, prior_valid,
            jnp.asarray(damping, vals.pose_t.dtype), chunk=chunk,
            step_clip=step_clip,
            assembly_precision=assembly_precision), None

    values, _ = jax.lax.scan(body, values, None, length=iterations)
    return values, total_error(graph, values)
