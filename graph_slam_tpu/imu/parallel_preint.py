"""Log-depth IMU preintegration: the associative-scan formulation.

``preintegration.integrate_segment`` walks the measurement window with a
sequential ``lax.scan`` — N dependent steps of tiny 3x3/15x15 ops (the hot
loop SURVEY.md §3.2 marks as the Pallas/scan target; reference:
``CImuBase::predictNext``'s integrateMeasurement loop,
``/root/reference/gtsam/imu_base.cpp:72-87``). On TPU that serializes N
VPU-underutilized iterations.

Every recurrence in the step is affine in the state with coefficients that
depend only on the measurements and the ROTATION PREFIX, so the whole
window parallelizes:

1. rotation prefixes ``G_k = A_0 ... A_{k-1}`` — one
   ``lax.associative_scan`` over (N, 3, 3) (log depth, batched matmuls);
2. ``dv/dp`` and all five bias Jacobians — closed-form prefix SUMS given
   ``G_k`` (batched einsums + ``cumsum``), e.g.
   ``H_R_bg,k = G_k^T (H0 - sum_{j<k} G_{j+1} Jr_j dt_j)``;
3. the 15x15 covariance — ``lax.associative_scan`` over the pair
   composition ``(F2, Q2) o (F1, Q1) = (F2 F1, F2 Q1 F2^T + Q2)`` with the
   SAME per-step ``F_k``/``Q_k`` definitions as the sequential path.

Masked rows (``dt <= 0``) contribute ``A = I``, ``F = I``, ``Q = 0`` —
identical to the sequential path's masking, so fixed-size padded windows
work unchanged. Exact same math as ``integrate_segment`` (parity pinned at
1e-10 by tests/test_imu.py); only the evaluation order differs, so results
agree to roundoff, not bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import so3
from .preintegration import ImuParams, PreintState, _right_jacobian

__all__ = ["integrate_segment_parallel"]


def _batched_exp_jr(w):
    """vmapped Exp / right Jacobian over (N, 3) rotation vectors."""
    A = jax.vmap(so3.expmap)(w)
    Jr = jax.vmap(_right_jacobian)(w)
    return A, Jr


def _excl(x):
    """Exclusive prefix sum along axis 0 (same dtype/shape)."""
    return jnp.cumsum(x, axis=0) - x


@jax.jit
def integrate_segment_parallel(state: PreintState, acc, gyr, dt,
                               params: ImuParams) -> PreintState:
    """Drop-in replacement for ``integrate_segment`` (same signature,
    same result to roundoff), evaluated at log depth."""
    dtype = state.dR.dtype
    acc = jnp.asarray(acc, dtype)
    gyr = jnp.asarray(gyr, dtype)
    dt = jnp.maximum(jnp.asarray(dt, dtype), 0.0)        # (N,)
    n = acc.shape[0]

    ba, bg = state.bias_hat[:3], state.bias_hat[3:]
    a = acc - ba                                          # (N, 3)
    w = (gyr - bg) * dt[:, None]                          # 0 on masked rows
    A, Jr = _batched_exp_jr(w)                            # (N, 3, 3)

    # -- 1. rotation prefixes ------------------------------------------------
    # inclusive products P_k = A_0 ... A_k; exclusive G_k = P_{k-1}, G_0 = I
    P = jax.lax.associative_scan(jnp.matmul, A)
    I3 = jnp.eye(3, dtype=dtype)
    G = jnp.concatenate([I3[None], P[:-1]], axis=0)       # (N, 3, 3)
    G_N = P[-1]
    dR0 = state.dR
    R = jnp.einsum("ij,kjl->kil", dR0, G)                 # dR_k, (N, 3, 3)

    # -- 2. deltas + bias Jacobians as prefix sums ---------------------------
    dt2 = dt * dt
    Ra = jnp.einsum("kij,kj->ki", R, a)                   # dR_k a_k, (N, 3)
    u = Ra * dt[:, None]                                  # dv increments
    dv_pre = state.dv[None] + _excl(u)                    # dv_k prefixes
    dv_N = state.dv + u.sum(0)
    dp_N = (state.dp + (dv_pre * dt[:, None]).sum(0)
            + 0.5 * (Ra * dt2[:, None]).sum(0))

    # H_R_bg,k = G_k^T (H0 - T_k),  T_k = sum_{j<k} G_{j+1} Jr_j dt_j
    GJr = jnp.einsum("kij,kjl->kil", P, Jr) * dt[:, None, None]
    T = _excl(GJr)
    H_R_pre = jnp.einsum("kji,kjl->kil", G,
                         state.H_R_bg[None] - T)          # (N, 3, 3)
    H_R_bg_N = G_N.T @ (state.H_R_bg - GJr.sum(0))

    # H_v_ba,k = H0 - sum_{j<k} dR_j dt_j
    Rdt = R * dt[:, None, None]
    H_v_ba_pre = state.H_v_ba[None] - _excl(Rdt)
    H_v_ba_N = state.H_v_ba - Rdt.sum(0)

    # H_v_bg,k = H0 - sum_{j<k} aW_j H_R_bg,j dt_j,  aW_j = dR_j hat(a_j)
    aW = jnp.einsum("kij,kjl->kil", R, jax.vmap(so3.hat)(a))
    M = jnp.einsum("kij,kjl->kil", aW, H_R_pre) * dt[:, None, None]
    H_v_bg_pre = state.H_v_bg[None] - _excl(M)
    H_v_bg_N = state.H_v_bg - M.sum(0)

    # H_p_*: one more integration layer over the H_v_* prefixes
    H_p_ba_N = (state.H_p_ba + (H_v_ba_pre * dt[:, None, None]).sum(0)
                - 0.5 * (R * dt2[:, None, None]).sum(0))
    H_p_bg_N = (state.H_p_bg + (H_v_bg_pre * dt[:, None, None]).sum(0)
                - 0.5 * (M * dt[:, None, None]).sum(0))

    # -- 3. covariance: associative scan over (F, Q) pairs -------------------
    Z = jnp.zeros((n, 3, 3), dtype)
    I3n = jnp.broadcast_to(I3, (n, 3, 3))
    At = jnp.swapaxes(A, -1, -2)
    sdt = dt[:, None, None]
    sdt2 = dt2[:, None, None]
    F = jnp.block([
        [At,             Z,    Z,          Z,           -Jr * sdt],
        [-0.5 * aW * sdt2, I3n, I3n * sdt, -0.5 * R * sdt2, Z],
        [-aW * sdt,      Z,    I3n,        -R * sdt,    Z],
        [Z,              Z,    Z,          I3n,         Z],
        [Z,              Z,    Z,          Z,           I3n],
    ])                                                    # (N, 15, 15)
    dt_safe = jnp.where(dt > 0, dt, 1.0)
    sg = jnp.asarray(params.gyro_cov, dtype)[None] / dt_safe[:, None, None]
    sa = jnp.asarray(params.accel_cov, dtype)[None] / dt_safe[:, None, None]
    RsaRt = jnp.einsum("kij,kjl,kml->kim", R, sa, R)
    q_theta = jnp.einsum("kij,kjl,kml->kim", Jr, sg, Jr) * sdt2
    q_v = RsaRt * sdt2
    q_p = 0.25 * RsaRt * sdt2 * sdt2 + \
        jnp.asarray(params.integration_cov, dtype)[None] * sdt
    q_pv = 0.5 * RsaRt * sdt2 * sdt
    Q = jnp.zeros((n, 15, 15), dtype)
    Q = Q.at[:, 0:3, 0:3].set(q_theta)
    Q = Q.at[:, 3:6, 3:6].set(q_p)
    Q = Q.at[:, 6:9, 6:9].set(q_v)
    Q = Q.at[:, 3:6, 6:9].set(q_pv)
    Q = Q.at[:, 6:9, 3:6].set(jnp.swapaxes(q_pv, -1, -2))
    Q = Q.at[:, 9:12, 9:12].set(
        jnp.asarray(params.bias_acc_cov, dtype)[None] * sdt)
    Q = Q.at[:, 12:15, 12:15].set(
        jnp.asarray(params.bias_omega_cov, dtype)[None] * sdt)

    def combine(earlier, later):
        F1, Q1 = earlier
        F2, Q2 = later
        return (jnp.matmul(F2, F1),
                jnp.einsum("...ij,...jl,...ml->...im", F2, Q1, F2) + Q2)

    Phi, Qtot = jax.tree.map(lambda x: x[-1],
                             jax.lax.associative_scan(combine, (F, Q)))
    cov_N = Phi @ state.cov @ Phi.T + Qtot

    return PreintState(
        dR=dR0 @ G_N, dp=dp_N, dv=dv_N,
        H_R_bg=H_R_bg_N, H_p_ba=H_p_ba_N, H_p_bg=H_p_bg_N,
        H_v_ba=H_v_ba_N, H_v_bg=H_v_bg_N,
        cov=cov_N, dt=state.dt + dt.sum(),
        bias_hat=state.bias_hat,
    )
