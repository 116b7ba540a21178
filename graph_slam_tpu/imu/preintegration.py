"""IMU preintegration: Forster-style ΔR/Δv/Δp with bias Jacobians and a
15x15 combined covariance, as one fused ``lax.scan``.

Functional replacement for GTSAM ``PreintegratedCombinedMeasurements`` as the
reference drives it (sequential ``integrateMeasurement`` loop in
``CImuBase::predictNext``, ``/root/reference/gtsam/imu_base.cpp:72-87``;
re-integration between states ``predictBetween`` ``:156-170``; reset
``resetPreintegrationAndBias`` ``:89-99``). The whole measurement window
integrates on-device in a single scan — the hot loop SURVEY.md §3.2 marks as
the Pallas/scan target.

Math (Forster et al., RSS'15 / TRO'17 supplementary, and the CombinedImuFactor
bias-random-walk extension):

    ΔR_{k+1} = ΔR_k Exp((ω_k - bg) dt)
    Δv_{k+1} = Δv_k + ΔR_k (a_k - ba) dt
    Δp_{k+1} = Δp_k + Δv_k dt + 0.5 ΔR_k (a_k - ba) dt²

with first-order bias Jacobians and EKF covariance propagation over the
15-dim error state ordered ``[δθ, δp, δv, δba, δbg]``. The bias blocks carry
the random-walk noise plus the initial-bias uncertainty ``bias_acc_omega_int``
(applied at reset), mirroring the combined factor's treatment.

Masked rows (``dt <= 0``) are identity updates, so fixed-size padded windows
integrate variable-length segments without recompilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3, so3

__all__ = [
    "ImuParams",
    "PreintState",
    "init_preint",
    "integrate_segment",
    "predict_navstate",
    "corrected_deltas",
]


class ImuParams(NamedTuple):
    """Continuous-time noise model (GTSAM Params equivalent)."""

    accel_cov: jnp.ndarray        # (3,3) accelerometer white noise PSD
    gyro_cov: jnp.ndarray         # (3,3) gyroscope white noise PSD
    integration_cov: jnp.ndarray  # (3,3) position integration error
    bias_acc_cov: jnp.ndarray     # (3,3) accel bias random walk PSD
    bias_omega_cov: jnp.ndarray   # (3,3) gyro bias random walk PSD
    bias_acc_omega_init: jnp.ndarray  # (6,6) initial bias uncertainty
    gravity: jnp.ndarray          # (3,) world gravity, e.g. (0,0,-9.81)


class PreintState(NamedTuple):
    """Preintegrated deltas + bias Jacobians + covariance + elapsed time."""

    dR: jnp.ndarray       # (3,3)
    dp: jnp.ndarray       # (3,)
    dv: jnp.ndarray       # (3,)
    H_R_bg: jnp.ndarray   # (3,3) dLog(ΔR)/dbg
    H_p_ba: jnp.ndarray   # (3,3)
    H_p_bg: jnp.ndarray   # (3,3)
    H_v_ba: jnp.ndarray   # (3,3)
    H_v_bg: jnp.ndarray   # (3,3)
    cov: jnp.ndarray      # (15,15) over [δθ, δp, δv, δba, δbg]
    dt: jnp.ndarray       # scalar, total integrated time
    bias_hat: jnp.ndarray  # (6,) (ba, bg) used for integration


def init_preint(bias_hat, params: ImuParams, dtype=jnp.float64) -> PreintState:
    """Fresh preintegration (resetIntegrationAndSetBias equivalent).

    The bias block of the covariance starts at ``bias_acc_omega_init`` — the
    uncertainty of the bias estimate the deltas are conditioned on.
    """
    cov = jnp.zeros((15, 15), dtype)
    cov = cov.at[9:15, 9:15].set(jnp.asarray(params.bias_acc_omega_init, dtype))
    return PreintState(
        dR=jnp.eye(3, dtype=dtype),
        dp=jnp.zeros(3, dtype),
        dv=jnp.zeros(3, dtype),
        H_R_bg=jnp.zeros((3, 3), dtype),
        H_p_ba=jnp.zeros((3, 3), dtype),
        H_p_bg=jnp.zeros((3, 3), dtype),
        H_v_ba=jnp.zeros((3, 3), dtype),
        H_v_bg=jnp.zeros((3, 3), dtype),
        cov=cov,
        dt=jnp.zeros((), dtype),
        bias_hat=jnp.asarray(bias_hat, dtype),
    )


def _right_jacobian(w):
    """SO(3) right Jacobian J_r(w) = J_l(-w)."""
    return so3.left_jacobian(-jnp.asarray(w))


def _step(state: PreintState, meas, params: ImuParams):
    acc, gyr, dt = meas
    ba = state.bias_hat[:3]
    bg = state.bias_hat[3:]
    a = acc - ba
    w = (gyr - bg) * dt

    A = so3.expmap(w)          # incremental rotation
    Jr = _right_jacobian(w)
    dR, dp, dv = state.dR, state.dp, state.dv
    aW = dR @ so3.hat(a)       # ΔR hat(a)
    dt2 = dt * dt

    new_dR = dR @ A
    new_dv = dv + dR @ a * dt
    new_dp = dp + dv * dt + 0.5 * dR @ a * dt2

    # bias Jacobians (first order)
    At = A.T
    new_H_R_bg = At @ state.H_R_bg - Jr * dt
    new_H_v_ba = state.H_v_ba - dR * dt
    new_H_v_bg = state.H_v_bg - aW @ state.H_R_bg * dt
    new_H_p_ba = state.H_p_ba + state.H_v_ba * dt - 0.5 * dR * dt2
    new_H_p_bg = state.H_p_bg + state.H_v_bg * dt - 0.5 * aW @ state.H_R_bg * dt2

    # covariance propagation over [δθ, δp, δv, δba, δbg]
    dtype = dR.dtype
    Z = jnp.zeros((3, 3), dtype)
    I3 = jnp.eye(3, dtype=dtype)
    F = jnp.block([
        [At,               Z,  Z,        Z,        -Jr * dt],
        [-0.5 * aW * dt2,  I3, I3 * dt,  -0.5 * dR * dt2, Z],
        [-aW * dt,         Z,  I3,       -dR * dt, Z],
        [Z,                Z,  Z,        I3,       Z],
        [Z,                Z,  Z,        Z,        I3],
    ])
    # discrete measurement noise (continuous PSD / dt), mapped by B
    dt_safe = jnp.where(dt > 0, dt, 1.0)  # masked rows: avoid inf/NaN
    sg = jnp.asarray(params.gyro_cov, dtype) / dt_safe
    sa = jnp.asarray(params.accel_cov, dtype) / dt_safe
    q_theta = Jr @ sg @ Jr.T * dt2
    q_v = dR @ sa @ dR.T * dt2
    q_p = 0.25 * dR @ sa @ dR.T * dt2 * dt2 + jnp.asarray(
        params.integration_cov, dtype) * dt
    q_pv = 0.5 * dR @ sa @ dR.T * dt2 * dt
    Q = jnp.zeros((15, 15), dtype)
    Q = Q.at[0:3, 0:3].set(q_theta)
    Q = Q.at[3:6, 3:6].set(q_p)
    Q = Q.at[6:9, 6:9].set(q_v)
    Q = Q.at[3:6, 6:9].set(q_pv)
    Q = Q.at[6:9, 3:6].set(q_pv.T)
    Q = Q.at[9:12, 9:12].set(jnp.asarray(params.bias_acc_cov, dtype) * dt)
    Q = Q.at[12:15, 12:15].set(jnp.asarray(params.bias_omega_cov, dtype) * dt)

    new_cov = F @ state.cov @ F.T + Q

    live = dt > 0
    sel = lambda n, o: jnp.where(live, n, o)
    return PreintState(
        dR=sel(new_dR, dR), dp=sel(new_dp, dp), dv=sel(new_dv, dv),
        H_R_bg=sel(new_H_R_bg, state.H_R_bg),
        H_p_ba=sel(new_H_p_ba, state.H_p_ba),
        H_p_bg=sel(new_H_p_bg, state.H_p_bg),
        H_v_ba=sel(new_H_v_ba, state.H_v_ba),
        H_v_bg=sel(new_H_v_bg, state.H_v_bg),
        cov=sel(new_cov, state.cov),
        dt=state.dt + jnp.maximum(dt, 0.0),
        bias_hat=state.bias_hat,
    )


@jax.jit
def integrate_segment(state: PreintState, acc, gyr, dt,
                      params: ImuParams) -> PreintState:
    """Integrate a (possibly padded) window of measurements in one scan.

    ``acc``/``gyr``: (N, 3); ``dt``: (N,) with non-positive entries skipped.

    NOTE: this sequential form is the PARITY ORACLE; the package exports
    the log-depth associative-scan formulation
    (``parallel_preint.integrate_segment_parallel``, 20x faster on TPU at
    W=512) under the ``integrate_segment`` name — results agree to
    roundoff (tests/test_imu.py::TestParallelPreintegration).
    """
    acc = jnp.asarray(acc, state.dR.dtype)
    gyr = jnp.asarray(gyr, state.dR.dtype)
    dt = jnp.asarray(dt, state.dR.dtype)

    def body(s, meas):
        return _step(s, meas, params), None

    out, _ = jax.lax.scan(body, state, (acc, gyr, dt))
    return out


@jax.jit
def corrected_deltas(state: PreintState, bias_i):
    """Bias-corrected deltas for the factor / prediction.

    First-order update around ``bias_hat``:
      ΔR̃ = ΔR Exp(H_R_bg δbg),  Δṽ = Δv + H_v δb,  Δp̃ = Δp + H_p δb.
    """
    db = jnp.asarray(bias_i) - state.bias_hat
    dba, dbg = db[:3], db[3:]
    dR = state.dR @ so3.expmap(state.H_R_bg @ dbg)
    dv = state.dv + state.H_v_ba @ dba + state.H_v_bg @ dbg
    dp = state.dp + state.H_p_ba @ dba + state.H_p_bg @ dbg
    return dR, dp, dv


@jax.jit
def predict_navstate(state: PreintState, pose_i: se3.Pose, vel_i, bias_i,
                     gravity):
    """GTSAM ``PreintegrationBase::predict``: (X_i, v_i, b_i) -> (X_j, v_j).

    Used by the reference to seed new nodes (``imu_base.cpp:86``) and as the
    plane-propagation pose prediction (``test_vro_imu_graph.cpp:205-241``).
    """
    dR, dp, dv = corrected_deltas(state, bias_i)
    g = jnp.asarray(gravity, state.dR.dtype)
    t = state.dt
    R_j = pose_i.R @ dR
    v_j = vel_i + g * t + pose_i.R @ dv
    p_j = pose_i.t + vel_i * t + 0.5 * g * t * t + pose_i.R @ dp
    return se3.Pose(R_j, p_j), v_j
