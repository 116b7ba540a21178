"""The per-record VIO device kernel + host window helpers.

One traced unit shared by BOTH fused engines (the per-frame online path
and the whole-replay scan), so they execute literally the same operations
and cannot drift apart. See ``_vio_frame_kernel`` for the reference
call-stack mapping (test_vro_imu_graph.cpp, SURVEY.md 3.2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..graph import online as online_mod
from ..imu import (
    ImuParams,
    ImuStream,
    find_index_at,
    init_preint,
    integrate_segment,
    predict_navstate,
)

__all__ = ["_vio_frame_kernel", "_fused_vio_step", "_static_init",
           "_pad_window", "_conjugate_edges_batch", "_expmap_batch"]


def _vio_frame_kernel(graph, values, imu_params: ImuParams, acc, gyr, dts,
                      prev_R, prev_t, prev_vel, prev_bias,
                      meas_R, meas_t, sqrt_info_vo, robust_kind, robust_k,
                      failed, is_new, edge_valid, gi_vo, gi_imu, gj,
                      bt_slot, imu_slot, gravity, gate: bool, gate_thresh):
    """The per-record VIO device kernel SHARED by both fused engines.

    Preintegration scan, NavState prediction, the (optional) chi2
    IMU-vs-VRO rotation gate (test_vro_imu_graph.cpp:677-782), the
    VO/IMU-consistent pose selection, and all arena row writes — one
    traced unit, so the per-frame online fast path (``_fused_vio_step``)
    and the whole-replay scan engine (``_replay_scan``) execute literally
    the same operations and cannot drift apart.

    Index semantics match the reference driver: the VO between-factor
    connects the MATCHED pair ``(gi_vo, gj)`` and the VO initial estimate
    composes from the matched node's pose (addToGTSAM,
    gtsam_graph.cpp:655-668), while the CombinedImuFactor always connects
    CONSECUTIVE frames ``(gi_imu = gj-1, gj)`` — the preintegration window
    spans from the previous frame (test_vro_imu_graph.cpp:191-196). The
    two coincide on sequential logs but differ when tracking recovers
    against an older keyframe.

    ``is_new`` False (loop-closure records in the scan engine) turns the
    value writes into no-ops, parks the IMU row inactive, and leaves the
    feedback state untouched; the between row's ``active`` is
    ``~failed`` for new frames and ``edge_valid`` otherwise.

    Returns ``(graph, values, fb, est_R, est_t, pred_vel, st)`` where
    ``fb`` is the (R, t, vel, bias) feedback state after this record and
    ``st`` the window's PreintState (the scan engine ignores it; the
    rescue host step reads its covariance for the plane membership gate).
    """
    from ..core import so3 as _so3

    st = integrate_segment(
        init_preint(prev_bias, imu_params, dtype=prev_t.dtype),
        acc, gyr, dts, imu_params)
    prev_pose = se3.Pose(prev_R, prev_t)
    pred_pose, pred_vel = predict_navstate(st, prev_pose, prev_vel,
                                           prev_bias, gravity)
    if gate:
        R_imu = prev_R.T @ pred_pose.R
        e_R = _so3.logmap(meas_R.T @ R_imu)
        S_R = st.cov[:3, :3] + jnp.eye(3, dtype=prev_t.dtype) * 1e-12
        chi2 = e_R @ jnp.linalg.solve(S_R, e_R)
        failed = failed | (is_new & (chi2 > gate_thresh))

    base = se3.Pose(values.pose_R[gi_vo], values.pose_t[gi_vo])
    comp = se3.compose(base, se3.Pose(meas_R, meas_t))
    est_R = jnp.where(failed, pred_pose.R, comp.R)
    est_t = jnp.where(failed, pred_pose.t, comp.t)

    values = values._replace(
        pose_R=values.pose_R.at[gj].set(
            jnp.where(is_new, est_R, values.pose_R[gj])),
        pose_t=values.pose_t.at[gj].set(
            jnp.where(is_new, est_t, values.pose_t[gj])),
        vel=values.vel.at[gj].set(
            jnp.where(is_new, pred_vel, values.vel[gj])),
        bias=values.bias.at[gj].set(
            jnp.where(is_new, prev_bias, values.bias[gj])),
        num_poses=jnp.maximum(values.num_poses, gj + 1),
        num_vels=jnp.maximum(values.num_vels, gj + 1),
        num_biases=jnp.maximum(values.num_biases, gj + 1),
    )
    active = jnp.where(is_new, ~failed, edge_valid)
    bt = online_mod.between_row(graph.between, bt_slot, gi_vo, gj, meas_R,
                                meas_t, sqrt_info_vo, robust_kind,
                                robust_k, active=active)
    im = online_mod.imu_row(graph.imu, imu_slot, gi_imu, gj, st.dR, st.dp,
                            st.dv, st.H_R_bg, st.H_p_ba, st.H_p_bg,
                            st.H_v_ba, st.H_v_bg, st.bias_hat, st.dt,
                            gravity, st.cov, active=is_new)
    graph = graph._replace(between=bt, imu=im)
    fb = (jnp.where(is_new, est_R, prev_R),
          jnp.where(is_new, est_t, prev_t),
          jnp.where(is_new, pred_vel, prev_vel), prev_bias)
    return graph, values, fb, est_R, est_t, pred_vel, st


@functools.partial(jax.jit, static_argnames=("gate",))
def _fused_vio_step(graph, values, imu_params: ImuParams, acc, gyr, dts,
                    prev_R, prev_t, prev_vel, prev_bias,
                    meas_R, meas_t, sqrt_info_vo, robust_kind, robust_k,
                    failed, gi, gj, bt_slot, imu_slot, gravity,
                    gate: bool = False, gate_thresh: float = 4e4):
    """One VIO frame as ONE device program (the online engine's fast
    path when no plane stack is active; see ``_vio_frame_kernel``).

    The between row is written with ``active = ~failed`` so a gated or
    sentinel-failed edge costs its slot but not its residual — no
    data-dependent host branch, nothing read back per frame. The last
    output is the 15x15 preintegration covariance (the rescue host step's
    plane membership gate; other callers drop it unread, so XLA elides
    the transfer).
    """
    graph, values, _, est_R, est_t, pred_vel, st = _vio_frame_kernel(
        graph, values, imu_params, acc, gyr, dts, prev_R, prev_t,
        prev_vel, prev_bias, meas_R, meas_t, sqrt_info_vo, robust_kind,
        robust_k, failed, jnp.asarray(True), jnp.asarray(True),
        gi, gj - 1, gj, bt_slot, imu_slot, gravity, gate,
        jnp.asarray(gate_thresh, prev_t.dtype))
    return graph, values, est_R, est_t, pred_vel, st.cov


def _static_init(imu: ImuStream, t0: float, imu_params: ImuParams,
                 n_samples: int = 0):
    """Startup gravity/bias initialization from the static window.

    The reference aligns the first pose to the measured gravity direction
    (``initFromImu``, gtsam_graph.cpp:281-318, driven at
    main_rgbdslam_imu_offline.cpp:137-140) and estimates the prior bias
    from the initial static measurements (``initializeGravity``,
    imu_base.cpp:217-249). The static window is everything before the
    first image's sync point (``n_samples=0``); a log that starts at the
    sync point falls back to the first 200 samples (1 s at VN100 rate).

    Returns ``(R0, bias0)``: the gravity-aligned first-node rotation and
    the (ba, bg) prior bias.
    """
    from ..imu.streams import gravity_aligning_rotation, static_bias_estimate

    n = n_samples
    if n <= 0:
        idx = find_index_at(imu.t, t0)
        n = idx if idx > 0 else min(len(imu.t), 200)
    g_mag = float(np.linalg.norm(np.asarray(imu_params.gravity)))
    bias0, g_dir = static_bias_estimate(imu, n, gravity_mag=g_mag)
    R0 = gravity_aligning_rotation(g_dir)
    return R0, bias0


def _pad_window(acc, gyr, n, dt_nom, max_window):
    """Fixed-shape measurement window (masked rows have dt=0).

    An EMPTY window (non-advancing image timestamp) gets one zero-motion
    step: an all-zero ``dt`` vector makes the preintegration covariance
    singular and the IMU row's whitening Cholesky NaN.
    """
    acc_p = np.zeros((max_window, 3))
    gyr_p = np.zeros((max_window, 3))
    dt_p = np.zeros(max_window)
    k = min(n, max_window)
    acc_p[:k] = acc[:k]
    gyr_p[:k] = gyr[:k]
    dt_p[:k] = dt_nom
    if k == 0:
        dt_p[0] = dt_nom
    return acc_p, gyr_p, dt_p


@jax.jit
def _conjugate_edges_batch(xi, uR, ut):
    """All VRO edges camera->body in ONE device call (the per-record
    ``_conjugate_edge`` is eager JAX — one dispatch per edge, which
    dominates host precompute on remote-attached devices)."""
    T = jax.vmap(se3.expmap)(xi)
    u = se3.Pose(uR, ut)
    uinv = se3.inverse(u)

    def conj(R, t):
        P = se3.compose(se3.compose(u, se3.Pose(R, t)), uinv)
        return P.R, P.t

    R, t = jax.vmap(conj)(T.R, T.t)
    return R, t


@jax.jit
def _expmap_batch(xi):
    T = jax.vmap(se3.expmap)(xi)
    return T.R, T.t

