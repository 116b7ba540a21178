"""Offline plane-aided visual-inertial odometry — the flagship pipeline.

Twin of ``test_vro_imu_graph`` (``/root/reference/gtsam/test_vro_imu_graph.cpp:78-382``,
call stack SURVEY.md §3.2):

  per VRO record, in file order:
    - new frame  -> IMU window preintegration (one lax.scan) + NavState
      prediction; VO BetweenFactor when the edge is valid (camera->IMU
      conjugation); CombinedImuFactor(X,V,B: i-1 -> i); pose estimate from
      VO composition when valid, else from the IMU prediction
      (addNodeOffline + addToGTSAM(NavState), gtsam_graph.cpp:613-695);
    - plane rescue when VO failed (``:205``): propagate the previous plane
      set through the predicted pose, associate against the landmark window,
      add OrientedPlane3 factors (plane_mode="rescue"); "always" adds plane
      factors on every frame (the ba_imu variant), "off" disables planes;
    - loop-closure edges replayed when both endpoints exist;
    - incremental optimization every frame (ISAM2-equivalent warm-started
      GN) or periodic batch LM;
    - estimator feedback: optimized bias/state re-seed the next
      preintegration window (``test_vro_imu_graph.cpp:344-350``).

Execution engines (VioConfig.engine): "online" — this module's per-frame
loop over preallocated OnlineGraph arenas; "scan" — the whole replay as
chunked compiled ``lax.scan`` programs (``pipelines.vio_scan``). Both run
the SAME per-record device kernel (``pipelines.vio_kernel``) and the same
plane stack (``pipelines.vio_planes``); parity between them is pinned by
tests/test_vio_scan.py and tests/test_scan_rescue.py. The round-1
host-rebuild engine was deleted in round 4 — the independent NumPy
optimizer (tests/np_optimizer.py) is the cross-check oracle.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp
import jax

from ..config import CameraIntrinsics, SlamParams
from ..core import se3
from ..graph import LMParams, lm_optimize, total_error
from ..graph.builder import _sqrt_info
from ..graph.online import IncrementalOptimizer
from ..imu import ImuParams, ImuStream, find_index_at
from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog
from .posegraph import _conjugate_edge
from .vio_kernel import _fused_vio_step, _pad_window, _static_init
from .vio_planes import _OnlineVioGraph, _PlaneStack
from .vio_scan import _run_vio_scan
from .vio_types import VioConfig, VioResult

__all__ = ["VioConfig", "VioResult", "run_vio"]


def run_vio(log: VROLog, img_times, imu: ImuStream,
            imu_params: ImuParams, u2c: Optional[se3.Pose] = None,
            plane_obs_provider: Optional[Callable] = None,
            frames: Optional[Callable] = None,
            intrinsics: Optional[CameraIntrinsics] = None,
            params: SlamParams = SlamParams(),
            cfg: VioConfig = VioConfig(),
            lm_params: LMParams = LMParams()) -> VioResult:
    """Replay a VRO log with IMU (+ optional plane observations).

    Args:
      img_times: mapping seq_id -> timestamp (dict or callable).
      plane_obs_provider: optional ``seq_id -> [(plane_cam4, cov3x3), ...]``
        supplying per-frame plane observations in the camera frame
        (synthetic injection, used by tests).
      frames: optional ``seq_id -> (intensity, depth_m) | None`` frame
        source (e.g. ``io.frames.FrameStore``). When given (with
        ``intrinsics``), the plane stack runs end-to-end from real frames:
        node 0 planes are extracted and registered (``firstPlaneNode``,
        gtsam_graph.cpp:1102-1115); on VO failure the previous node's
        planes are propagated through the IMU-predicted pose
        (``predictPlaneNode``) with fresh extraction of the uncovered
        cloud, landmark ids carried, and plane factors inserted — the
        reference's plane rescue of tracking loss
        (test_vro_imu_graph.cpp:205-300).
    """
    t_of = img_times.__getitem__ if hasattr(img_times, "__getitem__") \
        else img_times
    gravity = np.asarray(imu_params.gravity)
    u2c_arg = u2c  # None means identity; predict_plane_node skips conjugation
    if frames is not None and intrinsics is None:
        raise ValueError("frames mode requires camera intrinsics")
    robust_k = cfg.robust_k if cfg.robust == "huber" else None

    if cfg.engine == "scan":
        if cfg.plane_mode == "always":
            raise ValueError(
                "engine='scan' supports plane_mode 'off' or 'rescue' "
                "(failures are host-known from the log, every frame is "
                "not); use engine='online' for 'always'")
        if not cfg.feedback:
            raise ValueError("engine='scan' requires feedback=True")
        return _run_vio_scan(log, t_of, imu, imu_params, u2c, params, cfg,
                             lm_params, frames=frames,
                             intrinsics=intrinsics,
                             plane_obs_provider=plane_obs_provider)
    if cfg.engine != "online":
        raise ValueError(f"unknown engine {cfg.engine!r} "
                         "(online|scan; the host-rebuild engine was "
                         "retired — tests/np_optimizer.py is the oracle)")

    n_frames = len(set(int(x) for x in log.id_to)) + 1
    b = _OnlineVioGraph(
        n_frames, len(log), bucket=cfg.bucket,
        plane_var_cap=cfg.plane_var_cap,
        plane_factor_cap=max(64, 4 * n_frames))
    inc = IncrementalOptimizer(
        iters_per_update=cfg.incremental_iters, damping=1e-6,
        solver=cfg.incremental_solver,
        pcg_iters=cfg.incremental_pcg_iters, window=cfg.window)
    # the plane stack needs an observation SOURCE; plane_mode="rescue"
    # with neither frames nor a provider is inert, and treating it as
    # plane-free keeps the fused per-frame fast path available
    stack = _PlaneStack(b, cfg, params, intrinsics, u2c_arg, frames,
                        plane_obs_provider) \
        if cfg.plane_mode != "off" and (frames is not None
                                        or plane_obs_provider is not None) \
        else None
    book = stack.book if stack is not None else None

    seq2graph: dict[int, int] = {}
    seq_ids: list[int] = []
    n_vo = n_imu = 0

    # startup gravity/bias initialization (initFromImu + static window;
    # see _static_init) — identity pose / zero bias when disabled
    if cfg.gravity_init and len(log):
        init_R, init_bias = _static_init(
            imu, float(t_of(int(log.id_from[0]))), imu_params,
            cfg.static_init_samples)
    else:
        init_R, init_bias = np.eye(3), np.zeros(6)
    init_pose = se3.Pose(jnp.asarray(init_R), jnp.zeros(3))

    # estimator state (feedback loop)
    prev_pose = init_pose
    prev_vel = jnp.zeros(3)
    prev_bias = jnp.asarray(init_bias)
    cur_imu_idx = 0  # measurement cursor relative to sync start

    def first_node(seq):
        nonlocal cur_imu_idx
        gid = b.add_pose((init_R, np.zeros(3)))
        b.add_vel(np.zeros(3))
        b.add_bias(init_bias)
        seq2graph[seq] = gid
        seq_ids.append(seq)
        b.add_prior_pose(gid, (init_R, np.zeros(3)),
                         sigmas=np.full(6, 1e-7))
        b.add_prior_vel(gid, np.zeros(3), sigma=1e-3)
        b.add_prior_bias(gid, init_bias, sigma=1e-3)
        imu.set_start_time(float(t_of(seq)))
        cur_imu_idx = 0
        if stack is not None:
            stack.first_node_planes(gid, init_pose, seq)

    def imu_window_for(seq):
        """Padded measurement window [cur_imu_idx, index_at(t_img))."""
        nonlocal cur_imu_idx
        t_img = float(t_of(seq))
        nxt = find_index_at(imu.t, t_img, imu.start)
        if nxt < 0:
            nxt = len(imu.t) - imu.start - 1
        i0, i1 = cur_imu_idx, max(nxt, cur_imu_idx)
        acc, gyr = imu.window(i0, i1)
        cur_imu_idx = nxt
        return _pad_window(acc, gyr, i1 - i0, imu.dt, cfg.max_imu_window)

    def integrate_to(seq):
        """Preintegrate the window with the current bias estimate."""
        from ..imu import init_preint, integrate_segment

        a, g, dts = imu_window_for(seq)
        st = init_preint(prev_bias, imu_params)
        return integrate_segment(st, a, g, dts, imu_params)

    # observability: per-phase wall timers + chi2-per-update records +
    # optional jax.profiler trace over the whole replay (SURVEY §5)
    from ..utils.profiling import Chi2Log, PhaseTimer, trace_context

    chi2_log = Chi2Log()
    pt = PhaseTimer()
    _stack = contextlib.ExitStack()
    _stack.enter_context(trace_context(cfg.trace_dir))

    for k in range(len(log)):
        id_to = int(log.id_to[k])
        id_from = int(log.id_from[k])
        info = log.info[k]
        failed = info[0, 0] == FAILED_INFO_SENTINEL

        if not seq2graph:
            first_node(id_from)
            prev_pose = init_pose
            prev_vel = jnp.zeros(3)
            prev_bias = jnp.asarray(init_bias)

        if id_from not in seq2graph:
            continue
        gi = seq2graph[id_from]

        # fused fast path: whole frame = ONE device call (no plane stack)
        fast = book is None and plane_obs_provider is None

        if id_to not in seq2graph and fast:
            with pt("fused_frame"):
                a, g_, dts = imu_window_for(id_to)
                if failed:
                    # the between row is written inactive, but its sqrt-info
                    # still passes through a host Cholesky — reference logs
                    # carry arbitrary values beyond the info(0,0) sentinel
                    # on failed rows, so substitute a benign placeholder
                    T = se3.identity()
                    info_b = np.eye(6)
                else:
                    T, info_b = _conjugate_edge(log.xi[k], info, u2c)
                gj = len(seq_ids)
                og = b.og
                bt_slot = og._slot("between", og.graph.between.i.shape[0])
                imu_slot = og._slot("imu", og.graph.imu.i.shape[0])
                dt64 = og.values.pose_t.dtype
                og.graph, og.values, est_R, est_t, pred_vel, _ = \
                    _fused_vio_step(
                        og.graph, og.values, imu_params, a, g_, dts,
                        jnp.asarray(prev_pose.R, dt64),
                        jnp.asarray(prev_pose.t, dt64),
                        jnp.asarray(prev_vel, dt64),
                        jnp.asarray(prev_bias, dt64),
                        jnp.asarray(T.R, dt64), jnp.asarray(T.t, dt64),
                        jnp.asarray(_sqrt_info(6, information=info_b), dt64),
                        jnp.asarray(0 if robust_k is None else 1, jnp.int32),
                        jnp.asarray(1.0 if robust_k is None
                                    else float(robust_k), dt64),
                        jnp.asarray(bool(failed)), jnp.asarray(gi),
                        jnp.asarray(gj),
                        jnp.asarray(bt_slot), jnp.asarray(imu_slot),
                        jnp.asarray(gravity, dt64),
                        gate=cfg.chi2_vro_gate,
                        gate_thresh=cfg.chi2_threshold)
                og.num_poses = max(og.num_poses, gj + 1)
                og.num_vels = max(og.num_vels, gj + 1)
                og.num_biases = max(og.num_biases, gj + 1)
                seq2graph[id_to] = gj
                seq_ids.append(id_to)
                n_imu += 1
                if cfg.feedback:
                    prev_pose = se3.Pose(est_R, est_t)
                    prev_vel = pred_vel
        elif id_to not in seq2graph:
            # --- new frame ---------------------------------------------
            from ..imu import predict_navstate

            with pt("imu_preint"):
                st = integrate_to(id_to)
                pred_pose, pred_vel = predict_navstate(
                    st, prev_pose, prev_vel, prev_bias, imu_params.gravity)

            T, info_b = _conjugate_edge(log.xi[k], info, u2c)

            if cfg.chi2_vro_gate and not failed:
                # rotation consistency: VO increment vs IMU prediction,
                # whitened by the preintegrated rotation covariance
                from ..core import so3 as _so3

                R_imu = (prev_pose.R.T @ pred_pose.R)
                e_R = np.asarray(_so3.logmap(jnp.asarray(T.R).T @ R_imu))
                S_R = np.asarray(st.cov)[:3, :3] + np.eye(3) * 1e-12
                chi2 = float(e_R @ np.linalg.solve(S_R, e_R))
                if chi2 > cfg.chi2_threshold:
                    failed = True   # reject the VO edge; IMU carries the pose

            gj = len(seq_ids)
            if not failed:
                # initial estimate composes from the MATCHED node's pose
                # (addToGTSAM, gtsam_graph.cpp:655-668); gi == gj-1 on
                # sequential logs but differs when tracking recovers
                # against an older keyframe
                Ri, ti = b.pose(gi)
                est = se3.compose(se3.Pose(jnp.asarray(Ri),
                                           jnp.asarray(ti)), T)
            else:
                est = pred_pose
            b.add_pose((np.asarray(est.R), np.asarray(est.t)))
            b.add_vel(np.asarray(pred_vel))
            b.add_bias(np.asarray(prev_bias))
            seq2graph[id_to] = gj
            seq_ids.append(id_to)

            if not failed:
                b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                              information=info_b, robust=robust_k)
                n_vo += 1
            # the CombinedImuFactor always connects CONSECUTIVE frames
            # (test_vro_imu_graph.cpp:191-196): the preintegration window
            # spans from the previous frame, whatever the VO edge matched
            b.add_imu_factor(gj - 1, gj, st, gravity)
            n_imu += 1

            want_planes = stack is not None and (
                cfg.plane_mode == "always"
                or (cfg.plane_mode == "rescue" and failed))
            if want_planes:
                stack.provider_obs(gj, est, id_to)
                if frames is not None:
                    # frames-driven rescue from the PREVIOUS FRAME's
                    # estimated pose — NOT the matched node gi and NOT the
                    # feedback state, which differ when tracking recovers
                    # against an older keyframe (see _PlaneStack.rescue)
                    pre_gid = gj - 1
                    Rp, tp = b.pose(pre_gid)
                    pre_pose = se3.Pose(jnp.asarray(Rp), jnp.asarray(tp))
                    stack.rescue(gj, est, id_to, pre_gid, pre_pose,
                                 seq_ids[pre_gid],
                                 np.asarray(st.cov)[:6, :6])

            if cfg.feedback:
                prev_pose, prev_vel = est, pred_vel
        else:
            # --- loop closure -------------------------------------------
            if failed:
                continue
            gj = seq2graph[id_to]
            T, info_b = _conjugate_edge(log.xi[k], info, u2c)
            b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                          information=info_b, robust=robust_k)
            n_vo += 1

        # --- periodic incremental optimization + feedback ---------------
        if cfg.feedback and len(seq_ids) % cfg.optimize_step == 0:
            with pt("optimize"):
                # zero-recompile update on the live arenas; og.values IS
                # the estimator state (no write-back needed)
                res = inc.update(b.og)
                vals = b.og.values
            chi2_log.add(k, len(seq_ids), None, float(res.error))
            j = len(seq_ids) - 1
            prev_pose = se3.Pose(vals.pose_R[j], vals.pose_t[j])
            prev_vel = vals.vel[j]
            prev_bias = vals.bias[j]

    graph, values = b.og.graph, b.og.values
    # the fused path never reads the gate verdict back per frame;
    # count accepted VO edges from the active mask instead
    n_vo = int(np.asarray(graph.between.active).sum())
    e0 = float(total_error(graph, values))
    if cfg.final_batch:
        with pt("final_batch"):
            res = lm_optimize(graph, values, lm_params)
        values = res.values
        err = float(res.error)
    else:
        err = e0
    chi2_log.add(len(log), len(seq_ids), e0, err)
    _stack.close()

    return VioResult(values=values, graph=graph,
                     seq_ids=np.asarray(seq_ids), error0=e0, error=err,
                     n_imu_factors=n_imu, n_vo_edges=n_vo,
                     n_plane_factors=stack.n_plane if stack else 0,
                     plane_book=book,
                     chi2_log=chi2_log, timers=pt.summary(),
                     plane_stack=stack)
